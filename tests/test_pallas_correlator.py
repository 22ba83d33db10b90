"""Pallas fused rotator+dot-product kernel vs the XLA reference path
(interpret mode on CPU; real lowering exercised on TPU by bench)."""

import jax.numpy as jnp
import numpy as np

from gnss_sim_receiver_tpu.ops import correlator, prn_codes
from gnss_sim_receiver_tpu.ops.pallas_correlator import (
    pallas_rotator_dot_prod, resample_codes_xla)

FS = 2_000_000.0


def test_pallas_matches_xla_correlator():
    n_ch = 4
    block = 2048
    prns = [1, 7, 13, 22]
    codes = prn_codes.gps_l1_ca_code_table(prns)
    rng = np.random.default_rng(0)
    n = 3 * block
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    positions = np.array([0, 100, 517, 1024], np.int32)
    rem_code = np.array([0.1, 0.9, 0.5, 0.0], np.float32)
    code_freq = np.full(n_ch, 1.023e6, np.float32) * (
        1 + np.array([1000, -2000, 0, 3000], np.float32) / 1.57542e9)
    rem_carr = np.array([0.0, 1.0, 3.0, 6.0], np.float32)
    doppler = np.array([1000.0, -2000.0, 0.0, 3000.0], np.float32)
    n_samp = np.array([1955, 2000, 1800, 2002], np.int32)
    taps = np.array([0.25, 0.0, -0.25], np.float32)

    blocks = correlator.gather_blocks(jnp.asarray(x), jnp.asarray(positions),
                                      block)
    ref = correlator.correlate_multitap(
        blocks, jnp.asarray(codes), jnp.asarray(taps),
        jnp.asarray(rem_code), jnp.asarray(code_freq),
        jnp.asarray(rem_carr), jnp.asarray(doppler),
        jnp.asarray(n_samp), FS)

    params = np.zeros((n_ch, 8), np.float32)
    params[:, 0] = rem_code
    params[:, 1] = code_freq
    params[:, 2] = rem_carr
    params[:, 3] = doppler
    params[:, 4] = n_samp.astype(np.float32)
    code_mat = resample_codes_xla(jnp.asarray(codes), jnp.asarray(taps),
                                  jnp.asarray(rem_code),
                                  jnp.asarray(code_freq), block, FS)
    got = pallas_rotator_dot_prod(blocks, code_mat, jnp.asarray(params),
                                  fs=FS, interpret=True)
    scale = np.sqrt(block)
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-3)
