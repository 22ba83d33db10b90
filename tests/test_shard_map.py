"""Explicit-collective scale-out tests on the virtual 8-device CPU mesh:
shard_map tracking (all_gather of observable records), Doppler-sharded
acquisition (all_gather peak reduction + psum noise floor), and time-axis
overlap-save acquisition with ppermute halo exchange — each proven equal
to the single-device computation (SURVEY.md §2.13/§7 scale-out plan)."""

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models import tracking as trk
from gnss_sim_receiver_tpu.ops import pcps, prn_codes
from gnss_sim_receiver_tpu.parallel import make_mesh, shard_channel_axis
from gnss_sim_receiver_tpu.parallel.shard_steps import (
    acquisition_doppler_sharded, overlap_save_acq_grid,
    tracking_step_sharded)

FS = 2_000_000.0


def test_tracking_step_sharded_equals_single_device():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    n_channels, n_epochs = 16, 3
    conf = trk.TrackingConf(fs=FS)
    prns = [(i % 32) + 1 for i in range(n_channels)]
    codes = prn_codes.gps_l1_ca_code_table(prns)
    taps = np.array([+0.25, 0.0, -0.25], np.float32)
    rng = np.random.default_rng(3)
    chunk = conf.nominal_epoch_samples * (n_epochs + 1) + conf.block_size
    x = (rng.standard_normal(chunk)
         + 1j * rng.standard_normal(chunk)).astype(np.complex64)
    state = trk._init_state(n_channels)._replace(
        active=jnp.ones(n_channels, bool),
        carrier_doppler=jnp.linspace(-3000, 3000,
                                     n_channels).astype(jnp.float32))

    ref_state, ref_outs = trk.track_chunk(conf, n_epochs, jnp.asarray(codes),
                                          jnp.asarray(taps), jnp.asarray(x),
                                          state)
    sh_state, sh_outs = tracking_step_sharded(
        mesh, conf, n_epochs, codes, taps, x,
        shard_channel_axis(state, mesh))

    np.testing.assert_allclose(np.asarray(sh_state.carrier_doppler),
                               np.asarray(ref_state.carrier_doppler),
                               rtol=1e-5, atol=1e-3)
    for k in ref_outs:
        np.testing.assert_allclose(np.asarray(sh_outs[k]),
                                   np.asarray(ref_outs[k]),
                                   rtol=1e-4, atol=1e-2, err_msg=k)
    # state stays sharded; gathered outs are full-size and replicated
    assert len({s.device for s in
                sh_state.carrier_doppler.addressable_shards}) == 8
    assert sh_outs["prompt"].shape == (n_epochs, n_channels)


def test_tracking_block_step_sharded_equals_single_device():
    """VERDICT r4 #4 done-criterion: the steady-state block-FFT kernel
    runs channel-sharded on the 8-device mesh and matches the
    single-device output."""
    from gnss_sim_receiver_tpu.models import tracking_block as tb
    from gnss_sim_receiver_tpu.parallel.shard_steps import \
        tracking_block_step_sharded

    mesh = make_mesh(8)
    n_channels = 16
    n_blocks, e_block = 2, 4
    conf = trk.TrackingConf(fs=FS, enable_fll_pullin=True)
    prns = [(i % 32) + 1 for i in range(n_channels)]
    codes = prn_codes.gps_l1_ca_code_table(prns)
    codes_rep = tb.code_spectra(conf, np.asarray(codes))
    taps = np.array([+0.25, 0.0, -0.25], np.float32)
    rng = np.random.default_rng(9)
    chunk = conf.nominal_epoch_samples * (n_blocks * e_block + 2) \
        + tb.block_fft_size(conf)
    x = (rng.standard_normal(chunk)
         + 1j * rng.standard_normal(chunk)).astype(np.complex64)
    state = trk._init_state(n_channels)._replace(
        active=jnp.ones(n_channels, bool),
        carrier_doppler=jnp.linspace(-3000, 3000,
                                     n_channels).astype(jnp.float32))

    ref_state, ref_outs = tb.track_chunk_blocks(
        conf, n_blocks, e_block, jnp.asarray(codes_rep),
        jnp.asarray(taps), jnp.asarray(x), state)
    sh_state, sh_outs = tracking_block_step_sharded(
        mesh, conf, n_blocks, e_block, codes_rep, taps, x,
        shard_channel_axis(state, mesh))

    np.testing.assert_allclose(np.asarray(sh_state.carrier_doppler),
                               np.asarray(ref_state.carrier_doppler),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sh_state.code_freq),
                               np.asarray(ref_state.code_freq),
                               rtol=1e-6, atol=1e-3)
    for k in ref_outs:
        np.testing.assert_allclose(np.asarray(sh_outs[k]),
                                   np.asarray(ref_outs[k]),
                                   rtol=1e-4, atol=1e-2, err_msg=k)
    assert len({s.device for s in
                sh_state.carrier_doppler.addressable_shards}) == 8
    assert sh_outs["prompt"].shape == (n_blocks * e_block, n_channels)


def _acq_setup(n_prns=4, fft=2000):
    prns = list(range(1, n_prns + 1))
    sampled = np.stack([prn_codes.sample_code(prn_codes.gps_l1_ca_code(p),
                                              FS, 1.023e6, fft)
                        for p in prns])
    cfc = np.conj(np.fft.fft(sampled, axis=-1)).astype(np.complex64)
    rng = np.random.default_rng(5)
    code = np.tile(sampled[0], 4)
    t = np.arange(2 * fft) / FS
    sig = np.roll(code[:2 * fft], 333) * np.exp(2j * np.pi * 2100.0 * t)
    xd = (0.5 * sig.reshape(2, fft)
          + 0.3 * (rng.standard_normal((2, fft))
                   + 1j * rng.standard_normal((2, fft)))).astype(np.complex64)
    return prns, cfc, xd


def test_acquisition_doppler_sharded_equals_full_grid():
    mesh = make_mesh(8)
    prns, cfc, xd = _acq_setup()
    # 40 bins / 8 shards = 5 bins per device
    dops = (np.arange(40, dtype=np.float32) - 20) * 250.0
    peak, dop_hz, del_i, noise = acquisition_doppler_sharded(
        mesh, xd, cfc, dops, FS)
    grid = pcps.pcps_grid(jnp.asarray(xd), jnp.asarray(cfc),
                          jnp.asarray(dops), FS)
    ref_peak, ref_dop_i, ref_del_i = pcps.grid_peak(grid)
    np.testing.assert_allclose(np.asarray(peak), np.asarray(ref_peak),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(del_i), np.asarray(ref_del_i))
    np.testing.assert_allclose(np.asarray(dop_hz),
                               dops[np.asarray(ref_dop_i)], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(noise),
                               np.asarray(jnp.mean(grid, axis=(1, 2))),
                               rtol=1e-5)
    # the detected channel-0 peak is at the injected delay/Doppler
    assert int(np.asarray(del_i)[0]) == 333
    assert abs(float(np.asarray(dop_hz)[0]) - 2100.0) <= 250.0


def test_overlap_save_halo_exchange_matches_linear_reference():
    mesh = make_mesh(8)
    n = 2000                      # one code period in samples
    k_per_dev = 2
    total = 8 * k_per_dev * n     # 16 code periods over 8 devices
    code = prn_codes.sample_code(prn_codes.gps_l1_ca_code(7), FS,
                                 1.023e6, n)
    rng = np.random.default_rng(9)
    t = np.arange(total) / FS
    sig = np.roll(np.tile(code, 8 * k_per_dev + 1)[:total], 777)
    x = (0.4 * sig * np.exp(2j * np.pi * 1500.0 * t)
         + 0.5 * (rng.standard_normal(total)
                  + 1j * rng.standard_normal(total))).astype(np.complex64)
    dops = np.array([-1500.0, 0.0, 1500.0, 3000.0], np.float32)

    grid = overlap_save_acq_grid(mesh, x, code, dops, FS)
    grid = np.asarray(grid)
    assert grid.shape == (4, n)

    # single-host linear reference: same windows, direct correlation
    code_fft = np.conj(np.fft.fft(np.concatenate([code,
                                                  np.zeros(total - n)])))
    ref = np.zeros((4, n))
    for di, d in enumerate(dops):
        wiped = x * np.exp(-2j * np.pi * d * t)
        corr = np.fft.ifft(np.fft.fft(wiped) * code_fft)
        mag = np.abs(corr) ** 2   # circular over the whole capture =
        # linear for every window except the final wrap, identical to the
        # sharded program's device-0-halo wraparound
        ref[di] = mag.reshape(-1, n).sum(axis=0)
    np.testing.assert_allclose(grid, ref, rtol=2e-4, atol=1e-2)
    # detection at the injected delay/Doppler
    di, li = np.unravel_index(np.argmax(grid), grid.shape)
    assert dops[di] == 1500.0 and li == 777
