"""Sharding tests on the virtual 8-device CPU mesh: channel-sharded
tracking and acquisition must equal the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sim_receiver_tpu.models import tracking as trk
from gnss_sim_receiver_tpu.ops import pcps, prn_codes
from gnss_sim_receiver_tpu.parallel import (make_mesh, replicate,
                                            shard_channel_axis)


def _setup(n_channels):
    conf = trk.TrackingConf(fs=2_000_000.0)
    prns = [(i % 32) + 1 for i in range(n_channels)]
    codes = prn_codes.gps_l1_ca_code_table(prns)
    taps = np.array([+0.25, 0.0, -0.25], np.float32)
    rng = np.random.default_rng(3)
    n_epochs = 3
    chunk = conf.nominal_epoch_samples * (n_epochs + 1) + conf.block_size
    x = (rng.standard_normal(chunk)
         + 1j * rng.standard_normal(chunk)).astype(np.complex64)
    state = trk._init_state(n_channels)._replace(
        active=jnp.ones(n_channels, bool),
        carrier_doppler=jnp.linspace(-3000, 3000, n_channels
                                     ).astype(jnp.float32))
    return conf, codes, taps, x, state, n_epochs


def test_sharded_tracking_matches_single_device():
    assert len(jax.devices()) == 8
    conf, codes, taps, x, state, n_epochs = _setup(16)

    ref_state, ref_outs = trk.track_chunk(conf, n_epochs,
                                          jnp.asarray(codes),
                                          jnp.asarray(taps),
                                          jnp.asarray(x), state)

    mesh = make_mesh(8)
    sh_state, sh_outs = trk.track_chunk(
        conf, n_epochs,
        shard_channel_axis(codes, mesh), replicate(taps, mesh),
        replicate(x, mesh), shard_channel_axis(state, mesh))

    np.testing.assert_allclose(np.asarray(sh_state.carrier_doppler),
                               np.asarray(ref_state.carrier_doppler),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sh_outs["prompt"]),
                               np.asarray(ref_outs["prompt"]),
                               rtol=1e-4, atol=1e-2)
    # outputs really are sharded over the mesh
    shard_devs = {s.device for s in sh_state.carrier_doppler.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_acquisition_matches_single_device():
    mesh = make_mesh(8)
    fs = 2_000_000.0
    fft = 2000
    prns = list(range(1, 17))
    sampled = np.stack([prn_codes.sample_code(prn_codes.gps_l1_ca_code(p),
                                              fs, 1.023e6, fft)
                        for p in prns])
    cfc = np.conj(np.fft.fft(sampled, axis=-1)).astype(np.complex64)
    dops = pcps.doppler_grid(5000.0, 500.0)
    rng = np.random.default_rng(5)
    xd = (rng.standard_normal((2, fft))
          + 1j * rng.standard_normal((2, fft))).astype(np.complex64)

    ref = pcps.pcps_grid(jnp.asarray(xd), jnp.asarray(cfc),
                         jnp.asarray(dops), fs)
    sh = pcps.pcps_grid(replicate(xd, mesh), shard_channel_axis(cfc, mesh),
                        replicate(dops, mesh), fs)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(ref),
                               rtol=1e-4, atol=1e-2)


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (8,)
    ge.dryrun_multichip(8)
