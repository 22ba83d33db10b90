"""Kernel-shape autotuner (volk_gnsssdr_profile role, VERDICT r4 #9):
tools.profile_kernels measures epochs-per-block candidates with the
honest carried-state timing, caches the winner, and TrackingEngine
transparently adopts it for the matching operating point."""

import io
import json

import numpy as np

from gnss_sim_receiver_tpu.models import tracking as trk
from gnss_sim_receiver_tpu.tools.profile_kernels import \
    profile_block_kernel
from gnss_sim_receiver_tpu.utils import autotune

FS = 2_000_000.0


def test_profile_tool_caches_and_engine_adopts(tmp_path, monkeypatch):
    cache = tmp_path / "profile.json"
    monkeypatch.setenv("GNSS_TPU_PROFILE", str(cache))
    autotune.invalidate()

    conf = trk.TrackingConf(fs=FS)
    eng = trk.TrackingEngine(conf, prns=list(range(1, 5)))
    default = eng.block_epochs
    assert default == 20     # hand-picked 20 ms default at 1 ms epochs

    out = io.StringIO()
    results = profile_block_kernel(fs=FS, n_channels=4,
                                   candidates=(4, 8), reps=2,
                                   span_s=0.05, out=out)
    assert set(results) == {4, 8}
    assert all(v > 0 for v in results.values())
    data = json.loads(cache.read_text())
    key = autotune.key_e_block(FS, conf.code_length_chips,
                               conf.t_epoch_nominal_s)
    assert data[key] in (4, 8)
    assert "msamples_s" in data["_meta"][key]

    autotune.invalidate()
    assert eng.block_epochs == data[key]
    # a DIFFERENT operating point still uses the default
    conf5 = trk.TrackingConf(fs=5_000_000.0)
    eng5 = trk.TrackingEngine(conf5, prns=list(range(1, 5)))
    assert eng5.block_epochs == 20

    # tuned shape still tracks: kernel output matches the default shape
    from gnss_sim_receiver_tpu.models import tracking_block as tb
    from gnss_sim_receiver_tpu.ops import prn_codes
    import jax.numpy as jnp
    codes = prn_codes.gps_l1_ca_code_table([1, 2, 3, 4])
    rep = tb.code_spectra(conf, np.asarray(codes))
    taps = np.array([0.25, 0.0, -0.25], np.float32)
    rng = np.random.default_rng(2)
    n = conf.nominal_epoch_samples * 18 + tb.block_fft_size(conf)
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64)
    st = trk._init_state(4)._replace(active=jnp.ones(4, bool))
    _, o_a = tb.track_chunk_blocks(conf, 4, 4, jnp.asarray(rep),
                                   jnp.asarray(taps), jnp.asarray(x), st)
    _, o_b = tb.track_chunk_blocks(conf, 2, 8, jnp.asarray(rep),
                                   jnp.asarray(taps), jnp.asarray(x), st)
    np.testing.assert_allclose(np.asarray(o_a["prompt"])[:4],
                               np.asarray(o_b["prompt"])[:4],
                               rtol=1e-4, atol=1e-2)


def test_lookup_miss_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("GNSS_TPU_PROFILE", str(tmp_path / "none.json"))
    autotune.invalidate()
    assert autotune.lookup("e_block:fs=1:cl=1:te=1.000ms") is None
    autotune.invalidate()
