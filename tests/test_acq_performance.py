"""Detection-performance harness: ROC points + tracking pull-in basin.

Round-2 verdict task #9 — the roles of acq_performance_test.cc (Pd/Pfa
vs C/N0 over many trials) and tracking_pull-in_test.cc (convergence map
over initial Doppler/code offsets), both exploiting the batched engines:
trials / grid points are array axes, so hundreds of trials run in a few
device dispatches."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models.acq_performance import sweep
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0


def test_roc_pfa_calibration_and_pd_curve():
    """Measured Pfa must track the CFAR design point and Pd must be a
    proper ROC: ~0 deep in the noise, ~1 at strong C/N0, monotonic."""
    pfa_hat, pd, thr = sweep(
        cn0_db_hz=(30.0, 40.0, 45.0), pfa=0.05, n_trials=384, seed=2)
    # Pfa calibration: the max-over-cells CFAR bound is conservative
    # (cells are correlated), so measured <= ~1.5x design and not
    # absurdly small
    assert pfa_hat <= 0.075, pfa_hat
    assert pfa_hat >= 0.002, pfa_hat
    # ROC shape at the three C/N0 points: 30 dB-Hz is below the 1 ms
    # single-dwell detection floor (~37 dB-Hz), 45 dB-Hz is solid
    assert pd[30.0] <= 0.2, pd
    assert pd[45.0] >= 0.95, pd
    assert pd[30.0] <= pd[40.0] <= pd[45.0], pd


def test_roc_dwell_gain():
    """Noncoherent dwell accumulation must raise Pd at the threshold
    C/N0 (the reference's max_dwells trade)."""
    _, pd1, _ = sweep(cn0_db_hz=(38.0,), pfa=0.01, n_trials=384,
                      max_dwells=1, seed=5)
    _, pd2, _ = sweep(cn0_db_hz=(38.0,), pfa=0.01, n_trials=384,
                      max_dwells=2, seed=5)
    assert pd2[38.0] >= pd1[38.0], (pd1, pd2)
    assert pd2[38.0] - pd1[38.0] > 0.05 or pd1[38.0] > 0.9


def test_tracking_pull_in_basin():
    """Map DLL/PLL convergence over initial (Doppler, code) offsets: one
    batched run, channels = grid points.  The inner basin must converge,
    far-out Doppler must not."""
    dop_true = 800.0
    rng_bits = (np.random.default_rng(8).integers(0, 2, 200) * 2
                - 1).astype(np.int8)
    sat = SatelliteSignalParams(prn=5, cn0_db_hz=45.0,
                                doppler_hz=dop_true,
                                delay_chips=0.0, nav_bits=rng_bits)
    x = generate_baseband([sat], FS, int(FS * 2.5), noise=True, seed=8)

    df = np.array([-2000.0, -400.0, -150.0, 0.0, 150.0, 400.0, 2000.0])
    dtau = np.array([-0.4, -0.2, 0.0, 0.2, 0.4])   # chips
    grid = [(f, t) for f in df for t in dtau]
    n = len(grid)
    trk = TrackingEngine(TrackingConf(fs=FS), prns=[5] * n)
    spc = FS / 1.023e6
    for c, (f, tau) in enumerate(grid):
        start = int(round((tau % 1023.0) * spc))
        trk.start_tracking(c, dop_true + f, start)
    outs = trk.process(x, 0, 2000)
    dop_err = np.abs(outs["carrier_doppler_hz"][-200:].mean(axis=0)
                     - dop_true)
    locked = (dop_err < 5.0) & np.asarray(outs["valid"][-1])

    basin = locked.reshape(len(df), len(dtau))
    # inner basin: |df| <= 150 Hz, |dtau| <= 0.2 chips must converge
    inner = basin[2:5, 1:4]
    assert inner.all(), basin.astype(int)
    # far Doppler (+-2 kHz) must NOT pull in at any code offset
    assert not basin[0].any() and not basin[-1].any(), basin.astype(int)
