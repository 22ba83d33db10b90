"""Acquisition-error pull-in basin (reference
src/tests/unit-tests/signal-processing-blocks/tracking/
tracking_pull-in_test.cc): seed tracking with a GRID of code-phase and
Doppler errors around the true handoff point and map which cells pull
in.  The batched engine runs every trial as a channel of one scan —
the whole basin is a single device program."""

import numpy as np

from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0
CODE_RATE = 1.023e6


def _basin(code_errs_chips, dop_errs_hz, n_epochs=1500, cn0=45.0):
    prn, dop_true = 17, 800.0
    n0 = 700
    delay = n0 * CODE_RATE / FS
    bits = (np.random.default_rng(2).integers(0, 2, 1500) * 2 - 1
            ).astype(np.int8)
    sat = SatelliteSignalParams(prn=prn, cn0_db_hz=cn0, doppler_hz=dop_true,
                                delay_chips=delay, nav_bits=bits)
    x = generate_baseband([sat], FS, n0 + (n_epochs + 4) * 2000 + 4096,
                          noise=True, seed=5)
    cells = [(ce, de) for ce in code_errs_chips for de in dop_errs_hz]
    eng = TrackingEngine(TrackingConf(fs=FS), prns=[prn] * len(cells))
    for c, (ce, de) in enumerate(cells):
        start = n0 + int(round(ce * FS / CODE_RATE))
        eng.start_tracking(c, dop_true + de, start)
    outs = eng.process(x, 0, n_epochs)
    dop_end = outs["carrier_doppler_hz"][-100:].mean(axis=0)
    lock = np.asarray(eng.state.carrier_lock)
    cn0_est = np.asarray(eng.state.cn0_db_hz)
    ok = ((np.abs(dop_end - dop_true) < 10.0) & (lock > 0.8)
          & (cn0_est > cn0 - 6.0)
          & ~np.asarray(eng.state.lock_lost))
    return {cell: bool(ok[i]) for i, cell in enumerate(cells)}


def test_pullin_basin_covers_acquisition_errors():
    """Every cell inside the acquisition handoff error budget
    (|code error| <= 0.5 chip, |Doppler error| <= 125 Hz = half the
    default bin) must pull in; far-outside cells must fail (the
    detector works)."""
    basin = _basin(code_errs_chips=[-0.5, -0.25, 0.0, 0.25, 0.5],
                   dop_errs_hz=[-125.0, 0.0, 125.0])
    bad = [cell for cell, ok in basin.items() if not ok]
    assert not bad, f"in-budget cells failed to pull in: {bad}"

    far = _basin(code_errs_chips=[8.0], dop_errs_hz=[0.0, 1500.0])
    assert not any(far.values()), "far-out cells reported lock"
