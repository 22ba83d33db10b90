"""DLL/PLL tracking on simulated signals (reference analogue:
src/tests/unit-tests/signal-processing-blocks/tracking/
gps_l1_ca_dll_pll_tracking_test.cc)."""

import numpy as np

from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0
F_L1 = 1575.42e6
CODE_RATE = 1.023e6


def _truth_code_phase(pos_samples, delay_chips, doppler_hz, fs):
    tau = (pos_samples / fs) * (1 + doppler_hz / F_L1) - delay_chips / CODE_RATE
    truth = (tau * CODE_RATE) % 1023
    return np.where(truth > 511, truth - 1023, truth)


def test_single_channel_convergence():
    bits = (np.random.default_rng(3).integers(0, 2, 1500) * 2 - 1).astype(np.int8)
    sat = SatelliteSignalParams(prn=7, cn0_db_hz=48.0, doppler_hz=1250.0,
                                delay_chips=300.5, nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * 2.6), noise=True, seed=1)
    trk = TrackingEngine(TrackingConf(fs=FS), prns=[7])
    code_start = int(round(300.5 * FS / CODE_RATE))
    # seed with a 100 Hz Doppler error (half an acquisition bin)
    trk.start_tracking(0, 1250.0 + 100.0, code_start)
    # 2.5 s: the 2nd-order 2 Hz DLL's pull-in transient (up to ~0.07
    # chips at the worst sub-sample delay phase) decays over ~2 s —
    # assertions below sample the SETTLED loop (the transient itself is
    # characterized in test_tracking_block.py / RTK settle weighting)
    outs = trk.process(x, 0, 2500)

    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-200:].mean() - 1250.0) < 5.0
    assert dop[-200:].std() < 10.0
    # C/N0 estimate within a few dB of truth
    assert abs(outs["cn0_db_hz"][-1, 0] - 48.0) < 4.0
    # carrier lock
    assert float(np.asarray(trk.state.carrier_lock)[0]) > 0.85
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    # prompt energy concentrated in I
    p = outs["prompt"][-200:, 0]
    assert np.abs(p.real).mean() > 5 * np.abs(p.imag).mean()
    # code phase tracks truth to < 0.05 chips on average
    err = (outs["rem_code_phase_chips"][-200:, 0].astype(np.float64)
           - _truth_code_phase(outs["pos_start"][-200:, 0].astype(np.float64),
                               300.5, 1250.0, FS))
    assert abs(err.mean()) < 0.05
    # nav bits recoverable from prompt signs (20-epoch cells, global sign amb)
    signs = np.sign(p.real[:180].reshape(9, 20).mean(axis=1))
    assert (np.abs(np.sign(p.real[:180].reshape(9, 20)).sum(axis=1)) == 20).all()


def test_multichannel_independent_dynamics():
    prns = [3, 11, 29]
    dops = [-3000.0, 800.0, 4200.0]
    delays = [12.25, 500.0, 890.75]
    bits = np.ones(1500, np.int8)
    sats = [SatelliteSignalParams(prn=p, cn0_db_hz=47.0, doppler_hz=d,
                                  delay_chips=dc, nav_bits=bits)
            for p, d, dc in zip(prns, dops, delays)]
    x = generate_baseband(sats, FS, int(FS * 0.9), noise=True, seed=5)
    trk = TrackingEngine(TrackingConf(fs=FS), prns=prns)
    for i, (d, dc) in enumerate(zip(dops, delays)):
        trk.start_tracking(i, d - 80.0, int(round(dc * FS / CODE_RATE)))
    outs = trk.process(x, 0, 800)
    for i, d in enumerate(dops):
        assert abs(outs["carrier_doppler_hz"][-100:, i].mean() - d) < 5.0, i
        assert not bool(np.asarray(trk.state.lock_lost)[i])


def test_acq_to_track_handoff():
    """Full acquisition -> start_tracking handoff as the channel FSM does."""
    bits = np.ones(1500, np.int8)
    sat = SatelliteSignalParams(prn=19, cn0_db_hz=48.0, doppler_hz=-2100.0,
                                delay_chips=777.3, nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * 0.8), noise=True, seed=9)
    acq = PcpsAcquisitionEngine(AcqConf(fs_in=FS, max_dwells=2), prns=[19])
    res = acq.acquire(x[:8000])
    assert bool(res.detected[0])
    trk = TrackingEngine(TrackingConf(fs=FS), prns=[19])
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    outs = trk.process(x, 0, 700)
    assert abs(outs["carrier_doppler_hz"][-100:, 0].mean() + 2100.0) < 8.0
    assert not bool(np.asarray(trk.state.lock_lost)[0])


def test_lock_loss_on_vanished_signal():
    """Signal disappears -> lock detector must flag loss (reference
    hysteretic fail counters, dll_pll_veml_tracking.cc:972-1029)."""
    bits = np.ones(1500, np.int8)
    sat = SatelliteSignalParams(prn=5, cn0_db_hz=48.0, doppler_hz=500.0,
                                delay_chips=100.0, nav_bits=bits)
    n_on = int(FS * 0.6)
    x_on = generate_baseband([sat], FS, n_on, noise=True, seed=2)
    x_off = generate_baseband([], FS, int(FS * 1.6), start_sample=n_on,
                              noise=True, seed=2)
    x = np.concatenate([x_on, x_off])
    conf = TrackingConf(fs=FS)
    trk = TrackingEngine(conf, prns=[5])
    trk.start_tracking(0, 500.0, int(round(100.0 * FS / CODE_RATE)))
    outs = trk.process(x, 0, 2100)
    assert bool(np.asarray(trk.state.lock_lost)[0])
    # and the valid flag drops once lost
    assert not outs["valid"][-1, 0]
