"""BASELINE configs #3/#4: hybrid GPS L1 + Galileo E1b multichannel in one
capture, and wideband GPS L5 (10.23 Mcps) tracking."""

import numpy as np

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.ops import prn_codes_multi
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband


def test_hybrid_gps_galileo_multichannel():
    """Two GPS L1 C/A + two Galileo E1b satellites in the same 4.5 Msps
    capture; both chains acquire and track concurrently (the hybrid
    multi-constellation receiver of conf #3)."""
    fs = 4_500_000.0
    rng = np.random.default_rng(12)
    gps_bits = (rng.integers(0, 2, 1500) * 2 - 1).astype(np.int8)
    e1_bits = (rng.integers(0, 2, 3000) * 2 - 1).astype(np.int8)
    sats = [
        SatelliteSignalParams(prn=3, cn0_db_hz=47.0, doppler_hz=-2200.0,
                              delay_chips=120.0, nav_bits=gps_bits),
        SatelliteSignalParams(prn=17, cn0_db_hz=47.0, doppler_hz=900.0,
                              delay_chips=830.5, nav_bits=gps_bits.copy()),
        SatelliteSignalParams(prn=11, system="Galileo", signal="1B",
                              cn0_db_hz=48.0, doppler_hz=1800.0,
                              delay_chips=1234.5, nav_bits=e1_bits),
        SatelliteSignalParams(prn=20, system="Galileo", signal="1B",
                              cn0_db_hz=48.0, doppler_hz=-3100.0,
                              delay_chips=400.25, nav_bits=e1_bits.copy()),
    ]
    x = generate_baseband(sats, fs, int(fs * 1.2), noise=True, seed=12)

    # GPS chain
    acq_gps = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, max_dwells=2), prns=[3, 17])
    rg = acq_gps.acquire(x)
    assert rg.detected.all(), rg.test_stat
    trk_gps = TrackingEngine(TrackingConf(fs=fs), prns=[3, 17])
    for c, d in enumerate((-2200.0, 900.0)):
        trk_gps.start_tracking(c, float(rg.doppler_hz[c]),
                               int(rg.samplestamp + rg.delay_samples[c]))
    og = trk_gps.process(x, 0, 1000)
    assert abs(og["carrier_doppler_hz"][-100:, 0].mean() + 2200.0) < 5.0
    assert abs(og["carrier_doppler_hz"][-100:, 1].mean() - 900.0) < 5.0

    # Galileo chain on the same capture
    sig = signals.GALILEO_E1B
    prov = lambda p: signals.subchip_table(sig, p)
    acq_e1 = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, sampled_ms=4, doppler_step=125.0, max_dwells=2,
                make_two_steps=True, doppler_step2=31.25),
        prns=[11, 20], code_provider=prov, sc_rate=sig.sc_rate)
    re = acq_e1.acquire(x)
    assert re.detected.all(), re.test_stat
    # E1B symbols flip every epoch (4 ms), so the cross-dot FLL is fed a
    # corrupted pair each time -> false locks at k*125 Hz; acquire finer
    # (two-step) and pull in with the PLL alone (reference disables FLL for
    # E1 for the same reason)
    conf_e1 = TrackingConf(fs=fs, code_rate_cps=sig.sc_rate,
                           code_length_chips=sig.sc_length,
                           early_late_space_chips=0.5,
                           enable_fll_pullin=False,
                           fll_pullin_epochs=100)
    trk_e1 = TrackingEngine(conf_e1, prns=[11, 20], code_provider=prov)
    for c in range(2):
        trk_e1.start_tracking(c, float(re.doppler_hz[c]),
                              int(re.samplestamp + re.delay_samples[c]))
    oe = trk_e1.process(x, 0, 280)
    assert abs(oe["carrier_doppler_hz"][-60:, 0].mean() - 1800.0) < 8.0
    assert abs(oe["carrier_doppler_hz"][-60:, 1].mean() + 3100.0) < 8.0
    assert not np.asarray(trk_gps.state.lock_lost).any()
    assert not np.asarray(trk_e1.state.lock_lost).any()


def test_l5_wideband_tracking():
    """GPS L5I at 10.23 Mcps, 12.5 Msps: acquisition + 1 ms-epoch tracking
    with the real L5 code generator (conf #4's wideband path; NH/data
    symbols at 1 ksps carried as nav_bits)."""
    fs = 12_500_000.0
    sig = signals.SignalDef("GPS", "L5", 1176.45e6, 10.23e6, 10230, 1,
                            1000.0)
    rng = np.random.default_rng(5)
    syms = (rng.integers(0, 2, 4000) * 2 - 1).astype(np.int8)

    # register L5 in the simulator via the generic signal hook
    import gnss_sim_receiver_tpu.sim.signal_generator as sg
    orig = sg._sig_params

    def patched(sat):
        if sat.signal == "L5":
            code = prn_codes_multi.gps_l5_code(sat.prn).astype(np.int8)
            return code, 10.23e6, 10230
        return orig(sat)
    sg._sig_params = patched
    try:
        sat = SatelliteSignalParams(prn=4, system="GPS", signal="L5",
                                    cn0_db_hz=48.0, doppler_hz=-1500.0,
                                    delay_chips=5000.25, nav_bits=syms)
        x = generate_baseband([sat], fs, int(fs * 0.9), noise=True, seed=5)
    finally:
        sg._sig_params = orig

    prov = lambda p: prn_codes_multi.gps_l5_code(p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, max_dwells=2, doppler_max=5000, doppler_step=250,
                make_two_steps=True, doppler_step2=62.5),
        prns=[4], code_provider=prov, sc_rate=10.23e6)
    res = acq.acquire(x)
    assert bool(res.detected[0])
    exp_delay = 5000.25 / 10.23e6 * fs
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, acq.fft_size - err) <= 3.0

    # L5 NH-chipped symbols flip every 1 ms epoch -> FLL pairs corrupted
    # like E1: PLL-only pull-in with a 50 Hz bandwidth wide enough to pull
    # in the refined-acquisition Doppler error (secondary-code wipeoff /
    # pilot tracking is the round-2 refinement, as in the reference's
    # track_pilot path)
    conf = TrackingConf(fs=fs, code_rate_cps=10.23e6,
                        code_length_chips=10230,
                        carrier_freq_hz=1176.45e6,
                        early_late_space_chips=0.5,
                        enable_fll_pullin=False, pll_bw_hz=50.0,
                        fll_pullin_epochs=250)
    trk = TrackingEngine(conf, prns=[4], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    outs = trk.process(x, 0, 800)
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-100:].mean() + 1500.0) < 5.0
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    p = outs["prompt"][-100:, 0]
    assert np.abs(p.real).mean() > 4 * np.abs(p.imag).mean()
