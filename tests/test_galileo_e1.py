"""Galileo E1B BOC(1,1) pipeline: simulation, PCPS acquisition (4 ms
coherent), DLL/PLL tracking on the sub-chip table (reference analogues:
galileo_e1_pcps_ambiguous_acquisition_test.cc,
galileo_e1_dll_pll_veml_tracking_test.cc).

Uses the real ICD memory-code tables (signals.galileo_e1_code, shipped in
data/galileo_codes.npz) shared by simulator and receiver.
"""

import numpy as np

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 4_500_000.0  # deliberately NOT commensurate with the 2.046 Msubchip/s rate
# (an integer samples-per-subchip grid makes the floor-sampled E/L taps
# degenerate; the reference recommends non-multiple fs for the same reason,
# GPS_L1_CA.h OPT_ACQ_FS comment)
SIG = signals.GALILEO_E1B


def _code_provider(prn):
    return signals.subchip_table(SIG, prn)


def _e1_scenario(prn=11, doppler=1800.0, delay_chips=1234.5, cn0=48.0,
                 dur=1.3, seed=7):
    rng = np.random.default_rng(seed)
    bits = (rng.integers(0, 2, 3000) * 2 - 1).astype(np.int8)
    sat = SatelliteSignalParams(prn=prn, system="Galileo", signal="1B",
                                cn0_db_hz=cn0, doppler_hz=doppler,
                                delay_chips=delay_chips, nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * dur), noise=True, seed=seed)
    return sat, x


def _acq_engine(prns):
    return PcpsAcquisitionEngine(
        AcqConf(fs_in=FS, sampled_ms=4, doppler_max=5000.0,
                doppler_step=125.0, max_dwells=2,
                make_two_steps=True, doppler_step2=31.25),
        prns=prns, code_provider=_code_provider, sc_rate=SIG.sc_rate)


def test_e1b_subchip_table():
    t = signals.subchip_table(SIG, 1)
    assert t.shape == (8184,)
    # BOC(1,1): second half-chip is the negation of the first
    np.testing.assert_array_equal(t[1::2], -t[0::2])


def test_e1b_acquisition():
    sat, x = _e1_scenario()
    eng = _acq_engine([11, 20])
    res = eng.acquire(x)
    assert bool(res.detected[0])
    assert not bool(res.detected[1])
    assert abs(res.doppler_hz[0] - 1800.0) <= 125.0
    exp_delay = 1234.5 / SIG.chip_rate_cps * FS
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, eng.fft_size - err) <= 2.0, (res.delay_samples[0],
                                                 exp_delay)


def test_e1b_tracking_converges():
    sat, x = _e1_scenario()
    eng = _acq_engine([11])
    res = eng.acquire(x)
    conf = TrackingConf(
        fs=FS, code_rate_cps=SIG.sc_rate, code_length_chips=SIG.sc_length,
        carrier_freq_hz=SIG.carrier_freq_hz,
        early_late_space_chips=0.5,     # sub-chips = 0.25 E1 chips
        enable_fll_pullin=False,        # 4 ms symbols corrupt the FLL pairs
        fll_pullin_epochs=100,          # transitory window for lock mgmt
        cn0_window_epochs=20)
    trk = TrackingEngine(conf, prns=[11], code_provider=_code_provider)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    outs = trk.process(x, 0, 280)       # 1.12 s of 4 ms epochs
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-60:].mean() - 1800.0) < 6.0
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    p = outs["prompt"][-60:, 0]
    assert np.abs(p.real).mean() > 4 * np.abs(p.imag).mean()
    # C/N0 estimate within a few dB (4 ms coherent integration)
    assert abs(outs["cn0_db_hz"][-1, 0] - 48.0) < 5.0
    # nav symbols at 250 sps recoverable from prompt signs
    signs = np.sign(p.real)
    assert (np.abs(signs.sum()) < 60)   # random symbols -> mixed signs


def test_e1b_veml_tracking():
    """5-tap VEML tracking on the BOC signal (the reference core's
    namesake: very-early/very-late taps + vemlp discriminator)."""
    sat, x = _e1_scenario()
    eng = _acq_engine([11])
    res = eng.acquire(x)
    conf = TrackingConf(
        fs=FS, code_rate_cps=SIG.sc_rate, code_length_chips=SIG.sc_length,
        carrier_freq_hz=SIG.carrier_freq_hz,
        early_late_space_chips=0.5,          # sub-chips
        very_early_late_space_chips=1.2,     # ~0.6 E1 chips (reference VE)
        enable_fll_pullin=False,
        fll_pullin_epochs=100)
    trk = TrackingEngine(conf, prns=[11], code_provider=_code_provider)
    assert trk.taps.shape == (5,)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    outs = trk.process(x, 0, 280)
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-60:].mean() - 1800.0) < 6.0
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    p = outs["prompt"][-60:, 0]
    assert np.abs(p.real).mean() > 4 * np.abs(p.imag).mean()
