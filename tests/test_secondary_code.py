"""Secondary-code sync + wipeoff (pilot channel tracking; reference
acquire_secondary, dll_pll_veml_tracking.cc:925-969).

Scenario: an L5Q-like pilot at 2 Msps-scale parameters — a 1023-chip code
with the GPS L5 NH20 secondary as the only symbol modulation — so the
wipeoff must sync to the 20-epoch NH pattern before coherent extension."""

import numpy as np

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0
NH20 = constants.GPS_L5Q_NH_CODE   # 20-bit {0,1}


def _pilot_scenario(cn0=42.0, dur=3.2, doppler=900.0, delay=250.0):
    nh_pm1 = (2 * np.array(NH20, np.int8) - 1)
    sym = np.tile(nh_pm1, 200).astype(np.int8)   # pure NH, no data (pilot)
    # pilot symbol = ONE code period (1 ms), unlike GPS 1C's 20: register a
    # pilot variant in the simulator's signal hook
    import gnss_sim_receiver_tpu.sim.signal_generator as sg
    from gnss_sim_receiver_tpu.ops import prn_codes
    orig = sg._sig_params

    def patched(sat):
        if sat.signal == "1Cp":
            code = prn_codes.gps_l1_ca_code(sat.prn).astype(np.int8)
            return code, 1.023e6, 1023
        return orig(sat)
    sg._sig_params = patched
    try:
        sat = SatelliteSignalParams(prn=9, signal="1Cp", cn0_db_hz=cn0,
                                    doppler_hz=doppler, delay_chips=delay,
                                    nav_bits=sym)
        x = generate_baseband([sat], FS, int(FS * dur), noise=True, seed=21)
    finally:
        sg._sig_params = orig
    return x


def _track(x, secondary, ext=1, n=3000):
    # pilot symbols flip every epoch -> FLL pairs corrupted (as for E1/L5):
    # PLL-only pull-in with a wide enough bandwidth
    conf = TrackingConf(fs=FS, secondary_code=secondary,
                        extend_correlation_symbols=ext,
                        enable_fll_pullin=False, pll_bw_hz=20.0,
                        fll_pullin_epochs=300,
                        pll_bw_narrow_hz=8.0)
    trk = TrackingEngine(conf, prns=[9])
    # fine Doppler seed (the two-step acquisition's role; every-epoch
    # symbol flips rule out FLL pull-in for pilots at low C/N0)
    trk.start_tracking(0, 900.0 + 10.0, int(round(250.0 * FS / 1.023e6)))
    outs = trk.process(x, 0, n)
    return outs, trk


def test_secondary_sync_and_wipeoff():
    x = _pilot_scenario()
    outs, trk = _track(x, tuple(NH20))
    st = trk.state
    assert bool(np.asarray(st.sec_synced)[0])
    assert not bool(np.asarray(st.lock_lost)[0])
    # delay 250 chips < 1 code period: epoch e holds NH chip e % 20, so
    # sec[(e+off)%20] == nh[e%20] -> off == 0
    assert int(np.asarray(st.sec_off)[0]) == 0
    # after sync+wipeoff the *wiped* prompt has constant sign: the raw
    # prompt signs must exactly follow the NH pattern
    p = outs["prompt"][-400:, 0].real
    nh_pm1 = 2 * np.array(NH20) - 1
    pattern = np.tile(nh_pm1, 20)
    signs = np.sign(p)
    agreement = (signs == pattern[: len(signs)]).mean()
    assert agreement > 0.99 or agreement < 0.01  # up to global polarity


def test_secondary_enables_extended_integration():
    x = _pilot_scenario(cn0=36.0)
    outs1, trk1 = _track(x, tuple(NH20), ext=1)
    outs20, trk20 = _track(x, tuple(NH20), ext=20)
    assert bool(np.asarray(trk20.state.sec_synced)[0])
    assert not bool(np.asarray(trk20.state.lock_lost)[0])
    d1 = outs1["carrier_doppler_hz"][-600:, 0]
    d20 = outs20["carrier_doppler_hz"][-600:, 0]
    assert abs(d20.mean() - 900.0) < 3.0
    # 20 ms coherent closure on the wiped pilot cuts Doppler jitter
    assert d20.std() < 0.6 * d1.std(), (d1.std(), d20.std())
