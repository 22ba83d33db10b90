"""Kalman-filter tracking mode (reference analogue: kf_tracking tests)."""

import numpy as np

from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0
CODE_RATE = 1.023e6


def _run(mode, sat, x, n=1100):
    trk = TrackingEngine(TrackingConf(fs=FS, tracking_mode=mode), prns=[7])
    trk.start_tracking(0, sat.doppler_hz + 80.0,
                       int(round(sat.delay_chips * FS / CODE_RATE)))
    outs = trk.process(x, 0, n)
    return outs, trk


def test_kf_tracks_doppler_ramp_with_less_jitter():
    bits = np.ones(1500, np.int8)
    sat = SatelliteSignalParams(prn=7, cn0_db_hz=45.0, doppler_hz=1250.0,
                                doppler_rate_hz_s=5.0, delay_chips=300.5,
                                nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * 1.2), noise=True, seed=1)
    outs_pll, trk_pll = _run("dll_pll", sat, x)
    outs_kf, trk_kf = _run("kf", sat, x)
    for outs, trk in ((outs_pll, trk_pll), (outs_kf, trk_kf)):
        assert not bool(np.asarray(trk.state.lock_lost)[0])
        # both track the ramp: ~1255.5 Hz at the end
        assert abs(outs["carrier_doppler_hz"][-50:, 0].mean() - 1255.5) < 4.0
    # the KF should be at least as quiet as the scalar loops
    std_pll = outs_pll["carrier_doppler_hz"][-200:, 0].std()
    std_kf = outs_kf["carrier_doppler_hz"][-200:, 0].std()
    assert std_kf < std_pll
    # KF estimates the Doppler rate
    fdot = float(np.asarray(trk_kf.state.kf_fdot)[0])
    assert 0.0 < fdot < 15.0, fdot  # right sign/magnitude; converges slowly


def test_kf_code_tracking_unbiased():
    bits = np.ones(1500, np.int8)
    sat = SatelliteSignalParams(prn=7, cn0_db_hz=48.0, doppler_hz=-2000.0,
                                delay_chips=100.25, nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * 1.1), noise=True, seed=3,
                          bandlimit_oversample=4)
    outs, trk = _run("kf", sat, x, n=1000)
    s = outs["pos_start"][-300:, 0].astype(np.float64)
    rem = outs["rem_code_phase_chips"][-300:, 0].astype(np.float64)
    tau = (s / FS) * (1 - 2000.0 / 1575.42e6) - 100.25 / CODE_RATE
    truth = (tau * CODE_RATE) % 1023
    truth = np.where(truth > 511, truth - 1023, truth)
    err = rem - truth
    assert abs(err.mean()) < 0.02, err.mean()


def test_gaussian_adaptive_tracking():
    """tracking_mode="gaussian": the KF tracker with Bayesian adaptive
    measurement noise (reference gps_l1_ca_gaussian_tracking_cc +
    bayesian_estimation.cc).  The adapted R must land near the actual
    discriminator noise variance and tracking must converge like the
    fixed-R KF."""
    import numpy as np

    from gnss_sim_receiver_tpu.models.tracking import (TrackingConf,
                                                       TrackingEngine)
    from gnss_sim_receiver_tpu.sim import (SatelliteSignalParams,
                                           generate_baseband)

    FS = 2_000_000.0
    bits = (np.random.default_rng(4).integers(0, 2, 200) * 2 - 1
            ).astype(np.int8)
    sat = SatelliteSignalParams(prn=9, cn0_db_hz=45.0, doppler_hz=900.0,
                                delay_chips=150.0, nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * 2.2), noise=True, seed=6)
    trk = TrackingEngine(TrackingConf(fs=FS, tracking_mode="gaussian"),
                         prns=[9])
    code_start = int(round(150.0 * FS / 1.023e6))
    trk.start_tracking(0, 900.0 + 80.0, code_start)
    outs = trk.process(x, 0, 2000)
    dop = outs["carrier_doppler_hz"][-300:, 0]
    assert abs(dop.mean() - 900.0) < 5.0
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    # the posterior noise estimate matches the measured discriminator
    # variance within a factor of ~3 (it adapted away from the prior)
    st = trk.state
    nu = float(np.asarray(st.bayes_nu)[0])
    r_code = float(np.asarray(st.bayes_psi_code)[0]) / max(nu - 2.0, 1.0)
    # empirical code-discriminator variance at 45 dB-Hz / 1 ms is
    # ~1e-3..1e-2 chips^2; the prior was 2e-3
    assert 1e-4 < r_code < 5e-2, r_code
    assert nu > 50.0   # forgetting-factor steady state, not the prior
