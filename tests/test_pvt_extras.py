"""Atmosphere models, PVT KF, .mat dumps (reference analogues: rtklib
ionmodel/tropmodel, pvt_kf.cc, dump/matio tests)."""

import numpy as np

from gnss_sim_receiver_tpu.models.atmosphere import (klobuchar_delay,
                                                     saastamoinen_delay)
from gnss_sim_receiver_tpu.models.dumps import (dump_observables_mat,
                                                dump_tracking_mat, load_mat)
from gnss_sim_receiver_tpu.models.pvt import PvtSolution
from gnss_sim_receiver_tpu.models.pvt_kf import PvtKf


def test_saastamoinen_plausible():
    # zenith total delay at sea level ~2.3-2.7 m; grows ~1/sin(el)
    z = saastamoinen_delay(np.radians(40.0), 0.0, np.radians(90.0))
    assert 2.0 < z < 3.0
    low = saastamoinen_delay(np.radians(40.0), 0.0, np.radians(10.0))
    assert 10.0 < low < 20.0
    # decreases with altitude
    hi = saastamoinen_delay(np.radians(40.0), 3000.0, np.radians(90.0))
    assert hi < z


def test_klobuchar_plausible():
    # typical broadcast coefficients
    alpha = (1.1176e-8, 7.4506e-9, -5.9605e-8, -5.9605e-8)
    beta = (90112.0, 0.0, -196608.0, -65536.0)
    d_zen = klobuchar_delay(alpha, beta, np.radians(40.0),
                            np.radians(-75.0), np.radians(80.0),
                            np.radians(120.0), 50400.0)  # local afternoon
    assert 1.0 < d_zen < 30.0
    d_low = klobuchar_delay(alpha, beta, np.radians(40.0),
                            np.radians(-75.0), np.radians(10.0),
                            np.radians(120.0), 50400.0)
    assert d_low > d_zen  # obliquity increases slant delay
    d_night = klobuchar_delay(alpha, beta, np.radians(40.0),
                              np.radians(-75.0), np.radians(80.0),
                              np.radians(120.0), 10000.0)
    assert d_night < d_zen  # nighttime floor is smaller


def _sol(t, pos, vel):
    return PvtSolution(True, np.array(pos, float), 0.0,
                       np.array(vel, float), 0.0, t, 2, 2, 1, 1, 6,
                       np.zeros(6))


def test_pvt_kf_smooths_noise():
    rng = np.random.default_rng(0)
    kf = PvtKf()
    truth = np.array([1.2e6, -4.7e6, 4.0e6])
    raw_errs, kf_errs = [], []
    for i in range(100):
        noisy = truth + rng.normal(0, 1.0, 3)
        s = _sol(1000.0 + 0.02 * i, noisy, [0, 0, 0])
        raw_errs.append(np.linalg.norm(noisy - truth))
        kf.update(s)
        if i > 20:
            kf_errs.append(np.linalg.norm(s.rx_ecef_m - truth))
    assert np.mean(kf_errs) < 0.6 * np.mean(raw_errs)


def test_tracking_mat_dump_roundtrip(tmp_path):
    t, c = 50, 2
    outs = {
        "prompt": (np.random.randn(t, c) + 1j * np.random.randn(t, c)
                   ).astype(np.complex64),
        "early_mag": np.abs(np.random.randn(t, c)).astype(np.float32),
        "late_mag": np.abs(np.random.randn(t, c)).astype(np.float32),
        "sample_counter": np.arange(t * c).reshape(t, c),
        "acc_phase_cycles": np.random.randn(t, c),
        "carrier_doppler_hz": np.random.randn(t, c),
        "code_freq_cps": np.full((t, c), 1.023e6),
        "code_phase_samples": np.random.randn(t, c),
        "cn0_db_hz": np.full((t, c), 44.0),
    }
    dump_tracking_mat(tmp_path / "trk.mat", outs, channel=1)
    m = load_mat(tmp_path / "trk.mat")
    np.testing.assert_allclose(m["Prompt_I"].ravel(),
                               outs["prompt"][:, 1].real, rtol=1e-6)
    assert "CN0_SNV_dB_Hz" in m and "abs_E" in m


def test_observables_mat_dump(tmp_path):
    from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
    eps = [ObservationEpoch(
        rx_time_s=100.0 + 0.02 * i, tick_sample=i,
        valid=np.array([True, False]),
        pseudorange_m=np.array([2.1e7, 0.0]),
        interp_tow_ms=np.array([1e8, 0.0]),
        carrier_doppler_hz=np.array([100.0, 0.0]),
        carrier_phase_cycles=np.array([5.0, 0.0]),
        cn0_db_hz=np.array([45.0, 0.0])) for i in range(4)]
    dump_observables_mat(tmp_path / "obs.mat", eps, n_channels=2)
    m = load_mat(tmp_path / "obs.mat")
    assert m["Pseudorange_m"].shape == (2, 4)
    assert m["valid_pseudoranges"][0].all()
    assert not m["valid_pseudoranges"][1].any()


def test_raim_fde_excludes_faulty_satellite():
    """PVT.raim_fde (rtklib raim_fde role): a 150 m pseudorange fault on
    one satellite is detected by its residual and excluded; the fix
    returns to meter-level while the plain solver is dragged off."""
    import numpy as np

    from gnss_sim_receiver_tpu.models.pvt import (PvtConf, solve_pvt,
                                                  solve_pvt_raim)
    from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
    from gnss_sim_receiver_tpu.utils import geodesy
    from tests.test_ppp import T0, _epoch

    rng = np.random.default_rng(5)
    rx_true = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0),
                                  100.0)
    ephs_l = make_sky_constellation(40.0, -75.0, toe=T0 + 600)[:8]
    prns = [e.prn for e in ephs_l]
    ephs = {e.prn: e for e in ephs_l}
    amb = np.zeros(len(ephs_l))
    obs = _epoch(ephs_l, T0 + 900.0, rx_true, 1e-4, amb, rng,
                 code_sig=0.5)
    # inject a fault on channel 2
    obs.pseudorange_m[2] += 150.0
    conf = PvtConf(raim_fde=True, raim_threshold_m=30.0)
    plain = solve_pvt(obs, prns, ephs, PvtConf())
    raim = solve_pvt_raim(obs, prns, ephs, conf)
    assert plain.valid and raim.valid
    err_plain = np.linalg.norm(plain.rx_ecef_m - rx_true)
    err_raim = np.linalg.norm(raim.rx_ecef_m - rx_true)
    assert err_raim < 5.0, err_raim
    assert err_raim < 0.5 * err_plain
    assert raim.n_sats == plain.n_sats - 1


def test_antenna_attitude_masks_in_antenna_frame():
    """ReceiverAntennaAttitude.* (fork, rtklib_pvt.cc:92-94): tilting
    the boresight turns the elevation mask into an antenna-FOV mask —
    satellites outside the tilted FOV are excluded from the solve."""
    import numpy as np

    from gnss_sim_receiver_tpu.models.factory import pvt_conf_from_config
    from gnss_sim_receiver_tpu.models.pvt import PvtConf
    from gnss_sim_receiver_tpu.utils import geodesy
    from gnss_sim_receiver_tpu.utils.config import InMemoryConfiguration

    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    # default boresight == geographic elevation, bit for bit
    sat = rx * 1.2 + np.array([1e6, 2e6, 3e6])
    el_g, az_g = geodesy.elevation_azimuth(rx, sat)
    el_a, az_a = geodesy.antenna_elevation_azimuth(rx, sat, 0.0,
                                                   np.pi / 2.0)
    assert abs(el_a - el_g) < 1e-9 and abs(az_a - az_g % (2 * np.pi)) \
        < 1e-9
    # boresight tilted 90 deg toward north: a zenith satellite sits at
    # antenna elevation ~0; a northern horizon satellite near boresight
    up = rx / np.linalg.norm(rx)
    sat_zen = rx + up * 2e7
    el_tilt, _ = geodesy.antenna_elevation_azimuth(
        rx, sat_zen, 0.0, 0.0)         # boresight at horizon, az=north
    assert abs(np.degrees(el_tilt)) < 1.0

    c = InMemoryConfiguration({
        "ReceiverAntennaAttitude.fix": "true",
        "ReceiverAntennaAttitude.az_deg": "45",
        "ReceiverAntennaAttitude.el_deg": "30"})
    conf = pvt_conf_from_config(c)
    assert abs(conf.antenna_az_rad - np.radians(45.0)) < 1e-12
    assert abs(conf.antenna_el_rad - np.radians(30.0)) < 1e-12
    assert pvt_conf_from_config(
        InMemoryConfiguration({})).antenna_el_rad == np.pi / 2.0


def test_antenna_attitude_excludes_out_of_fov_sats():
    """solve_pvt with a tilted boresight drops satellites behind the
    antenna while the default keeps them."""
    import numpy as np

    from gnss_sim_receiver_tpu.models.pvt import PvtConf, solve_pvt
    from tests.test_ppp import T0, _epoch
    from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
    from gnss_sim_receiver_tpu.utils import geodesy

    rng = np.random.default_rng(5)
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    ephs = [e for e in make_sky_constellation(40.0, -75.0, toe=T0 + 600)
            if e.prn in (1, 3, 4, 5, 9, 10)]
    prns = [e.prn for e in ephs]
    eph_map = {e.prn: e for e in ephs}
    ep = _epoch(ephs, T0 + 10.0, rx, 1e-4, np.zeros(len(ephs)), rng)
    base = solve_pvt(ep, prns, eph_map, PvtConf())
    assert base.valid
    # tilt boresight to the horizon with a high elevation mask: only the
    # satellites inside the tilted FOV remain
    tilted = solve_pvt(ep, prns, eph_map, PvtConf(
        elevation_mask_deg=40.0, antenna_az_rad=0.0,
        antenna_el_rad=0.0))
    assert (not tilted.valid) or tilted.n_sats < base.n_sats


def test_pre_2009_week_rollover_key():
    from gnss_sim_receiver_tpu.models.factory import \
        receiver_conf_from_config
    from gnss_sim_receiver_tpu.nav.ephemeris import adj_gps_week
    from gnss_sim_receiver_tpu.utils.config import InMemoryConfiguration

    # 10-bit week 152 in 2026 -> 2200; pre-2009 capture -> 1176
    assert adj_gps_week(152, now_week=2380) == 2200
    assert adj_gps_week(152, pre_2009_file=True) == 152 + 1024
    assert adj_gps_week(2200) == 2200            # full weeks pass through
    assert adj_gps_week(900, now_week=1600) == 900 + 1024

    c = InMemoryConfiguration({"GNSS-SDR.pre_2009_file": "true"})
    assert receiver_conf_from_config(c).pre_2009_file is True
    assert receiver_conf_from_config(
        InMemoryConfiguration({})).pre_2009_file is False
