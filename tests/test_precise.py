"""Precise products (SP3/clock-RINEX/IONEX/tides, nav.precise) and their
use in the PPP engine.

Role parity targets: rtklib_preceph.cc readsp3/peph2pos (SP3 parse +
polynomial interpolation), readrnxc (clock RINEX), rtklib_ionex.cc
iontec (IONEX TEC interpolation), rtklib_tides.cc tidedisp (solid-earth
tides).  The headline test is the VERDICT r4 #6 'done' criterion: PPP
with simulated precise products beats broadcast-ephemeris PPP measurably
and emits no warnings."""

import dataclasses
import warnings

import numpy as np

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.nav import precise
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
from gnss_sim_receiver_tpu.utils import geodesy

C = constants.SPEED_OF_LIGHT_M_S
T0 = 345600.0
WEEK = 2200


def _sample_sp3_text(tmp_path, ephs, t0, nt=13, step=900.0,
                     clk_override=None):
    tow = t0 + np.arange(nt) * step
    tab = {}
    for e in ephs:
        pos = np.stack([e.sat_pos_clock(t)[0] for t in tow])
        clk = np.array([e.sat_pos_clock(t)[1] for t in tow])
        if clk_override is not None:
            clk = np.full(nt, clk_override)
        tab[e.prn] = (pos, clk)
    path = tmp_path / "orbit.sp3"
    precise.write_sp3(path, WEEK, tow, tab)
    return path.read_text()


def test_sp3_roundtrip_interpolation(tmp_path):
    """Write SP3 sampled at 900 s from a Kepler ephemeris; the order-10
    polynomial interpolation must reproduce the orbit to sub-mm and the
    linear clock to sub-ns at off-grid epochs."""
    ephs = make_sky_constellation(40.0, -75.0, toe=T0 + 3600)[:4]
    text = _sample_sp3_text(tmp_path, ephs, T0)
    sats = precise.Sp3Ephemeris(text).satellites()
    assert set(sats) == {e.prn for e in ephs}
    for e in ephs:
        for t in (T0 + 1234.5, T0 + 4321.0, T0 + 8000.25):
            p_ref, c_ref = e.sat_pos_clock(t)
            p, c = sats[e.prn].sat_pos_clock(t)
            # SP3 stores 1e-6 km = 1 mm per coordinate; allow a few
            # quanta on top of the (smaller) interpolation error
            assert np.linalg.norm(p - p_ref) < 5e-3, (e.prn, t)
            assert abs(c - c_ref) < 1e-9


def test_clock_rinex_overrides_sp3_clock(tmp_path):
    ephs = make_sky_constellation(40.0, -75.0, toe=T0 + 3600)[:1]
    text = _sample_sp3_text(tmp_path, ephs, T0, clk_override=np.nan)
    clk = {ephs[0].prn: (np.array([T0, T0 + 7200.0]),
                         np.array([2e-6, 2.2e-6]))}
    sats = precise.Sp3Ephemeris(text).satellites(clock_rinex=clk)
    _, c = sats[ephs[0].prn].sat_pos_clock(T0 + 3600.0)
    assert abs(c - 2.1e-6) < 1e-9


def test_clock_rinex_parser():
    text = ("AS G05  2024  1  7  0  0  0.000000  2"
            "    1.234567890000E-04 0.0\n"
            "AS E11  2024  1  7  0  0 30.000000  2"
            "   -5.000000000000E-05 0.0\n")
    out = precise.read_clock_rinex(text)
    assert 5 in out and ("Galileo", 11) in out
    assert abs(out[5][1][0] - 1.23456789e-4) < 1e-12
    # 2024-01-07 is a Sunday -> TOW 0; second record at TOW 30
    assert abs(out[("Galileo", 11)][0][0] - 30.0) < 1e-6


def _ionex_text():
    """Two VTEC maps (10 and 20 TECU uniform) one hour apart."""
    def block(tow_h, val):
        rows = []
        rows.append("  2000     1     1    %2d     0     0"
                    "                        EPOCH OF CURRENT MAP"
                    % tow_h)
        for lat in (60.0, 30.0, 0.0):
            rows.append("  %6.1f-120.0 120.0  60.0 450.0"
                        "                            LAT/LON1/LON2/DLON/H"
                        % lat)
            rows.append("".join("%5d" % val for _ in range(5))
                        + " " * 35)
        rows.append("                                       "
                    "                     END OF TEC MAP")
        return rows
    hdr = [
        "     1.0            IONOSPHERE MAPS     GPS                 "
        "IONEX VERSION / TYPE",
        "   450.0 450.0   0.0                                        "
        "HGT1 / HGT2 / DHGT",
        "    60.0   0.0 -30.0                                        "
        "LAT1 / LAT2 / DLAT",
        "  -120.0 120.0  60.0                                        "
        "LON1 / LON2 / DLON",
        "    -1                                                      "
        "EXPONENT",
        "                                                            "
        "END OF HEADER"]
    return "\n".join(hdr + block(0, 100) + block(1, 200))


def test_ionex_interpolation_and_slant():
    grid = precise.IonexTecGrid(_ionex_text())
    # uniform 10 TECU at epoch 0, 20 at epoch 1 (exponent -1)
    tow0 = grid.epoch_tow[0]
    assert abs(grid.vtec(tow0, 30.0, 0.0) - 10.0) < 1e-6
    mid = 0.5 * (grid.epoch_tow[0] + grid.epoch_tow[1])
    assert abs(grid.vtec(mid, 45.0, -60.0) - 15.0) < 1e-6
    # zenith delay at L1 for 10 TECU = 40.3e16*10e16? -> 1.62 m
    d_zen = grid.slant_delay_m(tow0, 30.0, 0.0, np.pi / 2,
                               constants.GPS_L1_FREQ_HZ)
    assert abs(d_zen - 40.30e16 * 10.0 / constants.GPS_L1_FREQ_HZ ** 2) \
        < 1e-3
    # slant at 15 deg elevation is amplified by the single-layer factor
    d_slant = grid.slant_delay_m(tow0, 30.0, 0.0, np.radians(15.0),
                                 constants.GPS_L1_FREQ_HZ)
    assert 2.0 < d_slant / d_zen < 3.5


def test_sun_moon_and_tide_magnitude():
    sun, moon = precise.sun_moon_ecef(WEEK, T0)
    assert abs(np.linalg.norm(sun) - 1.496e11) < 0.05e11
    assert abs(np.linalg.norm(moon) - 3.84e8) < 0.4e8
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    disp = precise.solid_earth_tide(WEEK, T0, rx)
    # degree-2 solid tide is decimeters, dominated by the radial term
    assert 0.01 < np.linalg.norm(disp) < 0.6, disp
    # varies over 6 hours (lunar/solar geometry moves)
    disp2 = precise.solid_earth_tide(WEEK, T0 + 6 * 3600.0, rx)
    assert np.linalg.norm(disp - disp2) > 1e-3


def test_ppp_precise_products_beat_broadcast(tmp_path):
    """VERDICT r4 #6 done-criterion: simulate truth orbits/clocks, give
    'broadcast' PPP ephemerides with meter-level clock errors and the
    precise run an SP3 written from truth; precise PPP must land well
    below broadcast PPP.  The whole test runs with warnings-as-errors to
    prove the r4 negative-covariance sqrt warning is gone."""
    from gnss_sim_receiver_tpu.models.ppp import PppConf, PppEngine
    from tests.test_ppp import _epoch

    rng = np.random.default_rng(17)
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    truth = [e for e in make_sky_constellation(40.0, -75.0, toe=T0 + 600)
             if e.prn in (1, 3, 4, 5, 9, 10)]
    prns = [e.prn for e in truth]
    # broadcast = truth + clock bias (1.5-4 m) + af1 drift
    bcast = {e.prn: dataclasses.replace(
        e, af0=e.af0 + rng.uniform(1.5, 4.0) / C * rng.choice([-1, 1]),
        af1=e.af1 + rng.uniform(-1e-11, 1e-11)) for e in truth}
    text = _sample_sp3_text(tmp_path, truth, T0, nt=13, step=900.0)
    sats = precise.Sp3Ephemeris(text).satellites()
    amb = rng.integers(-50, 50, len(truth)).astype(float)

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        eng_b = PppEngine(PppConf(mode="static"))
        eng_p = PppEngine(PppConf(mode="static"))
        for i in range(120):
            t = T0 + 10.0 + i * 1.0
            ep = _epoch(truth, t, rx, 1e-4, amb, rng)
            sol_b = eng_b.update(ep, prns, bcast, x0=rx + 30.0)
            sol_p = eng_p.update(ep, prns, sats, x0=rx + 30.0,
                                 week=WEEK)
    err_b = np.linalg.norm(sol_b.rx_ecef_m - rx)
    err_p = np.linalg.norm(sol_p.rx_ecef_m - rx)
    assert err_p < 0.5, err_p
    assert err_b > 2.0 * err_p, (err_b, err_p)


def test_ppp_ionex_corrects_single_frequency():
    """Single-frequency PPP with an IONEX grid removes a simulated
    uniform-VTEC ionosphere (rtklib_ionex iontec role in ppp_res)."""
    from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
    from gnss_sim_receiver_tpu.models.ppp import PppConf, PppEngine

    grid = precise.IonexTecGrid(_ionex_text())
    tow0 = float(grid.epoch_tow[0])
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    ephs = {e.prn: e
            for e in make_sky_constellation(40.0, -75.0, toe=tow0 + 600)
            if e.prn in (1, 3, 4, 5, 9, 10)}
    prns = sorted(ephs)
    lam = C / constants.GPS_L1_FREQ_HZ
    rng = np.random.default_rng(23)
    amb = rng.integers(-50, 50, len(prns)).astype(float)
    om = constants.GPS_OMEGA_EARTH_DOT

    def epoch(t, with_iono):
        n = len(prns)
        pr, ph, tow = np.zeros(n), np.zeros(n), np.zeros(n)
        for k, prn in enumerate(prns):
            e = ephs[prn]
            tau = 0.07
            for _ in range(4):
                pos, clk = e.sat_pos_clock(t - tau)
                ang = om * tau
                rot = np.array([[np.cos(ang), np.sin(ang), 0],
                                [-np.sin(ang), np.cos(ang), 0],
                                [0, 0, 1]])
                p = rot @ pos
                r = np.linalg.norm(p - rx)
                tau = r / C
            el, az = geodesy.elevation_azimuth(rx, p)
            # simulate the iono the grid describes: 10 TECU single layer
            lat0, lon0, _ = geodesy.ecef_to_llh(rx)
            re_h = 6378137.0 / (6378137.0 + grid.h_km * 1e3)
            psi = np.pi / 2 - el - np.arcsin(re_h * np.cos(el))
            lat_i = np.arcsin(np.sin(lat0) * np.cos(psi)
                              + np.cos(lat0) * np.sin(psi) * np.cos(az))
            lon_i = lon0 + np.arcsin(np.sin(psi) * np.sin(az)
                                     / max(np.cos(lat_i), 1e-6))
            di = grid.slant_delay_m(t, np.degrees(lat_i),
                                    np.degrees(lon_i), el,
                                    constants.GPS_L1_FREQ_HZ)
            iono = di if with_iono else 0.0
            pr[k] = r - C * clk + iono + rng.normal(0, 0.5)
            ph[k] = (-(r - C * clk - iono) / lam + amb[k]
                     + rng.normal(0, 0.003) / lam)
            tow[k] = (t - tau + clk) * 1000.0
        return ObservationEpoch(
            rx_time_s=t, tick_sample=0, valid=np.ones(n, bool),
            pseudorange_m=pr, interp_tow_ms=tow,
            carrier_doppler_hz=np.zeros(n), carrier_phase_cycles=ph,
            cn0_db_hz=np.full(n, 45.0))

    eng_plain = PppEngine(PppConf(mode="static"))
    eng_ionex = PppEngine(PppConf(mode="static"))
    for i in range(90):
        t = tow0 + 10.0 + i
        ep = epoch(t, with_iono=True)
        sol_plain = eng_plain.update(ep, prns, ephs, x0=rx + 30.0)
        sol_ionex = eng_ionex.update(ep, prns, ephs, x0=rx + 30.0,
                                     ionex=grid)
    e_plain = np.linalg.norm(sol_plain.rx_ecef_m - rx)
    e_ionex = np.linalg.norm(sol_ionex.rx_ecef_m - rx)
    assert e_ionex < 0.7, e_ionex
    assert e_plain > 1.5 * e_ionex, (e_plain, e_ionex)
