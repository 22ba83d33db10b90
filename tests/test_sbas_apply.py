"""SBAS corrections APPLIED in PVT (round-2 verdict task #8).

Codec roundtrips for MT1/2/25/18/26/12, the SbasCorrections aggregation,
and the payoff: a degraded scenario (per-satellite range biases + an
iono-like delay) where solve_pvt with SBAS corrections measurably beats
the uncorrected solve (rtklib_sbas.cc sbssatcorr/sbsioncorr roles).
Also MT9 GEO ranging through the SbasGeoEphemeris adapter."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
from gnss_sim_receiver_tpu.models.pvt import solve_pvt
from gnss_sim_receiver_tpu.nav import sbas
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
from gnss_sim_receiver_tpu.utils import geodesy

C = constants.SPEED_OF_LIGHT_M_S
T0 = 345600.0


def _ev(mt, payload):
    return sbas.SbasMessageEvent(msg_type=mt, payload=payload,
                                 start_symbol=0, preamble_idx=0,
                                 crc_ok=True)


def test_correction_codecs_roundtrip():
    prns = [1, 3, 4, 5, 9, 10]
    got, iodp = sbas.parse_mt1(sbas.pack_mt1(prns, iodp=2))
    assert got == prns and iodp == 2

    prc = [1.25, -3.5, 0.0, 7.875] + [0.0] * 9
    back, _, _ = sbas.parse_mt2(sbas.pack_mt2(prc))
    np.testing.assert_allclose(back, prc)

    lts = [sbas.SbasLongTerm(slot=2, iode=17, dpos_m=(1.5, -2.0, 0.625),
                             daf0_s=3e-8),
           sbas.SbasLongTerm(slot=5, iode=3, dpos_m=(-4.0, 0.125, 2.0),
                             daf0_s=-1e-8)]
    back = sbas.parse_mt25(sbas.pack_mt25(lts))
    assert [b.slot for b in back] == [2, 5]
    np.testing.assert_allclose(back[0].dpos_m, lts[0].dpos_m)
    assert abs(back[1].daf0_s - lts[1].daf0_s) < 2 ** -31

    band, idx, _ = sbas.parse_mt18(sbas.pack_mt18(2, [0, 5, 44, 170]))
    assert band == 2 and idx == [0, 5, 44, 170]

    b2, blk, delays = sbas.parse_mt26(sbas.pack_mt26(2, 1, [2.5] * 15))
    assert b2 == 2 and blk == 1
    np.testing.assert_allclose(delays, [2.5] * 15)

    tow, wk = sbas.parse_mt12(sbas.pack_mt12(345678.0, week=2200))
    assert tow == 345678.0 and wk == 2200 % 1024 or wk == 2200
    assert tow == 345678.0


def _epoch(ephs, rx, dtr_s, rng, bias=None, iono_m=None):
    n = len(ephs)
    pr = np.zeros(n)
    tow = np.zeros(n)
    om = constants.GPS_OMEGA_EARTH_DOT
    t = T0 + 60.0
    for k, e in enumerate(ephs):
        tau = 0.07
        for _ in range(4):
            pos, clk = e.sat_pos_clock(t - tau)
            ang = om * tau
            rot = np.array([[np.cos(ang), np.sin(ang), 0],
                            [-np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
            p = rot @ pos
            r = np.linalg.norm(p - rx)
            tau = r / C
        pr[k] = r + C * (dtr_s - clk) + rng.standard_normal() * 0.3
        if bias is not None:
            pr[k] += bias[k]
        if iono_m is not None:
            pr[k] += iono_m[k]
        tow[k] = (t - tau + clk) * 1000.0
    return ObservationEpoch(
        rx_time_s=t + dtr_s, tick_sample=0, valid=np.ones(n, bool),
        pseudorange_m=pr, interp_tow_ms=tow,
        carrier_doppler_hz=np.zeros(n), carrier_phase_cycles=np.zeros(n),
        cn0_db_hz=np.full(n, 45.0))


def test_sbas_corrections_improve_degraded_scenario():
    rng = np.random.default_rng(3)
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    all_ephs = make_sky_constellation(40.0, -75.0, toe=T0 + 600)
    ephs = [e for e in all_ephs if e.prn in (1, 3, 4, 5, 9, 10)]
    prns = [e.prn for e in ephs]
    eph_map = {e.prn: e for e in ephs}

    # degradation: meter-level per-satellite range biases (clock/ephemeris
    # error) + an iono delay following the thin-shell obliquity model the
    # corrections use (vertical delay x slant factor at 350 km)
    bias = np.array([3.0, -4.5, 2.25, -1.75, 5.0, -2.5])
    vert_true = 4.0 / 1.35
    re, hi = 6378136.3, 350e3
    iono = np.zeros(len(ephs))
    for k, e in enumerate(ephs):
        pos, _ = e.sat_pos_clock(T0 + 60.0)
        el, _ = geodesy.elevation_azimuth(rx, pos)
        iono[k] = vert_true / np.sqrt(
            1.0 - (re * np.cos(el) / (re + hi)) ** 2)

    # the SBAS broadcast correcting them: fast PRC = -bias; iono grid
    # holds ~vertical 4 m / obliquity over the receiver's region
    corr = sbas.SbasCorrections()
    corr.push(_ev(1, sbas.pack_mt1(prns)))
    prc = [0.0] * 13
    for i in range(len(prns)):
        prc[i] = -bias[i]
    corr.push(_ev(2, sbas.pack_mt2(prc)))
    # IGP grid: cover the receiver's region with the flat vertical delay
    vert = vert_true
    for band in (2, 3):
        n_igp = sbas.IGP_LONS_PER_BAND * len(sbas.IGP_LATS)
        corr.push(_ev(18, sbas.pack_mt18(band, list(range(n_igp)))))
        for blk in range(0, (n_igp + 14) // 15):
            corr.push(_ev(26, sbas.pack_mt26(band, blk, [vert] * 15)))

    ep = _epoch(ephs, rx, 1e-4, rng, bias=bias, iono_m=iono)
    sol_raw = solve_pvt(ep, prns, eph_map)
    sol_cor = solve_pvt(ep, prns, eph_map, sbas_corrections=corr)
    assert sol_raw.valid and sol_cor.valid
    err_raw = np.linalg.norm(sol_raw.rx_ecef_m - rx)
    err_cor = np.linalg.norm(sol_cor.rx_ecef_m - rx)
    assert err_cor < 0.5 * err_raw, (err_raw, err_cor)
    assert err_cor < 3.0, err_cor


def test_mt25_long_term_applied():
    """Long-term dpos/daf0 shift the satellite state used by PVT."""
    rng = np.random.default_rng(5)
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    all_ephs = make_sky_constellation(40.0, -75.0, toe=T0 + 600)
    ephs = [e for e in all_ephs if e.prn in (1, 3, 4, 5, 9, 10)]
    prns = [e.prn for e in ephs]
    eph_map = {e.prn: e for e in ephs}
    ep = _epoch(ephs, rx, 1e-4, rng)
    corr = sbas.SbasCorrections()
    corr.push(_ev(1, sbas.pack_mt1(prns)))
    # a bogus 30 m clock shift on PRN 1 must visibly move the solution
    corr.push(_ev(25, sbas.pack_mt25(
        [sbas.SbasLongTerm(slot=1, dpos_m=(0, 0, 0), daf0_s=1e-7)])))
    sol0 = solve_pvt(ep, prns, eph_map)
    sol1 = solve_pvt(ep, prns, eph_map, sbas_corrections=corr)
    d = np.linalg.norm(sol0.rx_ecef_m - sol1.rx_ecef_m)
    assert d > 1.0, d


def test_geo_ephemeris_ranges():
    """MT9 GEO navigation ranges through the standard PVT interface."""
    nav = sbas.SbasGeoNav(t0_s=T0, pos_m=(26e6, -2e6, 1e5),
                          vel_ms=(1.0, 2.0, -0.5),
                          acc_ms2=(1e-4, -1e-4, 0.0),
                          agf0_s=2e-8, agf1_ss=1e-12)
    eph = sbas.SbasGeoEphemeris(135, nav)
    t = T0 + 120.0
    pos, clk = eph.sat_pos_clock(t)
    np.testing.assert_allclose(pos, sbas.geo_nav_pos(nav, t))
    assert abs(clk - (2e-8 + 1e-12 * 120.0)) < 1e-15
    v = eph.sat_vel(t)
    np.testing.assert_allclose(v, [1.0 + 1e-4 * 120, 2.0 - 1e-4 * 120,
                                   -0.5], rtol=1e-5, atol=1e-4)
    assert eph.system == "SBAS" and eph.tgd == 0.0
