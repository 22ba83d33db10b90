"""LNAV subframe 4/5 assistance: almanac + iono/UTC pages.

Round-2 verdict task #5's AGNSS decode gap (gps_navigation_message.cc
almanac/iono/UTC, :494+): page codecs roundtrip through the parity/
encode/decode chain, the telemetry decoder collects them, the almanac
propagates to km-level satellite positions, and the assistance set
persists/reloads (the reference's XML assistance dumps)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu.nav import lnav
from gnss_sim_receiver_tpu.nav.ephemeris import (almanac_to_ephemeris,
                                                 load_assistance,
                                                 make_sky_constellation,
                                                 save_assistance)

T0 = 345600.0


def _almanac_fields(eph):
    """Almanac page content: toa is quantized to its 2^12 s LSB, so the
    mean anomaly must be restated AT the quantized toa (IS-GPS-200: the
    almanac's M0 is referenced to its own toa)."""
    toa_q = round(eph.toe / 4096.0) * 4096.0
    mu = 3.986005e14
    n_sc = (np.sqrt(mu) / eph.sqrt_a ** 3) / np.pi   # semicircles/s
    m0_at_toa = eph.m0_sc + n_sc * (toa_q - eph.toe)
    m0_at_toa = (m0_at_toa + 1.0) % 2.0 - 1.0
    return dict(ecc=eph.ecc, toa=toa_q, delta_i=eph.i0_sc - 0.3,
                omega_dot=eph.omega_dot_sc, health=0,
                sqrt_a=eph.sqrt_a, omega0=eph.omega0_sc,
                omega=eph.omega_sc, m0=m0_at_toa,
                af0=eph.af0, af1=eph.af1)


IONO = dict(alpha0=1.1176e-08, alpha1=-7.45e-09, alpha2=-5.96e-08,
            alpha3=1.192e-07, beta0=116736.0, beta1=-114688.0,
            beta2=-131072.0, beta3=-196608.0, a0=4.65e-09, a1=1.33e-14,
            tot=147456.0, wn_t=61, delta_t_ls=18, wn_lsf=137, dn=7,
            delta_t_lsf=18)


def test_page45_codec_roundtrip():
    eph = make_sky_constellation(40.0, -75.0, toe=T0 + 600)[2]
    fields = _almanac_fields(eph)
    words = lnav.pack_page45(5, T0 + 12.0, eph.prn, fields)
    sv, back = lnav.unpack_page45(words)
    assert sv == eph.prn
    for k, v in fields.items():
        scale = {"ecc": 2 ** -21, "toa": 2 ** 12, "delta_i": 2 ** -19,
                 "omega_dot": 2 ** -38, "sqrt_a": 2 ** -11,
                 "omega0": 2 ** -23, "omega": 2 ** -23, "m0": 2 ** -23,
                 "af0": 2 ** -20, "af1": 2 ** -38}.get(k, 1.0)
        assert abs(back[k] - v) <= scale, (k, back[k], v)

    words = lnav.pack_page45(4, T0 + 12.0, lnav.IONO_SV_ID, IONO)
    sv, back = lnav.unpack_page45(words)
    assert sv == lnav.IONO_SV_ID
    assert abs(back["alpha0"] - IONO["alpha0"]) <= 2 ** -30
    assert back["beta0"] == IONO["beta0"]
    assert back["delta_t_ls"] == 18 and back["dn"] == 7


def test_full_cycle_stream_decodes_assistance():
    """A (1..5) frame stream with real SF4/5 pages decodes ephemeris AND
    almanac AND iono through the bit-level frame decoder."""
    ephs = make_sky_constellation(40.0, -75.0, toe=T0 + 600)
    eph = ephs[0]
    alm_pages = [(e.prn, _almanac_fields(e)) for e in ephs[:4]]
    bits = lnav.frames_for_ephemeris(
        eph, T0, n_frames=4, subframe_cycle=(1, 2, 3, 4, 5),
        almanac=alm_pages, iono_utc=IONO)
    dec = lnav.LnavFrameDecoder()
    events = dec.push_bits(bits.tolist())
    sf_ids = [ev.sf_id for ev in events]
    assert set(sf_ids) >= {1, 2, 3, 4, 5}
    alm_seen = {}
    iono_seen = None
    for ev in events:
        if ev.sf_id in (4, 5) and ev.fields:
            sv = int(ev.fields.get("sv_id", 0))
            if sv == lnav.IONO_SV_ID:
                iono_seen = ev.fields
            elif sv:
                alm_seen[sv] = ev.fields
    assert iono_seen is not None
    assert abs(iono_seen["alpha0"] - IONO["alpha0"]) <= 2 ** -30
    assert set(alm_seen) == {e.prn for e in ephs[:4]}


def test_almanac_position_accuracy():
    """Almanac-propagated position within ~2 km of the full ephemeris."""
    eph = make_sky_constellation(40.0, -75.0, toe=T0 + 600)[1]
    fields = _almanac_fields(eph)
    words = lnav.pack_page45(5, T0, eph.prn, fields)
    _, back = lnav.unpack_page45(words)
    alm_eph = almanac_to_ephemeris(eph.prn, back, week=eph.week)
    t = T0 + 900.0
    p_full, _ = eph.sat_pos_clock(t)
    p_alm, _ = alm_eph.sat_pos_clock(t)
    assert np.linalg.norm(p_full - p_alm) < 2000.0, \
        np.linalg.norm(p_full - p_alm)


def test_assistance_persistence_roundtrip(tmp_path):
    ephs = make_sky_constellation(40.0, -75.0, toe=T0 + 600)[:3]
    eph_map = {e.prn: e for e in ephs}
    alm = {e.prn: _almanac_fields(e) for e in ephs}
    path = tmp_path / "assist.json"
    save_assistance(path, eph_map, alm, IONO)
    ephs2, alm2, iono2 = load_assistance(path)
    assert set(ephs2) == set(eph_map)
    assert ephs2[ephs[0].prn].sqrt_a == ephs[0].sqrt_a
    assert set(alm2) == set(alm)
    assert iono2["dn"] == 7
