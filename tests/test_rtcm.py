"""RTCM 3.x codec: framing/CRC, ephemeris and MSM round trips, and the
RTK-over-RTCM end-to-end (reference rtcm.cc + rtcm_printer.cc roles)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models import rtcm
from gnss_sim_receiver_tpu.nav.ephemeris import (GpsEphemeris,
                                                 make_sky_constellation)


def test_crc24q_and_framing():
    payload = bytes(range(40))
    f = rtcm.frame(payload)
    assert f[0] == 0xD3
    got = list(rtcm.iter_frames(f))
    assert got == [payload]
    # resync through garbage and reject corrupted CRC
    corrupted = bytearray(f)
    corrupted[10] ^= 0xFF
    stream = b"\xd3junk" + bytes(corrupted) + b"\x00\xd3" + f + b"tail"
    got = list(rtcm.iter_frames(stream))
    assert got == [payload]


def _sky_eph(system, prn=7):
    # toe/toc on the wire-scale grid (x16 GPS, x60 Galileo, x8 BeiDou —
    # real broadcast ephemerides are always aligned): 346560 = 16*21660
    # = 60*5776 = 8*43320
    eph = make_sky_constellation(40.0, -75.0, toe=346560.0)[0]
    eph.toc = eph.toe
    eph.prn = prn
    eph.system = system
    eph.week = 2200 if system == "GPS" else (1300 if system == "BeiDou"
                                             else 1200)
    eph.tgd = 4.6e-9
    eph.af0 = -1.2e-4
    eph.af1 = 3e-12
    eph.iode = 17
    eph.iodc = 17
    eph.iod_nav = 17
    eph.bgd_e1e5a = 2.3e-9
    return eph


@pytest.mark.parametrize("system", ["GPS", "Galileo", "BeiDou"])
def test_ephemeris_roundtrip(system):
    eph = _sky_eph(system)
    payload = rtcm.encode_ephemeris(eph)
    assert rtcm.message_number(payload) == \
        rtcm._EPH_MSG_FOR_SYSTEM[system]
    back = rtcm.decode_ephemeris(payload)
    assert back.system == system
    assert back.prn == eph.prn and back.week == eph.week
    # propagated orbit must agree within quantization (sqrt_a's 2^-19
    # step alone is ~2 cm of semi-major axis; clock to ~1e-10 s)
    t = eph.toe + np.array([0.0, 300.0, 900.0])
    p0, c0 = eph.sat_pos_clock(t)
    p1, c1 = back.sat_pos_clock(t)
    assert np.abs(p0 - p1).max() < 0.05
    assert np.abs(c0 - c1).max() < 1e-9
    assert abs(back.tgd - eph.tgd) < 1e-9 or system == "Galileo"


def test_station_roundtrip():
    ecef = np.array([1112189.9031, -4842955.0319, 3985352.2376])
    pos, sid = rtcm.decode_station(rtcm.encode_station(ecef, station_id=42))
    assert sid == 42
    assert np.abs(pos - ecef).max() < 1e-4 + 1e-9


@pytest.mark.parametrize("msm", [4, 7])
def test_msm_roundtrip(msm):
    rng = np.random.default_rng(5)
    obs = []
    for prn in (2, 9, 17, 23):
        pr = 2.1e7 + rng.uniform(0, 5e6)
        lam = rtcm.C / rtcm._SIG_FREQ[("GPS", "1C")]
        cyc = (pr + rng.uniform(-20, 20)) / lam
        obs.append(rtcm.MsmObservation(
            prn=prn, system="GPS", signal="1C", pseudorange_m=pr,
            carrier_phase_cycles=cyc, doppler_hz=rng.uniform(-4000, 4000),
            cn0_db_hz=44.5))
    payload = rtcm.encode_msm("GPS", tow_ms=345600123, obs=obs, msm=msm)
    assert rtcm.message_number(payload) == (1074 if msm == 4 else 1077)
    ep = rtcm.decode_msm(payload)
    assert ep.tow_ms == 345600123 and ep.system == "GPS"
    assert len(ep.obs) == len(obs)
    for o, b in zip(obs, sorted(ep.obs, key=lambda v: v.prn)):
        assert b.prn == o.prn and b.signal == "1C"
        pr_tol = 0.6e-3 if msm == 7 else 0.02   # quantization x c
        ph_tol_m = 2e-4 if msm == 7 else 8e-4
        lam = rtcm.C / rtcm._SIG_FREQ[("GPS", "1C")]
        assert abs(b.pseudorange_m - o.pseudorange_m) < pr_tol
        assert abs(b.carrier_phase_cycles
                   - o.carrier_phase_cycles) * lam < ph_tol_m
        if msm == 7:
            assert abs(b.doppler_hz - o.doppler_hz) < 0.01
            assert abs(b.cn0_db_hz - o.cn0_db_hz) < 0.0626
        else:
            assert b.doppler_hz is None
            assert abs(b.cn0_db_hz - o.cn0_db_hz) < 0.51


def test_msm_multi_constellation_decoder():
    """Decoder groups constellations by epoch into BaseObservations."""
    lam_g = rtcm.C / rtcm._SIG_FREQ[("GPS", "1C")]
    lam_e = rtcm.C / rtcm._SIG_FREQ[("Galileo", "1B")]
    frames = []
    for tow in (1000, 1020):
        obs_g = [rtcm.MsmObservation(3, "GPS", "1C", 2.2e7,
                                     (2.2e7 + 4.2) / lam_g, 100.0, 45.0)]
        obs_e = [rtcm.MsmObservation(5, "Galileo", "1B", 2.4e7,
                                     (2.4e7 - 7.7) / lam_e, -50.0, 44.0)]
        frames.append(rtcm.frame(rtcm.encode_msm("GPS", tow, obs_g)))
        frames.append(rtcm.frame(rtcm.encode_msm("Galileo", tow, obs_e)))
    frames.append(rtcm.frame(rtcm.encode_station([1.0, 2.0, 3.0])))
    dec = rtcm.RtcmBaseDecoder()
    dec.feed(b"".join(frames))
    base = dec.base_observations()
    assert len(base.epochs) == 2
    assert sorted(zip(base.systems, base.prns)) == [("GPS", 3),
                                                    ("Galileo", 5)]
    assert base.epochs[0].valid.all()


def test_tcp_transport():
    payload = rtcm.encode_station([10.0, 20.0, 30.0])
    data = rtcm.frame(payload) * 3
    port, srv = rtcm.serve_frames(data)
    try:
        got = rtcm.read_frames("127.0.0.1", port)
    finally:
        srv.close()
    assert got == data
    assert len(list(rtcm.iter_frames(got))) == 3


def test_msm7_glonass_fdma_roundtrip():
    """GLONASS MSM7 (1087): the FDMA channel rides the extended
    satellite info field (k+7) and sets the per-satellite wavelength;
    phase and Doppler survive the round trip at nonzero slots."""
    obs = [rtcm.MsmObservation(
               prn=5, system="GLONASS", signal="1G",
               pseudorange_m=2.1234567e7,
               carrier_phase_cycles=2.1234567e7 / rtcm._sig_lambda(
                   "GLONASS", "1G", 3),
               doppler_hz=1234.5, cn0_db_hz=44.5, lock_s=60.0,
               freq_slot=3),
           rtcm.MsmObservation(
               prn=12, system="GLONASS", signal="1G",
               pseudorange_m=2.3456789e7,
               carrier_phase_cycles=2.3456789e7 / rtcm._sig_lambda(
                   "GLONASS", "1G", -4),
               doppler_hz=-2500.25, cn0_db_hz=41.0, lock_s=60.0,
               freq_slot=-4)]
    payload = rtcm.encode_msm("GLONASS", 34567000, obs, msm=7)
    ep = rtcm.decode_msm(payload)
    assert ep.system == "GLONASS" and len(ep.obs) == 2
    by_prn = {o.prn: o for o in ep.obs}
    assert by_prn[5].freq_slot == 3 and by_prn[12].freq_slot == -4
    for o in obs:
        b = by_prn[o.prn]
        assert abs(b.pseudorange_m - o.pseudorange_m) < 5e-4
        assert abs(b.carrier_phase_cycles - o.carrier_phase_cycles) \
            * rtcm._sig_lambda("GLONASS", "1G", o.freq_slot) < 1e-3
        assert abs(b.doppler_hz - o.doppler_hz) < 0.5


def test_msm7_sbas_roundtrip():
    """SBAS MSM7 (1107) encodes/decodes the S1 signal."""
    obs = [rtcm.MsmObservation(
        prn=20, system="SBAS", signal="S1", pseudorange_m=3.8123456e7,
        carrier_phase_cycles=3.8123456e7 * rtcm.GPS_L1_FREQ /
        rtcm.C if hasattr(rtcm, "GPS_L1_FREQ") else 3.8123456e7 /
        rtcm._sig_lambda("SBAS", "S1"),
        doppler_hz=150.0, cn0_db_hz=38.5, lock_s=30.0)]
    payload = rtcm.encode_msm("SBAS", 12345000, obs, msm=7)
    ep = rtcm.decode_msm(payload)
    assert ep.system == "SBAS" and len(ep.obs) == 1
    assert abs(ep.obs[0].pseudorange_m - obs[0].pseudorange_m) < 5e-4
