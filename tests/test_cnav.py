"""GPS CNAV (L2C/L5) message layer tests: pack/unpack + CRC, ephemeris
roundtrip through the CNAV parameterization (delta-A / delta-Omega-dot),
and streaming decode of a noisy, possibly inverted, misaligned symbol
stream (the role of the reference's libswiftcnav cnav_msg decoder tests).
"""

import numpy as np
import pytest

from gnss_sim_receiver_tpu.nav import cnav
from gnss_sim_receiver_tpu.nav.ephemeris import GpsEphemeris


def _test_eph(prn=7):
    return GpsEphemeris(
        prn=prn, week=2200, toe=345600.0, toc=345600.0,
        af0=-3.1e-4, af1=-6.2e-12, af2=0.0, tgd=-8.4e-9,
        sqrt_a=np.sqrt(26_560_123.0), ecc=0.0123, m0_sc=0.42,
        delta_n_sc=1.5e-9, omega_sc=-0.66, omega0_sc=0.31, i0_sc=0.305,
        omega_dot_sc=-2.51e-9, idot_sc=1.1e-10,
        cuc=-4.5e-7, cus=8.9e-6, crc=212.5, crs=-18.4,
        cic=-2.4e-8, cis=5.1e-8)


def test_message_pack_unpack_roundtrip():
    eph = _test_eph()
    msgs = cnav.cnav_ephemeris_to_messages(eph)
    for mt, f in msgs.items():
        bits = cnav.pack_message(7, mt, 345612.0, f)
        ok, prn, mt2, tow, f2 = cnav.unpack_message(bits)
        assert ok and prn == 7 and mt2 == mt and tow == 345612.0
        for k, v in f.items():
            scale = cnav.MSG_FIELDS[mt][k][2]
            assert abs(f2[k] - v) <= scale / 2 + 1e-15, (mt, k)
    # corrupting any bit must fail the CRC
    bits = cnav.pack_message(7, 10, 345612.0, msgs[10])
    bits[100] ^= 1
    assert not cnav.unpack_message(bits)[0]


def test_ephemeris_roundtrip_via_cnav():
    eph = _test_eph()
    msgs = {mt: cnav.unpack_message(cnav.pack_message(7, mt, 0.0, f))[4]
            for mt, f in cnav.cnav_ephemeris_to_messages(eph).items()}
    eph2 = cnav.messages_to_ephemeris(7, msgs)
    # CNAV quantization: delta_a at 2^-9 m -> sub-mm on sqrt_a
    assert abs(eph2.sqrt_a ** 2 - eph.sqrt_a ** 2) < 2.0 ** -9
    assert abs(eph2.m0_sc - eph.m0_sc) < 2.0 ** -31
    assert abs(eph2.omega_dot_sc - eph.omega_dot_sc) < 2.0 ** -43
    assert abs(eph2.tgd - eph.tgd) < 2.0 ** -34
    p1, c1 = eph.sat_pos_clock(346000.0)
    p2, c2 = eph2.sat_pos_clock(346000.0)
    assert np.linalg.norm(np.asarray(p1) - np.asarray(p2)) < 1.0
    assert abs(c1 - c2) < 1e-9


@pytest.mark.parametrize("invert", [False, True])
@pytest.mark.parametrize("offset", [0, 333])
def test_stream_decode(invert, offset):
    eph = _test_eph()
    t0 = 345600.0
    sym = cnav.symbols_for_ephemeris(eph, t0, n_repeats=3)
    s = (2.0 * sym - 1.0).astype(np.float64)
    if invert:
        s = -s
    s = s[offset:]
    rng = np.random.default_rng(4)
    s = s + 0.3 * rng.standard_normal(len(s))
    dec = cnav.CnavDecoder()
    events = []
    i = 0
    while i < len(s):
        n = int(rng.integers(100, 700))
        events.extend(dec.push_symbols(s[i:i + n]))
        i += n
    assert all(e.crc_ok and e.prn == 7 for e in events)
    types = [e.msg_type for e in events]
    # 9 messages transmitted; the first may straddle the offset cut and the
    # last sits inside the final Viterbi tail
    assert len(events) >= 6
    for mt in (10, 11, 30):
        assert mt in types
    # TOW semantics: message k (12 s each, starting at t0) carries
    # TOW = t0 + 12(k+1); its start symbol is k*600 - offset
    for e in events:
        k = (e.start_symbol + offset) // 600
        assert (e.start_symbol + offset) % 600 == 0
        assert e.tow_s == t0 + 12.0 * (k + 1)
    # ephemeris assembly
    msgs = {e.msg_type: e.fields for e in events}
    eph2 = cnav.messages_to_ephemeris(7, msgs)
    assert abs(eph2.sqrt_a ** 2 - eph.sqrt_a ** 2) < 2.0 ** -9


def test_stream_decode_rejects_garbage():
    rng = np.random.default_rng(9)
    dec = cnav.CnavDecoder()
    events = dec.push_symbols(rng.standard_normal(6000))
    assert events == []
