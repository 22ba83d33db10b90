"""LNAV bit-level codec tests (reference analogue: nav message unit tests +
telemetry decoder tests)."""

import numpy as np

from gnss_sim_receiver_tpu.nav import lnav
from gnss_sim_receiver_tpu.nav.ephemeris import (GpsEphemeris,
                                                 fields_to_ephemeris,
                                                 make_test_constellation)


def test_parity_roundtrip():
    rng = np.random.default_rng(0)
    d29s = d30s = 0
    for _ in range(50):
        data = rng.integers(0, 2, 24)
        tx = lnav.encode_word(data, d29s, d30s)
        ok, decoded = lnav.check_word(tx, d29s, d30s)
        assert ok
        np.testing.assert_array_equal(decoded, data)
        # corrupt any single bit -> parity must fail
        k = rng.integers(0, 30)
        bad = tx.copy()
        bad[k] ^= 1
        ok_bad, _ = lnav.check_word(bad, d29s, d30s)
        assert not ok_bad
        d29s, d30s = int(tx[28]), int(tx[29])


def test_solve_parity_bits_zero_d29_d30():
    rng = np.random.default_rng(1)
    for _ in range(20):
        data22 = rng.integers(0, 2, 22)
        d29s, d30s = rng.integers(0, 2), rng.integers(0, 2)
        d = lnav.solve_parity_bits(data22, d29s, d30s)
        tx = lnav.encode_word(d, d29s, d30s)
        assert tx[28] == 0 and tx[29] == 0


def test_subframe_field_roundtrip():
    eph = make_test_constellation(1)[0]
    from gnss_sim_receiver_tpu.nav.ephemeris import ephemeris_to_fields
    f1, f2, f3 = ephemeris_to_fields(eph)
    for sf_id, fields in ((1, f1), (2, f2), (3, f3)):
        words = lnav.pack_subframe(sf_id, 345678.0, fields)
        out = lnav.unpack_subframe(sf_id, words)
        for name, val in fields.items():
            # quantization <= half LSB of each field
            scale = 2.0 ** lnav._FIELDS_BY_SF[sf_id][name][1]
            assert abs(out[name] - val) <= scale / 2 + 1e-15, (sf_id, name)
        tow, got_id = lnav.decode_how(words[1])
        assert got_id == sf_id
        assert tow == 345678.0


def test_frame_stream_decode():
    eph = make_test_constellation(1)[0]
    stream = lnav.frames_for_ephemeris(eph, tow_first_subframe_s=345600.0,
                                       n_frames=2)
    assert len(stream) == 2 * 5 * 300
    dec = lnav.LnavFrameDecoder()
    events = dec.push_bits(stream)
    assert len(events) == 10
    assert [e.sf_id for e in events] == [1, 2, 3, 4, 5] * 2
    # HOW TOW advances by 6 s per subframe
    tows = [e.tow_next_s for e in events]
    np.testing.assert_allclose(np.diff(tows), 6.0)
    # reassemble ephemeris from decoded fields
    evs = {e.sf_id: e.fields for e in events[:3]}
    eph2 = fields_to_ephemeris(1, evs[1], evs[2], evs[3])
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2 ** -19
    assert abs(eph2.m0_sc - eph.m0_sc) < 2 ** -30
    assert eph2.iode == eph.iode


def test_frame_decode_inverted_and_offset():
    eph = make_test_constellation(1)[0]
    stream = lnav.frames_for_ephemeris(eph, 345600.0, n_frames=1)
    garbled = np.concatenate([np.array([1, 0, 1, 1, 0, 0, 1]),
                              1 - stream])  # offset + 180 deg inversion
    dec = lnav.LnavFrameDecoder()
    events = dec.push_bits(garbled)
    assert [e.sf_id for e in events] == [1, 2, 3, 4, 5]
    assert events[0].bit_index == 7


def test_satellite_position_sanity():
    eph = make_test_constellation(4)[1]
    pos, clk = eph.sat_pos_clock(eph.toe + np.array([0.0, 100.0]))
    r = np.linalg.norm(pos, axis=-1)
    assert (np.abs(r - 26.56e6) < 0.5e6).all()
    v = eph.sat_vel(eph.toe)
    assert 2500 < np.linalg.norm(v) < 4500
    assert abs(clk[0] - eph.af0) < 1e-6
