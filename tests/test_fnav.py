"""Galileo E5a F/NAV tests: word pack/unpack + CRC, ephemeris roundtrip
(incl. the (f_E1/f_E5a)^2 BGD scaling), streaming page decode, and the
E5a telemetry decoder with CS20 secondary-code sync (reference analogues:
galileo_fnav_message tests + galileo_e5a telemetry decoder tests)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.telemetry import GalileoE5aTelemetryDecoder
from gnss_sim_receiver_tpu.nav import fnav
from gnss_sim_receiver_tpu.nav.ephemeris import GpsEphemeris


def _test_eph(prn=19):
    return GpsEphemeris(
        prn=prn, system="Galileo", week=1045, iod_nav=209,
        toe=345600.0, toc=345600.0,
        af0=-2.2e-4, af1=3.1e-12, af2=0.0, bgd_e1e5a=3.49e-9,
        sqrt_a=5440.588, ecc=0.000431, m0_sc=0.17, delta_n_sc=1.1e-9,
        omega0_sc=-0.41, i0_sc=0.311, omega_sc=0.53,
        omega_dot_sc=-2.61e-9, idot_sc=-7.3e-11,
        cuc=3.2e-7, cus=-7.7e-6, crc=98.5, crs=12.4,
        cic=1.9e-8, cis=-4.4e-8)


def test_word_roundtrip_all_types():
    eph = _test_eph()
    words = fnav.galileo_ephemeris_to_fnav_words(
        eph, iono=dict(ai0=33.0, ai1=0.11))
    words[4].update(a0=1.2e-8, a1=3.1e-15, dt_ls=18.0)
    for wt, f in words.items():
        f = dict(f, tow=345610.0)
        ok, wt2, f2 = fnav.unpack_word(fnav.pack_word(wt, f))
        assert ok and wt2 == wt
        for k, v in f.items():
            scale = fnav.WORD_FIELDS[wt][k][2]
            assert abs(f2[k] - v) <= scale / 2 + 1e-15, (wt, k)
    # CRC gate
    bits = fnav.pack_word(2, words[2])
    bits[50] ^= 1
    assert not fnav.unpack_word(bits)[0]


def test_ephemeris_roundtrip_bgd_scaling():
    eph = _test_eph()
    words = {wt: fnav.unpack_word(fnav.pack_word(wt, f))[2]
             for wt, f in fnav.galileo_ephemeris_to_fnav_words(eph).items()}
    eph2 = fnav.fnav_words_to_ephemeris(19, words)
    assert eph2.system == "Galileo" and eph2.iod_nav == 209
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18
    # E5a single-frequency group delay = BGD(E1,E5a) * (f_E1/f_E5a)^2
    assert eph2.tgd == pytest.approx(eph2.bgd_e1e5a * (1575.42 / 1176.45) ** 2)
    p1, _ = eph.sat_pos_clock(346000.0)
    p2, _ = eph2.sat_pos_clock(346000.0)
    assert np.linalg.norm(np.asarray(p1) - np.asarray(p2)) < 1.0


@pytest.mark.parametrize("invert", [False, True])
@pytest.mark.parametrize("offset", [0, 777])
def test_page_stream_decode(invert, offset):
    eph = _test_eph()
    sym = fnav.pages_for_ephemeris(eph, t0_gst_s=345600.0, n_repeats=2,
                                   iono=dict(ai0=33.0))
    s = (2.0 * sym - 1.0).astype(np.float64)[offset:]
    if invert:
        s = -s
    rng = np.random.default_rng(2)
    s = s + 0.3 * rng.standard_normal(len(s))
    dec = fnav.FnavPageDecoder()
    events = []
    i = 0
    while i < len(s):
        n = int(rng.integers(60, 600))
        events.extend(dec.push_symbols(s[i:i + n]))
        i += n
    ok = [e for e in events if e.crc_ok]
    assert len(ok) >= 6       # 8 pages; first may straddle the cut
    types = [e.word_type for e in ok]
    for wt in (1, 2, 3, 4):
        assert wt in types
    # page k starts at symbol 500k - offset and carries tow = t0 + 10k
    for e in ok:
        k = (e.page_start_symbol + offset) // 500
        assert (e.page_start_symbol + offset) % 500 == 0
        assert e.fields["tow"] == 345600.0 + 10.0 * k
    eph2 = fnav.fnav_words_to_ephemeris(
        19, {e.word_type: e.fields for e in ok})
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18


def test_e5a_telemetry_cs20_sync():
    """1 ms-epoch prompts with per-PRN CS20 spreading -> secondary sync ->
    F/NAV decode -> ephemeris + per-epoch TOW."""
    eph = _test_eph(prn=19)
    t0 = 345600.0
    sym = fnav.pages_for_ephemeris(eph, t0_gst_s=t0, n_repeats=2)
    epochs = fnav.e5a_epoch_signs(sym, prn=19).astype(np.float64)
    off = 13
    epochs = epochs[off:]
    rng = np.random.default_rng(21)
    soft = 3.0 * epochs + rng.standard_normal(len(epochs))
    tlm = GalileoE5aTelemetryDecoder(prns=[19])
    tow = []
    new_eph = []
    i = 0
    while i < len(soft):
        n = int(rng.integers(500, 2500))
        chunk = soft[i:i + n]
        outs = {"prompt": (chunk + 0j).reshape(-1, 1),
                "valid": np.ones((len(chunk), 1), bool)}
        r = tlm.process(outs)
        tow.append(r.tow_at_epoch_ms[:, 0])
        new_eph.extend(r.new_ephemerides)
        i += n
    assert len(new_eph) == 1
    eph2 = new_eph[0][1]
    assert eph2.prn == 19 and eph2.iod_nav == 209
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18
    tow = np.concatenate(tow)
    m = ~np.isnan(tow)
    assert m.sum() > 10_000
    idx = np.flatnonzero(m)
    expected = t0 * 1000.0 + (off + idx + 1) * 1.0
    np.testing.assert_allclose(tow[m], expected, atol=1e-9)


def test_e5a_chain_conf():
    from gnss_sim_receiver_tpu.models.receiver import galileo_e5a_chain
    c = galileo_e5a_chain(12_500_000.0, prns=(19,), n_channels=1)
    assert c.signal == "5X" and c.system == "Galileo"
    assert isinstance(c.telemetry_decoder([0]), GalileoE5aTelemetryDecoder)
    # simulator + subchip table agree on the placeholder code
    t = signals.subchip_table(signals.GALILEO_E5A_I, 19)
    assert t.shape == (10230,)
    np.testing.assert_array_equal(t, signals.galileo_e5a_code(19, "I"))
