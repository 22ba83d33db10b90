"""Galileo E1B I/NAV message layer tests (reference analogues:
galileo_inav_message tests + the INAV half of
galileo_telemetry_decoder_gs.cc): CRC-24Q vector, word pack/unpack
roundtrip, page encode->streaming decode with polarity inversion and
misalignment, TOW anchoring, and an end-to-end E1B signal -> tracking ->
telemetry -> ephemeris chain."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.nav import inav
from gnss_sim_receiver_tpu.nav.ephemeris import (GpsEphemeris,
                                                 galileo_ephemeris_to_words,
                                                 words_to_galileo_ephemeris)


def _bits_of_str(s: str) -> np.ndarray:
    return np.unpackbits(np.frombuffer(s.encode(), np.uint8)).astype(np.int64)


def test_crc24q_check_value():
    # CRC-24Q (init 0, poly 0x864CFB) check: "123456789" -> 0xCDE703
    assert inav.crc24q(_bits_of_str("123456789")) == 0xCDE703
    assert inav.crc24q(np.zeros(196, np.int64)) == 0


def test_conv27_roundtrip_viterbi():
    from gnss_sim_receiver_tpu import native
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 120).astype(np.int64)
    coded = inav.conv27_encode(np.concatenate([bits, np.zeros(6, np.int64)]))
    soft = (2.0 * coded - 1.0).astype(np.float32)
    soft[1::2] = -soft[1::2]  # undo G2 NOT
    dec = native.viterbi27_decode(soft)
    np.testing.assert_array_equal(dec[:120], bits)


def test_interleaver_inverse():
    x = np.arange(240)
    np.testing.assert_array_equal(inav.deinterleave(inav.interleave(x)), x)


def test_word_pack_unpack_roundtrip():
    fields = {
        1: dict(iod_nav=417, toe=351600.0, m0=-0.31,
                ecc=0.00231, sqrt_a=5440.6),
        2: dict(iod_nav=417, omega0=0.71, i0=0.304, omega=-0.92,
                idot=1.1e-10 / np.pi * np.pi),
        3: dict(iod_nav=417, omega_dot=-2.5e-9, delta_n=1.4e-9,
                cuc=-4.5e-7, cus=8.9e-6, crc=112.5, crs=-8.4, sisa=107),
        4: dict(iod_nav=417, svid=11, cic=-2.4e-8, cis=5.1e-8,
                toc=351600.0, af0=-4.3e-4, af1=-7.9e-12, af2=0.0),
        5: dict(ai0=40.0, ai1=0.12, ai2=0.004, bgd_e1e5a=2.3e-9,
                bgd_e1e5b=-3.1e-9, e1b_hs=0, wn=1045, tow=345602.0),
    }
    for wt, f in fields.items():
        bits = inav.pack_word(wt, f)
        wt2, f2 = inav.unpack_word(bits)
        assert wt2 == wt
        for k, v in f.items():
            scale = inav.WORD_FIELDS[wt][k][2]
            assert abs(f2[k] - v) <= scale / 2 + 1e-12, (wt, k, f2[k], v)


def _test_eph(prn=11):
    return GpsEphemeris(
        prn=prn, system="Galileo", week=1045, iod_nav=417,
        toe=351600.0, toc=351600.0,
        af0=-4.3e-4, af1=-7.9e-12, af2=0.0,
        sqrt_a=5440.588, ecc=0.000231, m0_sc=-0.31, delta_n_sc=1.5e-9,
        omega0_sc=0.711, i0_sc=0.3043, omega_sc=-0.887,
        omega_dot_sc=-2.55e-9, idot_sc=9.1e-11,
        cuc=-4.5e-7, cus=8.9e-6, crc=112.5, crs=-8.4,
        cic=-2.4e-8, cis=5.1e-8, bgd_e1e5a=2.33e-9, bgd_e1e5b=-3.03e-9)


def test_ephemeris_words_roundtrip():
    eph = _test_eph()
    words = {wt: inav.unpack_word(inav.pack_word(wt, f))[1]
             for wt, f in galileo_ephemeris_to_words(eph).items()}
    eph2 = words_to_galileo_ephemeris(11, words)
    assert eph2.iod_nav == 417 and eph2.system == "Galileo"
    # quantization-limited agreement on the Kepler set
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18
    assert abs(eph2.m0_sc - eph.m0_sc) < 2.0 ** -30
    assert abs(eph2.toe - eph.toe) < 1e-9
    assert abs(eph2.af0 - eph.af0) < 2.0 ** -33
    assert abs(eph2.bgd_e1e5a - eph.bgd_e1e5a) < 2.0 ** -31
    # propagated positions agree to sub-mm of quantization noise budget (m)
    p1, c1 = eph.sat_pos_clock(352000.0)
    p2, c2 = eph2.sat_pos_clock(352000.0)
    assert np.linalg.norm(np.asarray(p1) - np.asarray(p2)) < 1.0
    assert abs(c1 - c2) < 1e-9


def _decode_stream(sym_pm1):
    dec = inav.InavPageDecoder()
    events = []
    # stream in uneven chunks to exercise the incremental path
    i = 0
    rng = np.random.default_rng(3)
    while i < len(sym_pm1):
        n = int(rng.integers(40, 400))
        events.extend(dec.push_symbols(sym_pm1[i:i + n]))
        i += n
    return events


@pytest.mark.parametrize("invert", [False, True])
@pytest.mark.parametrize("offset", [0, 137])
def test_page_encode_decode_roundtrip(invert, offset):
    eph = _test_eph()
    iono = dict(ai0=40.0, ai1=0.12, ai2=0.004)
    sym = inav.pages_for_ephemeris(eph, t0_gst_s=345600.0, n_repeats=2,
                                   iono=iono)
    s = (2.0 * sym - 1.0).astype(np.float64)
    if invert:
        s = -s
    s = s[offset:]
    rng = np.random.default_rng(1)
    s = s + 0.25 * rng.standard_normal(len(s))  # mild symbol noise
    events = _decode_stream(s)
    ok = [e for e in events if e.crc_ok]
    # 10 pages transmitted; the first may straddle the offset cut
    assert len(ok) >= 8
    types = [e.word_type for e in ok]
    for wt in (1, 2, 3, 4, 5):
        assert wt in types
    w5 = next(e for e in ok if e.word_type == 5)
    # word 5 is the 5th page (pages 0-based idx 4): its even part starts at
    # stream symbol 4*500, i.e. 4*500-offset in the cut stream, and carries
    # TOW = t0 + 4 pages * 2 s
    assert w5.page_start_symbol == 4 * 500 - offset
    assert w5.fields["tow"] == 345600.0 + 4 * 2.0
    assert abs(w5.fields["ai0"] - 40.0) <= 0.25
    words = {e.word_type: e.fields for e in ok if e.word_type in range(1, 6)}
    eph2 = words_to_galileo_ephemeris(11, words)
    assert eph2.iod_nav == eph.iod_nav
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18


def test_crc_rejects_corruption():
    eph = _test_eph()
    sym = inav.pages_for_ephemeris(eph, t0_gst_s=0.0, n_repeats=1)
    s = (2.0 * sym - 1.0).astype(np.float64)
    # corrupt a run of data symbols inside page 2's odd part (after its
    # 10-symbol preamble) hard enough that Viterbi can't repair it
    s[2 * 500 + 250 + 40: 2 * 500 + 250 + 140] *= -1.0
    events = _decode_stream(s)
    bad = [e for e in events if not e.crc_ok]
    ok_types = [e.word_type for e in events if e.crc_ok]
    assert len(bad) >= 1
    assert 3 not in ok_types          # page 3 (word 3) was destroyed
    for wt in (1, 2, 4, 5):
        assert wt in ok_types


def test_e1b_telemetry_end_to_end():
    """Full chain: INAV pages -> E1B baseband -> acquisition -> tracking ->
    GalileoE1bTelemetryDecoder -> ephemeris + TOW stamps (the role of
    galileo_e1b_telemetry_decoder_test.cc)."""
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    from gnss_sim_receiver_tpu.models.telemetry import (
        GalileoE1bTelemetryDecoder)
    from gnss_sim_receiver_tpu.models.tracking import (TrackingConf,
                                                       TrackingEngine)
    from gnss_sim_receiver_tpu.sim import (SatelliteSignalParams,
                                           generate_baseband)

    fs = 4_500_000.0
    sig = signals.GALILEO_E1B
    eph = _test_eph(prn=11)
    t0 = 345600.0
    sym = inav.pages_for_ephemeris(eph, t0_gst_s=t0, n_repeats=6,
                                   iono=dict(ai0=40.0))
    bits = (2 * sym - 1).astype(np.int8)
    delay_chips = 734.25
    sat = SatelliteSignalParams(prn=11, system="Galileo", signal="1B",
                                cn0_db_hz=48.0, doppler_hz=1400.0,
                                delay_chips=delay_chips, nav_bits=bits)
    # >= 11 s: need ~2 pages after preamble lock confirm for words 1-5
    n_samp = int(fs * 11.5)
    x = generate_baseband([sat], fs, n_samp, noise=True, seed=5)

    prov = lambda p: signals.subchip_table(sig, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, sampled_ms=4, doppler_step=125.0, max_dwells=2,
                make_two_steps=True, doppler_step2=31.25),
        prns=[11], code_provider=prov, sc_rate=sig.sc_rate)
    res = acq.acquire(x)
    assert bool(res.detected[0])
    conf = TrackingConf(fs=fs, code_rate_cps=sig.sc_rate,
                        code_length_chips=sig.sc_length,
                        carrier_freq_hz=sig.carrier_freq_hz,
                        early_late_space_chips=0.5,
                        enable_fll_pullin=False, fll_pullin_epochs=100)
    trk = TrackingEngine(conf, prns=[11], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    tlm = GalileoE1bTelemetryDecoder(prns=[11])
    n_epochs = int(11.0 / 0.004)
    tow = np.full((0, 1), np.nan)
    counters = []
    new_eph = []
    chunk = 500
    done = 0
    while done < n_epochs:
        n = min(chunk, n_epochs - done)
        outs = trk.process(x, 0, n)
        r = tlm.process(outs)
        tow = np.vstack([tow, r.tow_at_epoch_ms])
        counters.append(np.asarray(outs["sample_counter"][:, 0]))
        new_eph.extend(r.new_ephemerides)
        done += n
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    assert len(new_eph) == 1
    c, eph2 = new_eph[0]
    assert c == 0 and eph2.prn == 11 and eph2.iod_nav == eph.iod_nav
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18

    # TOW stamps: at the end of epoch e the transmit time is
    # t0 + (sample_counter/fs - delay_sec) exactly (zero clock error sim)
    counter = np.concatenate(counters)
    m = ~np.isnan(tow[:, 0])
    # stamps start at the first word-5 anchor (~8 s in: pull-in + 4 pages)
    assert m.sum() > 500
    delay_s = delay_chips / sig.chip_rate_cps
    expected_ms = (t0 + counter[m] / fs - delay_s) * 1000.0
    err = tow[m, 0] - expected_ms
    # sub-ms agreement (code tracking jitter only)
    assert np.max(np.abs(err)) < 1.0, (err.min(), err.max())
