"""BeiDou B1I D1 NAV tests: BCH(15,11) code, subframe pack/unpack +
error correction, ephemeris roundtrip, streaming subframe decode, the
NH20-synced telemetry decoder, and a full RF B1I chain end-to-end
(reference analogues: beidou_b1i telemetry decoder + navigation message
tests)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.telemetry import BeidouB1iTelemetryDecoder
from gnss_sim_receiver_tpu.nav import dnav
from gnss_sim_receiver_tpu.nav.ephemeris import GpsEphemeris


def _test_eph(prn=14):
    return GpsEphemeris(
        prn=prn, system="BeiDou", week=810, toe=345600.0, toc=345600.0,
        af0=2.4e-4, af1=-1.1e-11, af2=0.0, tgd=-5.2e-9,
        sqrt_a=np.sqrt(27_906_100.0), ecc=0.0021, m0_sc=-0.73,
        delta_n_sc=1.3e-9, omega_sc=0.41, omega0_sc=-0.18, i0_sc=0.306,
        omega_dot_sc=-2.2e-9, idot_sc=4.4e-11,
        cuc=2.1e-7, cus=-6.3e-6, crc=187.5, crs=44.25,
        cic=-3.1e-8, cis=6.6e-8, iode=21, iodc=21)


def test_bch_roundtrip_and_correction():
    rng = np.random.default_rng(0)
    for _ in range(30):
        d = rng.integers(0, 2, 11)
        cw = dnav.bch_encode(d)
        ok, d2 = dnav.bch_decode(cw)
        assert ok and np.array_equal(d2, d)
        # single-bit error corrected
        bad = cw.copy()
        bad[int(rng.integers(0, 15))] ^= 1
        ok, d2 = dnav.bch_decode(bad)
        assert ok and np.array_equal(d2, d)


def test_subframe_roundtrip():
    eph = _test_eph()
    sfs = dnav.beidou_ephemeris_to_subframes(eph)
    for fra, f in sfs.items():
        f = dict(f, sow=345606.0)
        bits = dnav.pack_subframe(fra, f)
        ok, fra2, f2 = dnav.unpack_subframe(bits)
        assert ok and fra2 == fra
        for k, v in f.items():
            scale = dnav.SUBFRAME_FIELDS[fra][k][1]
            assert abs(f2[k] - v) <= scale / 2 + 1e-12, (fra, k)
    # single-bit channel errors are corrected by BCH
    bits = dnav.pack_subframe(2, dict(sfs[2], sow=6.0))
    bits[77] ^= 1
    ok, fra2, f2 = dnav.unpack_subframe(bits)
    assert ok and fra2 == 2


def test_ephemeris_roundtrip_orbit():
    eph = _test_eph()
    sfs = {fra: dnav.unpack_subframe(dnav.pack_subframe(fra, f))[2]
           for fra, f in dnav.beidou_ephemeris_to_subframes(eph).items()}
    eph2 = dnav.subframes_to_beidou_ephemeris(14, sfs)
    assert eph2.system == "BeiDou" and eph2.toe == eph.toe
    assert abs(eph2.tgd - eph.tgd) <= 0.5e-10
    p1, c1 = eph.sat_pos_clock(346000.0)
    p2, c2 = eph2.sat_pos_clock(346000.0)
    assert np.linalg.norm(np.asarray(p1) - np.asarray(p2)) < 1.0
    assert abs(c1 - c2) < 1e-9


@pytest.mark.parametrize("invert", [False, True])
def test_bit_stream_decode(invert):
    eph = _test_eph()
    bits = dnav.bits_for_ephemeris(eph, t0_bdt_s=345600.0, n_repeats=2)
    s = (2.0 * bits - 1.0).astype(np.float64)[37:]
    if invert:
        s = -s
    rng = np.random.default_rng(5)
    s = s + 0.3 * rng.standard_normal(len(s))
    dec = dnav.DnavSubframeDecoder()
    events = []
    i = 0
    while i < len(s):
        n = int(rng.integers(40, 400))
        events.extend(dec.push_bits(s[i:i + n]))
        i += n
    ok = [e for e in events if e.ok]
    assert len(ok) >= 4
    ids = [e.fra_id for e in ok]
    for fra in (1, 2, 3):
        assert fra in ids
    # subframe k starts at bit 300k - 37 with SOW = t0 + 6k
    for e in ok:
        k = (e.subframe_start_bit + 37) // 300
        assert (e.subframe_start_bit + 37) % 300 == 0
        assert e.fields["sow"] == 345600.0 + 6.0 * k
    eph2 = dnav.subframes_to_beidou_ephemeris(
        14, {e.fra_id: e.fields for e in ok})
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18


def test_b1i_chain_end_to_end():
    """Full RF chain: D1 bits -> NH20-spread B1I baseband -> acquisition ->
    tracking -> NH20 sync -> subframes -> ephemeris + per-epoch TOW."""
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    from gnss_sim_receiver_tpu.models.tracking import (TrackingConf,
                                                       TrackingEngine)
    from gnss_sim_receiver_tpu.sim import (SatelliteSignalParams,
                                           generate_baseband)
    fs = 4_500_000.0
    sig = signals.BEIDOU_B1I
    eph = _test_eph(prn=14)
    t0 = 345600.0
    bits = dnav.bits_for_ephemeris(eph, t0_bdt_s=t0, n_repeats=2)
    epochs = dnav.b1i_epoch_signs(bits)
    delay_chips = 1111.75
    sat = SatelliteSignalParams(prn=14, system="BeiDou", signal="B1",
                                cn0_db_hz=46.0, doppler_hz=2300.0,
                                delay_chips=delay_chips, nav_bits=epochs)
    # subframe 1's first pass is lost to pull-in/NH-sync; its repeat ends
    # at t0+24 s (+300-bit decode lookahead)
    dur = 26.5
    x = generate_baseband([sat], fs, int(fs * dur), noise=True, seed=13)

    prov = lambda p: signals.subchip_table(sig, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5, bit_transition_flag=True),
        prns=[14], code_provider=prov, sc_rate=sig.chip_rate_cps)
    res = acq.acquire(x)
    assert bool(res.detected[0])
    conf = TrackingConf(fs=fs, code_rate_cps=sig.chip_rate_cps,
                        code_length_chips=sig.code_length_chips,
                        carrier_freq_hz=sig.carrier_freq_hz,
                        early_late_space_chips=0.5, pll_bw_hz=40.0,
                        enable_fll_pullin=False, fll_pullin_epochs=100)
    trk = TrackingEngine(conf, prns=[14], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    tlm = BeidouB1iTelemetryDecoder(prns=[14])
    n_epochs = trk.epochs_that_fit(len(x))
    tow, ctr, new_eph = [], [], []
    done = 0
    while done < n_epochs:
        n = min(500, n_epochs - done)
        outs = trk.process(x, 0, n)
        r = tlm.process(outs)
        tow.append(r.tow_at_epoch_ms[:, 0])
        ctr.append(outs["sample_counter"][:, 0])
        new_eph.extend(r.new_ephemerides)
        done += n
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    assert abs(outs["carrier_doppler_hz"][-100:, 0].mean() - 2300.0) < 3.0
    assert len(new_eph) == 1
    c, eph2 = new_eph[0]
    assert eph2.prn == 14 and eph2.system == "BeiDou"
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18
    tow = np.concatenate(tow)
    ctr = np.concatenate(ctr)[: len(tow)]
    m = ~np.isnan(tow)
    assert m.sum() > 1000
    delay_s = delay_chips / sig.chip_rate_cps
    expected_ms = (t0 + ctr[m] / fs - delay_s) * 1000.0
    err_ms = tow[m] - expected_ms
    assert np.max(np.abs(err_ms)) < 1.0, (err_ms.min(), err_ms.max())


def test_b1i_chain_conf():
    from gnss_sim_receiver_tpu.models.receiver import beidou_b1i_chain
    c = beidou_b1i_chain(4_500_000.0, prns=(14, 20), n_channels=2)
    assert c.signal == "B1" and c.system == "BeiDou"
    assert isinstance(c.telemetry_decoder([0, 0]), BeidouB1iTelemetryDecoder)


def test_icd_raw_bit_positions():
    """Field positions match the reference Beidou_DNAV.h tables on the
    de-interleaved frame (VERDICT r3 #9: ICD-interoperable D1/D2 layout).
    Spot checks: SOW split {19,8}+{31,12}, D1 WN {61,13}, D2 Pnum {43,4},
    D2 WN {65,13}."""
    f = dnav.pack_subframe(1, {"sow": 0b10110011_001111000011 * 1.0,
                               "wn": 0b1010101010101 * 1.0})
    ok, frame = dnav._tx_to_frame(f)
    assert ok
    bits = "".join(str(int(b)) for b in frame)
    assert bits[18:26] == "10110011"          # SOW MSB at 19..26
    assert bits[30:42] == "001111000011"      # SOW LSB at 31..42
    assert bits[60:73] == "1010101010101"     # D1 WN at 61..73

    f2 = dnav.pack_d2_subframe(1, {"pnum": 9.0})
    ok, frame = dnav._tx_to_frame(f2)
    assert ok
    bits = "".join(str(int(b)) for b in frame)
    assert bits[42:46] == "1001"              # D2 Pnum at 43..46
    f3 = dnav.pack_d2_subframe(1, {"pnum": 1.0,
                                   "wn": 0b1100110011001 * 1.0})
    ok, frame = dnav._tx_to_frame(f3)
    assert ok
    bits = "".join(str(int(b)) for b in frame)
    assert bits[64:77] == "1100110011001"     # D2 WN at 65..77 (page 1)
