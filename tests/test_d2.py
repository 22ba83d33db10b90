"""BeiDou D2 NAV (GEO) tests: page codec roundtrip, ephemeris splitting
across 10 pages, streaming subframe decode at 2 symbols/bit, the telemetry
decoder's GEO dispatch, and an RF end-to-end run on a GEO PRN.

Reference analogues: beidou_b1i_telemetry_decoder_gs.cc GEO arm
(set_satellite :368-420, decode dispatch :268-276) and
beidou_dnav_navigation_message.cc d2_subframe_decoder (:377-561)."""

import numpy as np

from gnss_sim_receiver_tpu.nav import dnav
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation

FS = 8_192_000.0


def _geo_eph(prn=2):
    eph = make_sky_constellation(30.0, 110.0, toe=7200.0)[0]
    eph.prn = prn
    eph.system = "BeiDou"
    return eph


def test_d2_page_roundtrip():
    fields = dict(sow=345.0, pnum=7, cic_lsb=131.0, cis=3.2e-8,
                  toe=7200.0, i0_msb=104233.0)
    bits = dnav.pack_d2_subframe(1, fields)
    assert bits.shape == (300,)
    ok, fra, pnum, out = dnav.unpack_d2_subframe(bits)
    assert ok and fra == 1 and pnum == 7
    assert out["sow"] == 345.0
    assert out["toe"] == 7200.0
    assert abs(out["cis"] - 3.2e-8) < 2.0 ** -32
    assert out["i0_msb"] == 104233.0


def test_d2_page_bch_corrects_errors():
    bits = dnav.pack_d2_subframe(1, dict(sow=9.0, pnum=3, a0=1e-5,
                                         a1_msb=9))
    # one flipped bit per word is correctable by BCH(15,11)
    rx = bits.copy()
    for w in range(10):
        rx[30 * w + 17] ^= 1
    ok, fra, pnum, out = dnav.unpack_d2_subframe(rx)
    assert ok and pnum == 3
    assert abs(out["a0"] - 1e-5) < 2.0 ** -34


def test_d2_ephemeris_pages_roundtrip():
    eph = _geo_eph()
    pages = dnav.beidou_ephemeris_to_d2_pages(eph)
    assert sorted(pages) == list(range(1, 11))
    # through the bit layer: pack/unpack every page
    dec_pages = {}
    for pnum, f in pages.items():
        ok, fra, pn, out = dnav.unpack_d2_subframe(
            dnav.pack_d2_subframe(1, dict(f, sow=100.0 + pnum)))
        assert ok and fra == 1 and pn == pnum
        dec_pages[pn] = out
    eph2 = dnav.d2_pages_to_beidou_ephemeris(eph.prn, dec_pages)
    assert eph2.system == "BeiDou" and eph2.prn == eph.prn
    for name, tol in [("af0", 2.0 ** -32), ("af1", 2.0 ** -49),
                      ("af2", 2.0 ** -65), ("ecc", 2.0 ** -32),
                      ("sqrt_a", 2.0 ** -18), ("m0_sc", 2.0 ** -30),
                      ("i0_sc", 2.0 ** -30), ("omega0_sc", 2.0 ** -30),
                      ("omega_sc", 2.0 ** -30),
                      ("omega_dot_sc", 2.0 ** -42),
                      ("idot_sc", 2.0 ** -42), ("delta_n_sc", 2.0 ** -42),
                      ("cuc", 2.0 ** -30), ("cus", 2.0 ** -30),
                      ("cic", 2.0 ** -30), ("cis", 2.0 ** -30),
                      ("crc", 2.0 ** -5), ("crs", 2.0 ** -5),
                      ("tgd", 1e-10)]:
        assert abs(getattr(eph2, name) - getattr(eph, name)) <= tol, name
    assert eph2.toe == eph.toe and eph2.toc == eph.toc
    # propagated position agrees to quantization level
    p1, _ = eph.sat_pos_clock(7300.0)
    p2, _ = eph2.sat_pos_clock(7300.0)
    assert np.linalg.norm(p1 - p2) < 15.0


def test_d2_streaming_decoder_offset_and_inverted():
    eph = _geo_eph()
    bits = dnav.d2_bits_for_ephemeris(eph, t0_bdt_s=300.0, n_frames=11)
    syms = dnav.d2_epoch_signs(bits).astype(np.float64)
    rng = np.random.default_rng(4)
    stream = -np.concatenate([rng.standard_normal(7) * 0.1,
                              3.0 * syms + rng.standard_normal(len(syms))])
    dec = dnav.D2SubframeDecoder()
    evs = [e for e in dec.push_symbols(stream) if e.ok]
    assert len(evs) >= 50
    sf1 = [e for e in evs if e.fra_id == 1]
    assert [e.pnum for e in sf1[:10]] == list(range(1, 11))
    # SOW marks the current frame's first bit: all 5 subframes of frame 0
    # say 300, frame 1 says 303
    assert evs[0].fields["sow"] == 300.0
    assert evs[1].fields["sow"] == 300.0
    assert evs[5].fields["sow"] == 303.0
    # pages -> ephemeris
    pages = {e.pnum: e.fields for e in sf1[:10]}
    eph2 = dnav.d2_pages_to_beidou_ephemeris(2, pages)
    assert abs(eph2.sqrt_a - eph.sqrt_a) <= 2.0 ** -18


def test_d2_telemetry_decoder_geo_dispatch():
    from gnss_sim_receiver_tpu.models.telemetry import \
        BeidouB1iTelemetryDecoder
    eph = _geo_eph(prn=3)
    bits = dnav.d2_bits_for_ephemeris(eph, t0_bdt_s=600.0, n_frames=11)
    syms = dnav.d2_epoch_signs(bits).astype(np.float64)
    rng = np.random.default_rng(5)
    soft = 3.0 * syms + rng.standard_normal(len(syms)) * 0.5

    tlm = BeidouB1iTelemetryDecoder(prns=[3])
    i = 0
    tows = []
    ephs = []
    while i < len(soft):
        n = min(977, len(soft) - i)
        outs = {"prompt": (soft[i:i + n] + 0j).reshape(-1, 1),
                "valid": np.ones((n, 1), bool)}
        r = tlm.process(outs)
        tows.append(r.tow_at_epoch_ms[:, 0])
        ephs.extend(e for _, e in r.new_ephemerides)
        i += n
    assert ephs, "no D2 ephemeris assembled"
    assert abs(ephs[0].m0_sc - eph.m0_sc) <= 2.0 ** -30
    tows = np.concatenate(tows)
    fin = np.isfinite(tows)
    assert fin.any()
    # 1 ms per epoch TOW ramp across the decoded stretch
    ft = tows[fin]
    np.testing.assert_allclose(np.diff(ft), 1.0, atol=1e-9)
    # anchor consistency: TOW at the first decoded epoch matches the 600 s
    # stream start plus its epoch index
    e0 = int(np.flatnonzero(fin)[0])
    assert abs(ft[0] - (600_000.0 + e0 + 1)) < 1e-6


def test_d2_rf_geo_end_to_end():
    """Simulated B1I GEO PRN 2 (D2 at 500 bps, no NH) -> acquisition ->
    tracking -> D2 subframe decode with correct SOW stamping."""
    from gnss_sim_receiver_tpu import signals
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    from gnss_sim_receiver_tpu.models.telemetry import \
        BeidouB1iTelemetryDecoder
    from gnss_sim_receiver_tpu.models.tracking import (TrackingConf,
                                                       TrackingEngine)
    from gnss_sim_receiver_tpu.sim import (SatelliteSignalParams,
                                           generate_baseband)
    sig = signals.BEIDOU_B1I
    eph = _geo_eph(prn=2)
    bits = dnav.d2_bits_for_ephemeris(eph, t0_bdt_s=300.0, n_frames=2)
    nav = dnav.d2_epoch_signs(bits)

    sat = SatelliteSignalParams(prn=2, system="BeiDou", signal="B1",
                                cn0_db_hz=48.0, doppler_hz=1350.0,
                                delay_chips=512.25, nav_bits=nav)
    n_samp = int(FS * 3.4)
    x = generate_baseband([sat], FS, n_samp, noise=True, seed=21)

    prov = lambda p: signals.subchip_table(sig, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=FS, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5, bit_transition_flag=True),
        prns=[2], code_provider=prov, sc_rate=sig.chip_rate_cps)
    res = acq.acquire(x[:acq.n_samples_needed])
    assert bool(res.detected[0])

    conf = TrackingConf(fs=FS, code_rate_cps=sig.chip_rate_cps,
                        code_length_chips=sig.code_length_chips,
                        carrier_freq_hz=sig.carrier_freq_hz,
                        early_late_space_chips=0.5, pll_bw_hz=40.0,
                        lock_rectify=True, enable_fll_pullin=False)
    trk = TrackingEngine(conf, prns=[2], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    tlm = BeidouB1iTelemetryDecoder(prns=[2])
    n_done = 0
    tow_cols = []
    while trk.epochs_that_fit(len(x)) > 400 and n_done < 3300:
        outs = trk.process(x, 0, 400)
        r = tlm.process(outs)
        tow_cols.append(r.tow_at_epoch_ms[:, 0])
        n_done += 400
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-50:].mean() - 1350.0) < 5.0
    tows = np.concatenate(tow_cols)
    fin = np.isfinite(tows)
    assert fin.sum() > 500, "no D2 subframe decoded on RF"
    # decoded SOW family: 300 s + n*0.6; spot-check the ramp
    ft = tows[fin]
    np.testing.assert_allclose(np.diff(ft)[np.diff(ft) > 0], 1.0,
                               atol=1e-6)
