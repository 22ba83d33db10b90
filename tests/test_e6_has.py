"""Galileo E6-B + HAS tests: RS(255,32) codec (golden against the
reference's E6B generator matrix column), C/NAV page codec, HAS MT1
pack/parse, page assembly with parity-page Reed-Solomon recovery, the E6
telemetry decoder with cross-band TOW stamping, and an RF end-to-end run
(simulated E6-B with real ICD codes -> receiver -> decoded HAS message).

Reference analogues: reed_solomon.cc (E6B config), galileo_cnav_message.cc,
galileo_e6_has_msg_receiver.cc, galileo_tow_map.cc, and the E6 arm of
galileo_telemetry_decoder_gs.cc."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.nav import cnav_e6, has as has_mod
from gnss_sim_receiver_tpu.nav import reed_solomon as rs

FS = 12_500_000.0


# --------------------------------------------------------------------------
# Reed-Solomon
# --------------------------------------------------------------------------

def test_rs_generator_matches_reference_matrix():
    """encode(e_0) parity must equal column 0 of the reference's
    generator matrix (reed_solomon.cc:70-84, first parity rows)."""
    info = np.zeros(32, np.int64)
    info[0] = 1
    cw = rs.encode(info)
    assert cw[32:47].tolist() == [19, 27, 98, 95, 172, 117, 243, 90,
                                  164, 211, 220, 110, 164, 251, 116]


def test_rs_erasure_only_any_32_pages():
    rng = np.random.default_rng(7)
    info = rng.integers(0, 256, 32)
    cw = rs.encode(info)
    keep = rng.choice(255, 32, replace=False)
    rx = np.zeros(255, np.int64)
    rx[keep] = cw[keep]
    eras = sorted(set(range(255)) - set(keep.tolist()))
    out = rs.decode(rx, eras)
    assert out is not None and (out[:32] == info).all()


def test_rs_errors_and_erasures():
    rng = np.random.default_rng(8)
    info = rng.integers(0, 256, 32)
    cw = rs.encode(info)
    rx = cw.copy()
    eras = rng.choice(255, 50, replace=False)
    rx[eras] = 0
    err = [p for p in rng.choice(255, 10, replace=False)
           if p not in set(eras.tolist())]
    for p in err:
        rx[p] ^= int(rng.integers(1, 256))
    out = rs.decode(rx, eras.tolist())
    assert out is not None and (out == cw).all()


def test_rs_too_many_errors_fails_cleanly():
    rng = np.random.default_rng(9)
    cw = rs.encode(rng.integers(0, 256, 32))
    rx = np.zeros(255, np.int64)
    rx[:20] = cw[:20]      # only 20 of 32 info symbols known
    out = rs.decode(rx, list(range(20, 255)))
    assert out is None


# --------------------------------------------------------------------------
# E6 codes
# --------------------------------------------------------------------------

def test_e6b_codes_real_tables():
    c1 = signals.galileo_e6_code(1, "B")
    assert c1.shape == (5115,) and set(np.unique(c1)) <= {-1.0, 1.0}
    # bit 0 -> +1 convention; reference PRN1 E6B starts hex "E66..."
    # = bits 1110 0110 0110 -> chips -1-1-1+1+1-1-1+1+1-1-1+1
    np.testing.assert_array_equal(
        c1[:12], [-1, -1, -1, 1, 1, -1, -1, 1, 1, -1, -1, 1])
    c2 = signals.galileo_e6_code(2, "B")
    assert abs(np.dot(c1, c2)) < 0.1 * 5115      # low cross-correlation
    sec = signals.e6c_secondary_code(1)
    assert sec.shape == (100,)


# --------------------------------------------------------------------------
# C/NAV page codec
# --------------------------------------------------------------------------

def test_cnav_page_roundtrip_with_noise():
    rng = np.random.default_rng(3)
    octets = rng.integers(0, 256, 53)
    hdr = cnav_e6.HasPageHeader(has_status=1, message_type=1, message_id=5,
                                message_size=7, message_page_id=211)
    sym = cnav_e6.encode_page(hdr, octets)
    assert sym.shape == (1000,)
    # direct decode takes positive soft value = bit 1
    soft = (2.0 * sym - 1.0) * 2.0 + rng.standard_normal(1000) * 0.8
    ev = cnav_e6.decode_page_symbols(soft[16:])
    assert ev.crc_ok
    assert ev.header.message_id == 5 and ev.header.message_page_id == 211
    np.testing.assert_array_equal(ev.octets, octets)


def test_cnav_streaming_decoder_inverted_polarity():
    rng = np.random.default_rng(4)
    pages = [cnav_e6.encode_page(
        cnav_e6.HasPageHeader(message_type=1, message_id=2, message_size=3,
                              message_page_id=p),
        rng.integers(0, 256, 53)) for p in (1, 2, 3)]
    stream = -np.concatenate([(1.0 - 2.0 * p) for p in pages])  # flipped
    stream = np.concatenate([rng.standard_normal(137) * 0.1, stream])
    dec = cnav_e6.CnavPageDecoder()
    evs = [e for e in dec.push_symbols(stream) if e.crc_ok]
    assert [e.header.message_page_id for e in evs] == [1, 2, 3]


# --------------------------------------------------------------------------
# HAS MT1
# --------------------------------------------------------------------------

def _sat_mask(prns):
    m = 0
    for p in prns:
        m |= 1 << (40 - p)
    return m


def _has_fixture():
    d = has_mod.HasData()
    d.header = has_mod.HasHeader(
        toh=450, mask_flag=True, orbit_correction_flag=True,
        clock_fullset_flag=True, clock_subset_flag=True,
        code_bias_flag=True, phase_bias_flag=True, mask_id=9,
        iod_set_id=3)
    d.nsys = 2
    d.gnss_id_mask = [has_mod.GPS_SYSTEM, has_mod.GALILEO_SYSTEM]
    d.satellite_mask = [_sat_mask([1, 3, 5]), _sat_mask([2, 4])]
    d.signal_mask = [0b1100000000000000, 0b1010000000000000]
    d.cell_mask_flag = [False, True]
    d.cell_mask = [np.ones((3, 2), bool), np.array([[1, 0], [1, 1]], bool)]
    d.nav_message = [0, 0]
    d.validity_orbit = 5
    d.gnss_iod = [17, 18, 19, 257, 258]
    d.delta_radial_m = [0.1, -0.2, 0.3, 0.05, -0.0725]
    d.delta_in_track_m = [0.4, -0.8, 0.16, 0.024, -0.032]
    d.delta_cross_track_m = [0.08, 0.016, -0.24, 0.8, 0.056]
    d.validity_clock = 2
    d.delta_clock_multiplier = [1, 2]
    d.delta_clock_m = [0.05, -0.1, 0.0025, 0.01, -0.005]
    d.validity_clock_subset = 1
    d.nsys_sub = 1
    d.gnss_id_clock_subset = [has_mod.GPS_SYSTEM]
    d.multiplier_clock_subset = [2]
    d.satellite_submask = [0b101]       # first and third masked GPS sats
    d.delta_clock_subset_m = [[0.01, -0.02]]
    d.validity_code_bias = 9
    d.code_bias_m = [[0.5, -0.3], [0.2, 0.1], [-0.8, 0.04],
                     [1.2], [0.6, -0.02]]
    d.validity_phase_bias = 11
    d.phase_bias_cycles = [[0.25, -0.1], [0.0, 0.05], [-0.3, 0.12],
                           [0.07], [0.2, -0.01]]
    d.phase_discontinuity = [[0, 1], [2, 3], [1, 0], [2], [3, 0]]
    return d


def test_mt1_pack_parse_roundtrip_all_sections():
    d = _has_fixture()
    d2 = has_mod.parse_mt1(has_mod.pack_mt1(d))
    assert d2.header.toh == 450 and d2.header.mask_id == 9
    assert d2.satellite_mask == d.satellite_mask
    assert d2.signal_mask == d.signal_mask
    assert d2.gnss_iod == d.gnss_iod
    np.testing.assert_allclose(d2.delta_radial_m, d.delta_radial_m,
                               atol=1e-12)
    np.testing.assert_allclose(d2.delta_clock_m, d.delta_clock_m,
                               atol=1e-12)
    assert d2.satellite_submask == d.satellite_submask
    np.testing.assert_allclose(d2.delta_clock_subset_m[0],
                               d.delta_clock_subset_m[0], atol=1e-12)
    np.testing.assert_allclose(np.concatenate(d2.code_bias_m),
                               np.concatenate(d.code_bias_m), atol=1e-12)
    np.testing.assert_allclose(np.concatenate(d2.phase_bias_cycles),
                               np.concatenate(d.phase_bias_cycles),
                               atol=1e-12)
    assert d2.phase_discontinuity == d.phase_discontinuity
    assert d2.prns(0) == [1, 3, 5] and d2.prns(1) == [2, 4]


def test_has_assembly_from_parity_pages():
    """Drop an information page; recover the message from parity PIDs
    (true RS erasure decoding, not just systematic copy-out)."""
    d = _has_fixture()
    probe = has_mod.mt1_to_pages(d, message_id=14)
    size = len(probe)
    assert size >= 2
    pids = list(range(2, size + 1)) + [77]      # page 1 replaced by parity
    pages = has_mod.mt1_to_pages(d, message_id=14, pids=pids)
    dec = cnav_e6.CnavPageDecoder()
    asm = has_mod.HasMessageAssembler()
    out = None
    rng = np.random.default_rng(5)
    for pg in pages:
        soft = (1.0 - 2.0 * pg) * 2.0 + 0.7 * rng.standard_normal(1000)
        for ev in dec.push_symbols(soft):
            got = asm.push_page(ev)
            out = got or out
    assert out is not None
    assert out.header.toh == 450
    np.testing.assert_allclose(out.delta_radial_m, d.delta_radial_m,
                               atol=1e-12)
    np.testing.assert_allclose(np.concatenate(out.code_bias_m),
                               np.concatenate(d.code_bias_m), atol=1e-12)


# --------------------------------------------------------------------------
# telemetry decoder + TOW map
# --------------------------------------------------------------------------

def test_e6_telemetry_decoder_with_tow_map():
    from gnss_sim_receiver_tpu.models.telemetry import (
        GalileoE6bTelemetryDecoder, GalileoTowMap)
    d = _has_fixture()
    pages = has_mod.mt1_to_pages(d, message_id=1)
    sym01 = np.concatenate(pages * 2)
    signs = cnav_e6.e6b_epoch_signs(sym01)
    rng = np.random.default_rng(6)
    soft = 3.0 * signs + rng.standard_normal(len(signs))

    tow_map = GalileoTowMap(fs=FS)
    tlm = GalileoE6bTelemetryDecoder(prns=[7], tow_map=tow_map)
    # another band decoded PRN 7's TOW: 100 s at sample 1e6
    tow_map.update(7, 100_000.0, 1_000_000.0)

    nominal = FS * 1e-3
    i = 0
    tow_all = []
    while i < len(soft):
        n = min(900, len(soft) - i)
        chunk = soft[i:i + n]
        sc = (1_000_000.0 + (np.arange(i, i + n) + 1) * nominal)
        outs = {"prompt": (chunk + 0j).reshape(-1, 1),
                "valid": np.ones((n, 1), bool),
                "sample_counter": sc.reshape(-1, 1)}
        r = tlm.process(outs)
        tow_all.append(r.tow_at_epoch_ms[:, 0])
        i += n
    assert len(tlm.has.messages) >= 1
    got = tlm.has.messages[0]
    np.testing.assert_allclose(got.delta_radial_m, d.delta_radial_m,
                               atol=1e-12)
    tow_all = np.concatenate(tow_all)
    # cross-band TOW stamping: epoch e ends 1 ms later than epoch e-1
    assert np.isfinite(tow_all).all()
    np.testing.assert_allclose(np.diff(tow_all), 1.0, atol=1e-9)
    assert abs(tow_all[0] - 100_001.0) < 1e-6


# --------------------------------------------------------------------------
# RF end-to-end
# --------------------------------------------------------------------------

def test_e6_rf_acquisition_tracking_has_decode():
    """Simulated E6-B (real ICD code, C/NAV symbols as per-epoch signs) ->
    acquisition -> tracking -> page decode -> HAS MT1 content."""
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    from gnss_sim_receiver_tpu.models.telemetry import \
        GalileoE6bTelemetryDecoder
    from gnss_sim_receiver_tpu.models.tracking import (TrackingConf,
                                                       TrackingEngine)
    from gnss_sim_receiver_tpu.sim import (SatelliteSignalParams,
                                           generate_baseband)
    sig = signals.GALILEO_E6B
    d = _has_fixture()
    # single-page message (mask + orbit only) repeated: fits page sync +
    # decode within a short capture
    d1 = has_mod.HasData()
    d1.header = has_mod.HasHeader(toh=450, mask_flag=True,
                                  orbit_correction_flag=True, mask_id=9)
    d1.nsys = 1
    d1.gnss_id_mask = [has_mod.GALILEO_SYSTEM]
    d1.satellite_mask = [_sat_mask([2, 4])]
    d1.signal_mask = [0b1010000000000000]
    d1.cell_mask_flag = [False]
    d1.cell_mask = [np.ones((2, 2), bool)]
    d1.nav_message = [0]
    d1.validity_orbit = 5
    d1.gnss_iod = [257, 258]
    d1.delta_radial_m = [0.05, -0.0725]
    d1.delta_in_track_m = [0.024, -0.032]
    d1.delta_cross_track_m = [0.8, 0.056]
    pages = has_mod.mt1_to_pages(d1, message_id=3)
    assert len(pages) == 1
    sym01 = np.concatenate(pages * 4)
    bits = cnav_e6.e6b_epoch_signs(sym01)

    delay_chips = 1234.5
    sat = SatelliteSignalParams(prn=2, system="Galileo", signal="E6",
                                cn0_db_hz=50.0, doppler_hz=-2200.0,
                                delay_chips=delay_chips, nav_bits=bits)
    n_samp = int(FS * 3.6)
    x = generate_baseband([sat], FS, n_samp, noise=True, seed=66)

    prov = lambda p: signals.subchip_table(sig, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=FS, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5, bit_transition_flag=True),
        prns=[2], code_provider=prov, sc_rate=sig.chip_rate_cps)
    res = acq.acquire(x[:acq.n_samples_needed])
    assert bool(res.detected[0])
    exp_delay = delay_chips / sig.chip_rate_cps * FS
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, acq.fft_size - err) <= 3.0

    conf = TrackingConf(fs=FS, code_rate_cps=sig.chip_rate_cps,
                        code_length_chips=sig.code_length_chips,
                        carrier_freq_hz=sig.carrier_freq_hz,
                        early_late_space_chips=0.5, lock_rectify=True,
                        enable_fll_pullin=False, pll_bw_hz=50.0)
    trk = TrackingEngine(conf, prns=[2], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    tlm = GalileoE6bTelemetryDecoder(prns=[2])
    n_done = 0
    while trk.epochs_that_fit(len(x)) > 400 and n_done < 3500:
        outs = trk.process(x, 0, 400)
        tlm.process(outs)
        n_done += 400
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-50:].mean() + 2200.0) < 5.0
    assert len(tlm.has.messages) >= 1, "no HAS message decoded"
    got = tlm.has.messages[0]
    assert got.header.toh == 450
    assert got.prns(0) == [2, 4]
    np.testing.assert_allclose(got.delta_radial_m, d1.delta_radial_m,
                               atol=1e-12)
    np.testing.assert_allclose(got.delta_cross_track_m,
                               d1.delta_cross_track_m, atol=1e-12)


def test_e6_chain_conf_and_factory():
    from gnss_sim_receiver_tpu.models.receiver import galileo_e6b_chain
    from gnss_sim_receiver_tpu.models.telemetry import \
        GalileoE6bTelemetryDecoder
    c = galileo_e6b_chain(FS, prns=(2,), n_channels=1)
    assert c.signal == "E6" and c.system == "Galileo"
    assert isinstance(c.telemetry_decoder([0]), GalileoE6bTelemetryDecoder)
    t = signals.subchip_table(signals.GALILEO_E6B, 2)
    np.testing.assert_array_equal(t, signals.galileo_e6_code(2, "B"))

    from gnss_sim_receiver_tpu.models import factory
    assert "E6" in factory.ALL_SIGNALS
    assert factory._CHAIN_BUILDERS["E6"] is galileo_e6b_chain
    assert "Galileo_E6_PCPS_Acquisition" in factory._ACQ_IMPLS["E6"]
