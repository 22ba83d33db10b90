"""SBAS L1 tests: PRN code family, 250-bit message codec (CRC-24Q,
cycling preambles), MT9 GEO navigation payload, the streaming
Viterbi/preamble/CRC decoder, the telemetry decoder's epoch-pairing
hypotheses, and an RF end-to-end run.

Reference analogues: sbas_l1_telemetry_decoder_gs.cc (Sample_Aligner,
Symbol_Aligner_And_Decoder, Frame_Detector, Crc_Verifier),
sbas_ephemeris.cc, gps_sdr_signal_replica.cc SBAS delay table."""

import numpy as np

from gnss_sim_receiver_tpu.nav import sbas
from gnss_sim_receiver_tpu.ops import prn_codes

FS = 4_092_000.0


def test_sbas_code_family():
    c120 = prn_codes.sbas_l1_code(120)
    assert c120.shape == (1023,) and set(np.unique(c120)) <= {-1.0, 1.0}
    c122 = prn_codes.sbas_l1_code(122)
    # low cross-correlation within the family and against GPS C/A
    assert abs(np.dot(c120, c122)) < 0.1 * 1023
    assert abs(np.dot(c120, prn_codes.gps_l1_ca_code(1))) < 0.1 * 1023
    # balanced (Gold-code property: near-zero DC)
    assert abs(c120.sum()) <= 1.0 + 1e-6


def test_message_roundtrip_all_preambles():
    rng = np.random.default_rng(0)
    for k in range(3):
        payload = rng.integers(0, 2, 212)
        msg = sbas.pack_message(63, payload, preamble_idx=k)
        assert msg.shape == (250,)
        np.testing.assert_array_equal(msg[:8], sbas.PREAMBLES[k])
        ok, mt, out = sbas.unpack_message(msg)
        assert ok and mt == 63
        np.testing.assert_array_equal(out, payload)
    # corrupting any bit breaks the CRC
    msg[100] ^= 1
    ok, _, _ = sbas.unpack_message(msg)
    assert not ok


def test_mt9_geo_nav_roundtrip():
    nav = sbas.SbasGeoNav(
        iodn=17, t0_s=70_400.0, ura=2,
        pos_m=(24_801_234.08, -34_087_912.4, 12_512.8),
        vel_ms=(1.25, -0.625, 0.4), acc_ms2=(0.000125, -0.0000625, 0.0),
        agf0_s=3.2e-7, agf1_ss=-4.0e-11)
    out = sbas.parse_mt9(sbas.pack_mt9(nav))
    assert out.iodn == 17 and out.t0_s == 70_400.0 and out.ura == 2
    np.testing.assert_allclose(out.pos_m[:2], nav.pos_m[:2], atol=0.08)
    assert abs(out.pos_m[2] - nav.pos_m[2]) <= 0.4
    np.testing.assert_allclose(out.vel_ms[:2], nav.vel_ms[:2],
                               atol=0.000625)
    assert abs(out.vel_ms[2] - nav.vel_ms[2]) <= 0.004
    assert abs(out.agf0_s - nav.agf0_s) <= 2.0 ** -31
    # quadratic propagation
    p = sbas.geo_nav_pos(out, 70_500.0)
    assert abs(p[0] - (nav.pos_m[0] + 100 * 1.25
                       + 0.5 * 1e4 * 0.000125)) < 1.0


def test_streaming_decoder_inverted_offset():
    rng = np.random.default_rng(1)
    payloads = [rng.integers(0, 2, 212) for _ in range(6)]
    msgs = [(9 if i == 2 else 2 + i, p) for i, p in enumerate(payloads)]
    syms = sbas.symbols_for_messages(msgs)
    soft = (2.0 * syms - 1.0) * 2.0 + rng.standard_normal(len(syms)) * 0.7
    # polarity inversion + odd symbol offset (parity hypothesis)
    stream = -np.concatenate([rng.standard_normal(3) * 0.1, soft])
    dec = sbas.SbasMessageDecoder()
    evs = dec.push_symbols(stream)
    assert len(evs) >= 4
    assert all(e.crc_ok for e in evs)
    # preamble indices cycle 0,1,2,0,...
    pre = [e.preamble_idx for e in evs]
    assert pre == [(pre[0] + i) % 3 for i in range(len(pre))]
    got = {e.msg_type: e.payload for e in evs}
    assert 9 in got
    np.testing.assert_array_equal(got[9], payloads[2])
    assert dec.geo_nav is not None   # MT9 parsed


def test_telemetry_decoder_epoch_pairing():
    from gnss_sim_receiver_tpu.models.telemetry import SbasL1TelemetryDecoder
    rng = np.random.default_rng(2)
    nav = sbas.SbasGeoNav(iodn=3, t0_s=64_000.0, pos_m=(2.6e7, -3.2e7, 0.0))
    msgs = [(9, sbas.pack_mt9(nav)), (2, rng.integers(0, 2, 212)),
            (3, rng.integers(0, 2, 212)), (9, sbas.pack_mt9(nav)),
            (4, rng.integers(0, 2, 212))]
    syms = sbas.symbols_for_messages(msgs)
    epochs = sbas.sbas_epoch_signs(syms).astype(np.float64)
    # odd epoch offset: the symbol pairing phase is the OTHER hypothesis
    soft = np.concatenate([[0.5], 3.0 * epochs
                           + rng.standard_normal(len(epochs)) * 0.6])
    tlm = SbasL1TelemetryDecoder(prns=[122])
    i = 0
    while i < len(soft):
        n = min(803, len(soft) - i)
        outs = {"prompt": (soft[i:i + n] + 0j).reshape(-1, 1),
                "valid": np.ones((n, 1), bool)}
        tlm.process(outs)
        i += n
    mts = [ev.msg_type for _, _, ev in tlm.messages]
    assert 9 in mts and len(mts) >= 3
    gn = tlm.geo_nav(0)
    assert gn is not None and gn.iodn == 3
    assert abs(gn.pos_m[0] - 2.6e7) < 0.1


def test_sbas_rf_end_to_end():
    """Simulated SBAS L1 PRN 122 -> acquisition -> tracking -> message +
    MT9 GEO nav decode."""
    from gnss_sim_receiver_tpu import signals
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    from gnss_sim_receiver_tpu.models.telemetry import SbasL1TelemetryDecoder
    from gnss_sim_receiver_tpu.models.tracking import (TrackingConf,
                                                       TrackingEngine)
    from gnss_sim_receiver_tpu.sim import (SatelliteSignalParams,
                                           generate_baseband)
    sig = signals.SBAS_L1
    rng = np.random.default_rng(3)
    nav = sbas.SbasGeoNav(iodn=7, t0_s=72_000.0,
                          pos_m=(24.8e6, -34.1e6, 9000.0),
                          vel_ms=(0.5, 0.25, 0.0))
    msgs = [(9, sbas.pack_mt9(nav)), (2, rng.integers(0, 2, 212)),
            (9, sbas.pack_mt9(nav)), (3, rng.integers(0, 2, 212))]
    bits = sbas.sbas_epoch_signs(sbas.symbols_for_messages(msgs))

    sat = SatelliteSignalParams(prn=122, system="SBAS", signal="S1",
                                cn0_db_hz=47.0, doppler_hz=950.0,
                                delay_chips=300.75, nav_bits=bits)
    n_samp = int(FS * 3.9)
    x = generate_baseband([sat], FS, n_samp, noise=True, seed=33)

    prov = lambda p: signals.subchip_table(sig, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=FS, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5, bit_transition_flag=True),
        prns=[122], code_provider=prov, sc_rate=sig.chip_rate_cps)
    res = acq.acquire(x[:acq.n_samples_needed])
    assert bool(res.detected[0])

    conf = TrackingConf(fs=FS, code_rate_cps=sig.chip_rate_cps,
                        code_length_chips=sig.code_length_chips,
                        carrier_freq_hz=sig.carrier_freq_hz,
                        early_late_space_chips=0.5, pll_bw_hz=40.0,
                        lock_rectify=True, enable_fll_pullin=False)
    trk = TrackingEngine(conf, prns=[122], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    tlm = SbasL1TelemetryDecoder(prns=[122])
    n_done = 0
    while trk.epochs_that_fit(len(x)) > 400 and n_done < 3800:
        outs = trk.process(x, 0, 400)
        tlm.process(outs)
        n_done += 400
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-50:].mean() - 950.0) < 5.0
    assert tlm.messages, "no SBAS message decoded on RF"
    assert all(ev.crc_ok for _, _, ev in tlm.messages)
    gn = tlm.geo_nav(0)
    assert gn is not None and gn.iodn == 7
    assert abs(gn.pos_m[0] - 24.8e6) < 0.1


def test_sbas_chain_conf_and_factory():
    from gnss_sim_receiver_tpu.models.receiver import sbas_l1_chain
    from gnss_sim_receiver_tpu.models.telemetry import SbasL1TelemetryDecoder
    c = sbas_l1_chain(FS, prns=(122,), n_channels=1)
    assert c.signal == "S1" and c.system == "SBAS"
    assert isinstance(c.telemetry_decoder([122]), SbasL1TelemetryDecoder)
    from gnss_sim_receiver_tpu.models import factory
    assert "S1" in factory.ALL_SIGNALS
    assert factory._CHAIN_BUILDERS["S1"] is sbas_l1_chain
    assert "SBAS_L1_PCPS_Acquisition" in factory._ACQ_IMPLS["S1"]
