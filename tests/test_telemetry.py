"""Telemetry decoding from tracked prompts (reference analogue:
gps_l1_ca_telemetry_decoder_test.cc).

One 13.6 s scenario is shared by the tests (a subframe is 6 s and the first
one overlaps the pull-in transient, so TOW appears after the second)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models.telemetry import TelemetryDecoder
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.nav import lnav
from gnss_sim_receiver_tpu.nav.ephemeris import make_test_constellation
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0
CODE_RATE = 1.023e6
TOW0 = 345600.0
DELAY_CHIPS = 137.6
DOPPLER = 900.0
DUR = 13.6
N_EPOCHS = int(DUR * 1000) - 200


@pytest.fixture(scope="module")
def scenario():
    eph = make_test_constellation(1)[0]
    stream = lnav.frames_for_ephemeris(eph, TOW0, n_frames=3)
    nav_bits = (2 * stream - 1).astype(np.int8)
    sat = SatelliteSignalParams(prn=1, cn0_db_hz=48.0, doppler_hz=DOPPLER,
                                delay_chips=DELAY_CHIPS, nav_bits=nav_bits)
    x = generate_baseband([sat], FS, int(FS * DUR), noise=True, seed=11)
    return x


def _run(x, chunks):
    trk = TrackingEngine(TrackingConf(fs=FS), prns=[1])
    trk.start_tracking(0, DOPPLER + 60.0,
                       int(round(DELAY_CHIPS * FS / CODE_RATE)))
    tlm = TelemetryDecoder(prns=[1])
    tow, cnt = [], []
    for n in chunks:
        outs = trk.process(x, 0, n)
        res = tlm.process(outs)
        tow.append(res.tow_at_epoch_ms[:, 0])
        cnt.append(outs["sample_counter"][:, 0])
    return np.concatenate(tow), np.concatenate(cnt)


def test_tow_decoding_from_tracked_signal(scenario):
    tow_ms, counters = _run(scenario, [N_EPOCHS])
    valid = ~np.isnan(tow_ms)
    assert valid.any(), "no TOW decoded"
    # TOW appears within two subframes + sync margin
    first = np.argmax(valid)
    assert first < 12_800
    # truth: epoch ending at sample s has transmit time
    # tau(s) = (s/fs)(1+fd/fc) - delay; TOW_truth = TOW0 + tau
    idx = np.where(valid)[0]
    s = counters[idx].astype(np.float64)
    tau = (s / FS) * (1 + DOPPLER / 1575.42e6) - DELAY_CHIPS / CODE_RATE
    err_ms = tow_ms[idx] - (TOW0 + tau) * 1000.0
    assert np.max(np.abs(err_ms)) < 0.1, np.max(np.abs(err_ms))


def test_incremental_processing_matches_batch(scenario):
    """Chunked host processing must produce the same TOW stream."""
    a, _ = _run(scenario, [N_EPOCHS])
    thirds = [N_EPOCHS // 3, N_EPOCHS // 3, N_EPOCHS - 2 * (N_EPOCHS // 3)]
    b, _ = _run(scenario, thirds)
    tail_a, tail_b = a[-500:], b[-500:]
    assert not np.isnan(tail_a).any()
    np.testing.assert_allclose(tail_a, tail_b, rtol=0, atol=1e-9)


def test_tlm_crc_stats_counters(tmp_path):
    """TlmCrcStats (reference tlm_crc_stats.cc role): CRC outcomes are
    counted per channel and dumped."""
    from gnss_sim_receiver_tpu.models.telemetry import TlmCrcStats, _note_crc

    class _D:
        pass

    d = _D()
    d.crc_stats = TlmCrcStats()
    for ok in (True, True, False, True):
        _note_crc(d, 0, ok)
    _note_crc(d, 3, False)
    assert d.crc_stats.total[0] == 4 and d.crc_stats.ok[0] == 3
    assert abs(d.crc_stats.rate(0) - 0.75) < 1e-12
    assert d.crc_stats.rate(3) == 0.0
    p = tmp_path / "crc.txt"
    d.crc_stats.write(p)
    lines = p.read_text().splitlines()
    assert lines[0].split() == ["channel", "ok", "total", "rate"]
    assert "0 3 4 0.7500" in lines[1]
    # decoder without stats attached: no-op
    _note_crc(_D(), 0, True)
