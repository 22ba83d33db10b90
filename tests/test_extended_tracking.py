"""Extended coherent integration (tracking states 2->3->4 with on-device
bit sync; reference extend_correlation_symbols path)."""

import numpy as np

from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0
CODE_RATE = 1.023e6


def _run(ext, x, delay_chips, doppler):
    conf = TrackingConf(fs=FS, extend_correlation_symbols=ext,
                        fll_pullin_epochs=400, pll_bw_hz=25.0,
                        carrier_lock_threshold=0.80)
    trk = TrackingEngine(conf, prns=[7])
    trk.start_tracking(0, doppler + 60.0,
                       int(round(delay_chips * FS / CODE_RATE)))
    outs = trk.process(x, 0, 3000)
    return outs, trk


def test_extended_integration_reduces_jitter_at_low_cn0():
    rng = np.random.default_rng(6)
    bits = (rng.integers(0, 2, 1500) * 2 - 1).astype(np.int8)
    sat = SatelliteSignalParams(prn=7, cn0_db_hz=34.0, doppler_hz=800.0,
                                delay_chips=300.0, nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * 3.2), noise=True, seed=2)

    outs1, trk1 = _run(1, x, 300.0, 800.0)
    outs10, trk10 = _run(10, x, 300.0, 800.0)

    assert not bool(np.asarray(trk1.state.lock_lost)[0])
    assert not bool(np.asarray(trk10.state.lock_lost)[0])
    # bit sync achieved in extended mode (delay < 1 code period -> phase 0)
    assert bool(np.asarray(trk10.state.bit_synced)[0])
    assert int(np.asarray(trk10.state.bit_phase)[0]) == 0
    # both still track the carrier
    d1 = outs1["carrier_doppler_hz"][-500:, 0]
    d10 = outs10["carrier_doppler_hz"][-500:, 0]
    assert abs(d1.mean() - 800.0) < 3.0
    assert abs(d10.mean() - 800.0) < 3.0
    # coherent extension cuts the Doppler jitter at least in half
    assert d10.std() < 0.5 * d1.std(), (d1.std(), d10.std())


def test_bit_phase_matches_signal_delay():
    """Delay of 5.5 code periods -> bit boundaries at epoch % 20 == 5|6."""
    rng = np.random.default_rng(9)
    bits = (rng.integers(0, 2, 1500) * 2 - 1).astype(np.int8)
    delay_chips = 5.5 * 1023
    sat = SatelliteSignalParams(prn=7, cn0_db_hz=45.0, doppler_hz=-500.0,
                                delay_chips=delay_chips, nav_bits=bits)
    x = generate_baseband([sat], FS, int(FS * 3.2), noise=True, seed=3)
    # start like the acquisition handoff does: at the code boundary within
    # the FIRST code period (delay mod one period = 0.5 periods), so the
    # first tracked epoch begins at transmit time tau = -5 ms
    outs, trk = _run(10, x, 0.5 * 1023, -500.0)
    assert bool(np.asarray(trk.state.bit_synced)[0])
    phase = int(np.asarray(trk.state.bit_phase)[0])
    # bit boundaries (tau = 20k ms) then land on epochs == 5 (mod 20)
    assert phase == 5, phase
