"""BeiDou B3I chain tests: code-generator cross-check against an
independent integer-register LFSR implementation, code-family statistics,
RF acquisition + tracking at 10.23 Mcps, and chain configuration
(reference analogues: beidou_b3i_pcps_acquisition /
beidou_b3i_dll_pll_tracking adapters + beidou_b3i_signal_replica)."""

import numpy as np

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.telemetry import BeidouB1iTelemetryDecoder
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.nav import dnav
from gnss_sim_receiver_tpu.ops import prn_codes_multi as pcm
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

SIG = signals.BEIDOU_B3I


def _b3i_reference_bits(prn: int, n: int) -> np.ndarray:
    """Independent scalar implementation with integer registers (bit i of
    the int = LFSR cell i), used only to cross-check the library's
    vectorized generator."""

    def step(s, taps):
        fb = 0
        for t in taps:
            fb ^= (s >> t) & 1
        return (s >> 1) | (fb << 12)

    g1, g2 = 0x1FFF, pcm._B3I_G2_INIT[prn - 1]
    out = np.empty(n, np.int8)
    for i in range(n):
        out[i] = (g1 & 1) ^ (g2 & 1)
        g1 = step(g1, (0, 9, 10, 12))
        g2 = step(g2, (0, 1, 3, 4, 6, 7, 8, 12))
        if g1 == 0x1FFC:      # cells 2..12 set, cells 0..1 clear
            g1 = 0x1FFF
    return out


def test_b3i_code_cross_check():
    for prn in (1, 13, 34, 63):
        lib = pcm.beidou_b3i_code(prn)
        ref = 2.0 * _b3i_reference_bits(prn, 10230) - 1.0
        np.testing.assert_array_equal(lib, ref.astype(np.float32))


def test_b3i_code_family_statistics():
    codes = np.stack([pcm.beidou_b3i_code(p) for p in range(1, 11)])
    assert codes.shape == (10, 10230)
    # near-balanced, unit power, low cross-correlation
    assert np.abs(codes.sum(axis=1)).max() < 200
    np.testing.assert_allclose((codes ** 2).sum(axis=1), 10230.0)
    xc = codes @ codes.T / 10230.0
    off = xc - np.diag(np.diag(xc))
    assert np.abs(off).max() < 0.05


def test_b3i_rf_acquisition_tracking():
    """B3I at 10.23 Mcps, 12.5 Msps: acquisition + 1 ms-epoch tracking with
    NH20-spread D1 bits riding as per-epoch signs."""
    fs = 12_500_000.0
    rng = np.random.default_rng(33)
    bits01 = rng.integers(0, 2, 64)
    epochs = dnav.b1i_epoch_signs(bits01)    # same NH20/D1 layer as B1I
    delay_chips = 7000.5
    sat = SatelliteSignalParams(prn=21, system="BeiDou", signal="B3",
                                cn0_db_hz=48.0, doppler_hz=-2700.0,
                                delay_chips=delay_chips, nav_bits=epochs)
    x = generate_baseband([sat], fs, int(fs * 0.9), noise=True, seed=33)

    prov = lambda p: signals.subchip_table(SIG, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5, bit_transition_flag=True),
        prns=[21], code_provider=prov, sc_rate=SIG.chip_rate_cps)
    res = acq.acquire(x)
    assert bool(res.detected[0])
    exp_delay = delay_chips / SIG.chip_rate_cps * fs
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, acq.fft_size - err) <= 3.0

    conf = TrackingConf(fs=fs, code_rate_cps=SIG.chip_rate_cps,
                        code_length_chips=SIG.code_length_chips,
                        carrier_freq_hz=SIG.carrier_freq_hz,
                        early_late_space_chips=0.5, pll_bw_hz=40.0,
                        enable_fll_pullin=False, fll_pullin_epochs=100)
    trk = TrackingEngine(conf, prns=[21], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    outs = trk.process(x, 0, 800)
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-100:].mean() + 2700.0) < 5.0
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    p = outs["prompt"][-100:, 0]
    assert np.abs(p.real).mean() > 4 * np.abs(p.imag).mean()


def test_b3i_chain_conf():
    from gnss_sim_receiver_tpu.models.receiver import beidou_b3i_chain
    c = beidou_b3i_chain(12_500_000.0, prns=(21,), n_channels=1)
    assert c.signal == "B3" and c.system == "BeiDou"
    # B3I reuses the D1/NH20 telemetry layer
    assert isinstance(c.telemetry_decoder([0]), BeidouB1iTelemetryDecoder)
    t = signals.subchip_table(signals.BEIDOU_B3I, 21)
    assert t.shape == (10230,)
    np.testing.assert_array_equal(t, pcm.beidou_b3i_code(21))
