"""Galileo E5b (7X) chain tests: CS4 secondary-code epoch expansion, the
E5b-I I/NAV telemetry decoder (CS4 sync -> 250-sps symbols -> nav.inav page
decode -> ephemeris with BGD(E1,E5b) scaling + per-epoch TOW), and RF
acquisition + tracking at 10.23 Mcps (reference analogues:
galileo_e5b_pcps_acquisition / galileo_e5b_dll_pll_tracking adapters and
galileo_telemetry_decoder_gs frame_type=3)."""

import numpy as np

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.telemetry import GalileoE5bTelemetryDecoder
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.nav import inav
from gnss_sim_receiver_tpu.nav.ephemeris import GpsEphemeris
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

SIG = signals.GALILEO_E5B_I


def _test_eph(prn=11):
    return GpsEphemeris(
        prn=prn, system="Galileo", week=1045, iod_nav=87,
        toe=345600.0, toc=345600.0,
        af0=-1.1e-4, af1=2.3e-12, af2=0.0,
        bgd_e1e5a=3.49e-9, bgd_e1e5b=4.19e-9,
        sqrt_a=5440.588, ecc=0.000431, m0_sc=0.17, delta_n_sc=1.1e-9,
        omega0_sc=-0.41, i0_sc=0.311, omega_sc=0.53,
        omega_dot_sc=-2.61e-9, idot_sc=-7.3e-11,
        cuc=3.2e-7, cus=-7.7e-6, crc=98.5, crs=12.4,
        cic=1.9e-8, cis=-4.4e-8)


def test_e5b_epoch_signs():
    cs = signals.e5b_secondary_code()
    np.testing.assert_array_equal(cs, [-1.0, -1.0, -1.0, 1.0])
    sym = np.array([1, 0, 1])
    signs = inav.e5b_epoch_signs(sym)
    assert signs.shape == (12,)
    # symbol {0,1} -> +-1, each spread over 4 epochs by CS4
    np.testing.assert_array_equal(signs[:4], cs.astype(np.int8))
    np.testing.assert_array_equal(signs[4:8], -cs.astype(np.int8))


def test_e5b_telemetry_cs4_sync():
    """1 ms-epoch prompts with CS4 spreading -> secondary sync -> I/NAV
    decode -> ephemeris (with the (f_E1/f_E5b)^2 BGD scaling) + TOW."""
    eph = _test_eph(prn=11)
    t0 = 345600.0
    sym = inav.pages_for_ephemeris(eph, t0_gst_s=t0, n_repeats=2)
    epochs = inav.e5b_epoch_signs(sym).astype(np.float64)
    off = 7
    epochs = epochs[off:]
    rng = np.random.default_rng(31)
    soft = 3.0 * epochs + rng.standard_normal(len(epochs))
    tlm = GalileoE5bTelemetryDecoder(prns=[11])
    tow, new_eph = [], []
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
    assert eph2.prn == 11 and eph2.iod_nav == 87
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 2.0 ** -18
    # E5b single-frequency group delay = BGD(E1,E5b) * (f_E1/f_E5b)^2
    exp_tgd = eph2.bgd_e1e5b * (1575.42 / 1207.14) ** 2
    assert abs(eph2.tgd - exp_tgd) < 1e-15
    tow = np.concatenate(tow)
    m = ~np.isnan(tow)
    assert m.sum() > 5_000
    idx = np.flatnonzero(m)
    expected = t0 * 1000.0 + (off + idx + 1) * 1.0
    np.testing.assert_allclose(tow[m], expected, atol=1e-9)


def test_e5b_rf_acquisition_tracking():
    """E5b-I at 10.23 Mcps, 12.5 Msps: acquisition + 1 ms-epoch tracking
    with CS4-spread I/NAV symbols riding as per-epoch signs."""
    fs = 12_500_000.0
    rng = np.random.default_rng(12)
    sym01 = rng.integers(0, 2, 300)
    bits = inav.e5b_epoch_signs(sym01)
    delay_chips = 2500.25
    sat = SatelliteSignalParams(prn=11, system="Galileo", signal="7X",
                                cn0_db_hz=48.0, doppler_hz=1800.0,
                                delay_chips=delay_chips, nav_bits=bits)
    x = generate_baseband([sat], fs, int(fs * 0.9), noise=True, seed=12)

    prov = lambda p: signals.subchip_table(SIG, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5),
        prns=[11], code_provider=prov, sc_rate=SIG.chip_rate_cps)
    res = acq.acquire(x)
    assert bool(res.detected[0])
    exp_delay = delay_chips / SIG.chip_rate_cps * fs
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, acq.fft_size - err) <= 3.0

    conf = TrackingConf(fs=fs, code_rate_cps=SIG.chip_rate_cps,
                        code_length_chips=SIG.code_length_chips,
                        carrier_freq_hz=SIG.carrier_freq_hz,
                        early_late_space_chips=0.5,
                        enable_fll_pullin=False, pll_bw_hz=50.0,
                        fll_pullin_epochs=250)
    trk = TrackingEngine(conf, prns=[11], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    outs = trk.process(x, 0, 800)
    dop = outs["carrier_doppler_hz"][:, 0]
    assert abs(dop[-100:].mean() - 1800.0) < 5.0
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    p = outs["prompt"][-100:, 0]
    assert np.abs(p.real).mean() > 4 * np.abs(p.imag).mean()


def test_e5b_chain_conf():
    from gnss_sim_receiver_tpu.models.receiver import galileo_e5b_chain
    c = galileo_e5b_chain(12_500_000.0, prns=(11,), n_channels=1)
    assert c.signal == "7X" and c.system == "Galileo"
    assert isinstance(c.telemetry_decoder([0]), GalileoE5bTelemetryDecoder)
    t = signals.subchip_table(signals.GALILEO_E5B_I, 11)
    assert t.shape == (10230,)
    np.testing.assert_array_equal(t, signals.galileo_e5b_code(11, "I"))
