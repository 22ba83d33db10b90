"""GPS L2C / L5 CNAV receiver-chain tests (reference analogues:
gps_l2_m_pcps_acquisition_test.cc + the L2C/L5 telemetry decoders).

- L2C: full RF chain — CNAV symbol stream -> CM baseband -> acquisition ->
  20 ms-epoch tracking -> GpsCnavTelemetryDecoder -> ephemeris + TOW.
- L5: telemetry-level — NH10-spread epochs (valid tracking assumed, which
  test_hybrid_and_l5 covers at RF level) -> NH sync -> CNAV decode.
"""

import numpy as np

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.telemetry import GpsCnavTelemetryDecoder
from gnss_sim_receiver_tpu.nav import cnav
from gnss_sim_receiver_tpu.nav.ephemeris import GpsEphemeris
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband


def _test_eph(prn=7):
    return GpsEphemeris(
        prn=prn, week=2200, toe=345600.0, toc=345600.0,
        af0=-3.1e-4, af1=-6.2e-12, tgd=-8.4e-9,
        sqrt_a=np.sqrt(26_560_123.0), ecc=0.0123, m0_sc=0.42,
        delta_n_sc=1.5e-9, omega_sc=-0.66, omega0_sc=0.31, i0_sc=0.305,
        omega_dot_sc=-2.51e-9, idot_sc=1.1e-10,
        cuc=-4.5e-7, cus=8.9e-6, crc=212.5, crs=-18.4)


def test_l2c_cnav_end_to_end():
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    from gnss_sim_receiver_tpu.models.tracking import (TrackingConf,
                                                       TrackingEngine)
    fs = 1_600_000.0
    sig = signals.GPS_L2C_CM
    eph = _test_eph(prn=7)
    t0 = 345600.0
    sym = cnav.symbols_for_ephemeris(eph, t0, n_repeats=2, bps=25.0)
    bits = (2 * sym - 1).astype(np.int8)      # 50 sps, one per 20 ms epoch
    delay_chips = 4321.5
    sat = SatelliteSignalParams(prn=7, system="GPS", signal="2S",
                                cn0_db_hz=45.0, doppler_hz=900.0,
                                delay_chips=delay_chips, nav_bits=bits)
    dur = 41.0   # first full message needs the 18 s Viterbi window + 12 s
    x = generate_baseband([sat], fs, int(fs * dur), noise=True, seed=3)

    prov = lambda p: signals.subchip_table(sig, p)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, sampled_ms=20, doppler_max=2000.0,
                doppler_step=60.0, max_dwells=1, make_two_steps=True,
                doppler_step2=15.0, bit_transition_flag=True),
        prns=[7], code_provider=prov, sc_rate=sig.chip_rate_cps)
    res = acq.acquire(x)
    assert bool(res.detected[0])
    assert abs(res.doppler_hz[0] - 900.0) <= 16.0
    exp_delay = delay_chips / sig.chip_rate_cps * fs
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, acq.fft_size - err) <= 2.0

    conf = TrackingConf(fs=fs, code_rate_cps=sig.chip_rate_cps,
                        code_length_chips=sig.code_length_chips,
                        carrier_freq_hz=sig.carrier_freq_hz,
                        early_late_space_chips=0.5, pll_bw_hz=8.0,
                        dll_bw_hz=0.75, enable_fll_pullin=False,
                        fll_pullin_epochs=25, cn0_window_epochs=20)
    trk = TrackingEngine(conf, prns=[7], code_provider=prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    tlm = GpsCnavTelemetryDecoder(prns=[7], signal="2S")
    n_epochs = trk.epochs_that_fit(len(x))
    assert n_epochs > 1900
    tow = []
    counters = []
    new_eph = []
    done = 0
    while done < n_epochs:
        n = min(500, n_epochs - done)
        outs = trk.process(x, 0, n)
        r = tlm.process(outs)
        tow.append(r.tow_at_epoch_ms[:, 0])
        counters.append(outs["sample_counter"][:, 0])
        new_eph.extend(r.new_ephemerides)
        done += n
    assert not bool(np.asarray(trk.state.lock_lost)[0])
    assert abs(outs["carrier_doppler_hz"][-1, 0] - 900.0) < 2.0
    assert len(new_eph) == 1
    c, eph2 = new_eph[0]
    assert c == 0 and eph2.prn == 7
    assert abs(eph2.sqrt_a ** 2 - eph.sqrt_a ** 2) < 2.0 ** -9
    assert abs(eph2.tgd - eph.tgd) < 2.0 ** -34

    tow = np.concatenate(tow)
    counter = np.concatenate(counters)[: len(tow)]
    m = ~np.isnan(tow)
    assert m.sum() > 500
    delay_s = delay_chips / sig.chip_rate_cps
    expected_ms = (t0 + counter[m] / fs - delay_s) * 1000.0
    err_ms = tow[m] - expected_ms
    assert np.max(np.abs(err_ms)) < 1.0, (err_ms.min(), err_ms.max())


def _fake_track_outs(prompt_i, chunk):
    t = len(prompt_i)
    return {"prompt": (prompt_i + 0j).reshape(t, 1),
            "valid": np.ones((t, 1), bool)}


def test_l5_cnav_telemetry_nh_sync():
    """NH10 sync + 100-sps symbol formation + CNAV decode from 1 ms-epoch
    prompts (the L5 telemetry decoder role; RF-level L5 tracking is covered
    by test_hybrid_and_l5)."""
    eph = _test_eph(prn=4)
    t0 = 345600.0
    sym = cnav.symbols_for_ephemeris(eph, t0, n_repeats=2, bps=50.0)
    epochs = cnav.l5i_epoch_signs(sym).astype(np.float64)
    # drop a partial-symbol prefix (tracking locks mid-symbol) + noise
    off = 7
    epochs = epochs[off:]
    rng = np.random.default_rng(11)
    soft = 3.0 * epochs + rng.standard_normal(len(epochs))
    tlm = GpsCnavTelemetryDecoder(prns=[4], signal="L5")
    tow = []
    new_eph = []
    i = 0
    while i < len(soft):
        n = int(rng.integers(300, 1500))
        r = tlm.process(_fake_track_outs(soft[i:i + n], n))
        tow.append(r.tow_at_epoch_ms[:, 0])
        new_eph.extend(r.new_ephemerides)
        i += n
    assert len(new_eph) == 1
    eph2 = new_eph[0][1]
    assert abs(eph2.sqrt_a ** 2 - eph.sqrt_a ** 2) < 2.0 ** -9
    tow = np.concatenate(tow)
    m = ~np.isnan(tow)
    assert m.sum() > 3000
    # epoch e (0-based, stream-relative after the off cut) ends at
    # t0 + (off + e + 1) ms of transmit time
    idx = np.flatnonzero(m)
    expected = (t0 * 1000.0) + (off + idx + 1) * 1.0
    np.testing.assert_allclose(tow[m], expected, atol=1e-9)


def test_l2c_l5_chain_confs():
    from gnss_sim_receiver_tpu.models.receiver import (gps_l2c_chain,
                                                       gps_l5_chain)
    c2 = gps_l2c_chain(2_500_000.0, prns=(1, 2), n_channels=2)
    c5 = gps_l5_chain(12_500_000.0, prns=(3,), n_channels=1)
    assert c2.signal == "2S" and c5.signal == "L5"
    assert c2.trk.nominal_epoch_samples == 50_000       # 20 ms at 2.5 Msps
    assert c5.trk.nominal_epoch_samples == 12_500       # 1 ms at 12.5 Msps
    d2 = c2.telemetry_decoder([0, 0])
    d5 = c5.telemetry_decoder([0])
    assert isinstance(d2, GpsCnavTelemetryDecoder) and d2.signal == "2S"
    assert isinstance(d5, GpsCnavTelemetryDecoder) and d5.signal == "L5"
