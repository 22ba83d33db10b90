"""GLONASS L1 C/A receiver-chain tests: single-slot RF end-to-end (GNAV
symbols -> baseband -> acquisition -> tracking -> telemetry -> ECEF
ephemeris + TOW) and FDMA two-slot acquisition via per-slot Doppler
centers (the reference's d_doppler_bias = DFRQ1_GLO*k,
pcps_acquisition.cc:211-230)."""

import numpy as np

from gnss_sim_receiver_tpu import constants, signals
from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.telemetry import GlonassTelemetryDecoder
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine
from gnss_sim_receiver_tpu.nav import gnav
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

SIG = signals.GLONASS_L1_CA
DF = constants.GLONASS_L1_DFREQ_HZ


def _test_eph(slot=5, k=0):
    r = 25_508_000.0
    v = np.sqrt(gnav._GM / r)
    return gnav.GlonassEphemeris(
        prn=slot, freq_slot=k, tb_s=345600.0 + 900.0,
        pos_m=(r * 0.6, r * 0.64, r * 0.48),
        vel_ms=(-v * 0.5, v * 0.1, v * 0.49),
        acc_ms2=(1.9e-9, -2.4e-9, 0.9e-9),
        tau_n=-4.7e-5, gamma_n=1.8e-12)


def _prov(_prn):
    return signals.subchip_table(SIG, _prn)


def test_glonass_l1_ca_end_to_end():
    fs = 2_000_000.0
    eph = _test_eph(slot=5, k=0)
    t0 = 345600.0
    sym = gnav.strings_for_ephemeris(eph, t0_s=t0, n_repeats=2)
    bits = (2 * sym - 1).astype(np.int8)      # 100 sps meander halves
    delay_chips = 217.25
    sat = SatelliteSignalParams(prn=5, system="GLONASS", signal="1G",
                                cn0_db_hz=46.0, doppler_hz=-1400.0,
                                delay_chips=delay_chips, nav_bits=bits)
    # frame 1's string 1 passes during pull-in; the ephemeris set completes
    # with frame 2's strings 1-4 (frames are 30 s)
    dur = 38.5
    x = generate_baseband([sat], fs, int(fs * dur), noise=True, seed=8)

    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5),
        prns=[5], code_provider=_prov, sc_rate=SIG.chip_rate_cps)
    res = acq.acquire(x)
    assert bool(res.detected[0])
    exp_delay = delay_chips / SIG.chip_rate_cps * fs
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, acq.fft_size - err) <= 3.0

    conf = TrackingConf(fs=fs, code_rate_cps=SIG.chip_rate_cps,
                        code_length_chips=SIG.code_length_chips,
                        carrier_freq_hz=SIG.carrier_freq_hz,
                        early_late_space_chips=0.5, lock_rectify=True,
                        enable_fll_pullin=True, fll_pullin_epochs=400)
    trk = TrackingEngine(conf, prns=[5], code_provider=_prov)
    trk.start_tracking(0, float(res.doppler_hz[0]),
                       int(res.samplestamp + res.delay_samples[0]))
    day = np.floor(t0 / 86400.0) * 86400.0
    tlm = GlonassTelemetryDecoder(prns=[5], freq_slots={5: 0},
                                  day_base_s=day)
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
    assert abs(outs["carrier_doppler_hz"][-1, 0] + 1400.0) < 3.0
    assert len(new_eph) == 1
    c, eph2 = new_eph[0]
    assert eph2.prn == 5 and eph2.system == "GLONASS"
    assert eph2.tb_s == eph.tb_s
    p1, c1 = eph.sat_pos_clock(eph.tb_s + 200.0)
    p2, c2 = eph2.sat_pos_clock(eph.tb_s + 200.0)
    assert np.linalg.norm(np.asarray(p1) - np.asarray(p2)) < 3.0
    assert abs(c1 - c2) < 2e-9

    tow = np.concatenate(tow)
    ctr = np.concatenate(ctr)[: len(tow)]
    m = ~np.isnan(tow)
    assert m.sum() > 1000
    delay_s = delay_chips / SIG.chip_rate_cps
    expected_ms = (t0 + ctr[m] / fs - delay_s) * 1000.0
    err_ms = tow[m] - expected_ms
    assert np.max(np.abs(err_ms)) < 1.0, (err_ms.min(), err_ms.max())


def test_glonass_fdma_two_slots():
    """Two satellites on different frequency slots in one capture: each
    slot acquires with its own Doppler center = k*562.5 kHz and both track
    concurrently (FDMA channel model)."""
    fs = 4_000_000.0
    rng = np.random.default_rng(4)
    syms = (rng.integers(0, 2, 4000) * 2 - 1).astype(np.int8)
    sats = [
        SatelliteSignalParams(prn=3, system="GLONASS", signal="1G",
                              cn0_db_hz=46.0, doppler_hz=-DF + 800.0,
                              delay_chips=100.5, nav_bits=syms),
        SatelliteSignalParams(prn=9, system="GLONASS", signal="1G",
                              cn0_db_hz=46.0, doppler_hz=+DF - 1300.0,
                              delay_chips=310.25, nav_bits=syms.copy()),
    ]
    x = generate_baseband(sats, fs, int(fs * 1.2), noise=True, seed=4)
    # same 511-chip code on both; only the slot separates them
    for k, prn, true_dopp, true_delay in (
            (-1, 3, 800.0, 100.5), (+1, 9, -1300.0, 310.25)):
        acq = PcpsAcquisitionEngine(
            AcqConf(fs_in=fs, sampled_ms=1, doppler_max=4000.0,
                    doppler_step=250.0, doppler_center=k * DF,
                    max_dwells=2, make_two_steps=True, doppler_step2=62.5),
            prns=[prn], code_provider=_prov, sc_rate=SIG.chip_rate_cps)
        res = acq.acquire(x)
        assert bool(res.detected[0]), (k, res.test_stat)
        assert abs(res.doppler_hz[0] - (k * DF + true_dopp)) <= 70.0
        exp = true_delay / SIG.chip_rate_cps * fs
        err = abs(res.delay_samples[0] - exp)
        assert min(err, acq.fft_size - err) <= 3.0
        conf = TrackingConf(fs=fs, code_rate_cps=SIG.chip_rate_cps,
                            code_length_chips=SIG.code_length_chips,
                            carrier_freq_hz=SIG.carrier_freq_hz + k * DF,
                            early_late_space_chips=0.5, lock_rectify=True,
                            enable_fll_pullin=True, fll_pullin_epochs=150)
        trk = TrackingEngine(conf, prns=[prn], code_provider=_prov)
        trk.start_tracking(0, float(res.doppler_hz[0]),
                           int(res.samplestamp + res.delay_samples[0]))
        outs = trk.process(x, 0, 1000)
        assert not bool(np.asarray(trk.state.lock_lost)[0])
        # tracked doppler includes the slot offset
        assert abs(outs["carrier_doppler_hz"][-100:, 0].mean()
                   - (k * DF + true_dopp)) < 6.0


def test_glonass_chain_conf():
    from gnss_sim_receiver_tpu.models.receiver import glonass_l1_chain
    c = glonass_l1_chain(4_000_000.0, prns=(3, 9), freq_slot=-1)
    assert c.signal == "1G" and c.system == "GLONASS"
    assert c.acq.doppler_center == -DF
    assert c.trk.carrier_freq_hz == SIG.carrier_freq_hz - DF
    assert c.trk.lock_rectify and c.trk.enable_fll_pullin
    d = c.telemetry_decoder([0, 0])
    assert isinstance(d, GlonassTelemetryDecoder)
    assert d.freq_slots == {3: -1, 9: -1}
