"""PCPS acquisition on simulated signals (reference analogue:
src/tests/unit-tests/signal-processing-blocks/acquisition/
gps_l1_ca_pcps_acquisition_test.cc)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models.acquisition import AcqConf, PcpsAcquisitionEngine
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0


def _scenario(prns, dopplers, delays_chips, cn0=47.0, n_ms=4, noise=True,
              seed=1):
    sats = [SatelliteSignalParams(prn=p, cn0_db_hz=cn0, doppler_hz=d,
                                  delay_chips=dc)
            for p, d, dc in zip(prns, dopplers, delays_chips)]
    x = generate_baseband(sats, FS, int(FS * n_ms * 1e-3), noise=noise,
                          seed=seed)
    return x


def test_single_satellite_detection():
    x = _scenario([7], [1250.0], [300.5])
    eng = PcpsAcquisitionEngine(AcqConf(fs_in=FS, max_dwells=2), prns=[7])
    res = eng.acquire(x)
    assert bool(res.detected[0])
    assert abs(res.doppler_hz[0] - 1250.0) <= 250.0
    expected_delay = 300.5 * FS / 1.023e6
    err = abs(res.delay_samples[0] - expected_delay)
    assert min(err, eng.fft_size - err) <= 2.0


def test_absent_satellite_not_detected():
    x = _scenario([7], [1250.0], [300.5])
    eng = PcpsAcquisitionEngine(AcqConf(fs_in=FS, max_dwells=2), prns=[13])
    res = eng.acquire(x)
    assert not bool(res.detected[0])


def test_batched_multichannel_acquisition():
    prns = [3, 7, 11, 19, 28]
    dops = [-3750.0, -1000.0, 0.0, 2250.0, 4900.0]
    delays = [10.0, 300.5, 511.25, 700.0, 1000.75]
    x = _scenario(prns, dops, delays, n_ms=4)
    # search present PRNs plus two absent ones
    search = prns + [2, 22]
    eng = PcpsAcquisitionEngine(AcqConf(fs_in=FS, max_dwells=2), prns=search)
    res = eng.acquire(x)
    for i, (p, d, dc) in enumerate(zip(prns, dops, delays)):
        assert bool(res.detected[i]), f"PRN {p} missed"
        assert abs(res.doppler_hz[i] - d) <= 250.0, f"PRN {p} doppler"
        exp = dc * FS / 1.023e6
        err = abs(res.delay_samples[i] - exp)
        assert min(err, eng.fft_size - err) <= 2.0, f"PRN {p} delay"
    assert not res.detected[5] and not res.detected[6]


def test_first_vs_second_peak_statistic():
    x = _scenario([9], [-2000.0], [123.0])
    conf = AcqConf(fs_in=FS, max_dwells=2, use_cfar_algorithm=False, pfa=0.0,
                   threshold=2.0)
    eng = PcpsAcquisitionEngine(conf, prns=[9, 17])
    res = eng.acquire(x)
    assert bool(res.detected[0])
    assert not bool(res.detected[1])


def test_two_step_doppler_refinement():
    x = _scenario([5], [1375.0], [42.0], noise=False)
    conf = AcqConf(fs_in=FS, max_dwells=2, make_two_steps=True,
                   doppler_step2=62.5, num_doppler_bins_step2=4)
    eng = PcpsAcquisitionEngine(conf, prns=[5])
    res = eng.acquire(x)
    assert bool(res.detected[0])
    assert abs(res.doppler_hz[0] - 1375.0) <= 62.5


def test_cfar_pfa_controls_false_alarms():
    rng = np.random.default_rng(0)
    noise_only = (rng.standard_normal(8000) + 1j * rng.standard_normal(8000)
                  ).astype(np.complex64) * np.sqrt(0.5)
    eng = PcpsAcquisitionEngine(
        AcqConf(fs_in=FS, pfa=1e-3, max_dwells=2),
        prns=list(range(1, 23)))
    res = eng.acquire(noise_only)
    # 22 channels x Pfa 1e-3 -> expected false alarms ~0.02
    assert int(res.detected.sum()) == 0
