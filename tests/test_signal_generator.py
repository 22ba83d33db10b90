"""Simulator sanity: power calibration, spectral content, chunked streaming
determinism."""

import numpy as np

from gnss_sim_receiver_tpu.sim import (SatelliteSignalParams, cn0_to_amplitude,
                                       generate_baseband, generate_to_file)
from gnss_sim_receiver_tpu.utils.sample_io import read_samples

FS = 2_000_000.0


def test_amplitude_calibration():
    a = cn0_to_amplitude(44.0, FS)
    assert np.isclose(a * a * FS, 10 ** 4.4, rtol=1e-6)


def test_noise_power_unit_variance():
    x = generate_baseband([], FS, 100_000, noise=True, seed=3)
    assert abs(np.var(x) - 1.0) < 0.02


def test_signal_power_matches_cn0():
    sat = SatelliteSignalParams(prn=1, cn0_db_hz=50.0, doppler_hz=0.0)
    x = generate_baseband([sat], FS, 100_000, noise=False)
    expect = 10 ** 5.0 / FS
    assert abs(np.mean(np.abs(x) ** 2) / expect - 1.0) < 0.01


def test_chunked_generation_is_continuous():
    sat = SatelliteSignalParams(
        prn=4, cn0_db_hz=45.0, doppler_hz=2500.0, delay_chips=100.25,
        nav_bits=np.ones(1500, dtype=np.int8))
    full = generate_baseband([sat], FS, 40_000, noise=False)
    a = generate_baseband([sat], FS, 25_000, noise=False)
    b = generate_baseband([sat], FS, 15_000, start_sample=25_000, noise=False)
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-6)


def test_generate_to_file_roundtrip(tmp_path):
    sat = SatelliteSignalParams(prn=9, cn0_db_hz=60.0, doppler_hz=-1000.0)
    path = tmp_path / "cap.ishort"
    n = generate_to_file(path, "ishort", [sat], FS, 0.01, noise=False,
                         seed=5, scale=1000.0)
    assert n == int(FS * 0.01)
    x = read_samples(path, "ishort")
    assert len(x) == n
    direct = generate_baseband([sat], FS, n, noise=False, seed=5) * 1000.0
    # int16 quantization error only
    assert np.max(np.abs(x - direct)) <= 0.5 * np.sqrt(2) + 1e-3
