"""Device (JAX) batch signal synthesizer vs the host NumPy generator:
numerical parity at float32-rounding level, multi-signal batches, and
noise statistics."""

import numpy as np

from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband
from gnss_sim_receiver_tpu.sim.device_generator import generate_baseband_device

FS = 4_092_000.0


def _sats():
    rng = np.random.default_rng(0)
    mk = lambda n: (rng.integers(0, 2, n) * 2 - 1).astype(np.int8)
    return [
        SatelliteSignalParams(prn=7, system="GPS", signal="1C",
                              cn0_db_hz=46.0, doppler_hz=1800.0,
                              delay_chips=213.4, nav_bits=mk(100)),
        SatelliteSignalParams(prn=11, system="Galileo", signal="1B",
                              cn0_db_hz=44.0, doppler_hz=-2600.0,
                              doppler_rate_hz_s=1.5,
                              delay_chips=1001.25, nav_bits=mk(300)),
        SatelliteSignalParams(prn=8, system="BeiDou", signal="B1",
                              cn0_db_hz=45.0, doppler_hz=700.0,
                              delay_chips=87.0, nav_bits=mk(200)),
    ]


def test_device_matches_host_no_noise():
    sats = _sats()
    n = int(FS * 0.25)
    ref = generate_baseband(sats, FS, n, noise=False, seed=1)
    # fresh param objects: the host path caches _chip_table on them
    got = generate_baseband_device(_sats(), FS, n, noise=False, seed=1)
    p_sig = float(np.mean(np.abs(ref) ** 2))
    err = np.abs(got - ref)
    # float32 rounding + occasional one-sample chip-edge flips only
    assert np.median(err) < 1e-3 * np.sqrt(p_sig)
    assert float(np.mean(err ** 2)) < 1e-3 * p_sig
    corr = np.vdot(ref, got).real / np.sqrt(
        np.vdot(ref, ref).real * np.vdot(got, got).real)
    assert corr > 0.999


def test_device_chunking_is_seamless():
    sats = _sats()
    n = int(FS * 0.12)
    a = generate_baseband_device(sats, FS, n, noise=False, seed=2,
                                 chunk_samples=100_000)
    b = generate_baseband_device(_sats(), FS, n, noise=False, seed=2,
                                 chunk_samples=1 << 21)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_device_noise_statistics():
    sats = _sats()[:1]
    n = 400_000
    x = generate_baseband_device(sats, FS, n, noise=True, seed=3)
    y = generate_baseband_device(sats, FS, n, noise=False, seed=3)
    w = x - y
    assert abs(np.mean(w.real)) < 0.01 and abs(np.mean(w.imag)) < 0.01
    assert abs(np.var(w) - 1.0) < 0.02      # complex noise, unit variance


def test_device_capture_acquires_and_tracks():
    """A device-generated capture runs through acquisition + tracking with
    the expected Doppler/delay (end-to-end fidelity, not just waveform
    comparison)."""
    from gnss_sim_receiver_tpu import signals
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    sat = SatelliteSignalParams(
        prn=19, system="GPS", signal="1C", cn0_db_hz=47.0,
        doppler_hz=-1500.0, delay_chips=400.5,
        nav_bits=np.ones(60, np.int8))   # pilot-like: acquisition fidelity
    #                                      here, data handling elsewhere
    x = generate_baseband_device([sat], 2_046_000.0, 2_046_00 * 4,
                                 noise=True, seed=6)
    acq = PcpsAcquisitionEngine(
        AcqConf(fs_in=2_046_000.0, sampled_ms=1, doppler_max=5000.0,
                doppler_step=250.0, max_dwells=2, make_two_steps=True,
                doppler_step2=62.5),
        prns=[19])
    res = acq.acquire(x[:acq.n_samples_needed])
    assert bool(res.detected[0])
    assert abs(float(res.doppler_hz[0]) + 1500.0) < 80.0
    exp_delay = 400.5 / 1.023e6 * 2_046_000.0
    err = abs(res.delay_samples[0] - exp_delay)
    assert min(err, acq.fft_size - err) <= 2.0
