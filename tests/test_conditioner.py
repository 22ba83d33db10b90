"""Conditioning chain tests (reference analogue: filter/resampler unit
tests in src/tests/unit-tests/signal-processing-blocks/{filter,resampler})."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models.conditioner import SignalConditioner
from gnss_sim_receiver_tpu.ops import filters, resampler
from gnss_sim_receiver_tpu.utils.config import InMemoryConfiguration


def _tone(f_norm, n=8192, amp=1.0):
    return (amp * np.exp(2j * np.pi * f_norm * np.arange(n))
            ).astype(np.complex64)


def test_fir_filter_passband_stopband():
    taps = filters.design_lowpass(63, 0.25)
    x_pass = _tone(0.05)
    x_stop = _tone(0.45)
    y_pass = np.asarray(filters.fir_filter(x_pass, taps))
    y_stop = np.asarray(filters.fir_filter(x_stop, taps))
    mid = slice(100, -100)
    assert np.abs(y_pass[mid]).mean() > 0.95
    assert np.abs(y_stop[mid]).mean() < 0.02


def test_fir_decimation():
    taps = filters.design_lowpass(63, 0.2)
    x = _tone(0.02, n=8192)
    y = np.asarray(filters.fir_filter(x, taps, decimation=4))
    assert len(y) == 8192 // 4
    # decimated tone at 4x the normalized frequency
    spec = np.abs(np.fft.fft(y[64:64 + 1024]))
    assert np.argmax(spec) == round(0.08 * 1024)


def test_freq_xlating_moves_if_to_baseband():
    fs = 4e6
    f_if = 1e6
    taps = filters.design_lowpass(63, 0.4)
    x = _tone(f_if / fs, n=16384)
    y = np.asarray(filters.freq_xlating_fir_filter(x, taps, f_if, fs, 2))
    # after translation the tone is at DC
    spec = np.abs(np.fft.fft(y[128:128 + 2048]))
    assert np.argmax(spec) == 0
    assert np.abs(y[200:-200]).mean() > 0.9


def test_notch_filter_kills_cw():
    x = _tone(0.1, amp=0.1) + _tone(0.23, amp=10.0)  # weak signal + CW
    y = np.asarray(filters.notch_filter(x, np.float32(0.23),
                                        np.float32(0.02)))
    spec_in = np.abs(np.fft.fft(x[2048:6144]))
    spec_out = np.abs(np.fft.fft(y[2048:6144]))
    k_cw = round(0.23 * 4096)
    k_sig = round(0.1 * 4096)
    assert spec_out[k_cw] < spec_in[k_cw] * 0.05
    assert spec_out[k_sig] > spec_in[k_sig] * 0.7


def test_pulse_blanking_excises_pulses():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64) * np.float32(np.sqrt(0.5))
    x[1000:1100] += 50.0  # strong pulse
    y = np.asarray(filters.pulse_blanking(x, 4.0, 64))
    assert np.abs(y[1024:1088]).max() == 0.0
    assert np.abs(y[4000:5000]).mean() > 0.5


def test_direct_and_linear_resampler():
    fs_in, fs_out = 4e6, 2.5e6
    n_in = 4000
    x = _tone(0.01, n=n_in)
    n_out = resampler.output_length(n_in, fs_in, fs_out)
    r = fs_in / fs_out
    y_d = np.asarray(resampler.direct_resampler(x, r, n_out))
    y_l = np.asarray(resampler.linear_resampler(x, r, n_out))
    assert len(y_d) == n_out == len(y_l)
    # resampled tone frequency scales by fs_in/fs_out
    truth = np.exp(2j * np.pi * 0.01 * r * np.arange(n_out))
    assert np.abs(y_l - truth).max() < 0.01
    assert np.abs(y_d - truth).max() < 0.26  # nearest-sample phase steps


@pytest.mark.parametrize("impl,key", [
    ("Fir_Filter", "InputFilter.decimation_factor"),
    ("Pass_Through", None),
])
def test_signal_conditioner_chain(impl, key):
    c = InMemoryConfiguration()
    c.set_property("InputFilter.implementation", impl)
    if key:
        c.set_property(key, "2")
        c.set_property("InputFilter.number_of_taps", "63")
        c.set_property("InputFilter.cutoff", "0.4")
    c.set_property("Resampler.implementation", "Direct_Resampler")
    c.set_property("Resampler.sample_freq_out", "1000000")
    cond = SignalConditioner(c, fs_in=4e6)
    x = _tone(0.01, n=16384)
    y = cond.process(x)
    assert cond.fs_out == 1e6
    expect = 16384 * (1e6 / 4e6)
    assert abs(len(y) - expect) <= 2


def test_beamformer_filter():
    """Beamformer_Filter (reference beamformer.cc work(): out[n] =
    sum_i w_i * in_i[n]): weights steer an array capture; a matched
    phase progression combines coherently (gain n_elements over one
    element)."""
    import numpy as np

    from gnss_sim_receiver_tpu.models.conditioner import SignalConditioner
    from gnss_sim_receiver_tpu.utils.config import InMemoryConfiguration

    n_el, n = 4, 4096
    rng = np.random.default_rng(2)
    base = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
            ).astype(np.complex64)
    # element k sees the signal phase-shifted by k*30 degrees
    shifts = np.exp(1j * np.radians(30.0) * np.arange(n_el))
    x = np.stack([base * s for s in shifts]).astype(np.complex64)

    conf = InMemoryConfiguration()
    conf.set_property("InputFilter.implementation", "Beamformer_Filter")
    conf.set_property("InputFilter.number_of_channels", str(n_el))
    for k in range(n_el):
        w = np.conj(shifts[k])
        conf.set_property(f"InputFilter.weight_{k}_real", f"{w.real:.17g}")
        conf.set_property(f"InputFilter.weight_{k}_imag", f"{w.imag:.17g}")
    cond = SignalConditioner(conf, fs_in=4e6)
    y = cond.process(x)
    assert y.shape == (n,)
    # coherent gain: matched weights recover n_el * base
    assert np.abs(y - n_el * base).max() < 1e-3 * n_el
    # default weights (1+0j): plain sum — phase-misaligned elements
    conf2 = InMemoryConfiguration()
    conf2.set_property("InputFilter.implementation", "Beamformer_Filter")
    conf2.set_property("InputFilter.number_of_channels", str(n_el))
    y2 = SignalConditioner(conf2, fs_in=4e6).process(x)
    assert np.abs(y2).mean() < np.abs(y).mean()
