"""Native C++ helper library tests (Viterbi27, unpackers) — and their
Python fallbacks (reference analogues: viterbi_decoder.cc + libswiftcnav
viterbi27 tests)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import native


def test_native_library_builds():
    assert native.have_native(), "g++ build of native/libgnss_native.so failed"


def test_viterbi_roundtrip_clean():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 300).astype(np.uint8)
    sym = native.conv27_encode(bits).astype(np.float32) * 2.0 - 1.0
    dec = native.viterbi27_decode(sym)
    np.testing.assert_array_equal(dec, bits)


def test_viterbi_corrects_noise():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 500).astype(np.uint8)
    sym = native.conv27_encode(bits).astype(np.float32) * 2.0 - 1.0
    noisy = sym + rng.normal(0, 0.6, len(sym)).astype(np.float32)
    dec = native.viterbi27_decode(noisy)
    # rate-1/2 K=7 at ~4.4 dB Eb/N0: expect error-free on 500 bits
    assert (dec == bits).mean() > 0.995


def test_viterbi_python_fallback_matches_native():
    if not native.have_native():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 120).astype(np.uint8)
    sym = (native.conv27_encode(bits).astype(np.float32) * 2.0 - 1.0
           + rng.normal(0, 0.4, 240).astype(np.float32))
    a = native.viterbi27_decode(sym)
    b = native._viterbi_py(np.asarray(sym, np.float32), 120)
    np.testing.assert_array_equal(a, b)


def test_unpack_2bit():
    raw = np.array([0b11100100, 0b00000001], np.uint8)
    out = native.unpack_2bit_samples(raw)
    np.testing.assert_array_equal(out[:4], [+1.0, +3.0, -1.0, -3.0])
    np.testing.assert_array_equal(out[4:], [+3.0, +1.0, +1.0, +1.0])


def test_interleaved_to_cfloat():
    raw = np.array([1, -2, 3, 4, -5, 6], np.int16)
    out = native.interleaved_to_cfloat(raw)
    np.testing.assert_array_equal(out, np.array([1 - 2j, 3 + 4j, -5 + 6j],
                                                np.complex64))
    raw8 = raw.astype(np.int8)
    np.testing.assert_array_equal(native.interleaved_to_cfloat(raw8), out)
