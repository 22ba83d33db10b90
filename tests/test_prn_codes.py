"""Golden tests for PRN code generation (reference test analogue:
src/tests/unit-tests/arithmetic/code_generation_test.cc)."""

import numpy as np

from gnss_sim_receiver_tpu.ops import prn_codes


def _first_10_chips_octal(prn):
    code = prn_codes.gps_l1_ca_code(prn)
    bits = ((code[:10] + 1) // 2).astype(int)  # +1 -> bit 1
    return int("".join(str(b) for b in bits), 2)


def test_gps_ca_first_chips_match_icd():
    # IS-GPS-200 table 3-I, "first 10 chips" octal column (PRN 1..10)
    golden = {1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744, 5: 0o1133,
              6: 0o1455, 7: 0o1131, 8: 0o1454, 9: 0o1626, 10: 0o1504}
    for prn, want in golden.items():
        assert _first_10_chips_octal(prn) == want, f"PRN {prn}"


def test_gps_ca_code_properties():
    for prn in (1, 7, 22, 32):
        code = prn_codes.gps_l1_ca_code(prn)
        assert code.shape == (1023,)
        assert set(np.unique(code)) == {-1.0, 1.0}
        # Gold codes are nearly balanced
        assert abs(int(code.sum())) == 1
        # circular autocorrelation: peak 1023, sidelobes in {-65,-1,63}
        fx = np.fft.fft(code)
        ac = np.real(np.fft.ifft(fx * np.conj(fx)))
        assert round(ac[0]) == 1023
        side = np.round(ac[1:]).astype(int)
        assert set(np.unique(side)).issubset({-65, -1, 63})


def test_gps_ca_cross_correlation():
    a = prn_codes.gps_l1_ca_code(1)
    b = prn_codes.gps_l1_ca_code(2)
    fx = np.fft.fft(a)
    cc = np.real(np.fft.ifft(fx * np.conj(np.fft.fft(b))))
    assert set(np.round(cc).astype(int)).issubset({-65, -1, 63})


def test_chip_shift():
    base = prn_codes.gps_l1_ca_code(5)
    shifted = prn_codes.gps_l1_ca_code(5, chip_shift=100)
    np.testing.assert_array_equal(shifted, np.roll(base, -100))


def test_sample_code_rates():
    code = prn_codes.gps_l1_ca_code(1)
    fs = 2.048e6
    sampled = prn_codes.sample_code(code, fs, 1.023e6, 4096)
    assert sampled.shape == (4096,)
    # chip at sample n is floor(n*code_rate/fs) mod 1023
    n = 1234
    assert sampled[n] == code[int(n * 1.023e6 / fs) % 1023]
