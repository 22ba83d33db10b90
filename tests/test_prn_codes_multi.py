"""Multi-constellation PRN generator tests (structural ICD properties:
m-sequence perfection, Gold-code bounds, period structure)."""

import numpy as np

from gnss_sim_receiver_tpu.ops import prn_codes_multi as pm


def _circ_corr(a, b):
    fa = np.fft.fft(a)
    return np.real(np.fft.ifft(fa * np.conj(np.fft.fft(b))))


def test_glonass_ca_is_perfect_msequence():
    c = pm.glonass_l1_ca_code()
    assert c.shape == (511,)
    assert set(np.unique(c)) == {-1.0, 1.0}
    assert abs(int(c.sum())) == 1          # m-sequence balance
    ac = np.round(_circ_corr(c, c)).astype(int)
    assert ac[0] == 511
    assert (ac[1:] == -1).all()            # perfect two-level autocorr


def test_beidou_b1i_codes():
    for prn in (1, 20, 38, 63):
        c = pm.beidou_b1i_code(prn)
        assert c.shape == (2046,)
        assert set(np.unique(c)) == {-1.0, 1.0}
        ac = np.round(_circ_corr(c, c)).astype(int)
        assert ac[0] == 2046
        assert np.abs(ac[1:]).max() < 250  # truncated-Gold sidelobe bound
    cc = _circ_corr(pm.beidou_b1i_code(1), pm.beidou_b1i_code(2))
    assert np.abs(cc).max() < 250


def test_l2c_cm_codes():
    c1 = pm.gps_l2c_m_code(1)
    c2 = pm.gps_l2c_m_code(2)
    assert c1.shape == (10230,)
    assert not np.array_equal(c1, c2)
    assert abs(int(c1.sum())) < 200        # near-balanced long-code segment
    cc = _circ_corr(c1, c2)
    assert np.abs(cc).max() < 0.06 * 10230  # low cross-correlation


def test_l5_codes():
    xa = pm._l5_xa()
    # XA short-cycles at 8190 chips
    np.testing.assert_array_equal(xa[8190:10230], xa[0:2040])
    i1 = pm.gps_l5_code(1)
    q1 = pm.gps_l5_code(1, quadrature=True)
    i2 = pm.gps_l5_code(2)
    assert i1.shape == (10230,)
    assert not np.array_equal(i1, q1)
    assert not np.array_equal(i1, i2)
    for c in (i1, q1):
        assert set(np.unique(c)) == {-1.0, 1.0}
        assert abs(int(c.sum())) < 200
    cc = _circ_corr(i1, i2)
    assert np.abs(cc).max() < 0.06 * 10230


def test_nh20_secondary():
    assert len(pm.BEIDOU_NH20) == 20
    assert sum(pm.BEIDOU_NH20) == 8  # known weight of the BDS NH20 code
