"""Golden tests for the real Galileo ICD spreading-code tables
(data/galileo_codes.npz): chip prefixes against the published hex tables
(Galileo OS SIS ICD Annex C; reference Galileo_E1.h:56, Galileo_E5a.h:72,
Galileo_E5b.h:57), code balance, secondary codes, and the chip sign
convention (bit 0 -> +1, gnss_signal_replica.cc:43)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import signals


def _chips_from_hex(hexstr):
    bits = np.unpackbits(np.array([int(c, 16) for c in hexstr], np.uint8)
                         [:, None], axis=1, count=None)[:, 4:].reshape(-1)
    return (1.0 - 2.0 * bits).astype(np.float32)


# first 16 hex chars (64 chips) of the ICD tables, PRN 1 and PRN 50
GOLDEN = {
    ("e1", 1, "B"): "F5D710130573541B",
    ("e1", 50, "B"): "97051FC67ACA30E8",
    ("e1", 1, "C"): "B39340CA1C817D81",
    ("e1", 50, "C"): "ADDCEDB50E907D20",
    ("e5a", 1, "I"): "3CEA9DA7B07B13A6",
    ("e5a", 50, "I"): "A5029C9EB4623226",
    ("e5b", 1, "I"): "C5BEA11BADD79BC7",
    ("e5b", 50, "I"): "AFC22B34A5791F52",
}


@pytest.mark.parametrize("band,prn,comp", list(GOLDEN))
def test_golden_prefixes(band, prn, comp):
    fn = {"e1": signals.galileo_e1_code,
          "e5a": signals.galileo_e5a_code,
          "e5b": signals.galileo_e5b_code}[band]
    code = fn(prn, comp)
    want = _chips_from_hex(GOLDEN[(band, prn, comp)])
    np.testing.assert_array_equal(code[:64], want)


def test_lengths_and_balance():
    for prn in (1, 17, 36, 50):
        e1b = signals.galileo_e1_code(prn, "B")
        assert e1b.shape == (4092,) and abs(e1b.sum()) <= 2
        for fn in (signals.galileo_e5a_code, signals.galileo_e5b_code):
            for comp in ("I", "Q"):
                c = fn(prn, comp)
                assert c.shape == (10230,)
                assert set(np.unique(c)) <= {-1.0, 1.0}
                assert abs(c.sum()) < 350    # near-balanced memory codes


def test_cross_correlation_low():
    """Distinct PRNs' primary codes are near-orthogonal (zero-lag)."""
    a = signals.galileo_e1_code(1, "B")
    b = signals.galileo_e1_code(2, "B")
    assert abs(np.dot(a, b)) / 4092 < 0.05
    a5 = signals.galileo_e5a_code(1, "I")
    b5 = signals.galileo_e5a_code(2, "I")
    assert abs(np.dot(a5, b5)) / 10230 < 0.05


def test_secondary_codes():
    # E5a-I CS20 is one fixed code for ALL satellites (Galileo_E5a.h:3581:
    # "10000100001011101001")
    cs20 = signals.e5a_secondary_code(1, "I")
    np.testing.assert_array_equal(cs20, signals.e5a_secondary_code(33, "I"))
    want = np.array([1 - 2 * int(c) for c in "10000100001011101001"],
                    np.float32)
    np.testing.assert_array_equal(cs20, want)
    # E5b-I CS4 = "1110"
    np.testing.assert_array_equal(signals.e5b_secondary_code(),
                                  np.array([-1, -1, -1, 1], np.float32))
    # E1-C CS25 prefix "0011100..." (Galileo_E1.h:52)
    cs25 = signals.e1c_secondary_code()
    assert cs25.shape == (25,)
    np.testing.assert_array_equal(
        cs25[:7], np.array([1, 1, -1, -1, -1, 1, 1], np.float32))
    # per-PRN CS100 on the Q channels differ between satellites
    q1 = signals.e5a_secondary_code(1, "Q")
    q2 = signals.e5a_secondary_code(2, "Q")
    assert q1.shape == (100,) and not np.array_equal(q1, q2)
    assert signals.e5bq_secondary_code(3).shape == (100,)


def test_engine_table_uses_real_codes():
    """subchip_table routes the real memory codes (BOC(1,1) expansion for
    E1-B) — the placeholder path is gone."""
    t = signals.subchip_table(signals.GALILEO_E1B, 1)
    e1b = signals.galileo_e1_code(1, "B")
    np.testing.assert_array_equal(t[0::2], e1b)
    np.testing.assert_array_equal(t[1::2], -e1b)
    np.testing.assert_array_equal(
        signals.subchip_table(signals.GALILEO_E5A_I, 7),
        signals.galileo_e5a_code(7, "I"))
    np.testing.assert_array_equal(
        signals.subchip_table(signals.GALILEO_E5B_I, 9),
        signals.galileo_e5b_code(9, "I"))
