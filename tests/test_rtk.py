"""RTK tests: LAMBDA integer least-squares (vs brute force), decorrelation,
and a two-receiver double-difference scenario fixing a short baseline to
cm level (rtklib_rtkpos.cc relpos / rtklib_lambda.cc analogues)."""

import itertools

import numpy as np
import pytest

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models import rtk
from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
from gnss_sim_receiver_tpu.utils import geodesy

C = constants.SPEED_OF_LIGHT_M_S
LAM = C / constants.GPS_L1_FREQ_HZ


def _random_pd(rng, n, cond=50.0):
    a = rng.standard_normal((n, n))
    q, _ = np.linalg.qr(a)
    d = np.logspace(0, np.log10(cond), n)
    return q @ np.diag(d) @ q.T * 0.01


def test_ld_decomp_reconstructs():
    rng = np.random.default_rng(0)
    Q = _random_pd(rng, 6)
    L, d = rtk._ld_decomp(Q)
    np.testing.assert_allclose(L.T @ np.diag(d) @ L, Q, atol=1e-10)
    assert np.allclose(np.diag(L), 1.0)
    assert np.allclose(np.triu(L, 1), 0.0)


def test_reduction_unimodular_and_equivalent():
    rng = np.random.default_rng(1)
    Q = _random_pd(rng, 5)
    L, d = rtk._ld_decomp(Q)
    Z = rtk._reduction(L, d)
    # Z integer with |det| = 1 (unimodular): the transform preserves the
    # integer lattice
    assert np.allclose(Z, np.round(Z))
    assert abs(abs(np.linalg.det(Z)) - 1.0) < 1e-8
    # L, d now factor Z^T Q Z
    np.testing.assert_allclose(L.T @ np.diag(d) @ L, Z.T @ Q @ Z, atol=1e-8)


@pytest.mark.parametrize("seed", [2, 3, 4, 5])
def test_lambda_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n = 5
    Q = _random_pd(rng, n, cond=200.0)
    truth = rng.integers(-20, 20, n).astype(np.float64)
    a = truth + np.linalg.cholesky(Q) @ rng.standard_normal(n) * 0.4
    cands, s = rtk.lambda_ils(a, Q, m=2)
    Qi = np.linalg.inv(Q)

    def norm(z):
        r = a - z
        return r @ Qi @ r

    # brute force over a window around the float solution
    base = np.round(a).astype(int)
    best = None
    for dz in itertools.product(range(-3, 4), repeat=n):
        z = base + np.array(dz)
        v = norm(z)
        if best is None or v < best[1]:
            best = (z, v)
    np.testing.assert_array_equal(cands[0], best[0])
    assert abs(s[0] - best[1]) < 1e-6 * max(1.0, best[1])
    assert s[1] >= s[0]


def test_lambda_identity_easy_case():
    a = np.array([1.1, -2.2, 3.05])
    cands, s = rtk.lambda_ils(a, np.eye(3) * 0.01, m=2)
    np.testing.assert_array_equal(cands[0], [1, -2, 3])


# ---------------------------------------------------------------------------
# two-receiver scenario
# ---------------------------------------------------------------------------

def _epoch(rx_ecef, base_ecef, ephs, t, dtr_s, amb, rng, code_sig, carr_sig):
    """Synthesize one ObservationEpoch consistent with the RTK engine's
    transmit-time/Sagnac geometry (sat pos at interp_tow - clk, rotated by
    the base-range light time).  carrier_phase_cycles uses the CHAIN
    convention (accumulated PLL phase ~ -range/lambda + N), which the
    engine negates at ingestion."""
    n = len(ephs)
    pr = np.zeros(n)
    ph = np.zeros(n)
    for k, eph in enumerate(ephs):
        _, clk = eph.sat_pos_clock(t)
        pos, _ = eph.sat_pos_clock(t - clk)
        tau = np.linalg.norm(pos - base_ecef) / C
        ang = constants.GPS_OMEGA_EARTH_DOT * tau
        rot = np.array([[np.cos(ang), np.sin(ang), 0.0],
                        [-np.sin(ang), np.cos(ang), 0.0],
                        [0.0, 0.0, 1.0]])
        p = rot @ pos
        r = np.linalg.norm(p - rx_ecef)
        pr[k] = r + C * dtr_s + rng.standard_normal() * code_sig
        ph[k] = -(r + C * dtr_s) / LAM + amb[k] \
            + rng.standard_normal() * carr_sig / LAM
    return ObservationEpoch(
        rx_time_s=t, tick_sample=0, valid=np.ones(n, bool),
        pseudorange_m=pr, interp_tow_ms=np.full(n, t * 1000.0),
        carrier_doppler_hz=np.zeros(n), carrier_phase_cycles=ph,
        cn0_db_hz=np.full(n, 45.0))


def test_rtk_static_baseline_fix():
    """Static rover 8.4 m from the base: the float solution converges, the
    LAMBDA fix passes the ratio test, recovers the true DD integers, and
    the fixed baseline is cm-accurate."""
    ephs = make_sky_constellation(37.0, -122.0, toe=7200.0)[:7]
    base = np.asarray(geodesy.llh_to_ecef(np.radians(37.0),
                                          np.radians(-122.0), 30.0))
    up = base / np.linalg.norm(base)
    east = np.cross([0.0, 0.0, 1.0], up)
    east /= np.linalg.norm(east)
    truth_baseline = 8.0 * east + 2.0 * np.cross(up, east) + 1.0 * up
    rover = base + truth_baseline

    rng = np.random.default_rng(11)
    amb_r = rng.integers(-5_000_000, 5_000_000, len(ephs)).astype(float)
    amb_b = rng.integers(-5_000_000, 5_000_000, len(ephs)).astype(float)
    prns = [e.prn for e in ephs]
    eph_map = {e.prn: e for e in ephs}

    eng = rtk.RtkEngine(rtk.RtkConf(mode="static", ratio_threshold=3.0,
                                    code_sigma_m=0.4,
                                    carrier_sigma_m=0.003),
                        base_ecef_m=base)
    sol = None
    for i in range(25):
        t = 7200.0 + i * 1.0
        er = _epoch(rover, base, ephs, t, dtr_s=2.5e-4 + i * 1e-9,
                    amb=amb_r, rng=rng, code_sig=0.4, carr_sig=0.003)
        eb = _epoch(base, base, ephs, t, dtr_s=-1.1e-4,
                    amb=amb_b, rng=rng, code_sig=0.4, carr_sig=0.003)
        sol = eng.update(er, eb, prns, eph_map)
        assert sol.valid
    assert sol.fixed, f"ratio={sol.ratio:.2f} never passed the test"
    err_fixed = np.linalg.norm(sol.baseline_m - truth_baseline)
    err_float = np.linalg.norm(sol.float_baseline_m - truth_baseline)
    assert err_fixed < 0.02, f"fixed baseline error {err_fixed:.3f} m"
    assert err_fixed <= err_float + 1e-9

    # the fixed integers must equal the true DD ambiguities; the engine
    # negates the chain-convention phase at ingestion, so its ambiguity
    # states carry the opposite sign of the synthesized chain ambiguities
    ref = eng.refsat["GPS"]
    k_ref = prns.index(ref[1])
    for (sysk, prn), n_fix in sol.ambiguities.items():
        k = prns.index(prn)
        truth_dd = (amb_r[k] - amb_b[k]) - (amb_r[k_ref] - amb_b[k_ref])
        assert n_fix == -int(truth_dd), (prn, n_fix, truth_dd)


def test_rtk_kinematic_mode_tracks_motion():
    """Kinematic conf: rover moves 2 cm/epoch east; the fixed solution
    follows within 2 cm."""
    ephs = make_sky_constellation(37.0, -122.0, toe=7200.0)[:7]
    base = np.asarray(geodesy.llh_to_ecef(np.radians(37.0),
                                          np.radians(-122.0), 30.0))
    up = base / np.linalg.norm(base)
    east = np.cross([0.0, 0.0, 1.0], up)
    east /= np.linalg.norm(east)

    rng = np.random.default_rng(12)
    amb_r = rng.integers(-100000, 100000, len(ephs)).astype(float)
    amb_b = rng.integers(-100000, 100000, len(ephs)).astype(float)
    prns = [e.prn for e in ephs]
    eph_map = {e.prn: e for e in ephs}
    eng = rtk.RtkEngine(rtk.RtkConf(mode="kinematic",
                                    pos_process_noise_ms=1.0,
                                    code_sigma_m=0.3,
                                    carrier_sigma_m=0.002),
                        base_ecef_m=base)
    errs = []
    for i in range(30):
        t = 7200.0 + i * 1.0
        offset = 5.0 * east + 0.02 * i * east
        rover = base + offset
        er = _epoch(rover, base, ephs, t, 1e-4, amb_r, rng, 0.3, 0.002)
        eb = _epoch(base, base, ephs, t, -2e-4, amb_b, rng, 0.3, 0.002)
        sol = eng.update(er, eb, prns, eph_map)
        if i > 10 and sol.fixed:
            errs.append(np.linalg.norm(sol.baseline_m - offset))
    assert errs, "never fixed"
    assert np.median(errs) < 0.02


def test_rtk_conf_from_config():
    from gnss_sim_receiver_tpu.models.factory import (pvt_conf_from_config,
                                                      rtk_conf_from_config)
    from gnss_sim_receiver_tpu.utils.config import Configuration
    cfg = Configuration({"PVT.positioning_mode": "RTK_Kinematic",
                         "PVT.AR_ratio_threshold": "2.5",
                         "PVT.carrier_sigma_m": "0.002"})
    pc = pvt_conf_from_config(cfg)
    assert pc.positioning_mode == "RTK_Kinematic"
    rc = rtk_conf_from_config(cfg)
    assert rc.mode == "kinematic"
    assert rc.ratio_threshold == 2.5
    assert rc.carrier_sigma_m == 0.002
