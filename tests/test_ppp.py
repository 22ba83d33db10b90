"""PPP float filter (rtklib_ppp.cc pppos role).

Epoch-level: synthetic undifferenced code+carrier epochs with meter code
noise and mm carrier noise; the float filter must converge well below the
epoch-wise LS error.  Receiver-level: PVT.positioning_mode=PPP_Static
routes epochs through the engine end-to-end."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
from gnss_sim_receiver_tpu.models.ppp import PppConf, PppEngine
from gnss_sim_receiver_tpu.models.pvt import solve_pvt
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
from gnss_sim_receiver_tpu.utils import geodesy

C = constants.SPEED_OF_LIGHT_M_S
LAM = C / constants.GPS_L1_FREQ_HZ
T0 = 345600.0


def _epoch(ephs, t, rx, dtr_s, amb, rng, code_sig=1.0, carr_sig=0.003):
    n = len(ephs)
    pr = np.zeros(n)
    ph = np.zeros(n)
    tow = np.zeros(n)
    om = constants.GPS_OMEGA_EARTH_DOT
    for k, e in enumerate(ephs):
        tau = 0.07
        for _ in range(4):
            pos, clk = e.sat_pos_clock(t - tau)
            ang = om * tau
            rot = np.array([[np.cos(ang), np.sin(ang), 0],
                            [-np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
            p = rot @ pos
            r = np.linalg.norm(p - rx)
            tau = r / C
        pr[k] = r + C * (dtr_s - clk) + rng.standard_normal() * code_sig
        # chain convention: accumulated phase ~ -(r + c dtr - c clk)/lam + N
        ph[k] = (-(r + C * dtr_s - C * clk) / LAM + amb[k]
                 + rng.standard_normal() * carr_sig / LAM)
        tow[k] = (t - tau + clk) * 1000.0
    return ObservationEpoch(
        rx_time_s=t + dtr_s, tick_sample=0, valid=np.ones(n, bool),
        pseudorange_m=pr, interp_tow_ms=tow,
        carrier_doppler_hz=np.zeros(n), carrier_phase_cycles=ph,
        cn0_db_hz=np.full(n, 45.0))


def test_ppp_static_converges_below_ls():
    rng = np.random.default_rng(11)
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    ephs = [e for e in make_sky_constellation(40.0, -75.0, toe=T0 + 600)
            if e.prn in (1, 3, 4, 5, 9, 10)]
    prns = [e.prn for e in ephs]
    eph_map = {e.prn: e for e in ephs}
    amb = rng.integers(-50, 50, len(ephs)).astype(float)

    eng = PppEngine(PppConf(mode="static", code_sigma_m=1.0))
    ls_errs = []
    last = None
    for i in range(120):
        t = T0 + 10.0 + i * 1.0
        ep = _epoch(ephs, t, rx, 1e-4 + 1e-9 * i, amb, rng)
        sol = solve_pvt(ep, prns, eph_map)
        assert sol.valid
        ls_errs.append(np.linalg.norm(sol.rx_ecef_m - rx))
        last = eng.update(ep, prns, eph_map, x0=sol.rx_ecef_m)
        assert last.valid
    ls_rms = float(np.sqrt(np.mean(np.square(ls_errs))))
    ppp_err = float(np.linalg.norm(last.rx_ecef_m - rx))
    # carrier-driven float solution converges an order of magnitude below
    # the code-only LS scatter
    assert ppp_err < 0.3 * ls_rms, (ppp_err, ls_rms)
    assert ppp_err < 0.5, ppp_err


def test_ppp_mode_routes_in_receiver():
    """PVT.positioning_mode=PPP_Static produces ppp_solutions end-to-end
    (no NotImplementedError, no silent single-point fallback)."""
    from gnss_sim_receiver_tpu.models.receiver import Receiver, ReceiverConf
    from gnss_sim_receiver_tpu.models.pvt import PvtConf
    from tests.fixtures import FS, control_scenario_capture, \
        scenario_ephemerides
    x, truth = control_scenario_capture()
    x = x[: int(FS * 16)]
    conf = ReceiverConf(fs=FS, prns=tuple(range(1, 11)), max_channels=8,
                        pvt=PvtConf(positioning_mode="PPP_Static"))
    run = Receiver(conf).process_array(
        x, ephemerides=dict(scenario_ephemerides()))
    assert run.ppp_solutions, "PPP produced no solutions"
    _, last = run.ppp_solutions[-1]
    err = np.linalg.norm(last.rx_ecef_m - np.asarray(truth))
    assert err < 10.0, err


def test_ppp_iono_free_beats_single_frequency_ls():
    """Dual-frequency iono-free PPP under a simulated ionosphere: the
    PPP float (IF combination + ZTD state) converges below 0.5 m where
    single-frequency LS carries meters of iono bias (VERDICT r3 #6
    'done' criterion; rtklib_ppp.cc L_LC/P_LC + TROPOPT_EST roles)."""
    import numpy as np

    from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
    from gnss_sim_receiver_tpu.models.ppp import PppConf, PppEngine
    from gnss_sim_receiver_tpu.models.pvt import PvtConf, solve_pvt
    from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
    from gnss_sim_receiver_tpu.utils import geodesy

    C = 299792458.0
    f1, f5 = 1575.42e6, 1176.45e6
    lam1, lam5 = C / f1, C / f5
    t0 = 345600.0
    rx_true = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0),
                                  100.0)
    ephs = {e.prn: e for e in make_sky_constellation(40.0, -75.0,
                                                     toe=t0 + 600)[:7]}
    prn_list = sorted(ephs)
    n_sat = len(prn_list)
    # channels: n_sat on L1 + n_sat on L5 (same satellites)
    prns = prn_list + prn_list
    systems = ["GPS"] * (2 * n_sat)
    freqs = np.array([f1] * n_sat + [f5] * n_sat)

    rng = np.random.default_rng(8)
    # slant iono: per-satellite vertical delays 1.5-4 m at L1 (dispersive)
    iono_l1 = rng.uniform(1.5, 4.0, n_sat)
    trop_wet = 0.15                                  # residual ZTD [m]
    amb = rng.integers(-50, 50, 2 * n_sat).astype(float)

    ppp = PppEngine(PppConf(mode="static", code_sigma_m=0.7,
                            carrier_sigma_m=0.004))
    ls_errs = []
    sol = None
    for k in range(240):
        t = t0 + 0.5 * k
        pr = np.zeros(2 * n_sat)
        ph = np.zeros(2 * n_sat)
        tow = np.zeros(2 * n_sat)
        for i, prn in enumerate(prn_list):
            # light-time iteration: satellite state at TRANSMIT time,
            # Earth-rotation (Sagnac) over the travel time — the
            # solver's exact measurement model
            tau = 0.07
            for _ in range(3):
                t_tx = t - tau
                pos, clk = ephs[prn].sat_pos_clock(np.array([t_tx]))
                ang = 7.2921151467e-5 * tau
                rot = np.array([[np.cos(ang), np.sin(ang), 0.0],
                                [-np.sin(ang), np.cos(ang), 0.0],
                                [0.0, 0.0, 1.0]])
                p_rot = rot @ pos[0]
                tau = np.linalg.norm(p_rot - rx_true) / C
            rng_m = tau * C
            el, _ = geodesy.elevation_azimuth(rx_true, p_rot)
            mf = 1.0 / max(np.sin(el), 0.05)
            for j, (f, lam) in ((i, (f1, lam1)),
                                (n_sat + i, (f5, lam5))):
                iono = iono_l1[i] * (f1 / f) ** 2 * mf
                r_obs = (rng_m + iono + trop_wet * mf - C * clk[0]
                         + rng.normal(0.0, 0.5))
                pr[j] = r_obs
                # chain phase convention: accumulated PLL phase
                # ~ -range/lambda (carrier iono has opposite sign)
                ph_m = (rng_m - iono + trop_wet * mf - C * clk[0]
                        + lam * amb[j] + rng.normal(0.0, 0.003))
                ph[j] = -ph_m / lam
                tow[j] = t_tx * 1000.0
        ep = ObservationEpoch(
            rx_time_s=t, tick_sample=0, valid=np.ones(2 * n_sat, bool),
            pseudorange_m=pr, interp_tow_ms=tow,
            carrier_doppler_hz=np.zeros(2 * n_sat),
            carrier_phase_cycles=ph, cn0_db_hz=np.full(2 * n_sat, 45.0))
        # single-frequency LS on the L1 channels only
        ls = solve_pvt(ep, prns, ephs, PvtConf(), systems=systems,
                       exclude_channels=tuple(range(n_sat, 2 * n_sat)))
        if ls.valid:
            ls_errs.append(np.linalg.norm(ls.rx_ecef_m - rx_true))
        x0 = ls.rx_ecef_m if ls.valid else rx_true + 50.0
        sol = ppp.update(ep, prns, ephs, systems=systems,
                         carrier_freq_hz=freqs, x0=x0)
    assert sol is not None and sol.valid
    ppp_err = np.linalg.norm(sol.rx_ecef_m - rx_true)
    ls_err = np.median(ls_errs)
    assert ls_err > 1.0, f"LS unexpectedly clean: {ls_err:.2f} m"
    assert ppp_err < 0.5, (f"PPP err {ppp_err:.3f} m "
                           f"(LS {ls_err:.2f} m)")
    # the ZTD state picked up the simulated wet delay
    assert abs(ppp.x[4] - trop_wet) < 0.1, ppp.x[4]
