"""Orbital-dynamics PVT EKF (fork pvt_ekf.cc run_Ekf equivalent).

Epoch-level test: a receiver on a circular LEO orbit sees synthetic
pseudoranges/Dopplers from the fixture constellation; the EKF must beat
epoch-wise LS under measurement noise and coast through a full GNSS
outage on dynamics alone (the capability the fork built the filter for).
"""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
from gnss_sim_receiver_tpu.models.pvt import solve_pvt
from gnss_sim_receiver_tpu.models.pvt_ekf_orbital import (PvtEkfConf,
                                                          PvtEkfOrbital)
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
from gnss_sim_receiver_tpu.utils import environment

C = constants.SPEED_OF_LIGHT_M_S
T0 = 345600.0
LAM = C / constants.GPS_L1_FREQ_HZ


def _leo_state(t):
    """Circular equatorial LEO in the inertial frame -> ECEF via the same
    environment frame model the filter uses (test and filter share the
    frame by construction; the measurements are generated in ECEF)."""
    earth = environment.earth(T0)
    r = 6378137.0 + 550e3
    v = np.sqrt(earth.mu_m3_s2 / r)
    w = v / r
    th = w * (t - T0)
    pos_i = np.array([r * np.cos(th), r * np.sin(th), 0.0])
    vel_i = np.array([-v * np.sin(th), v * np.cos(th), 0.0])
    return earth.state_i2fixed(np.concatenate([pos_i, vel_i]), t)


def _epoch(ephs, t, rx, vx, dtr_s, rng, pr_sigma=2.0, dop_sigma=0.05):
    n = len(ephs)
    pr = np.zeros(n)
    tow = np.zeros(n)
    dop = np.zeros(n)
    valid = np.ones(n, bool)
    om = constants.GPS_OMEGA_EARTH_DOT
    for k, eph in enumerate(ephs):
        # iterate transmit time
        tau = 0.07
        for _ in range(4):
            pos, clk = eph.sat_pos_clock(t - tau)
            ang = om * tau
            rot = np.array([[np.cos(ang), np.sin(ang), 0],
                            [-np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
            p = rot @ pos
            r = np.linalg.norm(p - rx)
            tau = r / C
        pr[k] = r + C * (dtr_s - clk) + rng.standard_normal() * pr_sigma
        # interp_tow is the SV-clock transmit time
        tow[k] = (t - tau + clk) * 1000.0
        vel = eph.sat_vel(t - tau)
        los = (p - rx) / r
        rate = los @ (vel - vx)
        dop[k] = -(rate + rng.standard_normal() * dop_sigma) / LAM
    return ObservationEpoch(
        rx_time_s=t + dtr_s, tick_sample=0, valid=valid,
        pseudorange_m=pr, interp_tow_ms=tow, carrier_doppler_hz=dop,
        carrier_phase_cycles=np.zeros(n), cn0_db_hz=np.full(n, 45.0))


@pytest.fixture(scope="module")
def leo_run():
    ephs = make_sky_constellation(0.0, 0.0, toe=T0 + 600)
    rng = np.random.default_rng(7)
    prns = [e.prn for e in ephs]
    eph_map = {e.prn: e for e in ephs}
    dt = 1.0
    times = T0 + np.arange(0.0, 120.0, dt)
    epochs = []
    truth = []
    for t in times:
        st = _leo_state(t)
        epochs.append(_epoch(ephs, t, st[:3], st[3:6], 1e-4, rng))
        truth.append(st)
    return prns, eph_map, times, epochs, np.asarray(truth)


def test_ekf_beats_ls_noise(leo_run):
    prns, eph_map, times, epochs, truth = leo_run
    ekf = PvtEkfOrbital(PvtEkfConf(update_interval_s=1.0,
                                   measures_pos_sd_m=2.0,
                                   measures_vel_sd_ms=0.05,
                                   system_pos_sd_m=0.05,
                                   system_vel_sd_ms=0.01),
                        t0_gps_s=T0)
    ls_errs = []
    ekf_errs = []
    for k, (t, ep) in enumerate(zip(times, epochs)):
        sol = solve_pvt(ep, prns, eph_map)
        assert sol.valid
        ls_errs.append(np.linalg.norm(sol.rx_ecef_m - truth[k, :3]))
        if not ekf.initialized:
            ekf.init_from_fix(sol, t)
            continue
        assert ekf.update(ep, prns, eph_map, t)
        pos, vel, *_ = ekf.state_ecef()
        ekf_errs.append(np.linalg.norm(pos - truth[k, :3]))
    ls_rms = float(np.sqrt(np.mean(np.square(ls_errs[60:]))))
    ekf_rms = float(np.sqrt(np.mean(np.square(ekf_errs[60:]))))
    assert ekf_rms < 0.6 * ls_rms, (ekf_rms, ls_rms)


def test_ekf_coasts_through_outage(leo_run):
    prns, eph_map, times, epochs, truth = leo_run
    ekf = PvtEkfOrbital(PvtEkfConf(update_interval_s=1.0,
                                   measures_pos_sd_m=2.0,
                                   measures_vel_sd_ms=0.05,
                                   system_pos_sd_m=0.05,
                                   system_vel_sd_ms=0.01),
                        t0_gps_s=T0)
    for k, (t, ep) in enumerate(zip(times, epochs)):
        if k >= 60:
            break
        if not ekf.initialized:
            ekf.init_from_fix(solve_pvt(ep, prns, eph_map), t)
            continue
        ekf.update(ep, prns, eph_map, t)
    # 30 s total outage: propagate on dynamics alone
    t_out = times[59] + 30.0
    ekf.propagate_to(t_out)
    st = _leo_state(t_out)
    err = np.linalg.norm(ekf.state_ecef()[0] - st[:3])
    # free-fall dynamics carry the orbit: position error stays bounded at
    # tens of meters over 30 s (vs ~200 m of dead-reckoned drift if the
    # velocity estimate were simply integrated without gravity)
    assert err < 50.0, err

    # reacquire: the filter accepts measurements again and reconverges
    k0 = 90
    for k in range(k0, len(times)):
        ekf.update(epochs[k], prns, eph_map, times[k])
    err2 = np.linalg.norm(ekf.state_ecef()[0] - truth[-1, :3])
    assert err2 < 5.0, err2
