"""Hybrid GNSS + pseudolite navigation tests (the fork's headline feature):
AOWR time-transfer estimator convergence + jump acceptance, the pseudolite
pseudorange rollover exception in observables, channel pinning, the
fixed-clock (rx clock propagation) PVT mode, and a full hybrid receiver
run producing dt_GNSSR-AOWR clock-difference products (reference
analogues: rtklib_pvt_gs.cc:2334-2425/2770-2780,
hybrid_observables_gs.cc:550-556, gnss_flowgraph.cc:1391-1415)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models.hybrid import (AowrConf, AowrTimeTransfer,
                                                 RingFileWriter,
                                                 format_clock_difference_line,
                                                 format_rx_clock_bias_line)

C = constants.SPEED_OF_LIGHT_M_S
F_L1 = constants.GPS_L1_FREQ_HZ


def _feed(aowr, dt_clk_s, n, rng, r_m=0.4, ci0_cycles=12345.678,
          code_noise_m=0.5):
    """Feed n epochs of a consistent pseudolite observable: code pr with
    noise, carrier phase tracking the same clock offset (carrier-clean)."""
    for _ in range(n):
        dt_true = dt_clk_s + r_m / C
        pr = C * dt_true + rng.standard_normal() * code_noise_m
        # carrier phase: f * (dt - R/c) + constant ambiguity
        ci_cycles = F_L1 * (dt_true - r_m / C) + ci0_cycles
        aowr.update(pr, ci_cycles)


def test_aowr_convergence():
    rng = np.random.default_rng(1)
    aowr = AowrTimeTransfer(AowrConf(r_ps_true_m=0.4))
    dt_clk = 0.25
    _feed(aowr, dt_clk, 400, rng)
    dt_true = dt_clk + 0.4 / C
    # code average converges ~ noise/sqrt(N)
    assert abs(aowr.dt_s - dt_true) < 3 * (0.5 / C) / np.sqrt(400)
    # carrier-aided estimate removes the known geometric range R/c: it
    # estimates the pure clock offset at averaged-code precision
    assert abs(aowr.dt_by_cp_s - dt_clk) < 3 * (0.5 / C) / np.sqrt(400)
    clock_diff, est_tx = aowr.clock_products(rx_clock_offset_s=1e-3,
                                             rx_time_s=345600.0)
    assert clock_diff == pytest.approx(-aowr.dt_by_cp_s + 1e-3)
    assert est_tx == pytest.approx(345600.0 - aowr.dt_by_cp_s)


def test_aowr_outliers_rejected():
    rng = np.random.default_rng(2)
    aowr = AowrTimeTransfer(AowrConf(r_ps_true_m=0.4))
    dt_clk = 0.1
    _feed(aowr, dt_clk, 200, rng)
    before = aowr.dt_s
    # a burst of 10 deviated epochs (>3 m) must not move the average
    _feed(aowr, dt_clk + 50.0 / C, 10, rng)
    assert aowr.dt_s == before
    _feed(aowr, dt_clk, 50, rng)
    assert abs(aowr.dt_s - (dt_clk + 0.4 / C)) < 1.0 / C


def test_aowr_jump_acceptance():
    """A persistent consistent jump (pseudolite clock step) is adopted
    after dev_count_thresh epochs (the reference's dt_new logic)."""
    rng = np.random.default_rng(3)
    aowr = AowrTimeTransfer(AowrConf(r_ps_true_m=0.4, dev_count_thresh=100))
    _feed(aowr, 0.1, 200, rng)
    dt_new_clk = 0.1 + 20.0 / C       # 20 m step
    _feed(aowr, dt_new_clk, 150, rng)
    assert abs(aowr.dt_s - (dt_new_clk + 0.4 / C)) < 1.0 / C


def test_observables_ps_rollover_exception():
    """The pseudolite channel keeps raw (possibly negative / >302400 ms)
    travel time; normal channels get the week-rollover fix."""
    from gnss_sim_receiver_tpu.models.observables import (ObsConf,
                                                          ObservablesEngine)
    from gnss_sim_receiver_tpu.models.telemetry import TelemetryOutputs
    fs = 2_000_000.0
    eng = ObservablesEngine(ObsConf(fs=fs, interval_ms=20, ps_channel=1),
                            n_channels=2)
    t_len = 200
    sc = (np.arange(1, t_len + 1) * 2000.0)[:, None].repeat(2, 1)
    # ch0: normal sat TOW near week end; ch1 (ps): TOW far ahead of rx time
    # -> raw travel would wrap for a GNSS channel
    tow = np.zeros((t_len, 2))
    tow[:, 0] = 604_799_000.0 + np.arange(t_len)
    tow[:, 1] = 604_799_000.0 + 400_000.0 + np.arange(t_len)
    outs = {"prompt": np.ones((t_len, 2), np.complex64),
            "sample_counter": sc,
            "code_phase_samples": np.zeros((t_len, 2)),
            "carrier_doppler_hz": np.zeros((t_len, 2)),
            "acc_phase_cycles": np.zeros((t_len, 2)),
            "cn0_db_hz": np.full((t_len, 2), 45.0),
            "valid": np.ones((t_len, 2), bool)}
    tlm = TelemetryOutputs(tow_at_epoch_ms=tow,
                           tow_valid=np.ones((t_len, 2), bool),
                           new_ephemerides=[])
    eng.push_epochs(outs, tlm)
    epochs = eng.pull_ticks(int(t_len * 2000))
    assert epochs
    ep = epochs[-1]
    assert ep.valid.all()
    travel_ch0_ms = ep.pseudorange_m[0] / C * 1000.0
    travel_ch1_ms = ep.pseudorange_m[1] / C * 1000.0
    # ch0 wrapped into a plausible positive travel time
    assert 0.0 < travel_ch0_ms < 302_400.0
    # ps channel: raw negative travel time preserved (clock not GNSS-synced)
    assert travel_ch1_ms < -300_000.0


def test_channel_pinning():
    from gnss_sim_receiver_tpu.models.control import (AcquisitionManager,
                                                      ChannelState)
    mgr = AcquisitionManager(prns=range(1, 11), n_channels=4,
                             max_acq_channels=4, pinned={2: 20})
    mgr.schedule()
    assert mgr.channels[2].prn == 20
    # pinned PRN never enters the shared pool
    assert 20 not in mgr.pool
    # a pinned channel that fails re-arms with the same PRN
    for _ in range(3):
        mgr.on_acq_result(2, False)
    assert mgr.channels[2].state == ChannelState.IDLE
    mgr.schedule()
    assert mgr.channels[2].prn == 20


def test_fixed_clock_pvt_mode():
    """solve_pvt with the clock held solves position from 3+ satellites
    (rx clock propagation mode)."""
    from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
    from gnss_sim_receiver_tpu.models.pvt import PvtConf, solve_pvt
    from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
    from gnss_sim_receiver_tpu.utils import geodesy
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    t0 = 346000.0
    ephs = {e.prn: e for e in make_sky_constellation(40.0, -75.0,
                                                     toe=t0)[:8]}
    bias_s = 2.5e-4
    prns, pr, tow = [], [], []
    for p, e in ephs.items():
        pos, clk = e.sat_pos_clock(t0)
        el, _ = geodesy.elevation_azimuth(rx, pos)
        if np.degrees(el) < 10:
            continue
        # transmit-time-consistent measurement model (what the solver
        # inverts): signal received at GPS time t0 was transmitted at
        # t_tx = t0 - tau with tau from the Sagnac-rotated range at t_tx;
        # the decoded TOW is SV time t_tx + clk(t_tx)
        t_tx, tau = t0, 0.07
        for _ in range(10):
            pos, clk = e.sat_pos_clock(t_tx)
            ang = constants.GPS_OMEGA_EARTH_DOT * tau
            rot = np.array([[np.cos(ang), np.sin(ang), 0],
                            [-np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
            tau = np.linalg.norm(rot @ pos - rx) / C
            t_tx = t0 - tau
        r = tau * C
        prns.append(p)
        pr.append(r + C * (bias_s - clk + e.tgd))
        tow.append((t_tx + clk) * 1000.0)
    n = len(prns)
    assert n >= 4
    obs = ObservationEpoch(
        rx_time_s=t0 + bias_s, tick_sample=0,
        valid=np.ones(n, bool), pseudorange_m=np.array(pr),
        interp_tow_ms=np.array(tow), carrier_doppler_hz=np.zeros(n),
        carrier_phase_cycles=np.zeros(n), cn0_db_hz=np.full(n, 45.0))
    # free solution recovers the bias
    sol = solve_pvt(obs, prns, ephs, PvtConf())
    assert sol.valid
    assert abs(sol.rx_clock_bias_s - bias_s) < 1e-8
    # fixed-clock solution with only 3 satellites still solves position
    obs3 = ObservationEpoch(
        rx_time_s=t0 + bias_s, tick_sample=0,
        valid=np.array([True, True, True] + [False] * (n - 3)),
        pseudorange_m=np.array(pr), interp_tow_ms=np.array(tow),
        carrier_doppler_hz=np.zeros(n), carrier_phase_cycles=np.zeros(n),
        cn0_db_hz=np.full(n, 45.0))
    sol3 = solve_pvt(obs3, prns, ephs, PvtConf(max_gdop=1000.0),
                     x0=rx + 10.0, fixed_clock_bias_s=bias_s)
    assert sol3.valid
    assert np.linalg.norm(sol3.rx_ecef_m - rx) < 1.0
    assert sol3.rx_clock_bias_s == pytest.approx(bias_s)
    # excluding a channel drops it from the solution
    sol_ex = solve_pvt(obs, prns, ephs, PvtConf(),
                       exclude_channels=(0,))
    assert sol_ex.valid and sol_ex.n_sats == n - 1


def test_ring_file_writer(tmp_path):
    line = format_clock_difference_line(345600.123, -1.25e-1)
    assert line.endswith("\n") and "," in line
    w = RingFileWriter(tmp_path / "clk.csv", line_len=len(line), n_lines=4)
    for k in range(6):   # wraps around
        w.write_line(format_clock_difference_line(345600.0 + k, 0.5))
    w.close()
    data = (tmp_path / "clk.csv").read_bytes()
    assert len(data) == 4 * len(line)
    assert b"345604." in data and b"345605." in data
    bias_line = format_rx_clock_bias_line(123456.78, 345600.1, 6.1e-4, 7)
    parts = bias_line.strip().split(",")
    assert parts[3] == "07" and float(parts[2]) == pytest.approx(6.1e-4)
