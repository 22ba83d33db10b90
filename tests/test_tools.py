"""Standalone utilities (reference src/utils/ parity): obsdiff,
rinex2assist, nav_listener, front_end_cal."""

import json
import socket
import threading

import numpy as np

from gnss_sim_receiver_tpu.models import outputs as out
from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
from gnss_sim_receiver_tpu.nav.ephemeris import (load_assistance,
                                                 make_sky_constellation)


def _epochs(n_sat=4, n_ep=10, bias=None):
    eps = []
    rng = np.random.default_rng(1)
    base_pr = 2.2e7 + rng.uniform(0, 2e6, n_sat)
    for k in range(n_ep):
        pr = base_pr + 100.0 * k
        if bias is not None:
            pr = pr + bias
        eps.append(ObservationEpoch(
            rx_time_s=345600.0 + 0.1 * k, tick_sample=0,
            valid=np.ones(n_sat, bool), pseudorange_m=pr.copy(),
            interp_tow_ms=pr / 3e8 * 1e3,
            carrier_doppler_hz=np.full(n_sat, 100.0),
            carrier_phase_cycles=pr / 0.19,
            cn0_db_hz=np.full(n_sat, 45.0)))
    return eps


def test_obsdiff(tmp_path):
    from gnss_sim_receiver_tpu.tools import obsdiff
    prns = [2, 7, 13, 21]
    a = tmp_path / "a.obs"
    b = tmp_path / "b.obs"
    out.write_rinex_obs(a, _epochs(), prns, 2200)
    bias = np.array([0.0, 0.5, 0.0, 0.0])
    out.write_rinex_obs(b, _epochs(bias=bias), prns, 2200)
    diffs = obsdiff.diff_obs(str(a), str(b))
    rep = obsdiff.stats(diffs)
    assert rep["n_sats"] == 4
    assert abs(rep["per_sat"]["G07"]["pr_mean"] + 0.5) < 2e-3
    assert abs(rep["per_sat"]["G02"]["pr_mean"]) < 2e-3
    # DD RMS picks up the one biased satellite
    assert 0.2 < rep["dd_pr_rms"] < 0.6
    # CLI: threshold pass/fail
    assert obsdiff.main([str(a), str(b), "--dd-pr-rms-max", "1.0"]) == 0
    assert obsdiff.main([str(a), str(b), "--dd-pr-rms-max", "0.1"]) == 1


def test_rinex2assist(tmp_path, capsys):
    from gnss_sim_receiver_tpu.tools import rinex2assist
    ephs = {}
    for e in make_sky_constellation(40.0, -75.0, toe=346560.0)[:3]:
        e.week, e.toc = 2200, e.toe
        ephs[e.prn] = e
    nav = tmp_path / "brdc.nav"
    out.write_rinex_nav(nav, ephs, 2200)
    dst = tmp_path / "assist.json"
    assert rinex2assist.main([str(nav), "-o", str(dst)]) == 0
    back = load_assistance(dst)
    back_ephs = back[0] if isinstance(back, tuple) else back
    assert set(back_ephs) == set(ephs)
    p0, _ = ephs[list(ephs)[0]].sat_pos_clock(np.array([346700.0]))
    p1, _ = back_ephs[list(ephs)[0]].sat_pos_clock(np.array([346700.0]))
    assert np.abs(p0 - p1).max() < 1e-3


def test_nav_listener():
    from gnss_sim_receiver_tpu.monitor.sinks import NavMessageUdpSink
    from gnss_sim_receiver_tpu.tools import nav_listener
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    got = {}

    def run():
        import io
        buf = io.StringIO()
        got["n"] = nav_listener.listen(port, host="127.0.0.1",
                                       max_messages=2, timeout_s=5.0,
                                       out=buf)
        got["text"] = buf.getvalue()

    th = threading.Thread(target=run)
    th.start()
    import time
    time.sleep(0.3)
    sink = NavMessageUdpSink(["127.0.0.1"], port)
    for _ in range(2):
        sink.send_subframe(7, 345600000, np.ones(30, np.int64))
    th.join(timeout=10)
    assert got["n"] == 2
    assert "PRN 7" in got["text"]


def test_front_end_cal():
    """A capture with a deliberate +1.9 kHz LO offset: the estimated
    common offset must land within an acquisition bin of truth
    (front_end_cal.cc IF-calibration role)."""
    from gnss_sim_receiver_tpu.sim.scenario import build_static_scenario
    from gnss_sim_receiver_tpu.sim import generate_baseband
    from gnss_sim_receiver_tpu.tools.front_end_cal import estimate_if_offset
    from gnss_sim_receiver_tpu.utils import geodesy

    fs = 2_000_000.0
    t0 = 345600.0
    lo_offset = 1900.0
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    ephs = {e.prn: e for e in make_sky_constellation(40.0, -75.0,
                                                     toe=t0 + 600)[:6]}
    sats = build_static_scenario(list(ephs.values()), rx, t0, 0.2,
                                 cn0_db_hz=48.0)
    x = generate_baseband(sats, fs, int(fs * 0.2), noise=True, seed=4)
    n = np.arange(len(x))
    x = (x * np.exp(2j * np.pi * lo_offset * n / fs)).astype(np.complex64)
    offset, rep = estimate_if_offset(x, fs, ephs, rx, t0, doppler_max=8000.0)
    assert rep["detected_with_eph"] >= 4
    assert abs(offset - lo_offset) < 260.0, rep
