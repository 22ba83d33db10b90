"""Live monitor wiring (VERDICT r4 #5 done-criterion): conf keys
instantiate the UDP sinks inside the session and a run STREAMS to them —
received by tools/nav_listener.py (nav messages) and local UDP listeners
(synchro / PVT / ephemeris), mirroring the reference's flowgraph wiring
(gnss_flowgraph.cc:194-273 + :1278, rtklib_pvt.cc:886-898)."""

import socket
import threading

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models.pvt import PvtConf
from gnss_sim_receiver_tpu.models.receiver import Receiver, ReceiverConf
from gnss_sim_receiver_tpu.monitor.sinks import build_monitors
from gnss_sim_receiver_tpu.utils.config import InMemoryConfiguration
from tests.fixtures import FS, control_scenario_capture, \
    scenario_ephemerides


def _udp_listener(results, key, port, parser, stop):
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", port))
    sock.settimeout(0.5)
    try:
        while not stop.is_set():
            try:
                data, _ = sock.recvfrom(65536)
            except socket.timeout:
                continue
            results.setdefault(key, []).append(parser(data))
    finally:
        sock.close()


def _free_ports(n):
    socks = [socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
             for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def test_conf_driven_monitors_stream_during_run():
    from gnss_sim_receiver_tpu.monitor import (gnss_synchro_pb2,
                                               gps_ephemeris_pb2,
                                               monitor_pvt_pb2)

    p_syn, p_pvt, p_nav, p_eph = _free_ports(4)
    cfg = InMemoryConfiguration({
        "Monitor.enable_monitor": "true",
        "Monitor.client_addresses": "127.0.0.1",
        "Monitor.udp_port": str(p_syn),
        "Monitor.decimation_factor": "50",
        "NavDataMonitor.enable_monitor": "true",
        "NavDataMonitor.client_addresses": "127.0.0.1",
        "NavDataMonitor.port": str(p_nav),
        "PVT.enable_monitor": "true",
        "PVT.monitor_client_addresses": "127.0.0.1",
        "PVT.monitor_udp_port": str(p_pvt),
        "PVT.enable_monitor_ephemeris": "true",
        "PVT.monitor_ephemeris_client_addresses": "127.0.0.1",
        "PVT.monitor_ephemeris_udp_port": str(p_eph),
    })
    monitors = build_monitors(cfg)
    assert monitors.any()
    assert monitors.synchro is not None and monitors.synchro.decim == 50
    assert monitors.pvt is not None and monitors.nav is not None
    assert monitors.ephemeris is not None

    results = {}
    stop = threading.Event()

    def parse_syn(d):
        m = gnss_synchro_pb2.Observables()
        m.ParseFromString(d)
        return m

    def parse_pvt(d):
        m = monitor_pvt_pb2.MonitorPvt()
        m.ParseFromString(d)
        return m

    def parse_eph(d):
        m = gps_ephemeris_pb2.GpsEphemeris()
        m.ParseFromString(d)
        return m

    threads = [
        threading.Thread(target=_udp_listener,
                         args=(results, k, p, f, stop), daemon=True)
        for k, p, f in (("synchro", p_syn, parse_syn),
                        ("pvt", p_pvt, parse_pvt),
                        ("eph", p_eph, parse_eph),
                        ("nav_raw", p_nav, lambda d: d))]
    for t in threads:
        t.start()

    # 26 s, no assistance: ephemerides must be DECODED live so the
    # ephemeris + nav taps stream real telemetry (same span as the
    # green e2e static test)
    x, truth = control_scenario_capture()
    x = x[: int(FS * 26)]
    conf = ReceiverConf(fs=FS, prns=tuple(range(1, 11)), max_channels=8,
                        pvt=PvtConf())
    rx = Receiver(conf)
    run = rx.process_array(x, monitors=monitors)
    stop.set()
    for t in threads:
        t.join(timeout=3.0)

    assert run.solutions, "scenario produced no fixes"
    # synchro tap: decimated tracking epochs with plausible payloads
    syn = results.get("synchro", [])
    assert len(syn) > 10, f"synchro datagrams: {len(syn)}"
    ob = syn[-1].observable[0]
    assert ob.system == "G" and ob.signal == "1C"
    assert 20.0 < ob.cn0_db_hz < 60.0
    # PVT tap: one MonitorPvt per fix, position matches the run
    pvt = results.get("pvt", [])
    assert len(pvt) == len(run.solutions), (len(pvt), len(run.solutions))
    last = pvt[-1]
    assert np.linalg.norm(
        np.array([last.pos_x, last.pos_y, last.pos_z])
        - run.solutions[-1].rx_ecef_m) < 1e-3
    # ephemeris tap: every decoded GPS ephemeris streamed
    eph = results.get("eph", [])
    assert len(eph) >= len(run.ephemerides), (len(eph),
                                              len(run.ephemerides))
    assert {m.PRN for m in eph} == set(run.ephemerides)
    # nav tap: raw subframe datagrams captured during the run, then
    # replayed through the reference-style nav_listener utility to prove
    # wire compatibility (300-bit LNAV subframes as navMsg protobuf)
    raw = results.get("nav_raw", [])
    assert len(raw) >= 5, f"nav datagrams: {len(raw)}"
    from gnss_sim_receiver_tpu.tools import nav_listener
    nav_out = []

    class _NavOut:
        def write(self, s):
            nav_out.append(s)

        def flush(self):
            pass

    (p_replay,) = _free_ports(1)
    nav_thread = threading.Thread(
        target=nav_listener.listen,
        kwargs=dict(port=p_replay, host="127.0.0.1", timeout_s=5.0,
                    max_messages=len(raw), out=_NavOut()), daemon=True)
    nav_thread.start()
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    import time
    time.sleep(0.3)
    for d in raw:
        sock.sendto(d, ("127.0.0.1", p_replay))
    nav_thread.join(timeout=10.0)
    text = "".join(nav_out)
    assert "PRN" in text, "nav_listener parsed nothing"
    lines = [ln for ln in text.splitlines() if ln]
    assert len(lines) == len(raw)
    # every payload is a full 300-bit subframe
    assert all(len(ln.rsplit(" ", 1)[-1]) == 300 for ln in lines)


def test_monitors_default_off():
    cfg = InMemoryConfiguration({})
    assert not build_monitors(cfg).any()
