"""Live control plane: streaming chunk-feed + TCP telecommand e2e.

The round-2 verdict's task #3: a test that drives warm-fix -> standby ->
hotstart -> refix over TCP against a RUNNING receiver (the reference's
TcpCmdInterface -> ControlThread -> flowgraph apply_action path,
tcp_cmd_interface.cc:46-176, gnss_flowgraph.cc:1991-2005).  The receiver
here is a ReceiverSession in streaming mode: samples are fed in 1 s
chunks while commands arrive on the TCP socket between feeds.
"""

import socket

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models.control import ChannelState
from gnss_sim_receiver_tpu.models.receiver import Receiver, ReceiverConf
from gnss_sim_receiver_tpu.monitor.tcp_cmd import TcpCmdServer
from tests.fixtures import (FS, control_scenario_capture,
                            scenario_ephemerides, rx_true_ecef)


def _cmd(port, line):
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        fh = s.makefile("rw", newline="\n")
        fh.write(line + "\n")
        fh.flush()
        reply = fh.readline().strip()
        fh.write("exit\n")
        fh.flush()
        return reply


def test_streaming_session_matches_batch():
    """feed()-driven streaming produces the same fixes as process_array
    over the same capture."""
    x, truth = control_scenario_capture()
    x = x[: int(FS * 16)]
    ephs = scenario_ephemerides()
    conf = ReceiverConf(fs=FS, prns=tuple(range(1, 11)), max_channels=8)

    batch = Receiver(conf).process_array(x, ephemerides=dict(ephs))

    s = Receiver(conf).start_session(ephemerides=dict(ephs))
    step = int(FS * 1.0)
    for k in range(0, len(x), step):
        s.feed(x[k:k + step])
    s.run_to_end()
    run = s.result()

    assert len(run.solutions) > 0
    # same fix count (+-1 for tail-chunk quantization differences)
    assert abs(len(run.solutions) - len(batch.solutions)) <= 2
    # before any re-acquisition wave the two modes process identical
    # chunks: early fixes must agree tightly
    d0 = max(np.linalg.norm(run.solutions[i].rx_ecef_m
                            - batch.solutions[i].rx_ecef_m)
             for i in range(min(4, len(run.solutions))))
    assert d0 < 0.5, d0
    # mid-run re-acquisitions may land on different millisecond
    # boundaries between the modes (cursor/chunk phases differ), which
    # shifts the re-acquired channels' handoff code phases and leaves a
    # small constant inter-mode bias — bound it at the few-meter level
    d = np.linalg.norm(run.solutions[-1].rx_ecef_m
                       - batch.solutions[-1].rx_ecef_m)
    assert d < 3.0, d


def test_tcp_control_standby_hotstart_refix():
    x, truth = control_scenario_capture()
    ephs = scenario_ephemerides()
    conf = ReceiverConf(fs=FS, prns=tuple(range(1, 11)), max_channels=8)
    session = Receiver(conf).start_session(ephemerides=dict(ephs))
    srv = TcpCmdServer(session)
    try:
        assert _cmd(srv.port, "status").startswith("running")

        step = int(FS * 1.0)
        pos = 0

        def feed_seconds(n):
            nonlocal pos
            for _ in range(n):
                session.feed(x[pos:pos + step])
                pos += step

        # warm start: ephemerides preloaded, fix needs only TOW anchor
        feed_seconds(16)
        assert session.solutions, "no warm fix within 16 s"
        n_fix_warm = len(session.solutions)
        t_warm_fix = session.solutions[0].rx_time_corrected_s

        # standby over TCP: channels park, inflow is discarded
        assert _cmd(srv.port, "standby") == "OK standby"
        feed_seconds(4)
        assert _cmd(srv.port, "status").startswith("standby")
        states = [c.state for rt in session.chains
                  for c in rt.mgr.channels]
        assert all(s == ChannelState.IDLE for s in states)
        assert len(session.solutions) == n_fix_warm

        # hotstart over TCP: ephemerides retained -> quick refix
        assert _cmd(srv.port, "hotstart") == "OK hotstart"
        feed_seconds(int(len(x) / step) - 20)
        session.run_to_end()
        run = session.result()
        assert len(run.solutions) > n_fix_warm, "no refix after hotstart"
        err = np.linalg.norm(run.solutions[-1].rx_ecef_m
                             - np.asarray(truth))
        assert err < 20.0, err
        # ephemerides survived standby/hotstart (no re-decode needed)
        assert len(run.ephemerides) >= 6
    finally:
        srv.close()


def test_coldstart_drops_assistance():
    x, _ = control_scenario_capture()
    ephs = scenario_ephemerides()
    conf = ReceiverConf(fs=FS, prns=tuple(range(1, 11)), max_channels=8)
    session = Receiver(conf).start_session(ephemerides=dict(ephs))
    assert session.ephemerides
    session.coldstart()
    assert not session.ephemerides
    assert not session._standby


def test_tlm_timeout_recycles_dead_channel():
    """A channel tracking a signal that never yields TOW (noise lock /
    wrong PRN) is recycled after tlm_timeout_s (the telemetry-timeout +
    bit-sync-limit fail-safes)."""
    x, _ = control_scenario_capture()
    x = x[: int(FS * 14)]
    conf = ReceiverConf(fs=FS, prns=tuple(range(1, 11)), max_channels=8,
                        tlm_timeout_s=6.0)
    session = Receiver(conf).start_session()
    session.attach_array(x)
    session.run_to_end()
    # with a 6 s timeout and ~8 s to first subframe, every channel gets
    # recycled at least once: TRK_LOST events must exist even though the
    # signals are healthy (the fail-safe fired), and channels re-acquire
    from gnss_sim_receiver_tpu.models.control import ChannelEvent
    run = session.result()
    assert any(ev == ChannelEvent.TRK_LOST for _, ev in run.events)
