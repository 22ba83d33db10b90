"""TCP telecommand tests (reference analogue: tcp_cmd_interface usage in
control_thread tests)."""

import socket

from gnss_sim_receiver_tpu.monitor.tcp_cmd import TcpCmdServer


class _FakeControl:
    def __init__(self):
        self.commands = []

    def status_text(self):
        return "Current receiver status: 3 channels tracking, PVT valid"

    def on_command(self, name):
        self.commands.append(name)
        return f"OK: {name} executed"


def _send(port, lines):
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        fh = s.makefile("rw", newline="\n")
        out = []
        for line in lines:
            fh.write(line + "\n")
            fh.flush()
            out.append(fh.readline().strip())
        fh.write("exit\n")
        fh.flush()
        return out


def test_tcp_commands_roundtrip():
    ctl = _FakeControl()
    srv = TcpCmdServer(ctl)
    try:
        replies = _send(srv.port, ["status", "coldstart", "standby", "bogus"])
        assert "tracking" in replies[0]
        assert replies[1] == "OK: coldstart executed"
        assert replies[2] == "OK: standby executed"
        assert replies[3].startswith("ERROR")
        assert ctl.commands == ["coldstart", "standby"]
    finally:
        srv.close()


def test_tcp_multiple_clients():
    ctl = _FakeControl()
    srv = TcpCmdServer(ctl)
    try:
        a = _send(srv.port, ["reset"])
        b = _send(srv.port, ["hotstart"])
        assert a == ["OK: reset executed"]
        assert b == ["OK: hotstart executed"]
    finally:
        srv.close()
