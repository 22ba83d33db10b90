"""nav_listener: UDP client printing navigation-message monitor packets
(reference src/utils/nav-listener — consumes the nav_message.proto
stream emitted by monitor.sinks.NavMessageUdpSink)."""

from __future__ import annotations

import argparse
import socket
import sys


def listen(port: int, host: str = "0.0.0.0", max_messages: int | None = None,
           timeout_s: float | None = None, out=sys.stdout):
    from gnss_sim_receiver_tpu.monitor import nav_message_pb2
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((host, port))
    if timeout_s:
        sock.settimeout(timeout_s)
    n = 0
    try:
        while max_messages is None or n < max_messages:
            try:
                data, _ = sock.recvfrom(65536)
            except socket.timeout:
                break
            msg = nav_message_pb2.navMsg()
            msg.ParseFromString(data)
            print(f"{msg.system} {msg.signal} PRN {msg.prn} "
                  f"TOW {msg.tow_at_current_symbol_ms} ms: "
                  f"{msg.nav_message}", file=out)
            n += 1
    finally:
        sock.close()
    return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("port", type=int)
    ap.add_argument("--count", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=None)
    args = ap.parse_args(argv)
    listen(args.port, max_messages=args.count, timeout_s=args.timeout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
