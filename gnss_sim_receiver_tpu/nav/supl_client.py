"""Network A-GNSS assistance client/server (the reference SUPL client's
ROLE: fetch ephemeris assistance over TCP before startup so a receiver
cold-starts warm — control_thread.cc assist_GNSS +
gnss_sdr_supl_client.{h,cc}).

Scope note (honest): the reference speaks SUPL v1 ULP/RRLP with ASN.1
PER encoding to carrier SUPL servers (~70 kLoC of generated codecs).
This module implements the same receiver-facing role with a minimal
framed transport — 4-byte big-endian length + the reference-compatible
boost-XML ephemeris archive (nav.agnss_xml) as payload — so a fleet can
run its own assistance server and receivers warm-start over the network.
A wire-compatible ASN.1 SUPL stack remains future work and is tracked as
such in docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import io
import socket
import struct
import tempfile
import threading


def serve_assistance(ephemerides: dict, host: str = "127.0.0.1",
                     port: int = 0):
    """Serve the ephemeris set to every client that connects.
    Returns (port, server_socket); close the socket to stop."""
    from gnss_sim_receiver_tpu.nav import agnss_xml
    with tempfile.NamedTemporaryFile("w+", suffix=".xml",
                                     delete=False) as fh:
        path = fh.name
    agnss_xml.write_gps_ephemeris_xml(path, ephemerides)
    payload = open(path, "rb").read()
    framed = struct.pack(">I", len(payload)) + payload

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(4)

    def _run():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            with conn:
                try:
                    conn.sendall(framed)
                except OSError:
                    pass

    threading.Thread(target=_run, daemon=True).start()
    return srv.getsockname()[1], srv


def fetch_assistance(host: str, port: int, timeout_s: float = 10.0) -> dict:
    """-> {prn: GpsEphemeris} fetched from an assistance server."""
    from gnss_sim_receiver_tpu.nav import agnss_xml
    with socket.create_connection((host, port), timeout=timeout_s) as s:
        s.settimeout(timeout_s)
        hdr = b""
        while len(hdr) < 4:
            b = s.recv(4 - len(hdr))
            if not b:
                raise ConnectionError("assistance server closed early")
            hdr += b
        (n,) = struct.unpack(">I", hdr)
        buf = io.BytesIO()
        while buf.tell() < n:
            b = s.recv(min(65536, n - buf.tell()))
            if not b:
                raise ConnectionError("assistance payload truncated")
            buf.write(b)
    with tempfile.NamedTemporaryFile("wb", suffix=".xml",
                                     delete=False) as fh:
        fh.write(buf.getvalue())
        path = fh.name
    return agnss_xml.read_gps_ephemeris_xml(path)
