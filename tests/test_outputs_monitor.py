"""Output writers + UDP monitor tests (reference analogues: nmea/kml/gpx
printer tests + protobuf_test.cc serdes roundtrip + UDP loopback)."""

import socket

import numpy as np
import pytest

from gnss_sim_receiver_tpu.models.observables import ObservationEpoch
from gnss_sim_receiver_tpu.models.outputs import (geohash, nmea_gga,
                                                  nmea_rmc, write_geojson,
                                                  write_gpx, write_kml,
                                                  write_nmea,
                                                  write_rinex_nav,
                                                  write_rinex_obs)
from gnss_sim_receiver_tpu.models.pvt import PvtSolution
from gnss_sim_receiver_tpu.monitor import GnssSynchroUdpSink, MonitorPvtUdpSink
from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
from gnss_sim_receiver_tpu.utils import geodesy


@pytest.fixture
def sol():
    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    return PvtSolution(
        valid=True, rx_ecef_m=rx, rx_clock_bias_s=-0.06,
        rx_vel_ecef_ms=np.array([0.1, -0.2, 0.05]),
        rx_clock_drift_ss=1e-9, rx_time_corrected_s=345625.0,
        gdop=2.5, pdop=2.0, hdop=1.2, vdop=1.6, n_sats=6,
        residuals_m=np.zeros(6))


def test_nmea_sentences(sol):
    gga = nmea_gga(sol, week=2200)
    rmc = nmea_rmc(sol, week=2200)
    for s in (gga, rmc):
        assert s.startswith("$GP")
        body, cs = s[1:].split("*")
        acc = 0
        for ch in body:
            acc ^= ord(ch)
        assert f"{acc:02X}" == cs
    assert "4000.00" in gga  # 40 deg -> 4000.00... minutes format
    assert ",N," in gga and ",W," in gga
    assert ",06," in gga  # n sats


def test_track_files(tmp_path, sol):
    sols = [sol] * 3
    write_nmea(tmp_path / "t.nmea", sols, week=2200)
    write_kml(tmp_path / "t.kml", sols)
    write_gpx(tmp_path / "t.gpx", sols, week=2200)
    write_geojson(tmp_path / "t.geojson", sols)
    assert (tmp_path / "t.nmea").read_text().count("$GPGGA") == 3
    kml = (tmp_path / "t.kml").read_text()
    assert "<coordinates>" in kml and "-75.0" in kml
    assert "<trkpt" in (tmp_path / "t.gpx").read_text()
    import json
    gj = json.loads((tmp_path / "t.geojson").read_text())
    assert len(gj["geometry"]["coordinates"]) == 3


def test_geohash_known_value():
    # Wikipedia example: (42.605, -5.603) -> ezs42 at precision 5
    assert geohash(42.605, -5.603, 5) == "ezs42"


def _obs_epoch(n=3):
    return ObservationEpoch(
        rx_time_s=345620.0, tick_sample=40_000_000,
        valid=np.array([True] * n),
        pseudorange_m=np.full(n, 2.1e7) + np.arange(n) * 1e4,
        interp_tow_ms=np.full(n, 345619.93e3),
        carrier_doppler_hz=np.linspace(-1000, 1000, n),
        carrier_phase_cycles=np.linspace(0, 5e5, n),
        cn0_db_hz=np.full(n, 45.0))


def test_rinex_obs_and_nav(tmp_path):
    epochs = [_obs_epoch(), _obs_epoch()]
    write_rinex_obs(tmp_path / "t.obs", epochs, prns=[1, 7, 13], week=2200)
    txt = (tmp_path / "t.obs").read_text()
    assert "RINEX VERSION / TYPE" in txt
    assert "END OF HEADER" in txt
    assert txt.count("> 2022") == 2
    assert "G07" in txt
    ephs = {e.prn: e for e in make_sky_constellation(40.0, -75.0,
                                                     toe=346208.0)[:3]}
    write_rinex_nav(tmp_path / "t.nav", ephs, week=2200)
    nav = (tmp_path / "t.nav").read_text()
    assert "N: GNSS NAV DATA" in nav
    assert nav.count("\nG0") + nav.count("\nG1") >= 2


def test_pvt_udp_monitor_roundtrip(sol):
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    port = recv.getsockname()[1]
    recv.settimeout(5.0)
    sink = MonitorPvtUdpSink(["127.0.0.1"], port, week=2200)
    sink.send_solution(sol)
    data, _ = recv.recvfrom(65536)
    from gnss_sim_receiver_tpu.monitor import monitor_pvt_pb2
    m = monitor_pvt_pb2.MonitorPvt()
    m.ParseFromString(data)
    assert m.valid_sats == 6
    assert abs(m.latitude - 40.0) < 1e-6
    assert abs(m.height - 100.0) < 0.01
    assert m.geohash.startswith("dr")  # northeast US geohash prefix


def test_synchro_udp_monitor(sol):
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    port = recv.getsockname()[1]
    recv.settimeout(5.0)
    sink = GnssSynchroUdpSink(["127.0.0.1"], port, prns=[5, 9], fs=2e6,
                              decimation_factor=2)
    t_len, c = 4, 2
    outs = {
        "prompt": np.ones((t_len, c), np.complex64) * (100 + 5j),
        "cn0_db_hz": np.full((t_len, c), 44.0),
        "carrier_doppler_hz": np.full((t_len, c), 321.0),
        "acc_phase_cycles": np.zeros((t_len, c)),
        "code_phase_samples": np.zeros((t_len, c)),
        "sample_counter": np.arange(t_len * c).reshape(t_len, c),
        "valid": np.ones((t_len, c), bool),
    }
    sent = sink.push_track_epochs(outs)
    assert sent == 2  # decimation by 2
    from gnss_sim_receiver_tpu.monitor import gnss_synchro_pb2
    data, _ = recv.recvfrom(65536)
    m = gnss_synchro_pb2.Observables()
    m.ParseFromString(data)
    assert len(m.observable) == 2
    assert m.observable[0].prn == 5
    assert abs(m.observable[0].carrier_doppler_hz - 321.0) < 1e-9


def test_nav_message_udp_monitor():
    from gnss_sim_receiver_tpu.monitor.sinks import NavMessageUdpSink
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(5.0)
    sink = NavMessageUdpSink(["127.0.0.1"], recv.getsockname()[1])
    bits = np.tile([1, 0, 0, 0, 1, 0, 1, 1], 38)[:300]
    sink.send_subframe(7, 345606_000, bits)
    data, _ = recv.recvfrom(65536)
    from gnss_sim_receiver_tpu.monitor import nav_message_pb2
    m = nav_message_pb2.navMsg()
    m.ParseFromString(data)
    assert m.prn == 7
    assert m.signal == "1C"
    assert len(m.nav_message) == 300
    assert m.nav_message.startswith("10001011")


def test_output_enabled_aliases_and_xml(tmp_path):
    """Reference key spellings (PVT.kml_output_enabled /
    xml_output_enabled / *_rate_ms) drive the output products
    (rtklib_pvt.cc adapter key set)."""
    from types import SimpleNamespace

    from gnss_sim_receiver_tpu.__main__ import _write_outputs
    from gnss_sim_receiver_tpu.utils.config import InMemoryConfiguration

    rx = geodesy.llh_to_ecef(np.radians(40.0), np.radians(-75.0), 100.0)
    sols = [PvtSolution(
        valid=True, rx_ecef_m=rx, rx_clock_bias_s=-0.06,
        rx_vel_ecef_ms=np.zeros(3), rx_clock_drift_ss=1e-9,
        rx_time_corrected_s=345600.0 + 0.02 * k,
        gdop=2.5, pdop=2.0, hdop=1.2, vdop=1.6, n_sats=6,
        residuals_m=np.zeros(6)) for k in range(12)]
    run = SimpleNamespace(solutions=sols, observation_epochs=[],
                          ephemerides={}, channel_prns=[],
                          channel_systems=[])
    conf = InMemoryConfiguration()
    conf.set_property("PVT.kml_output_enabled", "true")
    conf.set_property("PVT.kml_output_path", str(tmp_path / "a.kml"))
    conf.set_property("PVT.kml_rate_ms", "100")
    conf.set_property("PVT.output_rate_ms", "20")
    conf.set_property("PVT.xml_output_enabled", "true")
    conf.set_property("PVT.xml_output_path", str(tmp_path / "a.xml"))
    _write_outputs(conf, run)
    assert (tmp_path / "a.kml").exists()
    xml = (tmp_path / "a.xml").read_text()
    assert "<pvt_solutions>" in xml and "<gdop>" in xml
    assert xml.count("<solution>") == len(run.solutions)
    # kml rate 100 ms vs 20 ms solver rate -> every 5th fix
    kml = (tmp_path / "a.kml").read_text()
    n_coords = len([ln for ln in kml.splitlines() if "," in ln
                    and "xml" not in ln])
    assert n_coords == (len(run.solutions) + 4) // 5
