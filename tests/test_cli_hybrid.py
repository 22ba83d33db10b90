"""Hybrid (GPS L1 + Galileo E1B) conf-driven CLI run + multi-GNSS RINEX.

Round-2 verdict task #5: the flagship "reference confs drive all chains"
story must survive a multi-constellation run — the CLI completes (mixed
int/tuple ephemeris keys print fine) and writes parseable multi-GNSS
RINEX obs + nav files (rinex_printer.cc multi-system role)."""

import textwrap

import numpy as np
import pytest

from gnss_sim_receiver_tpu.__main__ import main
from gnss_sim_receiver_tpu.models import outputs as out
from gnss_sim_receiver_tpu.utils.sample_io import write_samples
from tests.test_hybrid_position import (DUR, FS, GAL_PRNS, GPS_PRNS,
                                        hybrid_capture)

CONF = """\
[GNSS-SDR]
GNSS-SDR.internal_fs_sps={fs}
SignalSource.implementation=File_Signal_Source
SignalSource.filename={filename}
SignalSource.item_type=ishort
SignalSource.sampling_frequency={fs}
Channels_1C.count=4
Channels_1B.count=5
Channels.in_acquisition=9
Channel0.satellite=1
Channel1.satellite=3
Channel2.satellite=4
Channel3.satellite=5
Channel4.satellite=11
Channel5.satellite=12
Channel6.satellite=13
Channel7.satellite=14
Channel8.satellite=15
Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition
Tracking_1C.implementation=GPS_L1_CA_DLL_PLL_Tracking
Acquisition_1B.implementation=Galileo_E1_PCPS_Ambiguous_Acquisition
Tracking_1B.implementation=Galileo_E1_DLL_PLL_VEML_Tracking
PVT.implementation=RTKLIB_PVT
PVT.positioning_mode=Single
PVT.flag_rinex=true
PVT.rinex_output_path={obs_path}
PVT.rinex_nav_output_path={nav_path}
"""


def test_cli_hybrid_run_writes_multignss_rinex(tmp_path, capsys,
                                               hybrid_capture):
    x, _ = hybrid_capture
    cap = tmp_path / "cap.ishort"
    write_samples(cap, x, "ishort", scale=200.0)
    obs_path = tmp_path / "hyb.obs"
    nav_path = tmp_path / "hyb.nav"
    conf = tmp_path / "rx.conf"
    conf.write_text(textwrap.dedent(CONF.format(
        fs=int(FS), filename=cap, obs_path=obs_path, nav_path=nav_path)))

    rc = main([f"--config_file={conf}"])
    text = capsys.readouterr().out
    assert rc == 0, text
    # mixed-key ephemeris print didn't crash and shows both systems
    assert "Ephemerides decoded" in text
    assert "('Galileo'" in text

    # obs: parseable, contains satellites of both systems
    epochs, prns, systems = out.read_rinex_obs(obs_path)
    assert epochs
    pairs = set(zip(systems, prns))
    assert any(s == "GPS" and p in GPS_PRNS for s, p in pairs), pairs
    assert any(s == "Galileo" and p in GAL_PRNS for s, p in pairs), pairs
    header = obs_path.read_text().split("END OF HEADER")[0]
    assert "M: MIXED" in header
    assert "C1C L1C D1C S1C" in header
    assert "C1B L1B D1B S1B" in header

    # nav: G and E records present
    nav = nav_path.read_text()
    assert any(ln.startswith("G0") or ln.startswith("G1")
               for ln in nav.splitlines())
    assert any(ln.startswith("E1") for ln in nav.splitlines())


def test_cli_rtcm_output(tmp_path, hybrid_capture):
    """PVT.rtcm_output_file_enabled (rtcm_printer role): the run writes
    a decodable RTCM 3.x stream — station 1005, ephemeris and MSM
    frames — from the rover's own observables."""
    from gnss_sim_receiver_tpu.models.rtcm import BitReader, iter_frames

    x, _ = hybrid_capture
    cap = tmp_path / "cap.ishort"
    write_samples(cap, x, "ishort", scale=200.0)
    conf = tmp_path / "rx.conf"
    conf.write_text(textwrap.dedent(CONF.format(
        fs=int(FS), filename=cap, obs_path=tmp_path / "o.obs",
        nav_path=tmp_path / "o.nav"))
        + f"PVT.rtcm_output_file_enabled=true\n"
          f"PVT.rtcm_output_file_path={tmp_path}/out.rtcm\n"
          f"PVT.rtcm_station_id=732\n")
    rc = main([f"--config_file={conf}"])
    assert rc == 0
    data = (tmp_path / "out.rtcm").read_bytes()
    msgs = [BitReader(p).u(12) for p in iter_frames(data)]
    assert 1005 in msgs
    assert 1019 in msgs                       # GPS ephemeris
    assert any(1071 <= m <= 1077 for m in msgs)   # GPS MSM
