"""File_Timestamp_Signal_Source: GnssTime side-channel tags anchor the
receiver clock to the capture's absolute time (reference
adapters/file_timestamp_signal_source.cc + gnss_sdr_timestamp.cc ->
hybrid_observables_gs.cc:672-695)."""

import numpy as np

from gnss_sim_receiver_tpu.models.receiver import Receiver, ReceiverConf
from gnss_sim_receiver_tpu.utils.sample_io import (read_timestamp_file,
                                                   write_timestamp_file)
from tests.fixtures import FS, T0, static_scenario_capture, rx_true_ecef
from tests.test_control_plane import scenario_ephemerides


def test_timetag_file_roundtrip(tmp_path):
    p = tmp_path / "cap_timestamp.dat"
    sc = np.array([0, 2_000_000, 7_500_000], np.uint64)
    wk = np.array([2200, 2200, 2200], np.int32)
    tow = np.array([345_600_000, 345_601_000, 345_603_750], np.int32)
    write_timestamp_file(p, sc, wk, tow)
    # record layout matches the reference reader: 16 bytes per tag
    # (uint64 samplecount + int32 week + int32 tow_ms, little-endian)
    assert p.stat().st_size == 16 * 3
    raw = p.read_bytes()
    assert int.from_bytes(raw[0:8], "little") == 0
    assert int.from_bytes(raw[8:12], "little") == 2200
    assert int.from_bytes(raw[12:16], "little") == 345_600_000
    sc2, wk2, tow2 = read_timestamp_file(p)
    assert np.array_equal(sc, sc2) and np.array_equal(wk, wk2)
    assert np.array_equal(tow, tow2)


def test_timetags_anchor_receiver_clock():
    """With tags attached, the observables clock anchors to the
    capture's absolute time: rx epochs land on the tag timescale and the
    position fix is unchanged."""
    x, truth = static_scenario_capture()
    x = x[: int(FS * 14)]
    ephs = dict(scenario_ephemerides()) if False else None
    from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
    sel = [e for e in make_sky_constellation(40.0, -75.0, toe=T0 + 600)
           if e.prn in (1, 3, 4, 5, 9, 10)]
    ephs = {e.prn: e for e in sel}

    conf = ReceiverConf(fs=FS, prns=tuple(range(1, 11)), max_channels=8)
    s = Receiver(conf).start_session(ephemerides=dict(ephs))
    # tags: the capture starts exactly at T0 (the simulator's t=0)
    s.attach_time_tags([0, int(FS)], [2200, 2200],
                       [T0 * 1000.0, T0 * 1000.0 + 1000.0])
    s.attach_array(x)
    s.run_to_end()
    run = s.result()
    assert run.solutions, "no fix with time tags"
    pos = np.mean([sol.rx_ecef_m for sol in run.solutions[2:]], axis=0)
    assert np.linalg.norm(pos - rx_true_ecef()) < 5.0
    # epochs sit on the tag timescale: first epoch's rx time is within
    # one tick of T0 + first-tick time, on the 20 ms grid
    t0_rx = run.observation_epochs[0].rx_time_s
    assert abs((t0_rx * 1000.0) % 20.0) < 1e-6
    tick_s = run.observation_epochs[0].tick_sample / FS
    # absolute anchor: rx time == capture time + ~travel-time-free offset
    assert abs(t0_rx - (T0 + tick_s)) < 0.050
    assert s.obs_eng.week == 2200
