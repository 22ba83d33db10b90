"""glog-role logging layer (reference LOG/VLOG via glog; SURVEY aux
subsystems): severity file output, VLOG gating, control-plane wiring."""

import logging

import numpy as np

from gnss_sim_receiver_tpu.utils import glog


def test_init_writes_file_and_gates_vlog(tmp_path):
    path = glog.init(log_dir=tmp_path, verbosity=1, also_stderr=False)
    log = glog.logger("testmod")
    log.info("hello %d", 7)
    glog.vlog(1, "visible")
    glog.vlog(2, "gated out")
    for h in logging.getLogger("gnss_sim_receiver_tpu").handlers:
        h.flush()
    txt = path.read_text()
    assert "hello 7" in txt
    assert "visible" in txt and "gated out" not in txt
    # glog-style line prefix: severity letter + MMDD time + module]
    line = [ln for ln in txt.splitlines() if "hello 7" in ln][0]
    assert line[0] == "I" and "]" in line
    glog.init(verbosity=0, also_stderr=False)   # reset for other tests


def test_control_plane_logs_events(tmp_path):
    from gnss_sim_receiver_tpu.models.control import AcquisitionManager

    path = glog.init(log_dir=tmp_path, verbosity=0, also_stderr=False)
    mgr = AcquisitionManager(prns=(7, 8, 9), n_channels=2)
    mgr.schedule()
    mgr.on_acq_result(0, True, doppler_hz=1250.0)
    mgr.on_tracking_lost(0)
    for h in logging.getLogger("gnss_sim_receiver_tpu").handlers:
        h.flush()
    txt = path.read_text()
    assert "acquisition OK" in txt and "1250" in txt
    assert "loss of lock" in txt
    glog.init(verbosity=0, also_stderr=False)
