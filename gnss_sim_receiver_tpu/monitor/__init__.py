"""UDP monitoring: protobuf streaming of per-channel synchro state and PVT
solutions, wire-compatible with the reference's monitor subsystem
(src/core/monitor/gnss_synchro_monitor.cc + serdes_gnss_synchro.h and
src/algorithms/PVT/libs/monitor_pvt_udp_sink.cc)."""

from gnss_sim_receiver_tpu.monitor.sinks import (  # noqa: F401
    GnssSynchroUdpSink, MonitorPvtUdpSink)
