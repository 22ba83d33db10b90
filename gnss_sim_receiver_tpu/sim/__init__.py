"""Signal simulator — the test fixture replacing the reference's in-tree
SignalGenerator block and the bladeGPS/gnss-sim external simulators."""

from gnss_sim_receiver_tpu.sim.signal_generator import (  # noqa: F401
    SatelliteSignalParams, generate_baseband, generate_to_file,
    cn0_to_amplitude)
