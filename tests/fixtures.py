"""Shared test fixtures: cached static scenario capture."""

import os

import numpy as np

from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
from gnss_sim_receiver_tpu.sim import generate_baseband
from gnss_sim_receiver_tpu.sim.scenario import build_static_scenario
from gnss_sim_receiver_tpu.utils import geodesy

FS = 2_000_000.0
T0 = 345600.0
DUR = 26.0
RX_LLH = (40.0, -75.0, 100.0)
_CACHE = "/tmp/gnss_tpu_fixture_static_v1.npy"


def rx_true_ecef():
    return geodesy.llh_to_ecef(np.radians(RX_LLH[0]), np.radians(RX_LLH[1]),
                               RX_LLH[2])


def static_scenario_capture():
    """26 s, 6 satellites, GPS L1 C/A at 2 Msps, CN0 47 dB-Hz."""
    if os.path.exists(_CACHE):
        return np.load(_CACHE), rx_true_ecef()
    ephs = make_sky_constellation(RX_LLH[0], RX_LLH[1], toe=T0 + 600)
    sel = [e for e in ephs if e.prn in (1, 3, 4, 5, 9, 10)]
    sats = build_static_scenario(sel, rx_true_ecef(), T0, DUR,
                                 cn0_db_hz=47.0, subframe_cycle=(1, 2, 3))
    x = generate_baseband(sats, FS, int(FS * DUR), noise=True, seed=42,
                          bandlimit_oversample=4)
    np.save(_CACHE, x)
    return x, rx_true_ecef()
