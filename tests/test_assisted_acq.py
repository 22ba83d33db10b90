"""Doppler-assisted secondary-band acquisition.

Round-2 verdict task #7: an L1-locked PRN's Doppler, scaled by the
carrier ratio, seeds the L2C search so the secondary band acquires with a
narrow (+-250 Hz) grid in one dwell instead of a cold full-grid sweep
(reference project_doppler + secondary-channel dispatch,
gnss_flowgraph.cc:1774-1795, 2615-2750)."""

import numpy as np

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models.control import ChannelState
from gnss_sim_receiver_tpu.models.receiver import (Receiver, ReceiverConf,
                                                   gps_l2c_chain)
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_500_000.0
F_RATIO = constants.GPS_L2_FREQ_HZ / constants.GPS_L1_FREQ_HZ


def _dual_band_capture(dur_s=6.0, dop_l1=-2613.0, seed=4):
    rng = np.random.default_rng(seed)
    bits = (rng.integers(0, 2, 1500) * 2 - 1).astype(np.int8)
    sats = [
        SatelliteSignalParams(prn=7, cn0_db_hz=48.0, doppler_hz=dop_l1,
                              delay_chips=317.25, nav_bits=bits),
        SatelliteSignalParams(prn=7, system="GPS", signal="2S",
                              cn0_db_hz=48.0,
                              doppler_hz=dop_l1 * F_RATIO,
                              delay_chips=4123.5, nav_bits=bits.copy()),
    ]
    return generate_baseband(sats, FS, int(FS * dur_s), noise=True,
                             seed=seed)


def test_l2c_acquires_via_doppler_assist():
    x = _dual_band_capture()
    dop_l1 = -2613.0
    conf = ReceiverConf(
        fs=FS, prns=(7,), max_channels=1, max_acq_channels=1,
        chains=(gps_l2c_chain(FS, prns=(7,), n_channels=1),))
    session = Receiver(conf).start_session()
    session.attach_array(x)
    session.run_to_end()
    run = session.result()

    # both bands end up tracking
    states = {(s, p): st for s, p, st in
              zip(["1C", "2S"], run.channel_prns, run.channel_states)}
    assert all(st == ChannelState.TRACKING
               for st in run.channel_states), run.channel_states

    # the 2S band acquired through the ASSISTED narrow-grid path, seeded
    # by the L1 Doppler scaled with the carrier ratio
    assert session.assist_log, "no assisted acquisition happened"
    sig, prn, center, detected = session.assist_log[0]
    assert sig == "2S" and prn == 7 and detected
    assert abs(center - dop_l1 * F_RATIO) < 50.0, center


def test_assist_gate_inactive_without_primary_chain():
    """A lone secondary-band chain must still cold-start (the gate only
    engages when a same-system primary chain exists)."""
    x = _dual_band_capture()
    conf = ReceiverConf(
        fs=FS, gps_chain=False,
        chains=(gps_l2c_chain(FS, prns=(7,), n_channels=1),))
    run = Receiver(conf).process_array(x)
    assert run.channel_states[0] == ChannelState.TRACKING
