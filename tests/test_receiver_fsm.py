"""Control-plane tests: acquisition manager FSM + end-to-end lock loss and
re-acquisition (reference analogues: channel FSM / flowgraph apply_action
tests, gnss_flowgraph_test.cc)."""

import numpy as np

from gnss_sim_receiver_tpu.models.control import (AcquisitionManager,
                                                  ChannelEvent, ChannelState)
from gnss_sim_receiver_tpu.models.receiver import Receiver, ReceiverConf
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 2_000_000.0


def test_manager_assigns_and_rotates():
    mgr = AcquisitionManager([1, 2, 3, 4], n_channels=2, max_acq_channels=2,
                             max_acq_fails_per_prn=2)
    armed = mgr.schedule()
    assert armed == [0, 1]
    assert [mgr.channels[c].prn for c in (0, 1)] == [1, 2]
    # channel 0 succeeds, channel 1 fails out and rotates
    mgr.on_acq_result(0, True, doppler_hz=1000.0)
    assert mgr.channels[0].state == ChannelState.TRACKING
    mgr.on_acq_result(1, False)
    assert mgr.channels[1].state == ChannelState.ACQUIRING
    mgr.on_acq_result(1, False)
    assert mgr.channels[1].state == ChannelState.IDLE
    mgr.schedule()
    assert mgr.channels[1].prn not in (0, 1)  # moved on, never PRN in use
    # lock loss returns the channel to the pool cycle
    mgr.on_tracking_lost(0)
    assert mgr.channels[0].state == ChannelState.IDLE
    assert (0, ChannelEvent.TRK_LOST) in mgr.events
    mgr.schedule()
    assert mgr.channels[0].state == ChannelState.ACQUIRING


def test_manager_never_duplicates_prn():
    mgr = AcquisitionManager([7, 8], n_channels=4, max_acq_channels=4)
    mgr.schedule()
    prns = [c.prn for c in mgr.channels if c.state == ChannelState.ACQUIRING]
    assert sorted(prns) == [7, 8]  # only 2 assignable, no duplicates


def test_lock_loss_triggers_reacquisition():
    """PRN 5 vanishes mid-run: its channel must emit TRK_LOST and go back
    to acquisition while PRN 9 keeps tracking."""
    bits = np.ones(1500, np.int8)
    sats_on = [
        SatelliteSignalParams(prn=5, cn0_db_hz=48.0, doppler_hz=1200.0,
                              delay_chips=50.0, nav_bits=bits),
        SatelliteSignalParams(prn=9, cn0_db_hz=48.0, doppler_hz=-800.0,
                              delay_chips=700.0, nav_bits=bits),
    ]
    n_on = int(FS * 5.0)
    n_total = int(FS * 11.0)
    x_on = generate_baseband(sats_on, FS, n_on, noise=True, seed=4)
    x_off = generate_baseband(sats_on[1:], FS, n_total - n_on,
                              start_sample=n_on, noise=True, seed=4)
    x = np.concatenate([x_on, x_off])

    conf = ReceiverConf(fs=FS, prns=(5, 9), max_channels=2,
                        max_acq_channels=2, chunk_epochs=500)
    run = Receiver(conf).process_array(x)
    trk_lost = [(c, e) for c, e in run.events if e == ChannelEvent.TRK_LOST]
    assert len(trk_lost) >= 1
    lost_ch = trk_lost[0][0]
    # the surviving channel still tracks PRN 9
    other = 1 - lost_ch
    assert run.channel_states[other] == ChannelState.TRACKING
    assert run.channel_prns[other] == 9
    # the lost channel went back to acquisition (PRN 5 is gone, so it ends
    # in ACQUIRING or IDLE, not TRACKING)
    assert run.channel_states[lost_ch] != ChannelState.TRACKING
    # re-acquisition attempts were made after the loss
    ev_after = run.events[run.events.index(trk_lost[0]) + 1:]
    assert any(c == lost_ch and e == ChannelEvent.ACQ_FAIL
               for c, e in ev_after)
