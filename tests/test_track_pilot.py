"""track_pilot: loops on the E1-C pilot, data-prompt correlator on E1-B.

Round-2 verdict task #6's pilot half (reference default E1 configuration,
Tracking_1B.track_pilot=true, dll_pll_veml_tracking.cc:1050-1061): a
capture carrying BOTH E1 components (E1-B with I/NAV symbols, E1-C with
the CS25 secondary) is tracked on the pilot while I/NAV pages decode from
the data-prompt tap."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import signals
from gnss_sim_receiver_tpu.models.control import ChannelState
from gnss_sim_receiver_tpu.models.receiver import (Receiver, ReceiverConf,
                                                   galileo_e1b_chain)
from gnss_sim_receiver_tpu.nav import inav
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband

FS = 4_000_000.0
PRN = 11


def _e1_dual_component_capture(dur_s=16.0, dop=1700.0, delay=812.25,
                               seed=6):
    from gnss_sim_receiver_tpu.nav.ephemeris import make_sky_constellation
    import dataclasses
    base = make_sky_constellation(40.0, -75.0, toe=345600.0 + 600)[0]
    eph = dataclasses.replace(base, system="Galileo", prn=PRN,
                              toe=round((345600.0 + 600) / 60) * 60,
                              toc=round((345600.0 + 600) / 60) * 60,
                              iod_nav=55)
    n_rep = int(np.ceil((dur_s + 12.0) / (5 * inav.PAGE_SECONDS)))
    stream = inav.pages_for_ephemeris(eph, t0_gst_s=345600.0,
                                      n_repeats=n_rep)
    bits_b = (2 * stream - 1).astype(np.int8)
    cs25 = signals.e1c_secondary_code().astype(np.int8)
    bits_c = np.tile(cs25, int(np.ceil(dur_s * 250 / 25)) + 2)
    amp_split = 10.0 * np.log10(0.5)       # both components at -3 dB
    sats = [
        SatelliteSignalParams(prn=PRN, system="Galileo", signal="1B",
                              cn0_db_hz=48.0 + amp_split, doppler_hz=dop,
                              delay_chips=delay, nav_bits=bits_b),
        SatelliteSignalParams(prn=PRN, system="Galileo", signal="1P",
                              cn0_db_hz=48.0 + amp_split, doppler_hz=dop,
                              delay_chips=delay, nav_bits=bits_c),
    ]
    return generate_baseband(sats, FS, int(FS * dur_s), noise=True,
                             seed=seed), eph


@pytest.fixture(scope="module")
def pilot_capture():
    return _e1_dual_component_capture()


def test_e1_pilot_tracked_inav_decodes(pilot_capture):
    x, eph = pilot_capture
    conf = ReceiverConf(
        fs=FS, gps_chain=False,
        chains=(galileo_e1b_chain(FS, prns=(PRN,), n_channels=1,
                                  track_pilot=True),))
    run = Receiver(conf).process_array(x)
    assert run.channel_states[0] == ChannelState.TRACKING
    # I/NAV ephemeris decoded from the DATA component while the loops
    # ran on the pilot
    assert ("Galileo", PRN) in run.ephemerides
    assert run.ephemerides[("Galileo", PRN)].iod_nav == 55


def test_e1_pilot_secondary_sync_engages(pilot_capture):
    """The CS25 secondary must actually sync (sec_synced on device)."""
    x, _ = pilot_capture
    conf = ReceiverConf(
        fs=FS, gps_chain=False,
        chains=(galileo_e1b_chain(FS, prns=(PRN,), n_channels=1,
                                  track_pilot=True),))
    session = Receiver(conf).start_session()
    session.attach_array(x[: int(FS * 6)])
    session.run_to_end()
    rt = session.chains[0]
    assert bool(np.asarray(rt.trk.state.sec_synced)[0])
