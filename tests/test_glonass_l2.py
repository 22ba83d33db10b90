"""GLONASS L2 C/A ("2G") chain — round-2 verdict task #6's second half
(reference GLONASS_L2_CA blocks, glonass_l2_ca_pcps_acquisition.cc):
same 511-chip C/A code and GNAV stream on the 1246 MHz FDMA carrier."""

import numpy as np

from gnss_sim_receiver_tpu import constants, signals
from gnss_sim_receiver_tpu.models.control import ChannelState
from gnss_sim_receiver_tpu.models.factory import receiver_conf_from_config
from gnss_sim_receiver_tpu.models.receiver import (Receiver, ReceiverConf,
                                                   glonass_l2_chain)
from gnss_sim_receiver_tpu.nav import gnav
from gnss_sim_receiver_tpu.sim import SatelliteSignalParams, generate_baseband
from gnss_sim_receiver_tpu.utils.config import Configuration
from tests.test_glonass_chain import _test_eph

FS = 2_500_000.0


def test_glonass_l2_chain_conf():
    c = glonass_l2_chain(FS, prns=(5,), freq_slot=1)
    assert c.signal == "2G" and c.system == "GLONASS"
    assert c.trk.carrier_freq_hz == (constants.GLONASS_L2_FREQ_HZ
                                     + constants.GLONASS_L2_DFREQ_HZ)
    assert c.assist_wait
    # same C/A code as L1
    np.testing.assert_array_equal(
        c.code_provider(5), signals.subchip_table(signals.GLONASS_L1_CA, 5))


def test_glonass_l2_tracks():
    eph = _test_eph(slot=5, k=1)
    sym = gnav.strings_for_ephemeris(eph, t0_s=345600.0, n_repeats=1)
    bits = (2 * sym - 1).astype(np.int8)
    k = 1
    dop = k * constants.GLONASS_L2_DFREQ_HZ - 900.0
    sat = SatelliteSignalParams(prn=5, system="GLONASS", signal="2G",
                                cn0_db_hz=46.0, doppler_hz=dop,
                                delay_chips=133.5, nav_bits=bits,
                                # physical Doppler only drives the code
                                # (the slot offset does not)
                                code_doppler_hz=-900.0,
                                carrier_ref_hz=constants.GLONASS_L2_FREQ_HZ
                                + k * constants.GLONASS_L2_DFREQ_HZ)
    x = generate_baseband([sat], FS, int(FS * 6.0), noise=True, seed=9)
    conf = ReceiverConf(
        fs=FS, gps_chain=False,
        chains=(glonass_l2_chain(FS, prns=(5,), freq_slot=k),))
    run = Receiver(conf).process_array(x, collect_track_outputs=True)
    assert run.channel_states[0] == ChannelState.TRACKING
    to = run.track_outputs
    v = to["valid"][:, 0]
    d = to["carrier_doppler_hz"][v, 0]
    assert abs(d[-200:].mean() - dop) < 10.0, d[-200:].mean()


def test_factory_accepts_2g_conf():
    cfg = Configuration({
        "GNSS-SDR.internal_fs_sps": "2500000",
        "Channels_1C.count": "0",
        "Channels_2G.count": "3",
        "Acquisition_2G.implementation": "GLONASS_L2_CA_PCPS_Acquisition",
        "Tracking_2G.implementation": "GLONASS_L2_CA_DLL_PLL_Tracking",
    })
    rc = receiver_conf_from_config(cfg)
    sigs = [c.signal for c in rc.chains]
    assert "2G" in sigs
    c2 = [c for c in rc.chains if c.signal == "2G"][0]
    assert c2.system == "GLONASS"
    assert abs(c2.trk.carrier_freq_hz
               - (constants.GLONASS_L2_FREQ_HZ
                  + c2.freq_slot * constants.GLONASS_L2_DFREQ_HZ)) < 1.0
