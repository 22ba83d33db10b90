"""Factory parity: every implemented signal chain is reachable from a
reference-style conf file (gnss_block_factory.cc:652-1335 dispatch), plus
the acquisition engine variants (fine-doppler iteration, Tong sequential
detector)."""

import numpy as np
import pytest

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.models.factory import receiver_conf_from_config
from gnss_sim_receiver_tpu.utils.config import InMemoryConfiguration

MULTI_CONF = {
    "GNSS-SDR.internal_fs_sps": "20000000",
    "Channels_1C.count": "4",
    "Channels_1B.count": "3",
    "Channels_2S.count": "2",
    "Channels_L5.count": "2",
    "Channels_5X.count": "2",
    "Channels_7X.count": "2",
    "Channels_1G.count": "3",
    "Channels_B1.count": "2",
    "Channels_B3.count": "2",
    "Acquisition_1C.implementation": "GPS_L1_CA_PCPS_Acquisition",
    "Acquisition_1B.implementation": "Galileo_E1_PCPS_Ambiguous_Acquisition",
    "Acquisition_2S.implementation": "GPS_L2_M_PCPS_Acquisition",
    "Acquisition_L5.implementation": "GPS_L5i_PCPS_Acquisition",
    "Acquisition_5X.implementation": "Galileo_E5a_Pcps_Acquisition",
    "Acquisition_7X.implementation": "Galileo_E5b_PCPS_Acquisition",
    "Acquisition_1G.implementation": "GLONASS_L1_CA_PCPS_Acquisition",
    "Acquisition_B1.implementation": "BEIDOU_B1I_PCPS_Acquisition",
    "Acquisition_B3.implementation": "BEIDOU_B3I_PCPS_Acquisition",
    "Tracking_1C.implementation": "GPS_L1_CA_DLL_PLL_Tracking",
    "Tracking_1B.implementation": "Galileo_E1_DLL_PLL_VEML_Tracking",
    "Tracking_2S.implementation": "GPS_L2_M_DLL_PLL_Tracking",
    "Tracking_L5.implementation": "GPS_L5_DLL_PLL_Tracking",
    "Tracking_5X.implementation": "Galileo_E5a_DLL_PLL_Tracking",
    "Tracking_7X.implementation": "Galileo_E5b_DLL_PLL_Tracking",
    "Tracking_1G.implementation": "GLONASS_L1_CA_DLL_PLL_Tracking",
    "Tracking_B1.implementation": "BEIDOU_B1I_DLL_PLL_Tracking",
    "Tracking_B3.implementation": "BEIDOU_B3I_DLL_PLL_Tracking",
    "Acquisition_1B.doppler_max": "6000",
    "Tracking_5X.pll_bw_hz": "20.0",
    "Tracking_2S.dll_bw_hz": "0.4",
}


def _conf(extra=None, base=MULTI_CONF):
    c = InMemoryConfiguration()
    for k, v in {**base, **(extra or {})}.items():
        c.set_property(k, v)
    return c


def test_all_nine_chains_from_conf():
    rc = receiver_conf_from_config(_conf())
    chains = rc.all_chains()
    sigs = [c.signal for c in chains]
    # GPS 1C + 8 other signal groups; 1G expands per FDMA slot
    assert sigs[0] == "1C" and rc.max_channels == 4
    for s in ("1B", "2S", "L5", "5X", "7X", "1G", "B1", "B3"):
        assert s in sigs, s
    by_sig = {}
    for c in chains:
        by_sig.setdefault(c.signal, []).append(c)
    assert sum(c.n_channels for c in by_sig["1G"]) == 3
    assert by_sig["1B"][0].n_channels == 3
    # per-signal overrides land on the right chain
    assert by_sig["1B"][0].acq.doppler_max == 6000
    assert by_sig["5X"][0].trk.pll_bw_hz == 20.0
    assert by_sig["2S"][0].trk.dll_bw_hz == 0.4
    # every chain got the conf fs
    for c in chains:
        assert c.trk.fs == 20_000_000
    # GLONASS chains carry their slot's carrier offset
    for c in by_sig["1G"]:
        assert c.acq.doppler_center == pytest.approx(
            c.freq_slot * constants.GLONASS_L1_DFREQ_HZ)
        assert c.trk.carrier_freq_hz == pytest.approx(
            constants.GLONASS_L1_FREQ_HZ
            + c.freq_slot * constants.GLONASS_L1_DFREQ_HZ)


def test_unknown_impl_raises():
    with pytest.raises(NotImplementedError):
        receiver_conf_from_config(_conf(
            {"Acquisition_5X.implementation":
             "Galileo_E5a_Pcps_Acquisition_Fpga"}))
    with pytest.raises(NotImplementedError):
        receiver_conf_from_config(_conf(
            {"Tracking_1G.implementation":
             "GLONASS_L1_CA_DLL_PLL_C_Aid_Tracking"}))
    with pytest.raises(NotImplementedError):
        receiver_conf_from_config(_conf(
            {"PVT.positioning_mode": "NoSuchMode"}))


def test_channel_pinning_global_indexing():
    """Channel<i>.satellite uses GLOBAL channel indexes spanning chains in
    order (assign_channels, gnss_flowgraph.cc:1391-1415)."""
    rc = receiver_conf_from_config(_conf({
        "Channel1.satellite": "7",       # 1C chain (channels 0-3)
        "Channel5.satellite": "11",      # 1B chain (channels 4-6)
    }))
    assert rc.pinned_channels == {1: 7}
    chains = rc.all_chains()
    e1b = [c for c in chains if c.signal == "1B"][0]
    assert e1b.pinned == {1: 11}


def _sim_l1(prn=5, doppler=1800.0, delay_samples=300, fs=2e6, n_ms=24,
            cn0_db=46.0, seed=7):
    from gnss_sim_receiver_tpu.ops import prn_codes
    n = int(fs * 1e-3 * n_ms)
    code = prn_codes.sample_code(prn_codes.gps_l1_ca_code(prn), fs,
                                 constants.GPS_L1_CA_CODE_RATE_CPS,
                                 int(fs * 1e-3))
    x = np.tile(code, n_ms + 2).astype(np.complex64)
    x = np.roll(x, delay_samples)[:n]
    t = np.arange(n) / fs
    x = x * np.exp(2j * np.pi * doppler * t)
    rng = np.random.default_rng(seed)
    amp = np.sqrt(2 * 10 ** (cn0_db / 10) / fs)
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64) / np.sqrt(2)
    return (amp * x + noise).astype(np.complex64)


def test_fine_doppler_variant_refines():
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    x = _sim_l1(doppler=1840.0)
    conf = AcqConf(fs_in=2e6, doppler_step=500.0, max_dwells=2,
                   variant="fine_doppler", pfa=0.001)
    eng = PcpsAcquisitionEngine(conf, prns=[5, 11])
    res = eng.acquire(x)
    assert res.detected[0] and not res.detected[1]
    # coarse step is 500 Hz; the iterative zoom must land within ~20 Hz
    assert abs(res.doppler_hz[0] - 1840.0) < 20.0


def test_tong_variant_detects_and_dismisses():
    from gnss_sim_receiver_tpu.models.acquisition import (
        AcqConf, PcpsAcquisitionEngine)
    x = _sim_l1(n_ms=12)
    conf = AcqConf(fs_in=2e6, variant="tong", tong_init=1, tong_max=3,
                   tong_max_dwells=8, pfa=0.001)
    eng = PcpsAcquisitionEngine(conf, prns=[5, 21])
    assert eng.n_samples_needed == 8 * 2000
    res = eng.acquire(x)
    assert res.detected[0]          # present PRN reaches K = tong_max
    assert not res.detected[1]      # absent PRN dismissed (K -> 0)
    assert abs(res.delay_samples[0] - 300) <= 1
