"""Block factory: reference configuration strings -> engine configuration.

Equivalent of the reference GNSSBlockFactory
(src/core/receiver/gnss_block_factory.cc:639-1335): maps the
`Role.implementation` strings of a GNSS-SDR conf file onto this framework's
engines, so reference conf files drive the TPU receiver unchanged.  Blocks
whose roles the batched design absorbs (channel adapters, msg queues,
sample counters) have no standalone object — their parameters land in the
corresponding engine conf.
"""

from __future__ import annotations

import dataclasses

from gnss_sim_receiver_tpu.models.acquisition import AcqConf
from gnss_sim_receiver_tpu.models.observables import ObsConf
from gnss_sim_receiver_tpu.models.pvt import PvtConf
from gnss_sim_receiver_tpu.models.receiver import Receiver, ReceiverConf
from gnss_sim_receiver_tpu.models.tracking import TrackingConf
from gnss_sim_receiver_tpu.utils.config import Configuration

_SUPPORTED_ACQ = {
    "GPS_L1_CA_PCPS_Acquisition",
    "GPS_L1_CA_PCPS_Acquisition_Fine_Doppler",
}
_SUPPORTED_TRK = {
    "GPS_L1_CA_DLL_PLL_Tracking",
    "GPS_L1_CA_KF_Tracking",
}
_SUPPORTED_ACQ_1B = {"Galileo_E1_PCPS_Ambiguous_Acquisition"}
_SUPPORTED_TRK_1B = {"Galileo_E1_DLL_PLL_VEML_Tracking"}


@dataclasses.dataclass
class SourceSpec:
    implementation: str
    filename: str
    item_type: str
    sampling_frequency: float
    samples: int


def source_from_config(config: Configuration) -> SourceSpec:
    return SourceSpec(
        implementation=config.property("SignalSource.implementation",
                                       "File_Signal_Source"),
        filename=config.property("SignalSource.filename", ""),
        item_type=config.property("SignalSource.item_type", "gr_complex"),
        sampling_frequency=float(
            config.property("SignalSource.sampling_frequency", 0)),
        samples=config.property("SignalSource.samples", 0),
    )


def receiver_conf_from_config(config: Configuration) -> ReceiverConf:
    """Build the full receiver configuration from reference-style keys
    (GPS L1 C/A chain; other constellations join as their engines land)."""
    fs = float(config.property("GNSS-SDR.internal_fs_sps", 2_000_000))

    acq_impl = config.property("Acquisition_1C.implementation",
                               "GPS_L1_CA_PCPS_Acquisition")
    if acq_impl not in _SUPPORTED_ACQ:
        raise NotImplementedError(f"acquisition {acq_impl}")
    acq = AcqConf(
        fs_in=fs,
        doppler_max=float(config.property("Acquisition_1C.doppler_max",
                                          5000)),
        doppler_step=float(config.property("Acquisition_1C.doppler_step",
                                           250)),
        sampled_ms=config.property(
            "Acquisition_1C.coherent_integration_time_ms", 1),
        max_dwells=max(config.property("Acquisition_1C.max_dwells", 2), 1),
        pfa=config.property("Acquisition_1C.pfa", 0.01),
        threshold=config.property("Acquisition_1C.threshold", 0.0),
        use_cfar_algorithm=config.property(
            "Acquisition_1C.use_CFAR_algorithm", True),
        make_two_steps=config.property("Acquisition_1C.make_two_steps",
                                       False),
        doppler_step2=float(config.property("Acquisition_1C.second_doppler_step",
                                            125.0)),
    )

    trk_impl = config.property("Tracking_1C.implementation",
                               "GPS_L1_CA_DLL_PLL_Tracking")
    if trk_impl not in _SUPPORTED_TRK:
        raise NotImplementedError(f"tracking {trk_impl}")
    trk = TrackingConf(
        fs=fs,
        tracking_mode=("kf" if trk_impl == "GPS_L1_CA_KF_Tracking"
                       else "dll_pll"),
        pll_bw_hz=config.property("Tracking_1C.pll_bw_hz", 35.0),
        dll_bw_hz=config.property("Tracking_1C.dll_bw_hz", 2.0),
        pll_filter_order=config.property("Tracking_1C.order", 3),
        early_late_space_chips=config.property(
            "Tracking_1C.early_late_space_chips", 0.5),
        enable_fll_pullin=config.property("Tracking_1C.enable_fll_pullin",
                                          True),
        fll_bw_hz=config.property("Tracking_1C.fll_bw_hz", 15.0),
        cn0_min_db_hz=config.property("Tracking_1C.cn0_min", 25.0),
        max_lock_fail=config.property("Tracking_1C.max_lock_fail", 50),
        extend_correlation_symbols=config.property(
            "Tracking_1C.extend_correlation_symbols", 1),
        pll_bw_narrow_hz=config.property("Tracking_1C.pll_bw_narrow_hz",
                                         15.0),
        dll_bw_narrow_hz=config.property("Tracking_1C.dll_bw_narrow_hz",
                                         0.5),
    )

    obs = ObsConf(
        fs=fs,
        interval_ms=config.property("Observables.observable_interval_ms",
                                    20),
        smoothing_factor=config.property(
            "Observables.smoothing_factor", 0),
    )
    pvt = PvtConf(
        elevation_mask_deg=config.property("PVT.elevation_mask", 5.0),
        max_gdop=config.property("PVT.threshold_reject_GDOP", 30.0),
        iono_model=config.property("PVT.iono_model", "OFF"),
        trop_model=config.property("PVT.trop_model", "OFF"),
    )
    # Galileo E1B channel group (Channels_1B.count > 0 in hybrid confs,
    # e.g. conf/gnss-sdr_Hybrid_byte.conf:52,97-118)
    chains = []
    n_1b = config.property("Channels_1B.count", 0)
    if n_1b > 0:
        acq_1b = config.property("Acquisition_1B.implementation",
                                 "Galileo_E1_PCPS_Ambiguous_Acquisition")
        if acq_1b not in _SUPPORTED_ACQ_1B:
            raise NotImplementedError(f"acquisition {acq_1b}")
        trk_1b = config.property("Tracking_1B.implementation",
                                 "Galileo_E1_DLL_PLL_VEML_Tracking")
        if trk_1b not in _SUPPORTED_TRK_1B:
            raise NotImplementedError(f"tracking {trk_1b}")
        from gnss_sim_receiver_tpu.models.receiver import galileo_e1b_chain
        chain = galileo_e1b_chain(
            fs, n_channels=n_1b,
            pll_bw_hz=config.property("Tracking_1B.pll_bw_hz", 15.0),
            dll_bw_hz=config.property("Tracking_1B.dll_bw_hz", 2.0))
        chain.acq = dataclasses.replace(
            chain.acq,
            doppler_max=float(config.property("Acquisition_1B.doppler_max",
                                              5000)),
            doppler_step=float(config.property("Acquisition_1B.doppler_step",
                                               125)))
        ve = config.property("Tracking_1B.very_early_late_space_chips", 0.0)
        if ve > 0:
            chain.trk = dataclasses.replace(
                chain.trk, very_early_late_space_chips=2.0 * ve)  # sub-chips
        chains.append(chain)

    n_channels = config.property("Channels_1C.count", 8)
    # Channel<i>.satellite pinning (assign_channels,
    # gnss_flowgraph.cc:1391-1415)
    pinned = {}
    for i in range(n_channels):
        sat = config.property(f"Channel{i}.satellite", 0)
        if sat:
            pinned[i] = sat
    return ReceiverConf(
        pinned_channels=pinned,
        fs=fs, prns=tuple(range(1, 33)), max_channels=n_channels,
        acq=acq, trk=trk, obs=obs, pvt=pvt,
        output_rate_ms=config.property("PVT.output_rate_ms", 20),
        enable_pvt_kf=config.property("PVT.enable_pvt_kf", False),
        chains=tuple(chains), gps_chain=(n_channels > 0),
        # fork hybrid/pseudolite + rx clock keys (rtklib_pvt.cc:910-917,
        # conf/gnss-sdr_GPS_L1_bladeRF2_micro_hybrid_nav.conf)
        hybrid_mode=config.property("GNSS-SDR.hybrid_mode", False),
        ps_channel=config.property("GNSS-SDR.pseudo_sat_ch_id", -1),
        enable_rx_clock_propagation=config.property(
            "PVT.enable_rx_clock_propagation", False),
        share_rx_clock_bias=config.property("PVT.share_rx_clock_bias",
                                            False),
    )


def make_receiver(config: Configuration) -> Receiver:
    return Receiver(receiver_conf_from_config(config))
