"""Receiver driver: host-side orchestration of the full chain.

The TPU framework's control plane — the role of the reference's
ControlThread + GNSSFlowgraph + per-channel FSM (src/core/receiver/
control_thread.cc, gnss_flowgraph.cc, channel_fsm): acquisition
scheduling with re-acquisition and satellite rotation, acquisition ->
tracking handoff, chunked tracking over the sample stream, telemetry,
observables ticks and PVT epochs.  Device code (acquisition grids,
tracking scans) is pure dataflow; everything here is sequencing, driven by
the AcquisitionManager event model (models.control).

Multi-constellation: the receiver runs one *signal chain* per configured
signal (GPS L1 C/A "1C", Galileo E1B "1B", ...) over the same conditioned
sample stream — the reference's per-signal channel groups
(Channels_1C.count / Channels_1B.count, gnss_flowgraph.cc
set_signals_list) — each with its own acquisition grid, tracking scan and
telemetry decoder, all feeding one observables engine and one PVT solver.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.control import (AcquisitionManager,
                                                  ChannelState)
from gnss_sim_receiver_tpu.models.observables import (ObsConf,
                                                      ObservablesEngine)
from gnss_sim_receiver_tpu.models.pvt import PvtConf, solve_pvt
from gnss_sim_receiver_tpu.models.telemetry import TelemetryDecoder
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine


@dataclasses.dataclass
class SignalChainConf:
    """One per-signal channel group (the reference's Channels_<sig> block +
    its Acquisition_<sig>/Tracking_<sig> engine parameters)."""
    signal: str = "1C"                 # "1C" (GPS L1 C/A) | "1B" (GAL E1B)
    system: str = "GPS"
    prns: tuple = tuple(range(1, 33))
    n_channels: int = 8
    max_acq_channels: int = 8
    acq: AcqConf | None = None
    trk: TrackingConf | None = None
    code_provider: object = None       # prn -> +-1 sub-chip table
    sc_rate: float | None = None       # sub-chip rate for acquisition

    freq_slot: int = 0                 # GLONASS FDMA slot k (signal "1G")
    day_base_s: float = 0.0            # GLONASS day base for tk anchoring
    # chain-local channel index -> PRN pinning (Channel<i>.satellite)
    pinned: dict = dataclasses.field(default_factory=dict)

    def telemetry_decoder(self, prns):
        if self.signal in ("B1", "B3"):
            # B3I carries the same D1 NAV / NH20 structure as B1I
            from gnss_sim_receiver_tpu.models.telemetry import \
                BeidouB1iTelemetryDecoder
            return BeidouB1iTelemetryDecoder(prns)
        if self.signal == "1G":
            from gnss_sim_receiver_tpu.models.telemetry import \
                GlonassTelemetryDecoder
            return GlonassTelemetryDecoder(
                prns, freq_slots={p: self.freq_slot for p in self.prns},
                day_base_s=self.day_base_s)
        if self.signal == "5X":
            from gnss_sim_receiver_tpu.models.telemetry import \
                GalileoE5aTelemetryDecoder
            return GalileoE5aTelemetryDecoder(prns)
        if self.signal == "7X":
            from gnss_sim_receiver_tpu.models.telemetry import \
                GalileoE5bTelemetryDecoder
            return GalileoE5bTelemetryDecoder(prns)
        if self.signal == "1B":
            from gnss_sim_receiver_tpu.models.telemetry import \
                GalileoE1bTelemetryDecoder
            return GalileoE1bTelemetryDecoder(prns)
        if self.signal in ("2S", "L5"):
            from gnss_sim_receiver_tpu.models.telemetry import \
                GpsCnavTelemetryDecoder
            return GpsCnavTelemetryDecoder(prns, signal=self.signal)
        if self.signal == "E6":
            from gnss_sim_receiver_tpu.models.telemetry import \
                GalileoE6bTelemetryDecoder
            return GalileoE6bTelemetryDecoder(prns)
        if self.signal == "S1":
            from gnss_sim_receiver_tpu.models.telemetry import \
                SbasL1TelemetryDecoder
            return SbasL1TelemetryDecoder(prns)
        return TelemetryDecoder(prns)


def galileo_e1b_chain(fs: float, prns=tuple(range(1, 37)), n_channels=4,
                      **trk_overrides) -> SignalChainConf:
    """Convenience Galileo E1B chain: BOC(1,1) sub-chip engines, 4 ms
    coherent acquisition, PLL-only pull-in (the reference disables FLL for
    E1 for the same symbol-corruption reason)."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.GALILEO_E1B
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.sc_rate, code_length_chips=sig.sc_length,
        carrier_freq_hz=sig.carrier_freq_hz, early_late_space_chips=0.5,
        enable_fll_pullin=False, fll_pullin_epochs=100)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="1B", system="Galileo", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=4, doppler_step=125.0,
                    max_dwells=2, make_two_steps=True, doppler_step2=31.25),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.sc_rate)


def gps_l2c_chain(fs: float, prns=tuple(range(1, 33)), n_channels=4,
                  **trk_overrides) -> SignalChainConf:
    """GPS L2C CM chain: 20 ms code epochs carrying one 50-sps CNAV
    symbol each (the GPS_L2_M_* blocks of the reference)."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.GPS_L2C_CM
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=8.0, dll_bw_hz=0.75,
        enable_fll_pullin=False,    # symbols flip every 20 ms epoch
        fll_pullin_epochs=25, cn0_window_epochs=20)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="2S", system="GPS", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=20, doppler_max=5000.0,
                    doppler_step=60.0, max_dwells=1,
                    make_two_steps=True, doppler_step2=15.0,
                    bit_transition_flag=True),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)


def gps_l5_chain(fs: float, prns=tuple(range(1, 33)), n_channels=4,
                 **trk_overrides) -> SignalChainConf:
    """GPS L5I chain: 10.23 Mcps, 1 ms epochs, NH10-spread 100-sps CNAV
    symbols (GPS_L5_* blocks)."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.GPS_L5I
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=50.0,
        enable_fll_pullin=False,    # NH chips flip every 1 ms epoch
        fll_pullin_epochs=100)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="L5", system="GPS", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, max_dwells=2,
                    make_two_steps=True, doppler_step2=62.5),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)


def galileo_e5a_chain(fs: float, prns=tuple(range(1, 37)), n_channels=4,
                      **trk_overrides) -> SignalChainConf:
    """Galileo E5a-I chain: 10.23 Mcps, 1 ms epochs, CS20-spread 50-sps
    F/NAV symbols (the GALILEO_E5A_* blocks)."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.GALILEO_E5A_I
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=50.0,
        enable_fll_pullin=False,    # CS20 chips flip every 1 ms epoch
        fll_pullin_epochs=100)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="5X", system="Galileo", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, max_dwells=2,
                    make_two_steps=True, doppler_step2=62.5),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)


def beidou_b3i_chain(fs: float, prns=tuple(range(6, 31)), n_channels=4,
                     **trk_overrides) -> SignalChainConf:
    """BeiDou B3I (MEO/IGSO, D1) chain: 10.23 Mcps, 1 ms epochs, NH20-spread
    50-bps D1 bits (the BEIDOU_B3I_* blocks of the reference factory)."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.BEIDOU_B3I
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=40.0,
        enable_fll_pullin=False,    # NH20 chips flip every 1 ms epoch
        fll_pullin_epochs=100)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="B3", system="BeiDou", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, max_dwells=2,
                    make_two_steps=True, doppler_step2=62.5,
                    bit_transition_flag=True),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)


def galileo_e5b_chain(fs: float, prns=tuple(range(1, 37)), n_channels=4,
                      **trk_overrides) -> SignalChainConf:
    """Galileo E5b-I chain: 10.23 Mcps, 1 ms epochs, CS4-spread 250-sps
    I/NAV symbols (the GALILEO_E5B_* blocks of the reference factory,
    gnss_block_factory.cc signal '7X')."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.GALILEO_E5B_I
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=50.0,
        enable_fll_pullin=False,    # CS4 chips flip every 1 ms epoch
        fll_pullin_epochs=100)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="7X", system="Galileo", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, max_dwells=2,
                    make_two_steps=True, doppler_step2=62.5),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)


def galileo_e6b_chain(fs: float, prns=tuple(range(1, 37)), n_channels=4,
                      **trk_overrides) -> SignalChainConf:
    """Galileo E6-B (HAS) chain: 5.115 Mcps memory codes, 1 ms epochs, one
    1000-sps C/NAV symbol per epoch (the reference's
    Galileo_E6_PCPS_Acquisition / Galileo_E6_DLL_PLL_Tracking /
    Galileo_E6 telemetry blocks, gnss_block_factory.cc:1012,1150)."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.GALILEO_E6B
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=50.0,
        enable_fll_pullin=False,    # C/NAV symbols flip every 1 ms epoch
        # E6-B is a DATA component with one symbol per epoch: the coherent
        # NBD/NBP lock test zero-means over any window; use the rectified
        # detector (the reference instead tracks the E6-C pilot)
        lock_rectify=True,
        fll_pullin_epochs=100)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="E6", system="Galileo", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, max_dwells=2,
                    make_two_steps=True, doppler_step2=62.5),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)


def sbas_l1_chain(fs: float, prns=tuple(range(120, 139)), n_channels=2,
                  **trk_overrides) -> SignalChainConf:
    """SBAS L1 chain: GPS C/A chip plan on PRN 120-138, 500-sps conv-coded
    symbols (2 epochs each) — the reference's SBAS_L1_* blocks
    (sbas_l1_telemetry_decoder.cc adapter).  Data flips every 2 epochs at
    worst, so FLL pull-in stays off and the rectified lock test handles
    the zero-mean symbol stream."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.SBAS_L1
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=40.0,
        lock_rectify=True, enable_fll_pullin=False)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="S1", system="SBAS", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, max_dwells=2, make_two_steps=True,
                    doppler_step2=62.5, bit_transition_flag=True),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)


def glonass_l1_chain(fs: float, prns, freq_slot: int = 0,
                     n_channels: int | None = None, day_base_s: float = 0.0,
                     **trk_overrides) -> SignalChainConf:
    """GLONASS L1 C/A chain for ONE frequency slot (FDMA: satellites on
    slot k acquire around doppler_center = k*562.5 kHz and track on the
    offset carrier; build one chain per occupied slot — the reference's
    per-PRN d_doppler_bias, pcps_acquisition.cc:211-230).  FLL pull-in
    stays ON (10 ms symbols corrupt only 1 in 10 FLL pairs) and the
    rectified lock test handles the zero-mean meander data."""
    from gnss_sim_receiver_tpu import constants, signals
    sig = signals.GLONASS_L1_CA
    df = constants.GLONASS_L1_DFREQ_HZ
    prns = tuple(prns)
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz + freq_slot * df,
        early_late_space_chips=0.5, lock_rectify=True,
        enable_fll_pullin=True, fll_pullin_epochs=150)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="1G", system="GLONASS", prns=prns,
        n_channels=n_channels or len(prns),
        max_acq_channels=n_channels or len(prns),
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, doppler_center=freq_slot * df,
                    max_dwells=2, make_two_steps=True, doppler_step2=62.5),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps,
        freq_slot=freq_slot, day_base_s=day_base_s)


@dataclasses.dataclass
class ReceiverConf:
    fs: float = 2_000_000.0
    prns: tuple = tuple(range(1, 33))
    max_channels: int = 12
    max_acq_channels: int = 8         # Channels.in_acquisition
    acq: AcqConf | None = None
    trk: TrackingConf | None = None
    obs: ObsConf | None = None
    pvt: PvtConf | None = None
    chunk_epochs: int = 1000          # 1 ms epochs per chunk (chunk ~ 1 s)
    output_rate_ms: int = 20
    enable_pvt_kf: bool = False        # PVT.enable_pvt_kf (Pvt_Kf analogue)
    chains: tuple = ()                # extra SignalChainConfs beyond GPS L1;
    # set gps_chain=False to drop the implicit GPS L1 chain entirely
    gps_chain: bool = True
    # hybrid GNSS + pseudolite navigation (GNSS-SDR.hybrid_mode /
    # GNSS-SDR.pseudo_sat_ch_id): the designated global channel is a
    # pseudolite tracker whose observable feeds AOWR time transfer instead
    # of the position solution
    hybrid_mode: bool = False
    ps_channel: int = -1
    ps_range_m: float = 0.4           # known rx<->pseudolite range
    # rx clock handling (fork: rtklib_pvt.cc:910-917)
    enable_rx_clock_propagation: bool = False
    clk_prop_after_n_fixes: int = 10
    share_rx_clock_bias: bool = False
    # GPS-chain channel index -> PRN pinning (Channel<i>.satellite)
    pinned_channels: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if self.acq is None:
            self.acq = AcqConf(fs_in=self.fs, max_dwells=2)
        if self.trk is None:
            self.trk = TrackingConf(fs=self.fs)
        if self.obs is None:
            self.obs = ObsConf(fs=self.fs, interval_ms=self.output_rate_ms)
        if self.hybrid_mode and self.obs.ps_channel != self.ps_channel:
            self.obs = dataclasses.replace(self.obs,
                                           ps_channel=self.ps_channel)
        if self.pvt is None:
            self.pvt = PvtConf()
        # observables history must out-span a tracking chunk (ticks are
        # pulled once per chunk)
        if self.obs.history_len < self.chunk_epochs + 128:
            self.obs = dataclasses.replace(
                self.obs, history_len=self.chunk_epochs + 128)

    def all_chains(self) -> list[SignalChainConf]:
        out = []
        if self.gps_chain:
            out.append(SignalChainConf(
                signal="1C", system="GPS", prns=tuple(self.prns),
                n_channels=self.max_channels,
                max_acq_channels=self.max_acq_channels,
                acq=self.acq, trk=self.trk,
                pinned=dict(self.pinned_channels)))
        out.extend(self.chains)
        if not out:
            raise ValueError("receiver configured with no signal chains")
        return out


@dataclasses.dataclass
class ReceiverRun:
    solutions: list            # [PvtSolution]
    observation_epochs: list   # [ObservationEpoch]
    channel_prns: list[int]    # final PRN per (global) channel (0 = idle)
    channel_states: list       # final ChannelState per channel
    ephemerides: dict          # prn (GPS) | (system, prn) -> GpsEphemeris
    events: list               # [(channel, ChannelEvent)]
    track_outputs: dict | None = None
    channel_systems: list = () # constellation per channel
    # decoded Galileo HAS messages (nav.has.HasData), E6-B chains only
    has_messages: list = dataclasses.field(default_factory=list)
    # hybrid-mode AOWR products: [(est_tx_tow_s, clock_diff_s)] per fix
    clock_differences: list = dataclasses.field(default_factory=list)
    # rx clock sharing records: [(rx_time_s, tag_tow_s, bias_s, prn)]
    rx_clock_bias_log: list = dataclasses.field(default_factory=list)


class _ChainRt:
    """Runtime state of one signal chain."""

    def __init__(self, spec: SignalChainConf, obs_offset: int):
        self.spec = spec
        self.offset = obs_offset      # global channel index of channel 0
        n = spec.n_channels
        self.mgr = AcquisitionManager(spec.prns, n,
                                      max_acq_channels=spec.max_acq_channels,
                                      pinned=spec.pinned)
        self.trk = TrackingEngine(spec.trk, prns=[0] * n,
                                  code_provider=spec.code_provider)
        self.tlm = spec.telemetry_decoder([0] * n)
        self.nominal = spec.trk.nominal_epoch_samples
        self.margin = spec.trk.block_size + 64
        self.epoch_base = [0] * n
        self.acq_engines = {}
        self.done = 0
        self.total = 0

    def eph_key(self, prn: int):
        return prn if self.spec.system == "GPS" else (self.spec.system, prn)


class Receiver:
    def __init__(self, conf: ReceiverConf):
        self.conf = conf

    def process_array(self, x: np.ndarray,
                      collect_track_outputs: bool = False,
                      ephemerides: dict | None = None) -> ReceiverRun:
        """Run the whole receiver over an in-memory sample array.

        `ephemerides` preloads assistance data for a warm start (the
        reference's AGNSS / XML-assisted start, control_thread.cc
        assist_GNSS + read_assistance_from_XML): PVT can fix as soon as TOW
        is decoded, without waiting for subframes 1-3.  Keys: PRN int for
        GPS, (system, prn) otherwise.

        Multi-constellation note: pseudoranges place every TOW on a common
        timescale — valid for the simulator (GGTO = 0) and within a single
        constellation; broadcast GGTO correction is a PVT extension hook.
        """
        conf = self.conf
        chains = []
        n_total = 0
        for spec in conf.all_chains():
            chains.append(_ChainRt(spec, n_total))
            n_total += spec.n_channels
            # lean packed pulls (hot-path planes only) unless the caller
            # wants the full diagnostic set
            chains[-1].trk.full_outputs = bool(collect_track_outputs)
        # cross-band Galileo TOW sharing: E6-B C/NAV is timeless, its
        # channels stamp TOW published by the other Galileo bands
        # (galileo_tow_map.cc role)
        tow_map = None
        if any(rt.spec.signal == "E6" for rt in chains):
            from gnss_sim_receiver_tpu.models.telemetry import GalileoTowMap
            tow_map = GalileoTowMap(conf.fs)
            for rt in chains:
                if rt.spec.signal == "E6":
                    rt.tlm.tow_map = tow_map
        obs_eng = ObservablesEngine(conf.obs, n_channels=n_total)
        ephemerides = dict(ephemerides or {})
        solutions = []
        obs_epochs = []
        pvt_kf = None
        if conf.enable_pvt_kf:
            from gnss_sim_receiver_tpu.models.pvt_kf import PvtKf
            pvt_kf = PvtKf()
        collected = [] if collect_track_outputs else None

        aowr = None
        if conf.hybrid_mode and conf.ps_channel >= 0:
            from gnss_sim_receiver_tpu.models.hybrid import (AowrConf,
                                                             AowrTimeTransfer)
            # carrier-phase aiding scales by the ps channel's actual signal
            # frequency (the reference's SIGNAL_FREQ_MAP lookup,
            # rtklib_pvt_gs.cc) — not the L1 default, in case the ps channel
            # lives on a non-L1 chain
            ps_freq = constants.GPS_L1_FREQ_HZ
            for rt in chains:
                if rt.offset <= conf.ps_channel < rt.offset + rt.spec.n_channels:
                    ps_freq = rt.spec.trk.carrier_freq_hz
                    break
            aowr = AowrTimeTransfer(AowrConf(r_ps_true_m=conf.ps_range_m,
                                             carrier_freq_hz=ps_freq))
        clock_differences = []
        rx_clock_bias_log = []
        n_fixes = 0
        last_fix_time = None

        from gnss_sim_receiver_tpu.utils import xfer
        x_dev = xfer.device_put_complex(
            np.ascontiguousarray(x, dtype=np.complex64))

        # chunk wall-duration from the (legacy) 1 ms-epoch count
        chunk_s = conf.chunk_epochs * 1e-3
        for rt in chains:
            rt.total = (len(x) - rt.margin) // rt.nominal - 2
        cursor = 0                # absolute sample index of processing head
        last_fix = None

        while any(rt.done < rt.total for rt in chains):
            tick_bounds = []      # per-chain "observables safe up to" sample
            progressed = False
            staged = []           # (rt, tracking, n, in-flight chunk handle)
            # ---- phase 1: per-chain FSM + device dispatch ------------------
            # every chain's chunk is dispatched (and its device->host copy
            # started) before ANY chunk is pulled, so the transfers of all
            # chains overlap — one transfer latency per chunk, not per chain
            for rt in chains:
                if rt.done >= rt.total:
                    continue
                mgr, spec = rt.mgr, rt.spec
                # --- acquisition scheduling on idle channels ---------------
                mgr.schedule()
                acquiring = mgr.acquiring_channels()
                if acquiring:
                    prns_search = tuple(mgr.channels[c].prn
                                        for c in acquiring)
                    acq_eng = rt.acq_engines.get(prns_search)
                    if acq_eng is None:
                        acq_eng = PcpsAcquisitionEngine(
                            spec.acq, prns=prns_search,
                            code_provider=spec.code_provider,
                            sc_rate=spec.sc_rate)
                        rt.acq_engines[prns_search] = acq_eng
                    need = acq_eng.n_samples_needed
                    if cursor + need <= len(x):
                        # fused search: one dispatch, one packed pull
                        res = acq_eng.acquire_from(x, cursor)
                        for k, c in enumerate(acquiring):
                            mgr.on_acq_result(c, bool(res.detected[k]),
                                              float(res.doppler_hz[k]))
                            if mgr.channels[c].state == ChannelState.TRACKING:
                                prn = mgr.channels[c].prn
                                rt.trk.set_channel_prn(c, prn)
                                rt.trk.start_tracking(
                                    c, float(res.doppler_hz[k]),
                                    int(res.samplestamp
                                        + res.delay_samples[k]))
                                rt.tlm.reset_channel(
                                    c, prn, epoch_base=rt.epoch_base[c])
                                obs_eng.reset_channel(rt.offset + c)

                # --- tracking chunk ----------------------------------------
                tracking = mgr.tracking_channels()
                chunk_n = int(round(chunk_s / (rt.nominal / conf.fs)))
                if not tracking:
                    rt.done += min(chunk_n, rt.total - rt.done)
                    continue
                # late-acquired channels shift the chain's window: only as
                # many epochs as fit before the stream end
                n = min(chunk_n, rt.total - rt.done,
                        rt.trk.epochs_that_fit(len(x)))
                if 0 < n < chunk_n:
                    # quantize tail chunks to powers of two: a bounded set
                    # of jitted shapes (each n_epochs is a static arg), so
                    # arbitrary tails never trigger fresh XLA compiles
                    n = 1 << (n.bit_length() - 1)
                if n <= 0:
                    rt.done = rt.total   # stream exhausted for this chain
                    continue
                rt.done += n
                progressed = True
                staged.append((rt, tracking, n,
                               rt.trk.process_begin(x_dev, 0, n)))

            # ---- phase 2: pull + host-process every chain's chunk ----------
            for rt, tracking, n, handle in staged:
                spec = rt.spec
                outs = rt.trk.process_end(handle)
                for c in range(spec.n_channels):
                    rt.epoch_base[c] += n
                if collected is not None:
                    collected.append((spec.signal, outs))
                tlm_res = rt.tlm.process(outs)
                for c, eph in tlm_res.new_ephemerides:
                    ephemerides[rt.eph_key(eph.prn)] = eph
                if (tow_map is not None and rt.spec.system == "Galileo"
                        and rt.spec.signal != "E6"):
                    # publish per-PRN TOW for the E6 channels
                    tv = tlm_res.tow_valid
                    for c in np.flatnonzero(tv.any(axis=0)):
                        e = int(np.flatnonzero(tv[:, c])[-1])
                        tow_map.update(rt.tlm.prns[c],
                                       tlm_res.tow_at_epoch_ms[e, c],
                                       outs["sample_counter"][e, c])
                obs_eng.push_epochs(outs, tlm_res,
                                    channel_offset=rt.offset)

                # --- loss-of-lock events -----------------------------------
                lost = rt.trk.lock_lost_host
                for c in tracking:
                    if lost[c]:
                        rt.mgr.on_tracking_lost(c)
                        rt.trk.stop_channel(c)

                valid_cols = np.asarray(outs["valid"][-1])
                if valid_cols.any():
                    up_to = int(outs["sample_counter"][-1][valid_cols].min())
                    tick_bounds.append(up_to)
                    cursor = max(cursor, up_to - rt.margin)

            # --- observables + PVT -----------------------------------------
            if tick_bounds:
                prn_map, sys_map = self._channel_maps(chains, n_total)
                freq_map = np.concatenate(
                    [np.full(rt.spec.n_channels,
                             rt.spec.trk.carrier_freq_hz) for rt in chains])
                for epoch in obs_eng.pull_ticks(min(tick_bounds)):
                    obs_epochs.append(epoch)
                    # pseudolite channel: feed AOWR, exclude from PVT
                    excl = ()
                    if aowr is not None:
                        ps = conf.ps_channel
                        excl = (ps,)
                        if 0 <= ps < n_total and epoch.valid[ps]:
                            aowr.update(
                                float(epoch.pseudorange_m[ps]),
                                float(epoch.carrier_phase_cycles[ps]))
                    # rx clock propagation after enough fixes: hold the
                    # clock at the last bias + drift extrapolation
                    fixed_clk = None
                    if (conf.enable_rx_clock_propagation
                            and last_fix is not None
                            and n_fixes >= conf.clk_prop_after_n_fixes):
                        dt = epoch.rx_time_s - last_fix_time
                        fixed_clk = (last_fix.rx_clock_bias_s
                                     + last_fix.rx_clock_drift_ss * dt)
                    sol = solve_pvt(epoch, prn_map, ephemerides, conf.pvt,
                                    x0=None if last_fix is None
                                    else last_fix.rx_ecef_m,
                                    systems=sys_map,
                                    carrier_freq_hz=freq_map,
                                    exclude_channels=excl,
                                    fixed_clock_bias_s=fixed_clk)
                    if sol.valid:
                        if pvt_kf is not None:
                            pvt_kf.update(sol)
                        last_fix = sol
                        last_fix_time = epoch.rx_time_s
                        n_fixes += 1
                        solutions.append(sol)
                        if conf.share_rx_clock_bias:
                            # tag a GNSS channel's TOW/PRN, never the
                            # pseudolite's (the reference erases the ps
                            # channel from the observables map before
                            # write_rx_clock_bias, rtklib_pvt_gs.cc:2346)
                            cand = np.flatnonzero(epoch.valid)
                            cand = cand[~np.isin(cand, list(excl))]
                            ch0 = int(cand[0]) if cand.size else int(
                                np.flatnonzero(epoch.valid)[0])
                            rx_clock_bias_log.append(
                                (epoch.rx_time_s,
                                 epoch.interp_tow_ms[ch0] / 1000.0,
                                 sol.rx_clock_bias_s, prn_map[ch0]))
                        if aowr is not None and aowr.observed:
                            clock_differences.append(aowr.clock_products(
                                sol.rx_clock_bias_s, epoch.rx_time_s))
            elif not progressed:
                cursor += int(chunk_s * conf.fs)

        track_outputs = None
        if collected:
            track_outputs = {}
            for sig in {s for s, _ in collected}:
                parts = [o for s, o in collected if s == sig]
                track_outputs[sig] = {
                    k: np.concatenate([p[k] for p in parts])
                    for k in parts[0]}
            if len(track_outputs) == 1:   # legacy single-chain shape
                track_outputs = next(iter(track_outputs.values()))
        prn_map, sys_map = self._channel_maps(chains, n_total)
        states = []
        for rt in chains:
            states.extend(rt.mgr.channels[c].state
                          for c in range(rt.spec.n_channels))
        events = []
        for rt in chains:
            events.extend((rt.offset + c, ev) for c, ev in rt.mgr.events)
        has_messages = []
        for rt in chains:
            if rt.spec.signal == "E6":
                has_messages.extend(rt.tlm.has.messages)
        return ReceiverRun(
            solutions=solutions, observation_epochs=obs_epochs,
            channel_prns=prn_map, channel_states=states,
            channel_systems=sys_map,
            ephemerides=ephemerides, events=events,
            track_outputs=track_outputs,
            has_messages=has_messages,
            clock_differences=clock_differences,
            rx_clock_bias_log=rx_clock_bias_log)

    @staticmethod
    def _channel_maps(chains, n_total):
        prn_map = [0] * n_total
        sys_map = ["GPS"] * n_total
        for rt in chains:
            for c in range(rt.spec.n_channels):
                prn_map[rt.offset + c] = rt.mgr.channels[c].prn
                sys_map[rt.offset + c] = rt.spec.system
        return prn_map, sys_map


def beidou_b1i_chain(fs: float, prns=tuple(range(6, 31)), n_channels=4,
                     **trk_overrides) -> SignalChainConf:
    """BeiDou B1I (MEO/IGSO, D1) chain: 2.046 Mcps, 1 ms epochs,
    NH20-spread 50-bps D1 bits (the BEIDOU_B1I_* blocks)."""
    from gnss_sim_receiver_tpu import signals
    sig = signals.BEIDOU_B1I
    trk_kw = dict(
        fs=fs, code_rate_cps=sig.chip_rate_cps,
        code_length_chips=sig.code_length_chips,
        carrier_freq_hz=sig.carrier_freq_hz,
        early_late_space_chips=0.5, pll_bw_hz=40.0,
        enable_fll_pullin=False,    # NH20 chips flip every 1 ms epoch
        fll_pullin_epochs=100)
    trk_kw.update(trk_overrides)
    return SignalChainConf(
        signal="B1", system="BeiDou", prns=tuple(prns),
        n_channels=n_channels, max_acq_channels=n_channels,
        acq=AcqConf(fs_in=fs, sampled_ms=1, doppler_max=5000.0,
                    doppler_step=250.0, max_dwells=2,
                    make_two_steps=True, doppler_step2=62.5,
                    bit_transition_flag=True),
        trk=TrackingConf(**trk_kw),
        code_provider=lambda p: signals.subchip_table(sig, p),
        sc_rate=sig.chip_rate_cps)
