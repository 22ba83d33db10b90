"""Receiver driver: host-side orchestration of the full chain.

The TPU framework's control plane — the role of the reference's
ControlThread + GNSSFlowgraph + per-channel FSM (src/core/receiver/
control_thread.cc, gnss_flowgraph.cc, channel_fsm): acquisition
scheduling with re-acquisition and satellite rotation, acquisition ->
tracking handoff, chunked tracking over the sample stream, telemetry,
observables ticks and PVT epochs.  Device code (acquisition grids,
tracking scans) is pure dataflow; everything here is sequencing, driven by
the AcquisitionManager event model (models.control).
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
class ReceiverConf:
    fs: float = 2_000_000.0
    prns: tuple = tuple(range(1, 33))
    max_channels: int = 12
    max_acq_channels: int = 8         # Channels.in_acquisition
    acq: AcqConf | None = None
    trk: TrackingConf | None = None
    obs: ObsConf | None = None
    pvt: PvtConf | None = None
    chunk_epochs: int = 1000
    output_rate_ms: int = 20
    enable_pvt_kf: bool = False        # PVT.enable_pvt_kf (Pvt_Kf analogue)

    def __post_init__(self):
        if self.acq is None:
            self.acq = AcqConf(fs_in=self.fs, max_dwells=2)
        if self.trk is None:
            self.trk = TrackingConf(fs=self.fs)
        if self.obs is None:
            self.obs = ObsConf(fs=self.fs, interval_ms=self.output_rate_ms)
        if self.pvt is None:
            self.pvt = PvtConf()
        # observables history must out-span a tracking chunk (ticks are
        # pulled once per chunk)
        if self.obs.history_len < self.chunk_epochs + 128:
            self.obs = dataclasses.replace(
                self.obs, history_len=self.chunk_epochs + 128)


@dataclasses.dataclass
class ReceiverRun:
    solutions: list            # [PvtSolution]
    observation_epochs: list   # [ObservationEpoch]
    channel_prns: list[int]    # final PRN per channel (0 = idle)
    channel_states: list       # final ChannelState per channel
    ephemerides: dict          # prn -> GpsEphemeris
    events: list               # [(channel, ChannelEvent)]
    track_outputs: dict | None = None


class Receiver:
    def __init__(self, conf: ReceiverConf):
        self.conf = conf

    def process_array(self, x: np.ndarray,
                      collect_track_outputs: bool = False,
                      ephemerides: dict | None = None) -> ReceiverRun:
        """Run the whole receiver over an in-memory sample array.

        `ephemerides` ({prn: GpsEphemeris}) preloads assistance data for a
        warm start (the reference's AGNSS / XML-assisted start,
        control_thread.cc assist_GNSS + read_assistance_from_XML): PVT can
        fix as soon as TOW is decoded, without waiting for subframes 1-3.
        """
        conf = self.conf
        n_ch = conf.max_channels
        mgr = AcquisitionManager(conf.prns, n_ch,
                                 max_acq_channels=conf.max_acq_channels)
        trk = TrackingEngine(conf.trk, prns=[0] * n_ch)
        tlm = TelemetryDecoder(prns=[0] * n_ch)
        obs_eng = ObservablesEngine(conf.obs, n_channels=n_ch)
        ephemerides = dict(ephemerides or {})
        solutions = []
        obs_epochs = []
        pvt_kf = None
        if conf.enable_pvt_kf:
            from gnss_sim_receiver_tpu.models.pvt_kf import PvtKf
            pvt_kf = PvtKf()
        collected = [] if collect_track_outputs else None
        epoch_base = [0] * n_ch   # telemetry epoch counter base per channel
        acq_engines = {}          # PRN tuple -> engine (replica FFT cache)

        import jax.numpy as jnp
        x_dev = jnp.asarray(np.ascontiguousarray(x, dtype=np.complex64))

        nominal = conf.trk.nominal_epoch_samples
        margin = conf.trk.block_size + 64
        total_epochs = (len(x) - margin) // nominal - 2
        done = 0
        cursor = 0                # absolute sample index of processing head
        last_fix = None

        while done < total_epochs:
            # --- acquisition scheduling on idle channels -------------------
            mgr.schedule()
            acquiring = mgr.acquiring_channels()
            if acquiring:
                prns_search = tuple(mgr.channels[c].prn for c in acquiring)
                acq_eng = acq_engines.get(prns_search)
                if acq_eng is None:
                    acq_eng = PcpsAcquisitionEngine(conf.acq,
                                                    prns=prns_search)
                    acq_engines[prns_search] = acq_eng
                need = acq_eng.n_samples_needed
                if cursor + need <= len(x):
                    res = acq_eng.acquire(x[cursor:cursor + need],
                                          samplestamp=cursor)
                    for k, c in enumerate(acquiring):
                        ev = mgr.on_acq_result(c, bool(res.detected[k]),
                                               float(res.doppler_hz[k]))
                        if mgr.channels[c].state == ChannelState.TRACKING:
                            prn = mgr.channels[c].prn
                            trk.set_channel_prn(c, prn)
                            trk.start_tracking(
                                c, float(res.doppler_hz[k]),
                                int(res.samplestamp
                                    + res.delay_samples[k]))
                            tlm.reset_channel(c, prn,
                                              epoch_base=epoch_base[c])
                            obs_eng.reset_channel(c)

            # --- tracking chunk -------------------------------------------
            tracking = mgr.tracking_channels()
            n = min(conf.chunk_epochs, total_epochs - done)
            if not tracking:
                cursor += n * nominal
                done += n
                continue
            outs = trk.process(x_dev, 0, n)
            done += n
            for c in range(n_ch):
                epoch_base[c] += n
            if collected is not None:
                collected.append(outs)
            tlm_res = tlm.process(outs)
            for c, eph in tlm_res.new_ephemerides:
                ephemerides[eph.prn] = eph
            obs_eng.push_epochs(outs, tlm_res)

            # --- loss-of-lock events --------------------------------------
            lost = np.asarray(trk.state.lock_lost)
            for c in tracking:
                if lost[c]:
                    mgr.on_tracking_lost(c)
                    trk.stop_channel(c)

            # --- observables + PVT ----------------------------------------
            valid_cols = np.asarray(outs["valid"][-1])
            if valid_cols.any():
                up_to = int(outs["sample_counter"][-1][valid_cols].min())
                cursor = max(cursor, up_to - margin)
                prn_map = [mgr.channels[c].prn for c in range(n_ch)]
                for epoch in obs_eng.pull_ticks(up_to):
                    obs_epochs.append(epoch)
                    sol = solve_pvt(epoch, prn_map, ephemerides, conf.pvt,
                                    x0=None if last_fix is None
                                    else last_fix.rx_ecef_m)
                    if sol.valid:
                        if pvt_kf is not None:
                            pvt_kf.update(sol)
                        last_fix = sol
                        solutions.append(sol)
            else:
                cursor += n * nominal

        track_outputs = None
        if collected:
            track_outputs = {k: np.concatenate([c[k] for c in collected])
                             for k in collected[0]}
        return ReceiverRun(
            solutions=solutions, observation_epochs=obs_epochs,
            channel_prns=[mgr.channels[c].prn for c in range(n_ch)],
            channel_states=[mgr.channels[c].state for c in range(n_ch)],
            ephemerides=ephemerides, events=list(mgr.events),
            track_outputs=track_outputs)
