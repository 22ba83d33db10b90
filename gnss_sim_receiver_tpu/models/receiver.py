"""Receiver driver: host-side orchestration of the full chain.

The TPU framework's control plane — the role of the reference's
ControlThread + GNSSFlowgraph + per-channel FSM (src/core/receiver/
control_thread.cc, gnss_flowgraph.cc, channel_fsm): acquisition scheduling,
acquisition->tracking handoff, chunked tracking over the sample stream,
telemetry, observables ticks and PVT epochs.  Device code (acquisition
grids, tracking scans) is pure dataflow; everything here is sequencing.

Round-1 scope: GPS L1 C/A, file/array input, all channels acquired from an
initial block with periodic re-acquisition of missing satellites.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sim_receiver_tpu.models.acquisition import (AcqConf,
                                                      PcpsAcquisitionEngine)
from gnss_sim_receiver_tpu.models.observables import (ObsConf,
                                                      ObservablesEngine)
from gnss_sim_receiver_tpu.models.pvt import PvtConf, PvtSolution, solve_pvt
from gnss_sim_receiver_tpu.models.telemetry import TelemetryDecoder
from gnss_sim_receiver_tpu.models.tracking import TrackingConf, TrackingEngine


@dataclasses.dataclass
class ReceiverConf:
    fs: float = 2_000_000.0
    prns: tuple = tuple(range(1, 33))
    max_channels: int = 12
    acq: AcqConf | None = None
    trk: TrackingConf | None = None
    obs: ObsConf | None = None
    pvt: PvtConf | None = None
    chunk_epochs: int = 1000
    output_rate_ms: int = 20

    def __post_init__(self):
        if self.acq is None:
            self.acq = AcqConf(fs_in=self.fs, max_dwells=2)
        if self.trk is None:
            self.trk = TrackingConf(fs=self.fs)
        if self.obs is None:
            self.obs = ObsConf(fs=self.fs,
                               interval_ms=self.output_rate_ms)
        if self.pvt is None:
            self.pvt = PvtConf()


@dataclasses.dataclass
class ReceiverRun:
    solutions: list            # [PvtSolution]
    observation_epochs: list   # [ObservationEpoch]
    channel_prns: list[int]
    ephemerides: dict          # prn -> GpsEphemeris
    track_outputs: dict | None = None


class Receiver:
    def __init__(self, conf: ReceiverConf):
        self.conf = conf

    def process_array(self, x: np.ndarray,
                      collect_track_outputs: bool = False) -> ReceiverRun:
        """Run the whole receiver over an in-memory sample array."""
        conf = self.conf
        acq_eng = PcpsAcquisitionEngine(conf.acq, prns=list(conf.prns))
        res = acq_eng.acquire(x[: acq_eng.n_samples_needed], samplestamp=0)
        order = np.argsort(-res.test_stat)
        ch_idx = [int(i) for i in order if res.detected[i]][: conf.max_channels]
        if not ch_idx:
            return ReceiverRun([], [], [], {})
        ch_prns = [int(conf.prns[i]) for i in ch_idx]

        trk = TrackingEngine(conf.trk, prns=ch_prns)
        for c, i in enumerate(ch_idx):
            trk.start_tracking(c, float(res.doppler_hz[i]),
                               int(res.samplestamp + res.delay_samples[i]))
        tlm = TelemetryDecoder(prns=ch_prns)
        obs_eng = ObservablesEngine(conf.obs, n_channels=len(ch_prns))
        ephemerides = {}
        solutions = []
        obs_epochs = []
        collected = [] if collect_track_outputs else None

        nominal = conf.trk.nominal_epoch_samples
        margin = conf.trk.block_size + 64
        last_fix = None
        total_epochs = (len(x) - margin) // nominal - 2
        done = 0
        while done < total_epochs:
            n = min(conf.chunk_epochs, total_epochs - done)
            outs = trk.process(x, 0, n)
            done += n
            if collected is not None:
                collected.append(outs)
            tlm_res = tlm.process(outs)
            for c, eph in tlm_res.new_ephemerides:
                ephemerides[eph.prn] = eph
            obs_eng.push_epochs(outs, tlm_res)
            valid_cols = np.asarray(outs["valid"][-1])
            if valid_cols.any():
                up_to = int(outs["sample_counter"][-1][valid_cols].min())
            else:
                break
            for epoch in obs_eng.pull_ticks(up_to):
                obs_epochs.append(epoch)
                sol = solve_pvt(epoch, ch_prns, ephemerides, conf.pvt,
                                x0=None if last_fix is None
                                else last_fix.rx_ecef_m)
                if sol.valid:
                    last_fix = sol
                    solutions.append(sol)
        track_outputs = None
        if collected:
            track_outputs = {k: np.concatenate([c[k] for c in collected])
                             for k in collected[0]}
        return ReceiverRun(solutions=solutions,
                           observation_epochs=obs_epochs,
                           channel_prns=ch_prns, ephemerides=ephemerides,
                           track_outputs=track_outputs)
