"""Observables formation: common receiver clock, interpolation,
pseudoranges, optional carrier smoothing.

Host-side (float64) equivalent of the reference hybrid_observables_gs
(src/algorithms/observables/gnuradio_blocks/hybrid_observables_gs.cc):
  - receiver clock ticks every `interval_ms` of sample time (the role of
    gnss_sdr_sample_counter, wired in gnss_flowgraph.cc:836-863);
  - per channel, linear interpolation of TOW / carrier phase / Doppler to
    the tick (interp_trk_obs, :387-482), using the exact fractional
    code-boundary timestamps (compute_T_rx_s, :380);
  - common receiver TOW: first set to max decoded TOW rounded UP to the
    interval, then advanced by the interval each tick (update_TOW,
    :496-534, incl. week rollover);
  - rho = (T_rx - TOW_tx) * c with the 302400 ms travel-time guard
    (compute_pranges, :537-570);
  - optional Hatch carrier-smoothing filter (smooth_pseudoranges,
    :573-601).

Pseudorange formation is float64 bookkeeping at 50 Hz — host work; the
device produces the per-epoch timestamps.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sim_receiver_tpu import constants

_C_MS = constants.SPEED_OF_LIGHT_M_S / 1000.0


@dataclasses.dataclass
class ObsConf:
    fs: float = 2_000_000.0
    interval_ms: int = 20
    smoothing_factor: int = 0      # Hatch filter length M; 0 disables
    carrier_wavelength_m: float = (constants.SPEED_OF_LIGHT_M_S
                                   / constants.GPS_L1_FREQ_HZ)
    # must cover at least one driver chunk of epochs, or ticks older than
    # the retained window silently fail to interpolate
    history_len: int = 1200
    # hybrid pseudolite channel (GNSS-SDR.pseudo_sat_ch_id): its transmit
    # clock is not GNSS-synchronized, so the week-rollover travel-time fix
    # must NOT be applied to it (hybrid_observables_gs.cc:550-556)
    ps_channel: int = -1


@dataclasses.dataclass
class ObservationEpoch:
    """One synchronized observable set (the vector handed to PVT)."""
    rx_time_s: float                  # common receiver TOW [s]
    tick_sample: int                  # receiver sample counter of the tick
    valid: np.ndarray                 # [C] bool
    pseudorange_m: np.ndarray         # [C] float64
    interp_tow_ms: np.ndarray         # [C] float64
    carrier_doppler_hz: np.ndarray    # [C] float64
    carrier_phase_cycles: np.ndarray  # [C] float64
    cn0_db_hz: np.ndarray             # [C] float64


class ObservablesEngine:
    def __init__(self, conf: ObsConf, n_channels: int):
        self.conf = conf
        self.n = n_channels
        self.tick_step = int(round(conf.fs * conf.interval_ms / 1000.0))
        self.next_tick = self.tick_step
        self.t_rx_tow_ms: float | None = None
        # per-channel epoch history (parallel deques as numpy-backed lists)
        self.hist = [dict(t=[], tow=[], dop=[], ph=[], cn0=[])
                     for _ in range(n_channels)]
        # Hatch filter state
        self._sm_last_pr = np.zeros(n_channels)
        self._sm_last_ph = np.zeros(n_channels)
        self._sm_lock = np.zeros(n_channels, bool)

    def reset_channel(self, c: int) -> None:
        """Clear a channel's history (satellite reassignment)."""
        self.hist[c] = dict(t=[], tow=[], dop=[], ph=[], cn0=[])
        self._sm_lock[c] = False

    def push_epochs(self, track_outs: dict, tlm_outs,
                    channel_offset: int = 0) -> None:
        """Append a batch of per-epoch records ([T, C] arrays from tracking
        + telemetry).  `channel_offset` maps a signal chain's local channel
        axis into this engine's global channel space (the reference wires
        every per-signal channel group into the one hybrid_observables
        block the same way)."""
        t_len = track_outs["prompt"].shape[0]
        sc = track_outs["sample_counter"].astype(np.float64)
        cps = track_outs["code_phase_samples"].astype(np.float64)
        dop = track_outs["carrier_doppler_hz"].astype(np.float64)
        ph = track_outs["acc_phase_cycles"].astype(np.float64)
        cn0 = track_outs["cn0_db_hz"].astype(np.float64)
        valid = track_outs["valid"] & tlm_outs.tow_valid
        tow = tlm_outs.tow_at_epoch_ms
        for c in range(valid.shape[1]):
            h = self.hist[channel_offset + c]
            for e in range(t_len):
                if not valid[e, c]:
                    continue
                h["t"].append((sc[e, c] - cps[e, c]) / self.conf.fs)
                h["tow"].append(tow[e, c])
                h["dop"].append(dop[e, c])
                h["ph"].append(ph[e, c])
                h["cn0"].append(cn0[e, c])
            keep = self.conf.history_len
            for k in h:
                if len(h[k]) > keep:
                    del h[k][: len(h[k]) - keep]

    def pull_ticks(self, up_to_sample: int) -> list[ObservationEpoch]:
        """Emit every complete observable epoch with tick sample <=
        up_to_sample (call after push_epochs).  The common receiver clock
        advances by the interval on EVERY tick once set — whether or not an
        epoch forms — exactly like the reference's sample-counter-driven
        update_TOW (hybrid_observables_gs.cc:496-534)."""
        out = []
        while self.next_tick + 2 * self.tick_step <= up_to_sample:
            if self.t_rx_tow_ms is not None:
                self.t_rx_tow_ms += float(self.conf.interval_ms)
                if self.t_rx_tow_ms >= constants.GPS_TOW_MAX_MS:
                    self.t_rx_tow_ms %= constants.GPS_TOW_MAX_MS
            epoch = self._form_epoch(self.next_tick)
            self.next_tick += self.tick_step
            if epoch is not None:
                out.append(epoch)
        return out

    # -- internals ----------------------------------------------------------
    def _interp(self, c: int, t_rx_s: float):
        h = self.hist[c]
        if len(h["t"]) < 2:
            return None
        t = np.asarray(h["t"])
        i = int(np.searchsorted(t, t_rx_s))
        if i == 0 or i >= len(t):
            return None
        t1, t2 = t[i - 1], t[i]
        if not (t1 <= t_rx_s <= t2) or (t2 - t1) > 0.1:
            return None
        f = (t_rx_s - t1) / (t2 - t1)
        tow1, tow2 = h["tow"][i - 1], h["tow"][i]
        dtow = tow2 - tow1
        if dtow <= 0:  # week rollover (hybrid_observables_gs.cc:453-461)
            dtow += constants.GPS_TOW_MAX_MS
        return (tow1 + dtow * f,
                h["dop"][i - 1] + (h["dop"][i] - h["dop"][i - 1]) * f,
                h["ph"][i - 1] + (h["ph"][i] - h["ph"][i - 1]) * f,
                h["cn0"][i])

    def _form_epoch(self, tick_sample: int):
        t_rx_s = tick_sample / self.conf.fs
        valid = np.zeros(self.n, bool)
        tow = np.full(self.n, np.nan)
        dop = np.zeros(self.n)
        ph = np.zeros(self.n)
        cn0 = np.zeros(self.n)
        for c in range(self.n):
            r = self._interp(c, t_rx_s)
            if r is None:
                continue
            valid[c], (tow[c], dop[c], ph[c], cn0[c]) = True, r
        if not valid.any():
            return None
        # first-fix receiver TOW initialization (update_TOW); afterwards the
        # clock is advanced per tick in pull_ticks.  The pseudolite channel's
        # transmit clock is NOT GNSS-synchronized, so it must never seed the
        # common receiver time (hybrid_observables_gs.cc:496-556 excludes the
        # ps channel from receiver-time logic).
        step = float(self.conf.interval_ms)
        gnss_valid = valid.copy()
        if 0 <= self.conf.ps_channel < self.n:
            gnss_valid[self.conf.ps_channel] = False
        if self.t_rx_tow_ms is None:
            if not gnss_valid.any():
                return None   # cannot anchor rx time to a ps-only epoch
            ref = float(np.nanmax(tow[gnss_valid]))
            self.t_rx_tow_ms = np.ceil(ref / step) * step
        # pseudoranges (compute_pranges)
        travel_ms = self.t_rx_tow_ms - tow
        wrap = np.abs(travel_ms) > 302_400
        if 0 <= self.conf.ps_channel < self.n:
            wrap[self.conf.ps_channel] = False
        travel_ms = np.where(wrap, travel_ms + constants.GPS_TOW_MAX_MS,
                             travel_ms)
        pr = travel_ms * _C_MS
        # optional Hatch smoothing (smooth_pseudoranges)
        m = self.conf.smoothing_factor
        if m > 1:
            lam = self.conf.carrier_wavelength_m
            for c in range(self.n):
                if not valid[c]:
                    self._sm_lock[c] = False
                    continue
                if self._sm_lock[c]:
                    f = (m - 1.0) / m
                    pr[c] = (f * self._sm_last_pr[c] + pr[c] / m
                             + lam * f * (ph[c] - self._sm_last_ph[c]))
                self._sm_last_pr[c] = pr[c]
                self._sm_last_ph[c] = ph[c]
                self._sm_lock[c] = True
        return ObservationEpoch(
            rx_time_s=self.t_rx_tow_ms / 1000.0, tick_sample=tick_sample,
            valid=valid, pseudorange_m=np.where(valid, pr, 0.0),
            interp_tow_ms=tow, carrier_doppler_hz=dop,
            carrier_phase_cycles=ph, cn0_db_hz=cn0)
