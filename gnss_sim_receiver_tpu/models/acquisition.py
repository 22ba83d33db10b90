"""Batched PCPS acquisition engine.

Functional equivalent of the reference `pcps_acquisition` GNU Radio block +
per-constellation adapters (src/algorithms/acquisition/): given a block of
conditioned samples, searches ALL channels' (Doppler x code delay) grids in
one batched device program and returns per-channel detections.

Differences from the reference by design (TPU-first):
  - no worker thread / blocking modes: acquisition is one jitted call over
    a sample block shared by every searching channel;
  - the Doppler loop, channel loop, and dwell loop are array axes;
  - two-step refinement (make_2_steps, pcps_acquisition.cc:698-758) is a
    second jitted call on a narrow grid around the coarse hit.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.ops import pcps, prn_codes
from gnss_sim_receiver_tpu.utils import xfer


@dataclasses.dataclass
class AcqConf:
    """Reference Acq_Conf (acquisition/libs/acq_conf.h:33-81) subset."""
    fs_in: float = 2_000_000.0
    doppler_max: float = 5000.0
    doppler_step: float = 250.0
    doppler_center: float = 0.0
    sampled_ms: int = 1
    max_dwells: int = 1
    pfa: float = 0.01
    threshold: float = 0.0          # used when pfa <= 0
    use_cfar_algorithm: bool = True
    make_two_steps: bool = False
    doppler_step2: float = 125.0
    num_doppler_bins_step2: int = 4
    # double the FFT so one full clean code period always exists even when
    # a nav-symbol edge falls inside the dwell (pcps_acquisition.cc:607,656;
    # use with CFAR — the peak repeats at delay+N and defeats the
    # first-vs-second-peak statistic)
    bit_transition_flag: bool = False


@dataclasses.dataclass
class AcqResults:
    """Per-channel acquisition outcome (fills the Gnss_Synchro Acq_* fields,
    gnss_synchro.h 'Acquisition' block)."""
    detected: np.ndarray            # [C] bool
    test_stat: np.ndarray           # [C] float
    delay_samples: np.ndarray       # [C] float
    doppler_hz: np.ndarray          # [C] float
    threshold: float
    samplestamp: int                # sample index of block start


class PcpsAcquisitionEngine:
    """Batched PCPS acquisition over a fixed PRN set.  Signal-agnostic:
    pass code_provider(prn) -> +-1 sub-chip table and sc_rate for non-GPS
    signals (e.g. Galileo E1 BOC sub-chip tables); defaults to GPS L1
    C/A."""

    def __init__(self, conf: AcqConf, prns, code_provider=None,
                 sc_rate: float | None = None):
        self.conf = conf
        self.prns = list(int(p) for p in prns)
        fs = conf.fs_in
        code_provider = code_provider or prn_codes.gps_l1_ca_code
        sc_rate = sc_rate or constants.GPS_L1_CA_CODE_RATE_CPS
        self.n_coherent = int(round(fs * 1e-3 * conf.sampled_ms))
        self.fft_size = (2 * self.n_coherent if conf.bit_transition_flag
                         else self.n_coherent)
        self.samples_per_chip = max(1, int(round(fs / sc_rate)))
        # local replica FFTs (adapter-side precompute in the reference);
        # bit-transition mode: one code period + zero padding, so each lag
        # correlates N samples out of the 2N buffer
        codes = np.stack([
            prn_codes.sample_code(np.asarray(code_provider(p), np.float32),
                                  fs, sc_rate, self.n_coherent)
            for p in self.prns])
        if conf.bit_transition_flag:
            codes = np.concatenate(
                [codes, np.zeros_like(codes)], axis=-1)
        self.code_fft_conj = xfer.device_put_complex(
            np.conj(np.fft.fft(codes, axis=-1)).astype(np.complex64))
        self.dopplers = jnp.asarray(pcps.doppler_grid(
            conf.doppler_max, conf.doppler_step, conf.doppler_center))
        n_cells = self.fft_size * len(self.dopplers)
        self.threshold = (pcps.cfar_threshold(conf.pfa, n_cells,
                                              conf.max_dwells)
                          if conf.pfa > 0 else conf.threshold)

    @property
    def n_samples_needed(self) -> int:
        return self.n_coherent * self.conf.max_dwells

    def acquire(self, x: np.ndarray, samplestamp: int = 0) -> AcqResults:
        """Search every channel's grid over `x` (>= n_samples_needed
        samples)."""
        m = self.conf.max_dwells
        n = self.fft_size
        if len(x) < m * n:
            raise ValueError(f"need {m * n} samples, got {len(x)}")
        x_dwells = xfer.device_put_complex(
            np.asarray(x[: m * n], dtype=np.complex64).reshape(m, n))
        grid = pcps.pcps_grid(x_dwells, self.code_fft_conj, self.dopplers,
                              float(self.conf.fs_in))
        if self.conf.use_cfar_algorithm:
            stat, dop_idx, del_idx = pcps.max_to_input_power_stat(
                grid, jnp.float32(m))
        else:
            stat, dop_idx, del_idx = pcps.first_vs_second_peak_stat(
                grid, self.samples_per_chip)
        stat = xfer.host_get(stat)
        del_idx = xfer.host_get(del_idx)
        doppler_hz = np.asarray(self.dopplers)[xfer.host_get(dop_idx)]
        if self.conf.make_two_steps:
            doppler_hz, stat2 = self._refine(x_dwells, doppler_hz)
            stat = np.maximum(stat, stat2)
        delay = np.asarray(del_idx, dtype=np.float64)
        if self.conf.bit_transition_flag:
            delay = np.mod(delay, self.n_coherent)   # peak repeats at +N
        return AcqResults(
            detected=stat > self.threshold,
            test_stat=stat,
            delay_samples=delay,
            doppler_hz=doppler_hz.astype(np.float64),
            threshold=self.threshold,
            samplestamp=int(samplestamp),
        )

    def _refine(self, x_dwells, coarse_doppler_hz):
        """Step-two narrow-grid Doppler refinement around each channel's
        coarse hit (pcps_acquisition.cc:698-758)."""
        conf = self.conf
        k = conf.num_doppler_bins_step2
        offsets = (np.arange(2 * k + 1) - k) * conf.doppler_step2
        best_dop = np.array(coarse_doppler_hz, dtype=np.float64)
        best_stat = np.zeros(len(self.prns), dtype=np.float64)
        # one narrow grid per channel center; batch as [C, D2] dopplers by
        # running each channel against its own bin set via a shared grid of
        # offsets re-centered per channel
        for ci in range(len(self.prns)):
            dops = jnp.asarray((coarse_doppler_hz[ci] + offsets)
                               .astype(np.float32))
            grid = pcps.pcps_grid(x_dwells, self.code_fft_conj[ci:ci + 1],
                                  dops, float(conf.fs_in))
            stat, dop_idx, _ = pcps.max_to_input_power_stat(
                grid, jnp.float32(x_dwells.shape[0]))
            best_dop[ci] = float(coarse_doppler_hz[ci]
                                 + offsets[int(xfer.host_get(dop_idx)[0])])
            best_stat[ci] = float(xfer.host_get(stat)[0])
        return best_dop, best_stat
