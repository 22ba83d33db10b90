"""PRN spreading-code generation.

Host-side (NumPy) generation of the local replica codes; codes are produced
once at channel setup and live on-device as constant tables afterwards, so
this is not a hot path.  Functional equivalent of the reference replica
generators (``src/algorithms/libs/gps_sdr_signal_replica.cc``,
``galileo_e1_signal_replica.cc``, ...), built from the public ICD
definitions (IS-GPS-200 G1/G2 LFSRs + G2 delay table).

All codes are returned as ``+-1`` float32 arrays with chip bit b mapped to
``2*b - 1`` (a '1' bit -> +1), matching the reference sign convention
(gps_sdr_signal_replica.cc:98-107).
"""

from __future__ import annotations

import functools

import numpy as np

GPS_CA_CODE_LENGTH = 1023

# G2 output delay (chips) per PRN, IS-GPS-200 table 3-I (PRN 1..37; 33..37 are
# reserved/ground).  Same data as reference gps_sdr_signal_replica.cc:42-53.
_GPS_CA_G2_DELAYS = (
    5, 6, 7, 8, 17, 18, 139, 140, 141, 251,
    252, 254, 255, 256, 257, 258, 469, 470, 471, 472,
    473, 474, 509, 512, 513, 514, 515, 516, 859, 860,
    861, 862, 863, 950, 947, 948, 950,
)


def _lfsr(taps: tuple[int, ...], length: int) -> np.ndarray:
    """Run a 10-stage LFSR (all-ones init) for `length` chips.

    `taps` are the 1-based stage numbers XOR-ed into the feedback
    (IS-GPS-200 convention); output is stage 10.  Returns bits {0,1}.
    """
    reg = np.ones(10, dtype=np.int64)
    out = np.empty(length, dtype=np.int64)
    for i in range(length):
        out[i] = reg[9]
        fb = 0
        for t in taps:
            fb ^= reg[t - 1]
        reg[1:] = reg[:-1]
        reg[0] = fb
    return out


@functools.lru_cache(maxsize=64)
def _gps_ca_bits(prn: int) -> np.ndarray:
    """GPS L1 C/A code bits {0,1} for PRN 1..37."""
    if not 1 <= prn <= len(_GPS_CA_G2_DELAYS):
        raise ValueError(f"GPS C/A PRN out of range: {prn}")
    g1 = _lfsr((3, 10), GPS_CA_CODE_LENGTH)
    g2 = _lfsr((2, 3, 6, 8, 9, 10), GPS_CA_CODE_LENGTH)
    delay = _GPS_CA_G2_DELAYS[prn - 1]
    g2_delayed = np.roll(g2, delay)
    return (g1 ^ g2_delayed).astype(np.int8)


# SBAS L1 C/A G2 delays (chips) for PRN 120..138, DO-229 / same family as
# GPS C/A (reference gps_sdr_signal_replica.cc delays[119..137])
_SBAS_G2_DELAYS = (
    145, 175, 52, 21, 237, 235, 886, 657, 634, 762,
    355, 1012, 176, 603, 130, 359, 595, 68, 386,
)


@functools.lru_cache(maxsize=32)
def _sbas_l1_bits(prn: int) -> np.ndarray:
    """SBAS L1 code bits {0,1} for PRN 120..138 (same G1/G2 generators as
    GPS C/A with the DO-229 delay assignments)."""
    if not 120 <= prn <= 138:
        raise ValueError(f"SBAS PRN out of range: {prn}")
    g1 = _lfsr((3, 10), GPS_CA_CODE_LENGTH)
    g2 = _lfsr((2, 3, 6, 8, 9, 10), GPS_CA_CODE_LENGTH)
    g2_delayed = np.roll(g2, _SBAS_G2_DELAYS[prn - 120])
    return (g1 ^ g2_delayed).astype(np.int8)


def sbas_l1_code(prn: int) -> np.ndarray:
    """SBAS L1 C/A code as +-1 float32 for PRN 120..138."""
    return (2.0 * _sbas_l1_bits(prn) - 1.0).astype(np.float32)


def gps_l1_ca_code(prn: int, chip_shift: int = 0) -> np.ndarray:
    """GPS L1 C/A code as +-1 float32 ('1' bit -> +1, matching the reference
    mapping in gps_sdr_signal_replica.cc:98-107)."""
    bits = _gps_ca_bits(prn)
    if chip_shift:
        bits = np.roll(bits, -int(chip_shift) % GPS_CA_CODE_LENGTH)
    return (2.0 * bits - 1.0).astype(np.float32)


def gps_l1_ca_code_table(prns) -> np.ndarray:
    """[len(prns), 1023] table of +-1 codes — the per-channel device table."""
    return np.stack([gps_l1_ca_code(int(p)) for p in prns], axis=0)


def sample_code(code: np.ndarray, fs: float, code_rate: float,
                n_samples: int, chip_shift: float = 0.0) -> np.ndarray:
    """Resample a +-1 chip sequence to `fs` (nearest-chip / zero-order hold),
    equivalent to the sampled-replica generation in the reference adapters
    (gps_sdr_signal_replica.cc gps_l1_ca_code_gen_complex_sampled).
    """
    n = np.arange(n_samples, dtype=np.float64)
    idx = np.floor(n * (code_rate / fs) + chip_shift).astype(np.int64)
    return code[np.mod(idx, len(code))]


# --- Galileo E1 B/C (memory codes would be loaded from hex tables; the
# primary E1 codes are 4092-chip memory codes.  Round-1 scope note: tracked in
# models/ as a follow-up; the infrastructure (tables + BOC(1,1) subcarrier) is
# signal-agnostic.) -----------------------------------------------------------

def boc11_subcarrier(fs: float, code_rate: float, n_samples: int,
                     chip_shift: float = 0.0) -> np.ndarray:
    """sign(sin(2*pi*f_sc*t)) BOC(1,1) subcarrier sampled at fs (Galileo E1)."""
    n = np.arange(n_samples, dtype=np.float64)
    chips = n * (code_rate / fs) + chip_shift
    half = np.floor(chips * 2.0).astype(np.int64)
    return (1.0 - 2.0 * (half % 2)).astype(np.float32)
