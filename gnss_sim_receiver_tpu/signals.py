"""Signal definitions: per-signal code tables and rates for the batched
engines.

The acquisition/tracking engines are signal-agnostic: they consume a
"sub-chip" table (the spreading waveform sampled at sc_rate, one entry per
sub-chip) plus rates. BPSK signals use the code itself; BOC(1,1) signals
(Galileo E1) use the 2x-rate sub-chip expansion so the same NCO/correlator
handles the square-wave subcarrier — the role of the reference's sinboc
replica generation (galileo_e1_signal_replica.cc).

Galileo E1 B/C primary codes are ICD *memory codes* (no generator
polynomial).  The tables ship as data assets loaded at runtime
(`load_e1_code_table`); the built-in `e1_test_code` provides deterministic
placeholder codes with the right length/statistics so the whole E1 pipeline
(simulator <-> receiver) runs end-to-end in tests without the asset file.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from gnss_sim_receiver_tpu import constants
from gnss_sim_receiver_tpu.ops import prn_codes


@dataclasses.dataclass(frozen=True)
class SignalDef:
    system: str          # "GPS" | "Galileo" | ...
    signal: str          # "1C" | "1B" | ...
    carrier_freq_hz: float
    chip_rate_cps: float        # ICD chip rate
    code_length_chips: int
    sc_per_chip: int            # sub-chips per chip (1 = BPSK, 2 = BOC(1,1))
    symbol_rate_sps: float      # nav symbol rate

    @property
    def sc_rate(self) -> float:
        return self.chip_rate_cps * self.sc_per_chip

    @property
    def sc_length(self) -> int:
        return self.code_length_chips * self.sc_per_chip

    @property
    def code_period_s(self) -> float:
        return self.code_length_chips / self.chip_rate_cps


GPS_L1CA = SignalDef("GPS", "1C", constants.GPS_L1_FREQ_HZ, 1.023e6, 1023,
                     1, 50.0)
GALILEO_E1B = SignalDef("Galileo", "1B", constants.GALILEO_E1_FREQ_HZ,
                        1.023e6, 4092, 2, 250.0)
# L2C CM: 20 ms code period, one 50-sps CNAV symbol per period
GPS_L2C_CM = SignalDef("GPS", "2S", constants.GPS_L2_FREQ_HZ,
                       constants.GPS_L2C_M_CODE_RATE_CPS, 10230, 1, 50.0)
# L5I: 1 ms code epochs; 100-sps CNAV symbols spread by NH10 (the sim's
# nav_bits for "L5" are per-EPOCH signs — see nav.cnav.l5i_epoch_signs)
GPS_L5I = SignalDef("GPS", "L5", constants.GPS_L5_FREQ_HZ,
                    constants.GPS_L5_CODE_RATE_CPS, 10230, 1, 1000.0)
# Galileo E5a-I: 1 ms code epochs; 50-sps F/NAV symbols spread by the
# 20-chip per-PRN secondary code (nav_bits are per-EPOCH signs)
GALILEO_E5A_I = SignalDef("Galileo", "5X", constants.GALILEO_E5A_FREQ_HZ,
                          constants.GALILEO_E5A_CODE_RATE_CPS, 10230, 1,
                          1000.0)
# Galileo E5b-I: 1 ms code epochs; 250-sps I/NAV symbols spread by the
# fixed 4-chip CS4 secondary code (nav_bits are per-EPOCH signs —
# nav.inav.e5b_epoch_signs)
GALILEO_E5B_I = SignalDef("Galileo", "7X", constants.GALILEO_E5B_FREQ_HZ,
                          constants.GALILEO_E5B_CODE_RATE_CPS, 10230, 1,
                          1000.0)
# GLONASS L1 C/A: FDMA — all satellites share the 511-chip code; the
# carrier sits at L1 + k*562.5 kHz for frequency slot k (nav_bits are
# 100-sps GNAV meander-half symbols, 10 code epochs each)
GLONASS_L1_CA = SignalDef("GLONASS", "1G", constants.GLONASS_L1_FREQ_HZ,
                          constants.GLONASS_CA_CODE_RATE_CPS, 511, 1, 100.0)
# BeiDou B1I (MEO/IGSO, D1): 1 ms code epochs; 50-bps D1 bits spread by
# NH20 (nav_bits are per-EPOCH signs — nav.dnav b1i_epoch_signs)
BEIDOU_B1I = SignalDef("BeiDou", "B1", constants.BEIDOU_B1I_FREQ_HZ,
                       constants.BEIDOU_B1I_CODE_RATE_CPS, 2046, 1, 1000.0)
# BeiDou B3I (MEO/IGSO, D1): same 1 ms epoch / NH20 / D1 structure as B1I
# but 10.23 Mcps with its own 10230-chip code family
BEIDOU_B3I = SignalDef("BeiDou", "B3", constants.BEIDOU_B3I_FREQ_HZ,
                       constants.BEIDOU_B3I_CODE_RATE_CPS, 10230, 1, 1000.0)


@functools.lru_cache(maxsize=128)
def e1_test_code(prn: int, component: str = "B") -> np.ndarray:
    """Deterministic placeholder E1 memory code (+-1, 4092 chips).  Real
    ICD tables load via load_e1_code_table; correlation statistics
    (balance, low cross-correlation) match the memory codes' design."""
    seed = (prn * 7919 + (0 if component == "B" else 104729)) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, 4092) * 2.0 - 1.0).astype(np.float32)


@functools.lru_cache(maxsize=128)
def e5a_test_code(prn: int, component: str = "I") -> np.ndarray:
    """Deterministic placeholder E5a primary code (+-1, 10230 chips).
    The ICD generates E5a codes from per-PRN LFSR start values; real
    tables load via load_e1_code_table-style assets.  Shared by simulator
    and receiver so the whole 5X pipeline runs end-to-end in tests."""
    seed = (prn * 15487 + (0 if component == "I" else 337)) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, 10230) * 2.0 - 1.0).astype(np.float32)


@functools.lru_cache(maxsize=64)
def e5a_secondary_code(prn: int, component: str = "I") -> np.ndarray:
    """E5a-I 20-chip per-PRN secondary code (+-1).  Placeholder with the
    ICD's length/balance properties (real CS20 tables are data assets);
    deterministic and shared by simulator and receiver."""
    seed = (prn * 30011 + (0 if component == "I" else 77)) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, 20) * 2.0 - 1.0).astype(np.float32)


@functools.lru_cache(maxsize=128)
def e5b_test_code(prn: int, component: str = "I") -> np.ndarray:
    """Deterministic placeholder E5b primary code (+-1, 10230 chips).
    Real ICD register-start tables load via data assets; shared by
    simulator and receiver so the 7X pipeline runs end-to-end in tests."""
    seed = (prn * 27449 + (0 if component == "I" else 911)) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, 10230) * 2.0 - 1.0).astype(np.float32)


def e5b_secondary_code() -> np.ndarray:
    """E5b-I 4-chip secondary code CS4 (+-1), same for all satellites."""
    cs = np.asarray(constants.GALILEO_E5B_I_SECONDARY_CODE, np.float32)
    return 1.0 - 2.0 * cs


def load_e1_code_table(path, prn: int, component: str = "B") -> np.ndarray:
    """Load a real E1 code table asset: text file with lines
    '<prn> <B|C> <hex chips>' (1023 hex chars = 4092 chips, MSB first)."""
    want = (str(prn), component)
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) == 3 and (parts[0], parts[1]) == want:
                bits = np.array([int(c, 16) for c in parts[2].strip()],
                                np.uint8)
                chips = np.unpackbits(bits[:, None], axis=1,
                                      count=4)[:, :4].reshape(-1)[:4092]
                return (2.0 * chips - 1.0).astype(np.float32)
    raise KeyError(f"PRN {prn}{component} not in {path}")


def boc11_expand(code: np.ndarray) -> np.ndarray:
    """BOC(1,1) sine-phased sub-chip expansion: chip c -> (+c, -c)."""
    out = np.empty(2 * len(code), np.float32)
    out[0::2] = code
    out[1::2] = -code
    return out


def subchip_table(sig: SignalDef, prn: int) -> np.ndarray:
    """The engine-facing spreading table for (signal, prn)."""
    if sig.signal == "1C":
        return prn_codes.gps_l1_ca_code(prn)
    if sig.signal == "1B":
        return boc11_expand(e1_test_code(prn, "B"))
    if sig.signal == "2S":
        from gnss_sim_receiver_tpu.ops import prn_codes_multi
        return prn_codes_multi.gps_l2c_m_code(prn)
    if sig.signal == "L5":
        from gnss_sim_receiver_tpu.ops import prn_codes_multi
        return prn_codes_multi.gps_l5_code(prn)
    if sig.signal == "5X":
        return e5a_test_code(prn, "I")
    if sig.signal == "7X":
        return e5b_test_code(prn, "I")
    if sig.signal == "1G":
        from gnss_sim_receiver_tpu.ops import prn_codes_multi
        return prn_codes_multi.glonass_l1_ca_code()
    if sig.signal == "B1":
        from gnss_sim_receiver_tpu.ops import prn_codes_multi
        return prn_codes_multi.beidou_b1i_code(prn)
    if sig.signal == "B3":
        from gnss_sim_receiver_tpu.ops import prn_codes_multi
        return prn_codes_multi.beidou_b3i_code(prn)
    raise NotImplementedError(sig.signal)
