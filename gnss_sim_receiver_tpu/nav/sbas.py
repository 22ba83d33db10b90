"""SBAS L1 message layer: encode (simulator) and streaming decode.

Mirrors the reference's sbas_l1_telemetry_decoder_gs
(src/algorithms/telemetry_decoder/gnuradio_blocks/
sbas_l1_telemetry_decoder_gs.cc): 250-bit messages at 250 bps, rate-1/2
K=7 (171,133 octal) convolutional coding to 500 sps symbols (each symbol
spans two 1 ms code epochs), three cycling 8-bit distributed preambles
0x53/0x9A/0xC6, CRC-24Q over the leading 226 bits (DO-229).  The decoder
follows the reference's hypothesis structure — two symbol-pair alignments
x two polarities, preamble + CRC gated (Sample_Aligner /
Symbol_Aligner_And_Decoder / Frame_Detector / Crc_Verifier roles) — on the
framework's shared windowed-Viterbi pattern (nav.cnav.CnavDecoder).

MT9 (GEO navigation, sbas_ephemeris.cc role) and MT12 (time) payloads get
typed parsers; all other message types surface as raw payload bits.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sim_receiver_tpu.nav.inav import crc24q

MSG_BITS = 250
DATA_BITS = 226                  # preamble(8) + MT(6) + payload(212)
SYMBOLS_PER_BIT = 2
EPOCHS_PER_SYMBOL = 2            # 500 sps symbols over 1 ms code epochs
MSG_SECONDS = 1.0

# distributed preamble: 0x53, 0x9A, 0xC6 cycling across consecutive
# messages (sbas_l1_telemetry_decoder_gs.cc:240-243)
PREAMBLES = np.array([
    [0, 1, 0, 1, 0, 0, 1, 1],
    [1, 0, 0, 1, 1, 0, 1, 0],
    [1, 1, 0, 0, 0, 1, 1, 0],
], dtype=np.int64)


def pack_message(msg_type: int, payload212: np.ndarray,
                 preamble_idx: int = 0) -> np.ndarray:
    """-> 250 bits {0,1}: preamble + MT + payload + CRC-24Q."""
    payload212 = np.asarray(payload212, np.int64)
    if payload212.shape != (212,):
        raise ValueError("payload must be 212 bits")
    mt = np.array([(int(msg_type) >> (5 - i)) & 1 for i in range(6)],
                  np.int64)
    head = np.concatenate([PREAMBLES[preamble_idx % 3], mt, payload212])
    crc = crc24q(head)
    crc_bits = np.array([(crc >> (23 - i)) & 1 for i in range(24)],
                        np.int64)
    return np.concatenate([head, crc_bits])


def unpack_message(bits250: np.ndarray):
    """-> (crc_ok, msg_type, payload212)."""
    b = np.asarray(bits250, np.int64)
    crc_rx = 0
    for i in range(24):
        crc_rx = (crc_rx << 1) | int(b[DATA_BITS + i])
    ok = crc24q(b[:DATA_BITS]) == crc_rx
    mt = 0
    for i in range(6):
        mt = (mt << 1) | int(b[8 + i])
    return ok, mt, b[14:DATA_BITS]


# ---------------------------------------------------------------------------
# typed payloads
# ---------------------------------------------------------------------------

def _get(bits, start, n, scale=1.0, signed=False):
    raw = 0
    for i in range(n):
        raw = (raw << 1) | int(bits[start + i])
    if signed and raw >> (n - 1):
        raw -= 1 << n
    return raw * scale


def _put(bits, start, n, value, scale=1.0, signed=False):
    raw = int(round(value / scale))
    if signed:
        raw &= (1 << n) - 1
    for i in range(n):
        bits[start + i] = (raw >> (n - 1 - i)) & 1


@dataclasses.dataclass
class SbasGeoNav:
    """MT9 GEO navigation message (DO-229 A.4.4.11; the reference's
    Sbas_Ephemeris, sbas_ephemeris.h): ECEF position/velocity/acceleration
    + clock at t0."""
    iodn: int = 0
    t0_s: float = 0.0            # x16 s
    ura: int = 0
    pos_m: tuple = (0.0, 0.0, 0.0)      # x0.08 m (x,y), x0.4 m (z)
    vel_ms: tuple = (0.0, 0.0, 0.0)     # x0.000625 / x0.004 m/s
    acc_ms2: tuple = (0.0, 0.0, 0.0)    # x0.0000125 / x0.0000625 m/s^2
    agf0_s: float = 0.0          # x2^-31 s
    agf1_ss: float = 0.0         # x2^-40 s/s


_MT9 = [  # (start, n, scale, signed) per field, DO-229 layout
    ("iodn", 0, 8, 1.0, False),
    ("t0", 8, 13, 16.0, False),
    ("ura", 21, 4, 1.0, False),
    ("x", 25, 30, 0.08, True),
    ("y", 55, 30, 0.08, True),
    ("z", 85, 25, 0.4, True),
    ("vx", 110, 17, 0.000625, True),
    ("vy", 127, 17, 0.000625, True),
    ("vz", 144, 18, 0.004, True),
    ("ax", 162, 10, 0.0000125, True),
    ("ay", 172, 10, 0.0000125, True),
    ("az", 182, 10, 0.0000625, True),
    ("agf0", 192, 12, 2.0 ** -31, True),
    ("agf1", 204, 8, 2.0 ** -40, True),
]


def pack_mt9(nav: SbasGeoNav) -> np.ndarray:
    bits = np.zeros(212, np.int64)
    vals = dict(iodn=nav.iodn, t0=nav.t0_s, ura=nav.ura,
                x=nav.pos_m[0], y=nav.pos_m[1], z=nav.pos_m[2],
                vx=nav.vel_ms[0], vy=nav.vel_ms[1], vz=nav.vel_ms[2],
                ax=nav.acc_ms2[0], ay=nav.acc_ms2[1], az=nav.acc_ms2[2],
                agf0=nav.agf0_s, agf1=nav.agf1_ss)
    for name, start, n, scale, signed in _MT9:
        _put(bits, start, n, vals[name], scale, signed)
    return bits


def parse_mt9(payload212: np.ndarray) -> SbasGeoNav:
    b = np.asarray(payload212, np.int64)
    v = {name: _get(b, start, n, scale, signed)
         for name, start, n, scale, signed in _MT9}
    return SbasGeoNav(
        iodn=int(v["iodn"]), t0_s=v["t0"], ura=int(v["ura"]),
        pos_m=(v["x"], v["y"], v["z"]),
        vel_ms=(v["vx"], v["vy"], v["vz"]),
        acc_ms2=(v["ax"], v["ay"], v["az"]),
        agf0_s=v["agf0"], agf1_ss=v["agf1"])


def geo_nav_pos(nav: SbasGeoNav, t_s: float) -> np.ndarray:
    """Quadratic GEO position propagation (sbas_ephemeris.cc sat_pos)."""
    dt = t_s - nav.t0_s
    p = np.asarray(nav.pos_m, np.float64)
    v = np.asarray(nav.vel_ms, np.float64)
    a = np.asarray(nav.acc_ms2, np.float64)
    return p + v * dt + 0.5 * a * dt * dt


# ---------------------------------------------------------------------------
# symbol stream (encode)
# ---------------------------------------------------------------------------

def symbols_for_messages(msgs: list[tuple[int, np.ndarray]],
                         first_preamble_idx: int = 0) -> np.ndarray:
    """[(msg_type, payload212)] -> continuous 500 sps symbol stream {0,1}
    (one convolutional encoder across the whole stream, preambles
    cycling)."""
    from gnss_sim_receiver_tpu import native
    bits = np.concatenate([
        pack_message(mt, pl, first_preamble_idx + k)
        for k, (mt, pl) in enumerate(msgs)])
    return native.conv27_encode(bits).astype(np.int64)


def sbas_epoch_signs(symbols01: np.ndarray) -> np.ndarray:
    """Symbols {0,1} at 500 sps -> +-1 per 1 ms code epoch (2 epochs per
    symbol, no secondary code)."""
    s = 2 * np.asarray(symbols01, np.int64) - 1
    return np.repeat(s, EPOCHS_PER_SYMBOL).astype(np.int8)


# ---------------------------------------------------------------------------
# streaming decode
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SbasMessageEvent:
    msg_type: int
    payload: np.ndarray          # 212 bits
    start_symbol: int            # stream symbol index of the message start
    preamble_idx: int
    crc_ok: bool


class SbasMessageDecoder:
    """Streaming SBAS decoder for one channel: feed soft 500 sps symbols
    (sign > 0 = symbol 1); two symbol-pair alignments x two polarities run
    through the windowed Viterbi and the preamble/CRC gate — the role of
    the reference's Sample_Aligner + Symbol_Aligner_And_Decoder +
    Frame_Detector + Crc_Verifier chain."""

    WINDOW_BITS = 420
    TAIL_BITS = 40
    # generous Viterbi warm-up overlap: a message starting right at the
    # scan edge must sit past several constraint lengths of converged
    # trellis (5*K bits), or its leading bits decode wrong and the CRC
    # rejects a clean message
    HEAD_BITS = 40

    def __init__(self):
        self.sym: list[float] = []
        self.base = 0
        self._head = 0
        self.geo_nav: SbasGeoNav | None = None

    def push_symbols(self, soft) -> list[SbasMessageEvent]:
        self.sym.extend(float(s) for s in soft)
        events = []
        while True:
            ev = self._try_decode()
            if ev is None:
                break
            if ev.msg_type == 9:
                self.geo_nav = parse_mt9(ev.payload)
            events.append(ev)
        return events

    def _consume_bits(self, n_bits: int) -> None:
        drop = 2 * max(n_bits - self.HEAD_BITS, 0)
        del self.sym[:drop]
        self.base += drop
        self._head = self.HEAD_BITS

    def _try_decode(self):
        from gnss_sim_receiver_tpu import native
        win = 2 * self.WINDOW_BITS
        if len(self.sym) < win + 1:
            return None
        for par in (0, 1):
            arr = np.asarray(self.sym[par:par + win], dtype=np.float64)
            for sign in (1.0, -1.0):
                bits = native.viterbi27_decode(
                    np.asarray(sign * arr, np.float32)).astype(np.int64)
                lim = len(bits) - self.TAIL_BITS - MSG_BITS
                if lim <= self._head:
                    return None
                for off in range(self._head, lim):
                    pre = bits[off:off + 8]
                    hits = np.flatnonzero((PREAMBLES == pre).all(axis=1))
                    if hits.size == 0:
                        continue
                    ok, mt, payload = unpack_message(
                        bits[off:off + MSG_BITS])
                    if not ok:
                        continue
                    start = self.base + par + 2 * off
                    if par:
                        del self.sym[:1]
                        self.base += 1
                    self._consume_bits(off + MSG_BITS)
                    return SbasMessageEvent(mt, payload, start,
                                            int(hits[0]), True)
        self._consume_bits(lim)
        return None
