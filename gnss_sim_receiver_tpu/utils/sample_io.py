"""Raw IF sample file IO.

Covers the item formats of the reference file signal sources and data-type
adapters (src/algorithms/signal_source/adapters/file_signal_source.cc,
src/algorithms/data_type_adapter/): interleaved byte/short IQ, real
byte/short, and gr_complex float32 files, plus writers used by the JAX
simulator to produce fixtures consumable by both frameworks.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# item_type string -> (numpy dtype, complex interleaved?)
_FORMATS = {
    "gr_complex": (np.complex64, False),
    "cshort": (np.int16, True),
    "cbyte": (np.int8, True),
    "ishort": (np.int16, True),   # interleaved I/Q shorts (reference 'ishort')
    "ibyte": (np.int8, True),     # interleaved I/Q bytes
    "short": (np.int16, False),
    "byte": (np.int8, False),
    "float": (np.float32, False),
}


def read_samples(path: str | Path, item_type: str = "gr_complex",
                 count: int = -1, offset_items: int = 0) -> np.ndarray:
    """Read a raw capture file into complex64 baseband samples."""
    dtype, interleaved = _FORMATS[item_type]
    raw_per_sample = 2 if interleaved and dtype != np.complex64 else 1
    raw = np.fromfile(path, dtype=dtype,
                      count=-1 if count < 0 else count * raw_per_sample,
                      offset=offset_items * raw_per_sample * np.dtype(dtype).itemsize)
    if dtype == np.complex64:
        return raw.astype(np.complex64)
    if interleaved:
        from gnss_sim_receiver_tpu import native
        return native.interleaved_to_cfloat(raw[: (len(raw) // 2) * 2])
    return raw.astype(np.float32).astype(np.complex64)


def write_samples(path: str | Path, x: np.ndarray,
                  item_type: str = "gr_complex", scale: float = 1.0) -> None:
    """Write complex64 baseband to a raw capture file in the given format."""
    dtype, interleaved = _FORMATS[item_type]
    x = np.asarray(x)
    if dtype == np.complex64:
        (x.astype(np.complex64) * scale).tofile(path)
        return
    if interleaved:
        out = np.empty(2 * len(x), dtype=np.float32)
        out[0::2] = x.real * scale
        out[1::2] = x.imag * scale
        info = np.iinfo(dtype)
        np.clip(np.rint(out), info.min, info.max).astype(dtype).tofile(path)
        return
    info = np.iinfo(dtype)
    np.clip(np.rint(x.real * scale), info.min, info.max).astype(dtype).tofile(path)


# ---------------------------------------------------------------------------
# File_Timestamp_Signal_Source side-channel (reference
# signal_source/libs/gnss_sdr_timestamp.cc: binary records of
# (uint64 samplecount, int32 week, int32 tow_ms) read alongside the
# capture; the block turns them into GnssTime stream tags)
# ---------------------------------------------------------------------------

_TIMETAG_DTYPE = np.dtype([("samplecount", "<u8"), ("week", "<i4"),
                           ("tow_ms", "<i4")])


def write_timestamp_file(path, samplecounts, weeks, tow_ms) -> None:
    """Write the reference's timetag side-file format."""
    n = len(samplecounts)
    arr = np.empty(n, _TIMETAG_DTYPE)
    arr["samplecount"] = np.asarray(samplecounts, np.uint64)
    arr["week"] = np.asarray(weeks, np.int32)
    arr["tow_ms"] = np.asarray(tow_ms, np.int32)
    arr.tofile(path)


def read_timestamp_file(path):
    """-> (samplecounts uint64, weeks int32, tow_ms int32) arrays."""
    arr = np.fromfile(path, dtype=_TIMETAG_DTYPE)
    return (arr["samplecount"].copy(), arr["week"].copy(),
            arr["tow_ms"].copy())


# ---------------------------------------------------------------------------
# Packed capture formats (reference signal_source/gnuradio_blocks unpackers,
# vectorized host-side: these feed the device in one shot, so a sample-rate
# Python loop would be the wrong design even though the reference streams
# byte-at-a-time through GNU Radio)
# ---------------------------------------------------------------------------


def unpack_2bit_real(raw: np.ndarray) -> np.ndarray:
    """NSR 2-bit packed real samples: one byte -> 4 float samples, LSB
    pair first, each the two's-complement value of its 2-bit field
    (unpack_byte_2bit_samples.cc:40-66)."""
    b = np.asarray(raw).astype(np.uint8)
    out = np.empty(4 * len(b), np.float32)
    for k in range(4):
        v = ((b >> (2 * k)) & 3).astype(np.int8)
        out[k::4] = np.where(v >= 2, v - 4, v).astype(np.float32)
    return out


def unpack_2bit_cpx(raw: np.ndarray) -> np.ndarray:
    """2-bit packed complex: one byte -> 2 complex samples, the
    reference's I/Q-swap nibble order (I from bits 5:4 / 1:0, Q from
    bits 7:6 / 3:2), value = 2*field + 1 in {-3,-1,+1,+3}
    (unpack_byte_2bit_cpx_samples.cc:46-100)."""
    b = np.asarray(raw).astype(np.uint8)
    def field(shift):
        v = ((b >> shift) & 3).astype(np.int8)
        v = np.where(v >= 2, v - 4, v)
        return v.astype(np.float32) * 2.0 + 1.0
    i0, q0 = field(4), field(6)
    i1, q1 = field(0), field(2)
    out = np.empty(2 * len(b), np.complex64)
    out[0::2] = i0 + 1j * q0
    out[1::2] = i1 + 1j * q1
    return out


def read_samples_nsr(path: str | Path, count: int = -1) -> np.ndarray:
    """NSR capture (Nsr_File_Signal_Source): 2-bit packed real IF
    samples -> complex64 (real-valued) baseband vector."""
    raw = np.fromfile(path, np.int8,
                      count=-1 if count < 0 else (count + 3) // 4)
    x = unpack_2bit_real(raw)
    if count >= 0:
        x = x[:count]
    return x.astype(np.complex64)


def read_samples_spir(path: str | Path, channel: int = 1,
                      count: int = -1) -> np.ndarray:
    """SPIR capture (Spir_File_Signal_Source): 1-bit-per-component
    samples packed in int32 words; channel k's I/Q sit at bits
    2(k-1) and 2k-1.  Output uses the reference's historical +-32767
    levels (unpack_intspir_1bit_samples.cc:35-70)."""
    w = np.fromfile(path, "<i4", count=-1 if count < 0 else count)
    i = np.where((w >> (2 * (channel - 1))) & 1 == 1, 32767.0, -32767.0)
    q = np.where((w >> (2 * channel - 1)) & 1 == 1, 32767.0, -32767.0)
    return (i + 1j * q).astype(np.complex64)


# LabSat 2/3 capture container (labsat23_source.cc): 1024-byte header
# (8x00 preamble + 'LS2'/'LS3' + subversion + header length + sections),
# then int16 words each packing 8 (2-bit) or 4 (4-bit) complex samples.
_LS_4BIT_MAP = np.array([1.0, 2.0, -2.0, -1.0], np.float32)  # (sign,mag)


def _labsat_decode_words(words: np.ndarray, bits: int) -> np.ndarray:
    bs = words.astype(np.uint16)
    if bits == 2:
        # sample i: I = bit(15-2i), Q = bit(14-2i), 0/1 -> -1/+1
        out = np.empty(8 * len(bs), np.complex64)
        for i in range(8):
            ib = ((bs >> (15 - 2 * i)) & 1).astype(np.float32) * 2.0 - 1.0
            qb = ((bs >> (14 - 2 * i)) & 1).astype(np.float32) * 2.0 - 1.0
            out[i::8] = ib + 1j * qb
        return out
    if bits == 4:
        # sample i: I sign bit(15-4i) mag bit(13-4i); Q sign bit(14-4i)
        # mag bit(12-4i); (sign,mag) -> {00:+1, 01:+2, 10:-2, 11:-1}
        out = np.empty(4 * len(bs), np.complex64)
        for i in range(4):
            isel = (((bs >> (15 - 4 * i)) & 1) << 1) | ((bs >> (13 - 4 * i)) & 1)
            qsel = (((bs >> (14 - 4 * i)) & 1) << 1) | ((bs >> (12 - 4 * i)) & 1)
            out[i::4] = _LS_4BIT_MAP[isel] + 1j * _LS_4BIT_MAP[qsel]
        return out
    raise ValueError(f"LabSat bits per sample {bits} not supported")


def read_labsat23_header(path: str | Path) -> dict:
    """Parse the LabSat 2/3 file header -> {version, bits_per_sample,
    channel_config, ref_clock, header_bytes} (labsat23_source.cc
    parse_header, :140-330)."""
    with open(path, "rb") as fh:
        blk = fh.read(1024)
    if len(blk) < 64 or blk[:8] != b"\x00" * 8:
        raise ValueError("LabSat preamble not found")
    tag = blk[8:11]
    if tag == b"LS2":
        version = 2
    elif tag == b"LS3":
        version = 3
    else:
        raise ValueError("LabSat version tag not found")
    sub_version = blk[11]
    header_bytes = int.from_bytes(blk[12:16], "little")
    info = {"version": version, "sub_version": sub_version,
            "header_bytes": header_bytes, "bits_per_sample": 2,
            "channel_config": 1, "ref_clock": 0}
    # first section
    section_id = int.from_bytes(blk[16:18], "little")
    p = 22
    if section_id == 2:
        info["ref_clock"] = blk[p]; p += 1
        info["bits_per_sample"] = blk[p]; p += 1
        info["channel_config"] = blk[p]; p += 1
    return info


def write_labsat23(path: str | Path, x: np.ndarray, bits: int = 2) -> None:
    """Write a (single-channel) LabSat3 capture the reference reader
    accepts: quantize complex64 to the 2- or 4-bit packing above."""
    x = np.asarray(x, np.complex64)
    hdr = bytearray(1024)
    hdr[8:11] = b"LS3"
    hdr[11] = 1
    hdr[12:16] = (1024).to_bytes(4, "little")
    hdr[16:18] = (2).to_bytes(2, "little")        # section 2 first
    hdr[18:22] = (16).to_bytes(4, "little")       # section length
    hdr[22] = 0                                   # OCXO
    hdr[23] = bits
    hdr[24] = 1 if bits == 2 else 3               # channel A, 1/2-bit IQ
    if bits == 2:
        n = (len(x) // 8) * 8
        ib = (np.real(x[:n]) >= 0).astype(np.uint16)
        qb = (np.imag(x[:n]) >= 0).astype(np.uint16)
        w = np.zeros(n // 8, np.uint16)
        for i in range(8):
            w |= (ib[i::8] << (15 - 2 * i)) | (qb[i::8] << (14 - 2 * i))
    elif bits == 4:
        n = (len(x) // 4) * 4
        def enc(v):
            # nearest of {+1,+2,-2,-1} -> (sign,mag): 00:+1 01:+2
            # 10:-2 11:-1 — the mag bit flips meaning with sign
            sign = (v < 0).astype(np.uint16)
            big = (np.abs(v) >= 1.5).astype(np.uint16)
            mag = np.where(sign == 1, 1 - big, big).astype(np.uint16)
            return sign, mag
        isg, img = enc(np.real(x[:n]))
        qsg, qmg = enc(np.imag(x[:n]))
        w = np.zeros(n // 4, np.uint16)
        for i in range(4):
            w |= ((isg[i::4] << (15 - 4 * i)) | (qsg[i::4] << (14 - 4 * i))
                  | (img[i::4] << (13 - 4 * i)) | (qmg[i::4] << (12 - 4 * i)))
    else:
        raise ValueError("bits must be 2 or 4")
    with open(path, "wb") as fh:
        fh.write(bytes(hdr))
        w.astype("<u2").tofile(fh)


def read_samples_labsat23(path: str | Path) -> np.ndarray:
    """LabSat 2/3 capture -> complex64 baseband (Labsat_Signal_Source
    role; single-channel configurations)."""
    info = read_labsat23_header(path)
    words = np.fromfile(path, "<u2", offset=1024)
    return _labsat_decode_words(words, int(info["bits_per_sample"]))
