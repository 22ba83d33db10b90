"""ctypes bindings for the native C++ helper library (native/).

Native-path equivalents of the reference's C components (libswiftcnav
Viterbi, unpack blocks): built on demand with `make` (g++), cached next to
the sources.  Every entry point has a NumPy fallback so the package works
without a toolchain; `have_native()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgnss_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.viterbi27_decode.restype = ctypes.c_float
        lib.viterbi27_decode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.conv27_encode.restype = None
        lib.conv27_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.unpack_2bit_samples.restype = None
        lib.unpack_2bit_samples.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.ibyte_to_cfloat.restype = None
        lib.ibyte_to_cfloat.argtypes = [
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.ishort_to_cfloat.restype = None
        lib.ishort_to_cfloat.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Viterbi K=7 rate-1/2 (G1=0171, G2=0133)
# ---------------------------------------------------------------------------

_G1, _G2 = 0o171, 0o133


def conv27_encode(bits: np.ndarray) -> np.ndarray:
    """Convolutionally encode hard bits -> 2n symbols {0,1}."""
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(2 * len(bits), np.uint8)
        lib.conv27_encode(
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(bits),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    # fallback
    out = np.empty(2 * len(bits), np.uint8)
    state = 0
    for t, b in enumerate(bits):
        reg = (int(b) << 6) | state
        out[2 * t] = bin(reg & _G1).count("1") & 1
        out[2 * t + 1] = bin(reg & _G2).count("1") & 1
        state = reg >> 1
    return out


def viterbi27_decode(soft_symbols: np.ndarray) -> np.ndarray:
    """Soft symbols (2n floats, >0 ~ bit 1) -> n decoded bits."""
    sym = np.ascontiguousarray(soft_symbols, dtype=np.float32)
    n_bits = len(sym) // 2
    lib = _load()
    if lib is not None:
        out = np.empty(n_bits, np.uint8)
        lib.viterbi27_decode(
            sym.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_bits,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    return _viterbi_py(sym, n_bits)


def _viterbi_py(sym: np.ndarray, n_bits: int) -> np.ndarray:
    """Vectorized NumPy Viterbi fallback."""
    nstates = 64
    s = np.arange(nstates)
    out_bits = np.zeros((nstates, 2, 2), np.float32)
    for state in range(nstates):
        for inp in range(2):
            reg = (inp << 6) | state
            out_bits[state, inp, 0] = bin(reg & _G1).count("1") & 1
            out_bits[state, inp, 1] = bin(reg & _G2).count("1") & 1
    sign = 2.0 * out_bits - 1.0
    pm = np.full(nstates, -1e30, np.float32)
    pm[0] = 0.0
    decisions = np.zeros((n_bits, nstates), np.uint8)
    ns_for = (((np.arange(2)[None, :] << 6) | s[:, None]) >> 1)  # [64,2]
    for t in range(n_bits):
        bm = sign[:, :, 0] * sym[2 * t] + sign[:, :, 1] * sym[2 * t + 1]
        cand = pm[:, None] + bm                       # [64, 2]
        pm_next = np.full(nstates, -1e30, np.float32)
        dec = np.zeros(nstates, np.uint8)
        for inp in range(2):
            for state in range(nstates):
                ns = ns_for[state, inp]
                if cand[state, inp] > pm_next[ns]:
                    pm_next[ns] = cand[state, inp]
                    dec[ns] = (state & 1) | (inp << 1)
        pm = pm_next
        decisions[t] = dec
    state = int(np.argmax(pm))
    bits = np.zeros(n_bits, np.uint8)
    for t in range(n_bits - 1, -1, -1):
        d = decisions[t, state]
        bits[t] = (d >> 1) & 1
        state = ((state << 1) | (d & 1)) & 63
    return bits


# ---------------------------------------------------------------------------
# unpackers
# ---------------------------------------------------------------------------

_LUT_2BIT = np.array([+1.0, +3.0, -1.0, -3.0], np.float32)


def unpack_2bit_samples(raw: np.ndarray) -> np.ndarray:
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(4 * len(raw), np.float32)
        lib.unpack_2bit_samples(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    idx = np.empty(4 * len(raw), np.uint8)
    idx[0::4] = raw & 0x3
    idx[1::4] = (raw >> 2) & 0x3
    idx[2::4] = (raw >> 4) & 0x3
    idx[3::4] = (raw >> 6) & 0x3
    return _LUT_2BIT[idx]


def interleaved_to_cfloat(raw: np.ndarray) -> np.ndarray:
    """int8/int16 interleaved IQ -> complex64 via the native converter."""
    lib = _load()
    n = len(raw) // 2
    if lib is not None and raw.dtype in (np.int8, np.int16):
        out = np.empty(2 * n, np.float32)
        raw = np.ascontiguousarray(raw)
        if raw.dtype == np.int8:
            lib.ibyte_to_cfloat(
                raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        else:
            lib.ishort_to_cfloat(
                raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out.view(np.complex64)
    f = raw.astype(np.float32)
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
