"""DFT on the MXU: two-stage Cooley-Tukey with matmul butterflies.

XLA's TPU FFT lowers small/medium batched 1-D FFTs to a generic radix
pipeline that sustains only a few tens of GFLOPS on a v5e — measured
0.75 Gpoint/s for [1004, 4320] complex64, i.e. ~6 ms for one second of
2 Msps windows, which made jnp.fft.fft the single largest cost of the
block tracking kernel.  A DFT is just two matmuls and a twiddle when
N = N1*N2:

    n = N2*a + b,  k = N1*d + c
    X[N1*d + c] = sum_b W_N^{bc} W_N2^{bd} ( sum_a x[N2*a+b] W_N1^{ac} )

so with N1, N2 ~ sqrt(N) the arithmetic is N*(N1+N2) MACs — e.g. 2.1x
the FLOPs of an ideal FFT at N=4096 — but it lands on the MXU as two
dense [*, N1]x[N1, N1] / [*, N2]x[N2, N2] contractions that run two
orders of magnitude faster than the scalar-radix pipeline.  Complex
arithmetic is expressed on split real/imag planes (3-matmul Karatsuba
per stage) because TPU dot_general over complex64 does not hit the MXU.

Used by the block tracking kernel (models/tracking_block.py) for the
shared window spectra and per-block Doppler-ramped replica spectra, and
by PCPS acquisition for grid FFT/IFFTs.  Falls back to jnp.fft for
sizes that don't factor well (prime N) — never the case for the
5-smooth sizes the callers pick.

Role parity: the reference's FFT wrapper over FFTW
(/root/reference/src/algorithms/libs/gnss_fft.h) — here re-targeted at
the TPU's systolic array instead of a CPU FFT library.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fft", "ifft", "good_size"]


def good_size(n: int) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) integer >= n: factors into two
    near-sqrt matmul stages and keeps XLA's fallback FFT fast too."""
    best = 1 << int(np.ceil(np.log2(max(n, 1))))
    p5 = 1
    while p5 < best:
        p3 = p5
        while p3 < best:
            p2 = p3
            while p2 < n:
                p2 *= 2
            best = min(best, p2)
            p3 *= 3
        p5 *= 5
    return best


@lru_cache(maxsize=64)
def _split(n: int) -> tuple[int, int] | None:
    """Factor n = n1*n2 with n1 <= n2 as close to sqrt(n) as possible.
    Returns None when the best split is too lopsided to beat the
    built-in FFT (e.g. prime n)."""
    best = None
    for n1 in range(int(np.sqrt(n)), 0, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    if best is None or best[0] == 1:
        return None
    # lopsided splits (N1 << N2) degenerate toward O(N^2)
    if best[1] > 16 * best[0]:
        return None
    return best


@lru_cache(maxsize=64)
def _tables(n: int, inverse: bool):
    """(W1[a,c], tw[c,b], W2[b,d]) numpy complex64 DFT factor tables."""
    spl = _split(n)
    if spl is None:
        return None
    n1, n2 = spl
    sign = 2j * np.pi / n if inverse else -2j * np.pi / n
    a = np.arange(n1)
    b = np.arange(n2)
    w1 = np.exp(sign * n2 * (a[:, None] * a[None, :]))     # W_N1^{ac} [a, c]
    tw = np.exp(sign * (a[:, None] * b[None, :]))          # W_N^{cb} -> [c, b]
    w2 = np.exp(sign * n1 * (b[:, None] * b[None, :]))     # W_N2^{bd} [b, d]
    return (w1.astype(np.complex64), tw.astype(np.complex64),
            w2.astype(np.complex64))


def _cmatmul(xr, xi, w):
    """[..., A] x [A, B] complex matmul on split planes; w complex np/jnp.
    3-multiplication (Karatsuba) form: MXU sees three real matmuls."""
    wr = jnp.real(w).astype(jnp.float32)
    wi = jnp.imag(w).astype(jnp.float32)
    k1 = jnp.matmul(xr, wr + wi, preferred_element_type=jnp.float32)
    k2 = jnp.matmul(xi + xr, wi, preferred_element_type=jnp.float32)
    k3 = jnp.matmul(xi - xr, wr, preferred_element_type=jnp.float32)
    return k1 - k2, k1 + k3 - 2.0 * jnp.matmul(
        xr, wi, preferred_element_type=jnp.float32)


def _cmatmul4(xr, xi, w):
    """4-multiplication complex matmul: one more matmul than Karatsuba
    but fewer elementwise passes; measured faster on v5e for these
    shapes (matmuls are MXU-cheap, HBM passes are not)."""
    wr = jnp.real(w).astype(jnp.float32)
    wi = jnp.imag(w).astype(jnp.float32)
    rr = jnp.matmul(xr, wr, preferred_element_type=jnp.float32)
    ri = jnp.matmul(xr, wi, preferred_element_type=jnp.float32)
    ir = jnp.matmul(xi, wr, preferred_element_type=jnp.float32)
    ii = jnp.matmul(xi, wi, preferred_element_type=jnp.float32)
    return rr - ii, ri + ir


def _transform(x: jax.Array, inverse: bool) -> jax.Array:
    n = x.shape[-1]
    tabs = _tables(n, inverse)
    if tabs is None:                      # prime / lopsided: builtin FFT
        return jnp.fft.ifft(x, axis=-1) * n if inverse \
            else jnp.fft.fft(x, axis=-1)
    w1, tw, w2 = tabs
    n1, n2 = w1.shape[0], w2.shape[0]
    batch = x.shape[:-1]
    xr = jnp.real(x).astype(jnp.float32).reshape(*batch, n1, n2)
    xi = jnp.imag(x).astype(jnp.float32).reshape(*batch, n1, n2)
    # stage 1: DFT over a (the n1 axis): Y[c, b] = sum_a x[a, b] W1[a, c]
    xr_t = jnp.swapaxes(xr, -1, -2)                     # [.., b, a]
    xi_t = jnp.swapaxes(xi, -1, -2)
    yr, yi = _cmatmul4(xr_t, xi_t, w1)                  # [.., b, c]
    # twiddle W_N^{bc}
    twr = jnp.real(jnp.asarray(tw)).T                   # [b, c]
    twi = jnp.imag(jnp.asarray(tw)).T
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    # stage 2: DFT over b: Z[c, d] = sum_b Y[c, b] W2[b, d]
    zr_t = jnp.swapaxes(zr, -1, -2)                     # [.., c, b]
    zi_t = jnp.swapaxes(zi, -1, -2)
    or_, oi_ = _cmatmul4(zr_t, zi_t, w2)                # [.., c, d]
    # output index k = N1*d + c -> transpose to [.., d, c]
    out_r = jnp.swapaxes(or_, -1, -2).reshape(*batch, n)
    out_i = jnp.swapaxes(oi_, -1, -2).reshape(*batch, n)
    return jax.lax.complex(out_r, out_i)


@jax.jit
def fft(x: jax.Array) -> jax.Array:
    """Forward DFT along the last axis (matches jnp.fft.fft)."""
    return _transform(x, inverse=False)


@jax.jit
def ifft(x: jax.Array) -> jax.Array:
    """Inverse DFT along the last axis (matches jnp.fft.ifft)."""
    return _transform(x, inverse=True) / x.shape[-1]
