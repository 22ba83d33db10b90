"""Pallas TPU kernel: fused carrier NCO + wipeoff + multi-tap dot product.

TPU-native analogue of the reference's hot tracking kernel
volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn (+ its sincos NCO helper),
wrapped by cpu_multicorrelator_real_codes.cc:75-144 and mirrored by the
CUDA multicorrelator (tracking/libs/cuda_multicorrelator.cu).  The kernel
split matches the reference's: code resampling is a separate op (the volk
``32f_xn_resampler`` analogue lives in ops.correlator as an XLA gather);
this kernel fuses, per channel:
  - carrier NCO phase generation (VPU sin/cos),
  - complex rotation (wipeoff) of the sample block,
  - masked K-tap real-code dot products,
so the rotated block never round-trips to HBM.

Layout: sample blocks and resampled codes arrive pre-tiled as
[C, ROWS, 128] / [C, K, ROWS, 128] so every op is native (8,128)-tile
arithmetic — no in-kernel gathers, reshapes, or unaligned DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(params_ref,               # scalar prefetch: [C, 8] float32
            xre_ref, xim_ref,         # [1, ROWS, 128] VMEM
            code_ref,                 # [1, K, ROWS, 128] VMEM
            out_re_ref, out_im_ref,   # [1, 8, 128] VMEM (lane 0..K-1 used)
            *, n_taps, fs):
    c = pl.program_id(0)
    rem_carr = params_ref[c, 2]
    doppler = params_ref[c, 3]
    n_samp = params_ref[c, 4]

    rows = xre_ref.shape[1]
    n = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
         + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
         ).astype(jnp.float32)
    phase = rem_carr + jnp.float32(2.0 * np.pi / fs) * doppler * n
    cosp = jnp.cos(phase)
    sinp = jnp.sin(phase)
    mask = (n < n_samp).astype(jnp.float32)

    xre = xre_ref[0]
    xim = xim_ref[0]
    wr = (xre * cosp + xim * sinp) * mask   # Re{x e^{-j phase}}
    wi = (xim * cosp - xre * sinp) * mask

    row_id = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    acc_re = jnp.zeros((8, LANES), jnp.float32)
    acc_im = jnp.zeros((8, LANES), jnp.float32)
    for k in range(n_taps):
        code_k = code_ref[0, k]
        sel = (row_id == 0) & (lane_id == k)
        acc_re = jnp.where(sel, jnp.sum(wr * code_k), acc_re)
        acc_im = jnp.where(sel, jnp.sum(wi * code_k), acc_im)
    out_re_ref[0] = acc_re
    out_im_ref[0] = acc_im


@functools.partial(jax.jit, static_argnames=("fs", "interpret"))
def pallas_rotator_dot_prod(blocks: jax.Array, codes: jax.Array,
                            params: jax.Array, *, fs: float,
                            interpret: bool = False):
    """Fused NCO+wipeoff+K-tap correlation.

    blocks: [C, B] complex64 per-channel sample blocks (B % 128 == 0)
    codes:  [C, K, B] float32 resampled +-1 code taps
    params: [C, 8] float32 rows =
            (rem_code_phase, code_freq, rem_carr_phase, doppler, n_samples,
             0, 0, 0) — only indices 2..4 are used here
    Returns [C, K] complex64.
    """
    c, b = blocks.shape
    k = codes.shape[1]
    assert b % LANES == 0
    rows = b // LANES
    xre = jnp.real(blocks).reshape(c, rows, LANES)
    xim = jnp.imag(blocks).reshape(c, rows, LANES)
    code4 = codes.reshape(c, k, rows, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, rows, LANES), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_re, out_im = pl.pallas_call(
        functools.partial(_kernel, n_taps=k, fs=fs),
        out_shape=[jax.ShapeDtypeStruct((c, 8, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((c, 8, LANES), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(params, xre, xim, code4)
    return jax.lax.complex(out_re[:, 0, :k], out_im[:, 0, :k])


def resample_codes_xla(codes: jax.Array, taps: jax.Array,
                       rem_code_phase: jax.Array, code_freq: jax.Array,
                       block_size: int, fs: float) -> jax.Array:
    """The volk 32f_xn_resampler analogue as an XLA gather: [C, K, B]
    resampled +-1 code values (shared with ops.correlator semantics)."""
    c = codes.shape[0]
    l = codes.shape[1]
    n = jnp.arange(block_size, dtype=jnp.float32)[None, :]
    chips = rem_code_phase[:, None] + code_freq[:, None] * (n / jnp.float32(fs))
    idx = jnp.floor(chips[:, None, :] + taps[None, :, None]).astype(jnp.int32)
    idx = jnp.mod(idx, l)
    return jnp.take_along_axis(
        codes[:, None, :], idx.reshape(c, -1)[:, None, :], axis=-1
    ).reshape(c, idx.shape[1], block_size)
