"""Pallas TPU kernel: fused carrier-rotator + code-NCO + multi-tap
correlator.

The TPU-native replacement for the reference's hot kernel pair
volk_gnsssdr_32f_xn_resampler_32f_xn +
volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn
(cpu_multicorrelator_real_codes.cc:75-144) and the CUDA multicorrelator
(tracking/libs/cuda_multicorrelator.cu): one kernel program per channel
  1. DMAs its sample block from the shared HBM-resident chunk at a
     per-channel dynamic offset (scalar-prefetched positions),
  2. generates the carrier NCO (VPU sin/cos) and wipes off,
  3. resamples the local code by expressing the per-sample chip-index
     gather as a one-hot(bf16) x code-table matmul on the MXU — gathers
     don't vectorize on TPU, matmuls are free,
  4. forms all K tap outputs from the base/next/prev chip values with
     fractional-phase selects and mask-reduces to K complex accumulators.

Semantics match ops.correlator.correlate_multitap exactly (floor-based
chip indexing, tap offsets in (-1, 1)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CODE_PAD = 1024  # C/A table padded 1023 -> 1024 lanes


def pack_code_tables(codes: np.ndarray) -> np.ndarray:
    """[C, L] +-1 codes -> [C, 3, CODE_PAD] stacked (prev, base, next)
    chip-value tables so code[(i-1) % L], code[i % L], code[(i+1) % L] all
    come from one one-hot matmul."""
    c, l = codes.shape
    out = np.zeros((c, 3, CODE_PAD), np.float32)
    idx = np.arange(CODE_PAD) % l
    out[:, 0, :] = codes[:, (idx - 1) % l]
    out[:, 1, :] = codes[:, idx]
    out[:, 2, :] = codes[:, (idx + 1) % l]
    return out


def _kernel(positions_ref,            # scalar prefetch: [C] int32
            params_ref,               # scalar prefetch: [C, 8] float32
            x_re_hbm, x_im_hbm,       # [N] float32 in ANY/HBM
            tables_ref,               # [1, 3, CODE_PAD] VMEM (this channel)
            out_re_ref, out_im_ref,   # [1, 8, 128] VMEM (padded outputs)
            xr_scratch, xi_scratch,   # [B] VMEM scratch
            sem,                      # 2 DMA semaphores
            *, block_size, code_len, fs, taps):
    c = pl.program_id(0)
    pos = positions_ref[c]
    # HBM slices of 1-D f32 arrays must start on the 1024-element tile
    # grid: DMA the aligned superset window and shift the NCO time origin
    # by the in-tile offset delta instead of shifting the data
    pos_aligned = (pos // 1024) * 1024
    delta = (pos - pos_aligned).astype(jnp.float32)
    dma_len = block_size + 1024
    cp_re = pltpu.make_async_copy(
        x_re_hbm.at[pl.ds(pos_aligned, dma_len)], xr_scratch, sem.at[0])
    cp_im = pltpu.make_async_copy(
        x_im_hbm.at[pl.ds(pos_aligned, dma_len)], xi_scratch, sem.at[1])
    cp_re.start()
    cp_im.start()

    rem_code = params_ref[c, 0]
    code_freq = params_ref[c, 1]
    rem_carr = params_ref[c, 2]
    doppler = params_ref[c, 3]
    n_samp = params_ref[c, 4]

    lanes = 128
    rows = dma_len // lanes
    b = dma_len
    n = (jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) * lanes
         + jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
         ).astype(jnp.float32) - delta      # sample index rel. to pos
    inv_fs = jnp.float32(1.0 / fs)

    # carrier NCO + wipeoff
    phase = rem_carr + jnp.float32(2.0 * np.pi) * doppler * n * inv_fs
    cosp = jnp.cos(phase)
    sinp = jnp.sin(phase)
    mask = ((n >= 0.0) & (n < n_samp)).astype(jnp.float32)

    cp_re.wait()
    cp_im.wait()
    xre = xr_scratch[:].reshape(rows, lanes)
    xim = xi_scratch[:].reshape(rows, lanes)
    # x * exp(-j phase), masked
    wr = (xre * cosp + xim * sinp) * mask
    wi = (xim * cosp - xre * sinp) * mask

    # code NCO: chip index + fraction
    chips = rem_code + code_freq * n * inv_fs
    base = jnp.floor(chips)
    frac = chips - base
    # base mod code_len without integer mod: base in [-1, ~2100)
    l_f = jnp.float32(code_len)
    base = base - l_f * jnp.floor(base / l_f)
    ib = base.astype(jnp.int32)

    # one-hot [B, CODE_PAD] (bf16) x tables [CODE_PAD, 3] on the MXU
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes, CODE_PAD), 2)
    onehot = (col == ib[:, :, None]).astype(jnp.bfloat16)
    tabs = tables_ref[0].astype(jnp.bfloat16)          # [3, CODE_PAD]
    g = jax.lax.dot_general(
        onehot.reshape(b, CODE_PAD), tabs.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(rows, lanes, 3)
    g_prev, g_base, g_next = g[:, :, 0], g[:, :, 1], g[:, :, 2]

    # scalar tap sums -> one (8, 128) tile store (scalar VMEM stores don't
    # lower; a lane-selected broadcast does)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc_re = jnp.zeros((8, 128), jnp.float32)
    acc_im = jnp.zeros((8, 128), jnp.float32)
    for k, d in enumerate(taps):
        dk = jnp.float32(d)
        shifted = frac + dk
        code_k = jnp.where(shifted < 0.0, g_prev,
                           jnp.where(shifted >= 1.0, g_next, g_base))
        sel = (row_id == 0) & (lane_id == k)
        acc_re = jnp.where(sel, jnp.sum(wr * code_k), acc_re)
        acc_im = jnp.where(sel, jnp.sum(wi * code_k), acc_im)
    out_re_ref[0] = acc_re
    out_im_ref[0] = acc_im


@functools.partial(jax.jit, static_argnames=("block_size", "fs", "taps",
                                             "code_len", "interpret"))
def pallas_correlate(x_re: jax.Array, x_im: jax.Array,
                     positions: jax.Array, params: jax.Array,
                     tables: jax.Array, *, block_size: int, fs: float,
                     taps: tuple, code_len: int = 1023,
                     interpret: bool = False):
    """Run the fused correlator for all channels.

    x_re/x_im: [N] float32 sample chunk (real/imag)
    positions: [C] int32 block start indices
    params:    [C, 8] float32 rows =
               (rem_code_phase, code_freq, rem_carr_phase, doppler,
                n_samples, 0, 0, 0)
    tables:    [C, 3, CODE_PAD] from pack_code_tables
    returns (out_re, out_im): [C, K] float32
    """
    c = positions.shape[0]
    k = len(taps)
    kern = functools.partial(_kernel, block_size=block_size,
                             code_len=code_len, fs=fs, taps=taps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x_re
            pl.BlockSpec(memory_space=pl.ANY),    # x_im
            pl.BlockSpec((1, 3, CODE_PAD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # tables
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_size + 1024,), jnp.float32),
            pltpu.VMEM((block_size + 1024,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_re, out_im = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((c, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((c, 8, 128), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(positions, params, x_re, x_im, tables)
    return out_re[:, 0, :k], out_im[:, 0, :k]
