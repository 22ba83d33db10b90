"""Sample-rate conversion kernels.

Equivalents of the reference resampler stage (src/algorithms/resampler/):
  - direct_resampler: nearest-sample pick
    (direct_resampler_conditioner_cc.cc) — a gather;
  - linear_resampler: first-order MMSE (the role of Mmse_Resampler;
    fractional-delay linear interpolation, which is the reference's
    mmse_fir_interpolator at its default order for most rate pairs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def output_length(n_in: int, fs_in: float, fs_out: float) -> int:
    return int(np.floor(n_in * fs_out / fs_in))


@partial(jax.jit, static_argnames=("n_out",))
def direct_resampler(x: jax.Array, ratio_in_over_out: float, n_out: int):
    """Nearest-sample decimation/interpolation: out[k] = x[floor(k*r)]."""
    k = jnp.arange(n_out, dtype=jnp.float64
                   if jax.config.read("jax_enable_x64") else jnp.float32)
    idx = jnp.floor(k * ratio_in_over_out).astype(jnp.int32)
    idx = jnp.clip(idx, 0, x.shape[0] - 1)
    return x[idx]


@partial(jax.jit, static_argnames=("n_out",))
def linear_resampler(x: jax.Array, ratio_in_over_out: float, n_out: int):
    """Fractional resampling with linear interpolation."""
    k = jnp.arange(n_out, dtype=jnp.float32)
    pos = k * jnp.float32(ratio_in_over_out)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - i0.astype(jnp.float32)).astype(jnp.float32)
    i0 = jnp.clip(i0, 0, x.shape[0] - 2)
    return x[i0] * (1.0 - frac) + x[i0 + 1] * frac
