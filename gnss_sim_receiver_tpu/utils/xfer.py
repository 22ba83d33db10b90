"""Axon-safe host<->device transfer helpers.

On the remote-TPU ("axon") backend, complex64 transfers in EITHER
direction are unimplemented — and a complex host->device upload poisons
every later transfer in the process (all subsequent np.asarray()/scalar
pulls raise UNIMPLEMENTED, while on-device execution keeps working).
0-d scalar pulls are unimplemented too.

These helpers stage complex arrays as float32 planes (combined/split by a
tiny jitted kernel on device) and lift 0-d pulls to 1-d, so every
framework boundary works identically on CPU, plain TPU, and axon.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


def device_put_complex(x) -> jax.Array:
    """Upload `x` to the default device; complex inputs go up as two
    float32 planes and are combined on device."""
    if isinstance(x, jax.Array):
        return x
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jnp.asarray(x)
    return _combine(jnp.asarray(np.ascontiguousarray(x.real, np.float32)),
                    jnp.asarray(np.ascontiguousarray(x.imag, np.float32)))


def host_get(x) -> np.ndarray:
    """Device->host pull that is safe for complex and 0-d arrays."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    squeeze = (x.ndim == 0)
    if squeeze:
        x = x.reshape(1)
    if jnp.iscomplexobj(x):
        re, im = _split(x)
        out = (np.asarray(re) + 1j * np.asarray(im)).astype(np.complex64)
    else:
        out = np.asarray(x)
    return out[0] if squeeze else out


def host_get_tree(d: dict) -> dict:
    """host_get over every value of a flat dict (tracking outputs)."""
    return {k: host_get(v) for k, v in d.items()}
