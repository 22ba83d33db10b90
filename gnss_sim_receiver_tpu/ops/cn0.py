"""C/N0 estimation and lock detection (vectorized over channels).

Batched equivalents of the reference lock-detector library
(src/algorithms/tracking/libs/lock_detectors.h:68-109: cn0_svn_estimator,
cn0_m2m4_estimator, carrier_lock_detector) restructured for the scan world:
instead of a 20-prompt circular buffer per channel, [C]-shaped moment
accumulators are carried through the scan and folded into estimates every
`window` epochs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Cn0AccumState(NamedTuple):
    sum_abs_i: jnp.ndarray   # [C] sum |I_p|
    sum_abs_q: jnp.ndarray   # [C] sum |Q_p| (rectified lock detector)
    sum_m2: jnp.ndarray      # [C] sum |P|^2
    sum_m4: jnp.ndarray      # [C] sum |P|^4
    sum_i: jnp.ndarray       # [C] sum I (signed, for the lock detector)
    sum_q: jnp.ndarray       # [C] sum Q
    count: jnp.ndarray       # [C] epochs accumulated


def init_accum(n_channels: int) -> Cn0AccumState:
    z = jnp.zeros(n_channels, jnp.float32)
    return Cn0AccumState(z, z, z, z, z, z, z)


def accumulate(acc: Cn0AccumState, prompt: jnp.ndarray) -> Cn0AccumState:
    i = jnp.real(prompt)
    q = jnp.imag(prompt)
    p2 = i * i + q * q
    return Cn0AccumState(
        sum_abs_i=acc.sum_abs_i + jnp.abs(i),
        sum_abs_q=acc.sum_abs_q + jnp.abs(q),
        sum_m2=acc.sum_m2 + p2,
        sum_m4=acc.sum_m4 + p2 * p2,
        sum_i=acc.sum_i + i,
        sum_q=acc.sum_q + q,
        count=acc.count + 1.0,
    )


def cn0_svn_estimate(acc: Cn0AccumState, t_int_s) -> jnp.ndarray:
    """Signal-to-Noise-Variance C/N0 estimate [dB-Hz] over the accumulated
    window (reference cn0_svn_estimator)."""
    n = jnp.maximum(acc.count, 1.0)
    p_sig = (acc.sum_abs_i / n) ** 2
    p_tot = acc.sum_m2 / n
    snr = p_sig / jnp.maximum(p_tot - p_sig, 1e-20)
    return 10.0 * jnp.log10(jnp.maximum(snr / t_int_s, 1e-10))


def cn0_m2m4_estimate(acc: Cn0AccumState, t_int_s) -> jnp.ndarray:
    """Second/fourth-moment C/N0 estimate [dB-Hz] (reference
    cn0_m2m4_estimator)."""
    n = jnp.maximum(acc.count, 1.0)
    m2 = acc.sum_m2 / n
    m4 = acc.sum_m4 / n
    pd2 = jnp.maximum(2.0 * m2 * m2 - m4, 0.0)
    p_d = jnp.sqrt(pd2)
    p_n = jnp.maximum(m2 - p_d, 1e-20)
    return 10.0 * jnp.log10(jnp.maximum(p_d / p_n / t_int_s, 1e-10))


def carrier_lock_value(acc: Cn0AccumState,
                       rectify: bool = False) -> jnp.ndarray:
    """Carrier lock test ~= cos(2 phase_err): NBD/NBP with the coherent
    sums ((sum I)^2 -/+ (sum Q)^2) — exactly the reference
    carrier_lock_detector (lock_detectors.cc:133-148).

    rectify=True uses per-epoch |I| / |Q| sums instead — required for
    meander/bi-binary signals (GLONASS GNAV) whose data is zero-mean over
    EVERY window by construction, which drives the coherent ΣI to zero
    and the classic test to -1 even in perfect lock."""
    if rectify:
        i2 = acc.sum_abs_i * acc.sum_abs_i
        q2 = acc.sum_abs_q * acc.sum_abs_q
    else:
        i2 = acc.sum_i * acc.sum_i
        q2 = acc.sum_q * acc.sum_q
    return (i2 - q2) / jnp.maximum(i2 + q2, 1e-20)


def update_lock_counters(fail_count, locked, max_fail):
    """Hysteretic lock management (dll_pll_veml_tracking.cc:972-1029):
    increment the fail counter when unlocked, decrement toward 0 when
    locked; loss is declared only when count exceeds max_fail."""
    count = jnp.where(locked, jnp.maximum(fail_count - 1, 0), fail_count + 1)
    lost = count > max_fail
    return count, lost
