"""Tracking discriminators (vectorized over channels).

Batched equivalents of the reference's scalar discriminator library
(src/algorithms/tracking/libs/tracking_discriminators.h:46-195).  All inputs
are [C]-shaped arrays (one element per channel); outputs share that shape.
Units follow the reference: PLL errors in radians, FLL in Hz, DLL in chips.
"""

from __future__ import annotations

import jax.numpy as jnp


def pll_costas(prompt: jnp.ndarray) -> jnp.ndarray:
    """Costas-loop two-quadrant atan discriminator [rad] — insensitive to
    nav-bit sign flips (reference pll_cloop_two_quadrant_atan)."""
    i = jnp.real(prompt)
    q = jnp.imag(prompt)
    return jnp.arctan2(q * jnp.sign(i), jnp.abs(i))


def pll_four_quadrant(prompt: jnp.ndarray) -> jnp.ndarray:
    """Four-quadrant atan2 phase discriminator [rad] (pilot channels,
    reference pll_four_quadrant_atan)."""
    return jnp.arctan2(jnp.imag(prompt), jnp.real(prompt))


def fll_cross_dot(prompt_prev: jnp.ndarray, prompt: jnp.ndarray,
                  t_sep_s) -> jnp.ndarray:
    """Four-quadrant cross/dot frequency discriminator [Hz] between two
    consecutive prompts separated by t_sep_s (reference fll_diff_atan /
    fll_four_quadrant_atan family).  Bit-sign flips common to both prompts
    cancel; a flip between them is discriminator noise, as in the
    reference."""
    i1, q1 = jnp.real(prompt_prev), jnp.imag(prompt_prev)
    i2, q2 = jnp.real(prompt), jnp.imag(prompt)
    cross = i1 * q2 - i2 * q1
    dot = i1 * i2 + q1 * q2
    return jnp.arctan2(cross, dot) / (2.0 * jnp.pi * t_sep_s)


def fll_cross_dot_decision(prompt_prev: jnp.ndarray, prompt: jnp.ndarray,
                           t_sep_s) -> jnp.ndarray:
    """Two-quadrant (decision-directed) cross/dot frequency discriminator
    [Hz] (reference fll_diff_atan with atan: half the pull range of the
    four-quadrant form, but FULLY insensitive to a nav-bit flip BETWEEN
    the prompts — the flip negates cross and dot together, leaving
    atan2(cross*sign(dot), |dot|) unchanged.  Used by closures that
    AVERAGE pair discriminators over a block, where one flipped
    four-quadrant pair would bias the whole block's estimate."""
    i1, q1 = jnp.real(prompt_prev), jnp.imag(prompt_prev)
    i2, q2 = jnp.real(prompt), jnp.imag(prompt)
    cross = i1 * q2 - i2 * q1
    dot = i1 * i2 + q1 * q2
    sgn = jnp.where(dot >= 0, 1.0, -1.0)
    return jnp.arctan2(cross * sgn, jnp.abs(dot)) / (2.0 * jnp.pi * t_sep_s)


def dll_nc_e_minus_l_normalized(early_mag: jnp.ndarray, late_mag: jnp.ndarray,
                                spacing_chips) -> jnp.ndarray:
    """Normalized non-coherent early-minus-late envelope discriminator
    [chips] (reference dll_nc_e_minus_l_normalized with BPSK slope):
    for an ideal triangular ACF and total spacing d, E-L = 2*eps and
    E+L = 2-d near lock, so eps = (E-L)/(E+L) * (2-d)/2 — unit slope."""
    denom = early_mag + late_mag
    raw = jnp.where(denom > 0, (early_mag - late_mag) / jnp.maximum(denom, 1e-20), 0.0)
    return 0.5 * (2.0 - spacing_chips) * raw


def dll_nc_vemlp_normalized(ve, e, l, vl, spacing_chips) -> jnp.ndarray:
    """Very-early/early/late/very-late power discriminator [chips] for BOC
    signals (reference dll_nc_vemlp_normalized)."""
    p_early = jnp.sqrt(ve * ve + e * e)
    p_late = jnp.sqrt(vl * vl + l * l)
    denom = p_early + p_late
    raw = jnp.where(denom > 0, (p_early - p_late) / jnp.maximum(denom, 1e-20), 0.0)
    return 0.5 * spacing_chips * raw
