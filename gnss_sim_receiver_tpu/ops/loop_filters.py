"""Tracking loop filters as scan-carried state (vectorized over channels).

Batched functional rewrite of the reference loop filters
(src/algorithms/tracking/libs/tracking_2nd_PLL_filter.cc,
tracking_2nd_DLL_filter.cc, tracking_loop_filter.cc): instead of per-channel
C++ objects mutating members each ms, the filter state is a pytree of [C]
arrays threaded through ``lax.scan``; one call advances every channel.

Standard Kaplan/Hegarty natural-frequency scalings:
  1st order: w_n = 4 Bn
  2nd order: w_n = Bn / 0.53   (zeta = 0.707)
  3rd order: w_n = Bn / 0.7845 (a3 = 1.1, b3 = 2.4)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LoopFilterState(NamedTuple):
    vel: jnp.ndarray   # [C] first integrator
    acc: jnp.ndarray   # [C] second integrator (3rd order only)


def init_state(n_channels: int, vel0=None) -> LoopFilterState:
    z = jnp.zeros(n_channels, jnp.float32)
    return LoopFilterState(vel=z if vel0 is None else vel0, acc=z)


def second_order_step(state: LoopFilterState, error, bn_hz, t_s):
    """One update of a 2nd-order loop: returns (new_state, output).
    Output units = error units / s scaled into rate terms by the caller."""
    wn = bn_hz / 0.53
    vel = state.vel + wn * wn * t_s * error
    out = vel + 1.414213562 * wn * error
    return LoopFilterState(vel=vel, acc=state.acc), out


def third_order_step(state: LoopFilterState, error, bn_hz, t_s):
    """One update of a 3rd-order loop (reference pll_3rd order path)."""
    wn = bn_hz / 0.7845
    acc = state.acc + wn * wn * wn * t_s * error
    vel = state.vel + t_s * (acc + 1.1 * wn * wn * error)
    out = vel + 2.4 * wn * error
    return LoopFilterState(vel=vel, acc=acc), out


def first_order_step(value, error, bn_hz, t_s):
    """1st-order frequency loop (FLL pull-in): value += 4 Bn t err."""
    return value + 4.0 * bn_hz * t_s * error
