"""profile_kernels: measure block-kernel shape candidates on the
attached device and persist the winners (the volk_gnsssdr_profile role —
reference src/algorithms/libs/volk_gnsssdr_module/.../apps/
volk_gnsssdr_profile.cc measures every kernel's SIMD variants and writes
a config the runtime dispatches from; here the tunable is the kernel
SHAPE: epochs per block of the shared-window block-FFT tracking
kernel).

Honest timing on the axon-attached TPU: reps serialized through carried
state with one dependent device->host pull (bench.py's method).

Usage:
    python -m gnss_sim_receiver_tpu.tools.profile_kernels \
        [--fs 2e6] [--channels 12] [--candidates 10,20,40] [--reps 8]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from gnss_sim_receiver_tpu.utils import autotune


def _timed(step, state, reps, sync_of):
    import jax
    st = state
    st, out = step(st)
    np.asarray(sync_of(out))
    t0 = time.perf_counter()
    st = state
    for _ in range(reps):
        st, out = step(st)
    np.asarray(sync_of(out))
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    np.asarray(sync_of(out))
    lat = time.perf_counter() - t1
    del jax
    return max(total - lat, 1e-9) / reps


def profile_block_kernel(fs: float = 2_000_000.0, n_channels: int = 12,
                         candidates=(10, 20, 40), reps: int = 8,
                         span_s: float = 0.8, store: bool = True,
                         out=sys.stdout):
    """Measure Msamples/s of track_chunk_blocks for each epochs-per-block
    candidate over the same signal span; cache the fastest.  Returns
    {e_block: msamples_s}."""
    import jax
    import jax.numpy as jnp

    from gnss_sim_receiver_tpu.models import tracking as trk
    from gnss_sim_receiver_tpu.models import tracking_block as tb
    from gnss_sim_receiver_tpu.ops import prn_codes

    conf = trk.TrackingConf(fs=fs)
    prns = [(i % 32) + 1 for i in range(n_channels)]
    tables = np.stack([np.asarray(prn_codes.gps_l1_ca_code(p), np.float32)
                       for p in prns])
    codes_fft = tb.code_spectra(conf, tables)
    taps = jnp.asarray(np.array([+0.25, 0.0, -0.25], np.float32))
    state = trk._init_state(n_channels)._replace(
        active=jnp.ones(n_channels, bool),
        carrier_doppler=jnp.linspace(-4000, 4000,
                                     n_channels).astype(jnp.float32))
    # common span: every candidate tracks the same signal length so the
    # timings are directly comparable samples/s
    span_epochs = int(round(span_s / conf.t_epoch_nominal_s))
    results = {}
    for e_block in candidates:
        n_blocks = max(1, span_epochs // int(e_block))
        n_ep = n_blocks * int(e_block)
        chunk = conf.nominal_epoch_samples * (n_ep + 2) \
            + tb.block_fft_size(conf)
        rng = np.random.default_rng(5)
        x = jnp.asarray((rng.standard_normal(chunk)
                         + 1j * rng.standard_normal(chunk))
                        .astype(np.complex64))

        def step(st, _nb=n_blocks, _eb=int(e_block), _x=x):
            _, outs = tb.track_chunk_blocks(conf, _nb, _eb, codes_fft,
                                            taps, _x, st)
            return st, outs

        dt = _timed(step, state, reps, lambda o: jnp.abs(o["prompt"][-1]))
        ms = n_ep * conf.t_epoch_nominal_s * fs * n_channels / dt / 1e6
        results[int(e_block)] = round(ms, 1)
        print(f"  e_block={e_block:4d}: {ms:9.1f} Msamples/s "
              f"({n_blocks} blocks x {e_block} epochs)", file=out)
    best = max(results, key=results.get)
    key = autotune.key_e_block(fs, conf.code_length_chips,
                               conf.t_epoch_nominal_s)
    if store:
        autotune.store(key, best, extra={
            "msamples_s": results, "n_channels": n_channels,
            "device": str(jax.devices()[0])})
        print(f"cached {key} = {best} -> {autotune.cache_path()}",
              file=out)
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fs", type=float, default=2_000_000.0)
    ap.add_argument("--channels", type=int, default=12)
    ap.add_argument("--candidates", type=str, default="10,20,40")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--span", type=float, default=0.8,
                    help="signal seconds per measurement")
    ap.add_argument("--dry-run", action="store_true",
                    help="measure only, do not write the cache")
    args = ap.parse_args(argv)
    cands = tuple(int(c) for c in args.candidates.split(","))
    profile_block_kernel(fs=args.fs, n_channels=args.channels,
                         candidates=cands, reps=args.reps,
                         span_s=args.span, store=not args.dry_run)
    return 0


if __name__ == "__main__":
    sys.exit(main())
