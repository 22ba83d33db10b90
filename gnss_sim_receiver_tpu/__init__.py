"""TPU-native software-defined GNSS receiver framework.

A from-scratch re-design of the capabilities of the reference
``gnss_sim_receiver`` (a GNSS-SDR v0.0.19 fork) for TPU hardware:

- the per-satellite GNU Radio thread-per-block flowgraph becomes a *batched
  array program*: channels are rows of arrays, time advances in fixed-size
  sample blocks, and the DLL/PLL loop state is carried through ``lax.scan``;
- the VOLK SIMD kernels become XLA/Pallas kernels batched over
  (channels x taps x Doppler bins);
- the control plane (channel FSM, acquisition manager) runs host-side in
  Python while the device executes pure dataflow;
- scale-out is via ``jax.sharding.Mesh`` + ``shard_map`` over channels.

Package layout:
  ops/       numeric kernels: PRN codes, PCPS acquisition, correlators,
             discriminators, loop filters, filters/resamplers (XLA + Pallas)
  models/    receiver-stage engines: acquisition, tracking, telemetry,
             observables, PVT
  sim/       JAX signal simulator (the test fixture replacing gnss-sim /
             bladeGPS in the reference)
  parallel/  mesh / sharding helpers
  utils/     configuration, data model (Gnss_Synchro equivalent), sample IO
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache() -> None:
    """Point JAX at an on-disk compilation cache so fresh processes skip
    the 20-40 s XLA compiles of the receiver's jitted programs (the hot
    shapes are stable across runs).  Opt-in with GNSS_TPU_COMPILE_CACHE=1:
    remote-attached TPU plugins that cannot serialize executables hang on
    the cache-write path, so this must not be the default there."""
    if _os.environ.get("GNSS_TPU_COMPILE_CACHE", "0") != "1":
        return
    try:
        import jax
        path = _os.environ.get(
            "GNSS_TPU_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "gnss_sim_receiver_tpu", "jax_cache"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:   # never let cache plumbing break the import
        pass


_setup_compilation_cache()
