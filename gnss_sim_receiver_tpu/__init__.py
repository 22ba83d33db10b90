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
