"""Benchmark: correlated tracking throughput + PCPS acquisition grids/s on
the current JAX default device (real TPU under the driver).

Prints ONE JSON line:
  metric      — correlated Msamples/s (channels x fs x realtime-factor) of
                the batched DLL/PLL tracking scan (the receiver's dominant
                cost, SURVEY.md section 3.3)
  vs_baseline — against the reference CPU figure of ~1 channel tracked in
                real time at 2 Msps per core (BASELINE.md: "a CPU core
                tracks ~1 channel at a few Msps"), i.e. baseline = 2
                Msamples/s.
Extra keys: acquisition grids/s (reference: O(10) 41-bin grids/s/core) and
the realtime factor for the benchmark channel count.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gnss_sim_receiver_tpu.models import tracking as trk
    from gnss_sim_receiver_tpu.ops import pcps, prn_codes

    fs = 2_000_000.0
    n_channels = 12
    n_epochs = 1000          # 1 s of signal per timed call
    conf = trk.TrackingConf(fs=fs)

    prns = [(i % 32) + 1 for i in range(n_channels)]
    codes = jnp.asarray(prn_codes.gps_l1_ca_code_table(prns))
    taps = jnp.asarray(np.array([+0.25, 0.0, -0.25], np.float32))
    state = trk._init_state(n_channels)._replace(
        active=jnp.ones(n_channels, bool),
        carrier_doppler=jnp.linspace(-4000, 4000, n_channels
                                     ).astype(jnp.float32),
    )
    rng = np.random.default_rng(0)
    chunk_len = conf.nominal_epoch_samples * (n_epochs + 2) + conf.block_size
    x = jnp.asarray((rng.standard_normal(chunk_len)
                     + 1j * rng.standard_normal(chunk_len))
                    .astype(np.complex64))

    # warmup/compile
    st, outs = trk.track_chunk(conf, n_epochs, codes, taps, x, state)
    jax.block_until_ready(outs["prompt"])
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        st, outs = trk.track_chunk(conf, n_epochs, codes, taps, x, state)
        jax.block_until_ready(outs["prompt"])
    dt_track = (time.perf_counter() - t0) / reps
    signal_seconds = n_epochs * conf.t_epoch_nominal_s
    realtime_factor = signal_seconds / dt_track
    msamp_s = n_channels * fs * realtime_factor / 1e6

    # acquisition: 12 PRN grids, 41 Doppler bins x 2000 delays, 2 dwells
    fft = conf.nominal_epoch_samples
    sampled = np.stack([prn_codes.sample_code(prn_codes.gps_l1_ca_code(p),
                                              fs, 1.023e6, fft)
                        for p in prns])
    cfc = jnp.asarray(np.conj(np.fft.fft(sampled, axis=-1))
                      .astype(np.complex64))
    dops = jnp.asarray(pcps.doppler_grid(5000.0, 250.0))
    xd = x[: 2 * fft].reshape(2, fft)

    def acq():
        g = pcps.pcps_grid(xd, cfc, dops, fs)
        return pcps.max_to_input_power_stat(g, jnp.float32(2.0))

    jax.block_until_ready(acq())
    t0 = time.perf_counter()
    acq_reps = 20
    for _ in range(acq_reps):
        r = acq()
    jax.block_until_ready(r)
    dt_acq = (time.perf_counter() - t0) / acq_reps
    grids_s = n_channels / dt_acq

    baseline_msamp_s = 2.0   # 1 channel x 2 Msps realtime per CPU core
    print(json.dumps({
        "metric": "tracking correlated Msamples/s (12ch GPS L1 @2Msps)",
        "value": round(msamp_s, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msamp_s / baseline_msamp_s, 2),
        "realtime_factor_12ch": round(realtime_factor, 2),
        "acq_grids_per_s": round(grids_s, 1),
        "acq_grid": "41x2000x2dwell",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
