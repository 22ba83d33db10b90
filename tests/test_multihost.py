"""Multi-host smoke test: 2 CPU processes under jax.distributed run the
channel-sharded tracking step through `make_multihost_mesh` and agree
with the single-process result (VERDICT r3 weak #8 — the multi-host path
had never been executed).

Each subprocess initializes jax.distributed against a local coordinator,
builds the all-process mesh (4 virtual CPU devices per process -> 8
global), runs `tracking_step_sharded` on a deterministic scenario and
prints a digest of the gathered outputs; the test asserts both ranks
produce the identical digest and that it matches a single-process run of
the same scenario.

Also serves as the launch recipe: `scripts/run_multihost.sh` wraps the
same invocation for N real hosts.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
sys.path.insert(0, "@REPO@")
from gnss_sim_receiver_tpu.models import tracking as trk
from gnss_sim_receiver_tpu.ops import prn_codes
from gnss_sim_receiver_tpu.parallel.shard_steps import (
    make_multihost_mesh, tracking_step_sharded)

assert jax.process_count() == 2
assert len(jax.devices()) == 8

conf = trk.TrackingConf(fs=2e6, enable_fll_pullin=False)
n_channels = 8
prns = list(range(1, n_channels + 1))
codes = prn_codes.gps_l1_ca_code_table(prns)
taps = np.array([0.25, 0.0, -0.25], np.float32)
rng = np.random.default_rng(0)
n_epochs = 4
x = (rng.standard_normal(16384) + 1j * rng.standard_normal(16384)
     ).astype(np.complex64)
state = jax.tree.map(np.asarray, trk._init_state(n_channels))._replace(
    active=np.ones(n_channels, bool),
    carrier_doppler=np.linspace(-4000, 4000, n_channels).astype(np.float32))

mesh = make_multihost_mesh()
# globally-sharded inputs: every process materializes the full arrays
# (tiny) and shard_map splits them over the global mesh
from jax.sharding import NamedSharding, PartitionSpec as P
def gput(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        np.asarray(arr).shape, sh,
        lambda idx: np.asarray(arr)[idx])
codes_g = gput(codes, P("ch"))
x_g = gput(x, P())
taps_g = gput(taps, P())
state_g = jax.tree.map(lambda a: gput(a, P("ch")), state)
new_state, outs = tracking_step_sharded(mesh, conf, n_epochs, codes_g,
                                        taps_g, x_g, state_g)
# out_specs=P() -> replicated: every process holds full copies in its
# addressable shards
prompt = np.asarray(outs["prompt"].addressable_shards[0].data)
digest = {
    "prompt_sum": float(np.abs(prompt).sum()),
    "shape": list(prompt.shape[-2:]),
}
print("DIGEST" + json.dumps(digest), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_tracking(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@REPO@", repo))
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(rank)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    digests = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("DIGEST")]
        assert lines, out[-2000:]
        digests.append(json.loads(lines[-1][len("DIGEST"):]))
    assert digests[0] == digests[1]
    assert digests[0]["shape"] == [4, 8]

    # single-process reference on the same scenario
    import jax

    from gnss_sim_receiver_tpu.models import tracking as trk
    from gnss_sim_receiver_tpu.ops import prn_codes
    conf = trk.TrackingConf(fs=2e6, enable_fll_pullin=False)
    prns = list(range(1, 9))
    codes = prn_codes.gps_l1_ca_code_table(prns)
    taps = np.array([0.25, 0.0, -0.25], np.float32)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16384) + 1j * rng.standard_normal(16384)
         ).astype(np.complex64)
    import jax.numpy as jnp
    state = trk._init_state(8)._replace(
        active=jnp.ones(8, bool),
        carrier_doppler=jnp.linspace(-4000, 4000, 8).astype(jnp.float32))
    _, outs_ref = trk.track_chunk(conf, 4, jnp.asarray(codes),
                                  jnp.asarray(taps), jnp.asarray(x), state)
    ref_sum = float(np.abs(np.asarray(outs_ref["prompt"])).sum())
    assert abs(ref_sum - digests[0]["prompt_sum"]) / ref_sum < 1e-5
