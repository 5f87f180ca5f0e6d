"""Multi-host bring-up: two real OS processes over jax.distributed.

Validates parallel/mesh.initialize_multihost + a global-mesh sharded rollout
across processes — the DCN-bring-up / ICI-steady-state story of SURVEY.md
§2.5 — without TPU hardware (CPU backend, localhost coordinator).
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from or_gym_inventory_tpu.parallel import mesh as pmesh

pmesh.initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                          num_processes=nprocs, process_id=proc_id)
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 2 * nprocs   # global devices
assert jax.local_device_count() == 2

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.parallel.mesh import make_mesh
from or_gym_inventory_tpu.vector import vecenv

mesh = make_mesh()  # all global devices
params = nv.default_params(step_limit=4)
space = nv.ENV.action_space(params)
policy = lambda _s, obs, key, t: space.sample(key, (obs.shape[0],))

def per_device(key):
    # key is replicated; fold in the global shard index for independence
    key = jax.random.fold_in(key, jax.lax.axis_index("env"))
    _, traj = vecenv.rollout(nv.ENV, params, policy, None, key, 2, 4)
    return jax.lax.psum(jnp.sum(traj.reward), "env")

fn = jax.shard_map(per_device, mesh=mesh, in_specs=P(), out_specs=P(),
                   check_vma=False)
total = jax.jit(fn)(jax.random.PRNGKey(0))
print(f"PROC{proc_id} TOTAL {float(total):.4f}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("OGT_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_distributed_rollout(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = "12355"
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    # both processes computed the same psum-reduced global total
    totals = [line.split("TOTAL")[1].strip()
              for out in outs for line in out.splitlines() if "TOTAL" in line]
    assert len(totals) == 2 and totals[0] == totals[1], totals
