"""Multi-process (multi-host simulation) tests for parallel/distributed.py.

Spawns two real Python processes, each with 4 virtual CPU devices, bootstraps
them through our initialize() wrapper (gloo collectives), and checks the
per-host input sharding plus a cross-process collective over the global
8-device mesh — the simulation analog of a 2-host TPU slice (SURVEY.md §2.3
communication-backend row).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # app-level integration: run via -m slow

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, sys.argv[2])
pid = int(sys.argv[1])
from speech_cloner_tpu.parallel.distributed import initialize, host_shard, per_host_batch

# must work in a FRESH process: initialize() may not touch the backend before
# jax.distributed.initialize (jax.process_count() would poison it)
ok = initialize(f"localhost:{sys.argv[3]}", 2, pid)
assert ok, "initialize returned False"

import jax
import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2
assert jax.device_count() == 8 and len(jax.local_devices()) == 4
assert per_host_batch(8) == 4

shard = host_shard(np.arange(10))
expected = list(range(pid, 10, 2))
assert shard.tolist() == expected, (shard, expected)

# cross-process collective over the global mesh: psum of per-process values
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
local = np.full((4, 2), float(pid + 1), np.float32)  # this host's batch shard
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), local, (8, 2))

@jax.jit
def global_sum(x):
    return jnp.sum(x)

total = float(global_sum(garr))
assert total == (1.0 + 2.0) * 4 * 2, total
print(f"proc{pid} OK", flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="gloo transport")
def test_two_process_bootstrap_and_collective(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    port = "12931"
    procs = [subprocess.Popen([sys.executable, str(worker), str(pid), repo, port],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for pid in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK" in out
