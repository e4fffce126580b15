"""Real 2-process multi-host initialization: two CPU processes join one
jax.distributed cluster through initialize_multihost and run a psum over
the global mesh — the actual multi-host entry path, not a simulation."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from pdm_tpu.parallel.distributed import initialize_multihost

initialize_multihost(
    coordinator_address={coord!r},
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2, jax.process_count()
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

n = jax.device_count()
mesh = Mesh(np.array(jax.devices()), ("data",))
def body(x):
    return jax.lax.psum(x, "data")
out = jax.jit(
    jax.shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P()),
)(jnp.arange(n, dtype=jnp.float32))
assert float(np.asarray(out)[0]) == n * (n - 1) / 2, np.asarray(out)
print("proc", jax.process_index(), "OK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster():
    coord = f"127.0.0.1:{_free_port()}"
    code = WORKER.format(repo=REPO, coord=coord)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        assert "OK" in out
