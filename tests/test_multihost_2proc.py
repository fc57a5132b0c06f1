"""Real 2-process SPMD check of gather_global (VERDICT r1 #9, beyond the
unit-level monkeypatch test).

Spawns two fresh interpreters that form a jax.distributed cluster over
localhost, each with 2 fake CPU devices; each process contributes its local
half of a ('data',)-sharded global array, and gather_global must reassemble
the FULL array on BOTH processes. This is the exact topology where a bare
device_get would fail (non-addressable remote shards).
"""

import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid,
    local_device_ids=[0, 1],
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

sys.path.insert(0, os.environ["OUTFITX_REPO"])
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from outfitx_tpu.parallel import gather_global

mesh = jax.make_mesh((4,), ("data",), devices=jax.devices())
# global (8, 2) array, row i == i; each process owns rows [4*pid, 4*pid+4)
local = np.arange(8, dtype=np.float32).repeat(2).reshape(8, 2)[
    4 * pid : 4 * pid + 4
]
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("data", None)
)
assert not garr.is_fully_addressable  # the case device_get cannot handle
out = np.asarray(gather_global(garr))
expect = np.arange(8, dtype=np.float32).repeat(2).reshape(8, 2)
np.testing.assert_array_equal(out, expect)
print(f"proc{pid} OK", flush=True)
"""


def test_gather_global_across_two_processes():
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    import os

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    env["OUTFITX_REPO"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK" in out
