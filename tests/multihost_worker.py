"""Worker process for the 2-process CPU multi-host test (run via subprocess).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <outdir>

Each process gets 4 virtual CPU devices; with num_processes=2 the global
runtime has 8 devices across 2 "hosts". The worker trains a sharded SGLD
fleet on the host-aware (chain, data) mesh (data groups within a process,
chains across processes — the DCN layout) and writes its view of the
collected posterior draws to <outdir>/collected_<pid>.npy.

With num_processes=1 it runs the identical training single-process (the
reference result the multi-process run must reproduce).
"""
import os
import sys

pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gpt_tpu.parallel.distributed import (  # noqa: E402
    initialize_distributed,
    make_host_mesh,
)

if nproc > 1:
    assert initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nproc

import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _flagship  # noqa: E402
from gpt_tpu.inference.sgld import SGLDConfig  # noqa: E402
from gpt_tpu.models.tensor_gp import TensorGPParams  # noqa: E402
from gpt_tpu.parallel import run_sharded_chains  # noqa: E402

mesh = make_host_mesh(data=2)
# host-awareness: every data row must live inside ONE process
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, "data group crosses hosts"
assert mesh.devices.shape == (2 * nproc, 2)

model, _, phi, y = _flagship(N=16)
config = SGLDConfig(eps=TensorGPParams(w=1e-4, U=1e-6), transport="cayley")
states, collected = run_sharded_chains(
    model, mesh, jax.random.PRNGKey(1), phi, y,
    num_chains=8, m=8, config=config, burnin=1, maxepoch=3,
)

if nproc > 1:
    from jax.experimental import multihost_utils

    w = multihost_utils.process_allgather(collected.w, tiled=True)
else:
    w = np.asarray(collected.w)
assert np.all(np.isfinite(w)), "non-finite draws"
np.save(os.path.join(outdir, f"collected_{pid}.npy"), np.asarray(w))
print(f"worker {pid}/{nproc}: OK devices={jax.device_count()} w={w.shape}", flush=True)
