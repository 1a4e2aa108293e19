"""Multi-host (multi-process) execution: jax.distributed wiring + host-aware
meshes (L4).

The reference's only distribution story is single-host Julia shared memory
(``GPT_SGLD_p.jl:8-143``); cross-host runs were separate cluster jobs logging
to a shared text file (``DataRecords.txt:55-104``). The TPU-native framework
replaces that with a real multi-controller runtime:

- :func:`initialize_distributed` wires ``jax.distributed.initialize`` behind
  an explicit call / environment flags, turning N separate processes (one per
  TPU host) into one global JAX runtime with a global device set;
- :func:`make_host_mesh` builds the ``(chain, data)`` mesh with HOST-AWARE
  device ordering: every data-axis group lies within a single process (so the
  per-step minibatch-gradient ``psum`` rides ICI), while the chain axis spans
  processes (chains are embarrassingly parallel — the only cross-chain
  traffic is occasional ``pmean`` posterior moments/adaptation, which can
  afford DCN).

Multi-host validation without multi-host hardware: the 2-process CPU harness
(``run_multiprocess_selftest`` / ``tests/test_multihost.py``) starts two
controller processes with 4 virtual CPU devices each, trains a sharded SGLD
fleet over the global 8-device (2-host) mesh, and asserts agreement with the
single-process run — exercising the coordinator handshake, the cross-process
mesh, global array dispatch, and DCN-analog collectives end to end.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from gpt_tpu.parallel.mesh import CHAIN_AXIS, DATA_AXIS

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialise the multi-controller runtime if a multi-process topology is
    configured; no-op (returns False) for single-process runs.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``), so
    a launcher can simply export those and call ``initialize_distributed()``
    unconditionally. On real TPU pods ``jax.distributed.initialize()`` with no
    arguments auto-discovers the topology from the TPU metadata service; pass
    explicit values for CPU/GPU clusters or simulation.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def make_host_mesh(data: int = 1, devices=None) -> Mesh:
    """``(chain, data)`` mesh with data groups contained in one process each.

    Device grid construction: group the global device list by
    ``process_index``, split each process's devices into rows of ``data``
    consecutive devices (ICI-adjacent on real TPU hosts), and stack rows
    across processes. Row = a data-parallel gradient-psum group (ICI);
    column/chain axis spans hosts (DCN) — the layout SURVEY §2.9 prescribes.
    """
    devices = list(devices if devices is not None else jax.devices())
    procs = sorted({d.process_index for d in devices})
    by_proc = {p: [d for d in devices if d.process_index == p] for p in procs}
    sizes = {len(v) for v in by_proc.values()}
    if len(sizes) != 1:
        raise ValueError(f"uneven devices per process: { {p: len(v) for p, v in by_proc.items()} }")
    local = sizes.pop()
    if local % data != 0:
        raise ValueError(
            f"data={data} must divide the {local} per-process devices so a "
            "gradient-psum group never crosses a host boundary"
        )
    rows = []
    for p in procs:
        grid = np.empty((local // data, data), dtype=object)
        for i, d in enumerate(by_proc[p]):
            grid[i // data, i % data] = d
        rows.append(grid)
    return Mesh(np.concatenate(rows, axis=0), (CHAIN_AXIS, DATA_AXIS))


def process_local_chains(num_chains: int) -> int:
    """Chains this process owns under an even chain-axis split."""
    n = jax.process_count()
    if num_chains % n:
        raise ValueError(f"{num_chains} chains do not split over {n} processes")
    return num_chains // n
