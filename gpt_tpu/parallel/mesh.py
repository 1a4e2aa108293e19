"""Device-mesh construction (L4).

The TPU-native replacement for the reference's distributed backend — Julia
single-host shared memory with ``@everywhere``/``SharedArray``/``@sync
@parallel`` fork-join loops (``GPT_SGLD_p.jl``, SURVEY.md §2.2). Here the unit
of parallelism is the posterior *chain* (the reference's ``@parallel`` seed
sweeps), with an optional *data* axis for sharding minibatch gradients inside
each chain; collectives ride ICI within a slice and DCN across hosts, inserted
explicitly via ``shard_map`` + ``psum``/``pmean``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chain"
DATA_AXIS = "data"
FEATURE_AXIS = "feature"


def make_feature_mesh(num_shards: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the RFF feature axis (TP for full-theta n=8k–16k).

    The reference's largest no-tensor configs push the feature dimension to
    n = 8000–16000 (``kin40kNoTensorExperiment.jl:34-46``); θ and the columns
    of φ shard naturally over devices at that size (see
    :mod:`gpt_tpu.parallel.tp`). ``num_shards`` is the number of DEVICES the
    feature axis is split over (not the feature dimension itself); it must not
    exceed the number of available devices.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_shards is not None:
        if num_shards > devices.size:
            raise ValueError(
                f"num_shards={num_shards} exceeds {devices.size} available devices"
            )
        devices = devices[:num_shards]
    return Mesh(devices.reshape(-1), (FEATURE_AXIS,))


def make_chain_feature_mesh(chain: int, feature: int, devices=None) -> Mesh:
    """``(chain, feature)`` mesh: independent chains x feature-sharded θ
    within each chain (for :func:`gpt_tpu.parallel.run_sgld_tp_chains`)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if chain * feature > devices.size:
        raise ValueError(f"mesh {chain}x{feature} needs more than {devices.size} devices")
    return Mesh(
        devices[: chain * feature].reshape(chain, feature),
        (CHAIN_AXIS, FEATURE_AXIS),
    )


def make_mesh(
    chain: int | None = None,
    data: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(chain, data)`` mesh over the available devices.

    By default all devices go to the chain axis — the dominant scaling axis of
    this workload family (SURVEY.md §2.9). For multi-host topologies, callers
    should order devices so that the data axis (which carries per-step psums)
    stays within a host/ICI domain while chains span DCN.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if chain is None:
        chain = n // data
    if chain * data != n:
        raise ValueError(f"mesh {chain}x{data} != {n} devices")
    return Mesh(devices.reshape(chain, data), (CHAIN_AXIS, DATA_AXIS))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for chain-stacked pytrees: leading axis over the chain axis."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
