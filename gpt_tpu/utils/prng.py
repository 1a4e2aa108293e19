"""PRNG helpers.

The reference mixes global ``srand(seed)`` calls with four incompatible
historical feature signatures (see SURVEY.md §2.1). Here every source of
randomness is an explicit ``jax.random`` key; chains get independent streams
by folding the chain index into a base key.
"""
from __future__ import annotations

import jax


def chain_keys(key: jax.Array, num_chains: int) -> jax.Array:
    """Independent per-chain keys: ``split`` of the base key."""
    return jax.random.split(key, num_chains)


def fold(key: jax.Array, *data: int) -> jax.Array:
    """Fold one or more integers into a key (deterministic substream)."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key
