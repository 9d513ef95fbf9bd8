"""Device-side transition ring buffer.

The reference's RingReplayBuffer (/root/reference/src/utils/
ring_replay_buffer.py) is a deque of episodes whose sample_episodes method is
an unimplemented stub and whose capacity is never exercised (main.py drains
everything at 200 episodes — SURVEY.md §2.1). This is the working TPU-native
equivalent: a fixed-capacity ring of transition slices living on device,
written by rollout windows and uniformly sampled for off-policy-style
updates. On-policy TD(0) training does not need it (the trajectory window is
consumed whole); it exists for capability parity and experimentation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RingState(NamedTuple):
    store: dict  # pytree of [CAP, ...] arrays
    cursor: jax.Array  # int32 next write slot
    filled: jax.Array  # int32 number of valid slots


def init(example_slice, capacity: int) -> RingState:
    """``example_slice``: a pytree with leading axis = slice height (e.g. one
    [B, ...] transition batch); the ring stores ``capacity`` such slices."""
    store = jax.tree.map(
        lambda a: jnp.zeros((capacity, *a.shape), a.dtype), example_slice
    )
    return RingState(
        store=store, cursor=jnp.int32(0), filled=jnp.int32(0)
    )


def push(state: RingState, slice_) -> RingState:
    cap = jax.tree.leaves(state.store)[0].shape[0]
    store = jax.tree.map(
        lambda buf, x: jax.lax.dynamic_update_index_in_dim(
            buf, x.astype(buf.dtype), state.cursor, 0
        ),
        state.store,
        slice_,
    )
    return RingState(
        store=store,
        cursor=(state.cursor + 1) % cap,
        filled=jnp.minimum(state.filled + 1, cap),
    )


def sample(state: RingState, key: jax.Array, n: int):
    """Uniformly sample ``n`` stored slices (with replacement); implements
    what the reference left as a stub (ring_replay_buffer.py:11-13)."""
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(state.filled, 1))
    return jax.tree.map(lambda buf: jnp.take(buf, idx, axis=0), state.store)
