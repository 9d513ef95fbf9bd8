"""Exactness of the fused non-doubles tail kernel (experimental/nd_tail.py,
interpret mode on CPU) against the XLA path (movegen2._nd_tail): identical
keep masks, counts and overflow, and identical afterstates at every kept
slot, over positions drawn from real play."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.engine import movegen2
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.actor.rollout import rollout_step
from mlp_ppo_2ply_multi_tpu.experimental.nd_tail import nd_tail_fused
import pytest

# rejected nd-tail Pallas kernel exactness (default-off; PERF.md round 4)
pytestmark = pytest.mark.slow

B = 32


def _positions():
    cfg = Config()
    key = jax.random.PRNGKey(3)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), B)
    for i in range(8):
        state, _ = rollout_step(
            params, state, jax.random.fold_in(key, 50 + i), jnp.float32(1.0),
            cfg, True,
        )
    return state


def test_kernel_matches_xla_tail():
    state = _positions()
    cfg = Config().movegen
    # force non-doubles dice per row
    dice = jnp.stack(
        [jnp.full((B,), 5, jnp.int32), jnp.full((B,), 2, jnp.int32)], axis=-1
    )
    board, player = state.board, state.player
    pa, pb, valid, d_hi, d_lo = movegen2._nd_candidates(board, player, dice)
    K, a_max = 96, 96

    after_x, keep_x, pct_x = movegen2._nd_tail(
        board, pa.b1, pb.b1, valid, player, d_hi, d_lo, K, a_max, True
    )
    after_k, keep_k, n_pre_k, pct_k, _ = nd_tail_fused(
        valid, pa.b1.data, pb.b1.data, board.data,
        jnp.broadcast_to(player, (B,)),
        jnp.broadcast_to(d_hi, (B,)),
        jnp.broadcast_to(d_lo, (B,)),
        K, a_max, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(keep_x), np.asarray(keep_k))
    np.testing.assert_array_equal(np.asarray(pct_x), np.asarray(pct_k))
    np.testing.assert_array_equal(
        np.asarray(movegen2._popcount(valid)), np.asarray(n_pre_k)
    )
    ax, ak = np.asarray(after_x.data), np.asarray(after_k)
    m = np.asarray(keep_k)[..., None]
    np.testing.assert_array_equal(np.where(m, ax, 0), np.where(m, ak, 0))


def test_enumerate_nondoubles_kernel_path():
    """End-to-end MoveSet equality (kept slots) between kernel-path and XLA
    enumerate_nondoubles across several dice."""
    state = _positions()
    base = Config().movegen
    base = dataclasses.replace(base, nd_dedup_k=96, a_max=96)
    kcfg = dataclasses.replace(base, nd_tail_kernel=True)
    for d0, d1 in ((5, 2), (6, 1), (3, 4)):
        dice = jnp.stack(
            [jnp.full((B,), d0, jnp.int32), jnp.full((B,), d1, jnp.int32)],
            axis=-1,
        )
        ms_x = movegen2.enumerate_nondoubles(state.board, state.player, dice, base)
        ms_k = movegen2.enumerate_nondoubles(state.board, state.player, dice, kcfg)
        np.testing.assert_array_equal(np.asarray(ms_x.valid), np.asarray(ms_k.valid))
        np.testing.assert_array_equal(np.asarray(ms_x.count), np.asarray(ms_k.count))
        np.testing.assert_array_equal(
            np.asarray(ms_x.overflow), np.asarray(ms_k.overflow)
        )
        m = np.asarray(ms_k.valid)[..., None]
        np.testing.assert_array_equal(
            np.where(m, np.asarray(ms_x.boards.data), 0),
            np.where(m, np.asarray(ms_k.boards.data), 0),
        )
