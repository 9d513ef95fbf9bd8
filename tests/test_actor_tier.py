"""Two-tier actor candidate evaluation (ModelConfig.actor_tier_width).

At near-zero temperature softmax sampling degenerates to argmax, so the
tiered path must pick the SAME action as the direct full-width path (both
evaluate candidates with the same fused kernel; tier-1 compaction is
order-preserving and complete for games with count <= tier, wide games go
through the full-width sub-batch)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config, ModelConfig
from mlp_ppo_2ply_multi_tpu.actor import rollout
from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.engine.movegen import MoveSet
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.model import value_net

B_GAMES, A = 16, 32
TIER = 8


def _setup(seed, n_wide):
    rng = np.random.default_rng(seed)
    boards = rng.integers(0, 6, size=(B_GAMES, A, 52), dtype=np.int8)
    counts = np.where(
        np.arange(B_GAMES) < n_wide,
        rng.integers(TIER + 2, A, size=B_GAMES),
        rng.integers(1, TIER, size=B_GAMES),
    )
    rng.shuffle(counts)
    # non-contiguous valid masks with the prescribed counts
    valid = np.zeros((B_GAMES, A), bool)
    for g in range(B_GAMES):
        valid[g, rng.choice(A, size=counts[g], replace=False)] = True
    moves = MoveSet(
        boards=Board(data=jnp.asarray(boards)),
        valid=jnp.asarray(valid),
        count=jnp.asarray(counts, jnp.int32),
    )
    state = vec_env.reset(jax.random.PRNGKey(seed), B_GAMES)
    params = value_net.init_params(jax.random.PRNGKey(7), ModelConfig())
    return params, state, moves


def _run(params, state, moves, tier, wide_div=2, td_mode="reference"):
    cfg = Config(
        model=ModelConfig(
            fused_actor_kernel=True,
            actor_tier_width=tier,
            actor_tier_wide_div=wide_div,
        ),
    )
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, td_mode=td_mode)
    )
    temp = jnp.float32(1e-3)  # argmax regime
    return rollout.select_action(
        params, state, moves, jax.random.PRNGKey(11), temp, cfg
    )


def test_tiered_matches_direct_argmax():
    params, state, moves = _setup(seed=0, n_wide=5)
    a_tier, v_tier, ov = _run(params, state, moves, TIER)
    a_full, v_full, _ = _run(params, state, moves, 0)
    np.testing.assert_array_equal(np.asarray(a_tier), np.asarray(a_full))
    np.testing.assert_allclose(np.asarray(v_tier), np.asarray(v_full))
    assert not np.asarray(ov).any()
    # every action is a presented slot
    assert np.asarray(moves.valid)[np.arange(B_GAMES), np.asarray(a_tier)].all()


def test_tiered_matches_direct_argmax_side0():
    params, state, moves = _setup(seed=3, n_wide=4)
    a_tier, _, _ = _run(params, state, moves, TIER, td_mode="side0")
    a_full, _, _ = _run(params, state, moves, 0, td_mode="side0")
    np.testing.assert_array_equal(np.asarray(a_tier), np.asarray(a_full))


def test_wide_subbatch_overflow_flagged_and_safe():
    """More wide games than sub-batch slots: overflowing games fall back to
    the truncated tier (still a valid presented slot) and raise the flag."""
    params, state, moves = _setup(seed=1, n_wide=12)  # wn = max(8, 16//16) = 8
    a_tier, _, ov = _run(params, state, moves, TIER, wide_div=16)
    ov = np.asarray(ov)
    wide = np.asarray(moves.count) > TIER
    assert ov.sum() == max(0, wide.sum() - 8)
    assert not ov[~wide].any()
    assert np.asarray(moves.valid)[np.arange(B_GAMES), np.asarray(a_tier)].all()
