"""Plane-form rollout pipeline (MoveGenConfig.split_planes).

The split path must be SAMPLING-BIT-IDENTICAL to the merged tiered path:
legal_moves_split's merged valid mask equals legal_moves' bit for bit, the
tier takes inside each plane reproduce the same board content at every
valid slot, and the same PRNG stream therefore samples the same action and
the env adopts the same chosen board. Verified here by rolling full
trajectories with both pipelines and comparing every Transition leaf.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.actor import rollout
from mlp_ppo_2ply_multi_tpu.core.config import Config, ModelConfig, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine.movegen2 import legal_moves, legal_moves_split
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

B = 256


def _cfg(split: bool) -> Config:
    return Config(
        movegen=MoveGenConfig(
            w1=16, w2=32, w3=48, w4=64, a_max=64, nd_dedup_k=48,
            nd_tier=16, nd_wide_div=4, dd_subbatch_div=3,
            split_planes=split,
        ),
        model=ModelConfig(
            fused_actor_kernel=True, actor_tier_width=16, actor_tier_wide_div=4
        ),
    )


def test_split_valid_mask_matches_merged():
    cfg = _cfg(True).movegen
    key = jax.random.PRNGKey(0)
    state = vec_env.reset(key, B)
    ms = legal_moves(state.board, state.player, state.dice, cfg)
    sm = legal_moves_split(state.board, state.player, state.dice, cfg)
    np.testing.assert_array_equal(np.asarray(ms.valid), np.asarray(sm.valid))
    np.testing.assert_array_equal(np.asarray(ms.count), np.asarray(sm.count))
    np.testing.assert_array_equal(
        np.asarray(ms.overflow), np.asarray(sm.overflow)
    )


def test_split_rollout_bitwise_identical():
    key = jax.random.PRNGKey(1)
    params = td.init_train_state(key, _cfg(False)).params
    state0 = vec_env.reset(jax.random.fold_in(key, 1), B)
    temp = jnp.float32(1.0)
    outs = []
    for split in (False, True):
        _, traj = rollout.rollout(
            params, state0, jax.random.PRNGKey(5), temp, _cfg(split),
            num_steps=40, continuous=True,
        )
        outs.append(jax.device_get(traj))
    a, b = outs
    for name in a._fields:
        va, vb = getattr(a, name), getattr(b, name)
        if va is None:
            assert vb is None
            continue
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=name
        )


def test_split_rollout_side0_mode():
    cfg_m = dataclasses.replace(
        _cfg(False),
        train=dataclasses.replace(_cfg(False).train, td_mode="side0"),
    )
    cfg_s = dataclasses.replace(
        _cfg(True),
        train=dataclasses.replace(_cfg(True).train, td_mode="side0"),
    )
    key = jax.random.PRNGKey(2)
    params = td.init_train_state(key, cfg_m).params
    state0 = vec_env.reset(jax.random.fold_in(key, 1), B)
    temp = jnp.float32(0.5)
    _, ta = rollout.rollout(
        params, state0, jax.random.PRNGKey(6), temp, cfg_m, 24, continuous=True
    )
    _, tb = rollout.rollout(
        params, state0, jax.random.PRNGKey(6), temp, cfg_s, 24, continuous=True
    )
    np.testing.assert_array_equal(
        np.asarray(ta.packed_board), np.asarray(tb.packed_board)
    )
    np.testing.assert_array_equal(np.asarray(ta.reward), np.asarray(tb.reward))
    np.testing.assert_array_equal(np.asarray(ta.done), np.asarray(tb.done))
