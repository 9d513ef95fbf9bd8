"""The unrolled-roll 2-ply scorer (TwoPlyConfig.unroll_rolls) must be
bit-identical to the scan path at equal widths: same per-roll math, same
accumulation order. Also checks that per-die doubles widths surface their
truncation through the inexact flag rather than silently changing scores."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves, board_take
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.twoply import expectimax as tp
import pytest

B = 16


def _setup(twoply):
    cfg = Config().replace(twoply=twoply)
    key = jax.random.PRNGKey(7)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), B)
    # advance a few plies so positions are nontrivial
    for i in range(6):
        k = jax.random.fold_in(key, 100 + i)
        state, _ = __import__(
            "mlp_ppo_2ply_multi_tpu.actor.rollout", fromlist=["rollout_step"]
        ).rollout_step(params, state, k, jnp.float32(1.0), cfg, True)
    moves = legal_moves(state.board, state.player, state.dice, cfg.movegen)
    v = tp.oriented_values(params, moves.boards, state.player[..., None], cfg)
    _, topi = tp.topk_small(jnp.where(moves.valid, v, -1e9), 4)
    cand = board_take(moves.boards, topi)
    return cfg, params, state, cand


@pytest.mark.slow
def test_unrolled_matches_scan():
    cfg, params, state, cand = _setup(TwoPlyConfig(enabled=True))
    opp = 1 - state.player
    scan_cfg = cfg.replace(twoply=dataclasses.replace(cfg.twoply, unroll_rolls=False))
    w_scan = tp.weighted_opponent_response(params, cand, opp, scan_cfg)
    w_unroll = tp.weighted_opponent_response(params, cand, opp, cfg)
    np.testing.assert_array_equal(np.asarray(w_scan), np.asarray(w_unroll))


@pytest.mark.slow
def test_per_die_widths_flagged_and_close():
    """With generous per-die widths the scores match the uniform config
    wherever the flag is clear."""
    tw = TwoPlyConfig(
        enabled=True,
        dd_reply_widths=((64, 96, 64, 64),) * 3 + ((64, 128, 128, 128),) * 3,
    )
    cfg, params, state, cand = _setup(tw)
    opp = 1 - state.player
    base = cfg.replace(twoply=dataclasses.replace(tw, dd_reply_widths=()))
    w_base = np.asarray(tp.weighted_opponent_response(params, cand, opp, base))
    w_pd, flags = tp.weighted_opponent_response(
        params, cand, opp, cfg, return_flags=True
    )
    w_pd, flags = np.asarray(w_pd), np.asarray(flags)
    np.testing.assert_array_equal(w_base[~flags], w_pd[~flags])
