"""Head-to-head evaluation arena: batched policy-vs-policy matches.

The reference has no evaluation capability at all (SURVEY.md §6) — its only
quality signal is TensorBoard win-type curves from self-play. The baseline's
north star requires win rate vs. random and vs. 1-ply greedy at fixed step
budgets (BASELINE.md), so the arena is a first-class component here: both
policies run inside one jitted lockstep loop, selected per game by side.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.engine.movegen import MoveSet, legal_moves
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.model import value_net

_NEG = -1e9

# A policy maps (params, state, moves, key) -> action int32[B].
Policy = Callable[[dict, vec_env.EnvState, MoveSet, jax.Array], jax.Array]


def _candidate_values(params, state, moves, cfg: Config) -> jax.Array:
    """Afterstate values oriented so HIGHER is better for the mover, under
    the configured td_mode (side0: truthful opponent-on-roll flag, side 1
    minimizes the side-0 value)."""
    from mlp_ppo_2ply_multi_tpu.twoply.expectimax import oriented_values

    return oriented_values(params, moves.boards, state.player[..., None], cfg)


def greedy_policy(cfg: Config) -> Policy:
    """argmax over afterstate values — the reference play CLI's agent
    (play_versus_ai.py:165-195)."""

    def act(params, state, moves, key):
        v = _candidate_values(params, state, moves, cfg)
        return jnp.argmax(jnp.where(moves.valid, v, _NEG), axis=-1)

    return act


def softmax_policy(cfg: Config, temperature: float) -> Policy:
    def act(params, state, moves, key):
        v = _candidate_values(params, state, moves, cfg)
        logits = jnp.where(moves.valid, v / temperature, _NEG)
        return jax.random.categorical(key, logits, axis=-1)

    return act


def twoply_greedy_policy(cfg: Config) -> Policy:
    """argmax over 2-ply expectimax scores of the top-k 1-ply candidates
    (two_ply.py:44-90 semantics; greedy rather than sampled)."""
    from mlp_ppo_2ply_multi_tpu.twoply import expectimax
    from mlp_ppo_2ply_multi_tpu.engine.movegen import board_take

    k = cfg.twoply.top_k_candidates

    def act(params, state, moves, key):
        v = _candidate_values(params, state, moves, cfg)
        v_masked = jnp.where(moves.valid, v, _NEG)
        topv, topi = expectimax.topk_small(v_masked, k)
        top_valid = jnp.take_along_axis(moves.valid, topi, axis=-1)
        w_o = expectimax.weighted_opponent_response(
            params, board_take(moves.boards, topi), 1 - state.player, cfg
        )
        scores = jnp.where(
            top_valid, cfg.twoply.alpha * topv - cfg.twoply.beta * w_o, _NEG
        )
        best = jnp.argmax(scores, axis=-1)
        act2 = jnp.take_along_axis(topi, best[..., None], axis=-1)[..., 0]
        act1 = jnp.argmax(v_masked, axis=-1)
        return jnp.where(moves.count >= k, act2, act1)

    return act


def random_policy(cfg: Config) -> Policy:
    def act(params, state, moves, key):
        logits = jnp.where(moves.valid, 0.0, _NEG)
        return jax.random.categorical(key, logits, axis=-1)

    return act


class MatchResult(NamedTuple):
    winner: jax.Array  # int32[B]: 0 side A, 1 side B, -1 unfinished
    win_type: jax.Array  # int8[B]
    steps: jax.Array  # int32[B]


@functools.partial(
    jax.jit, static_argnames=("policy_a", "policy_b", "cfg", "batch", "max_steps")
)
def play_match(
    params_a,
    params_b,
    policy_a: Policy,
    policy_b: Policy,
    key: jax.Array,
    cfg: Config,
    batch: int,
    max_steps: int,
) -> MatchResult:
    """Play ``batch`` games with side A as player 0 and side B as player 1."""
    k_reset, k_loop = jax.random.split(key)
    state = vec_env.reset(k_reset, batch)
    winner0 = jnp.full((batch,), -1, jnp.int32)

    def body(carry, _):
        st, win, k = carry
        k, k_a, k_b, k_roll = jax.random.split(k, 4)
        moves = legal_moves(st.board, st.player, st.dice, cfg.movegen)
        a_act = policy_a(params_a, st, moves, k_a)
        b_act = policy_b(params_b, st, moves, k_b)
        action = jnp.where(st.player == 0, a_act, b_act)
        next_dice = vec_env.roll_dice(k_roll, st.player.shape)
        res = vec_env.step(st, moves, action, next_dice, cfg.env)
        win = jnp.where(res.done & (win < 0), st.player, win)
        return (res.state, win, k), None

    (state, winner, _), _ = jax.lax.scan(
        body, (state, winner0, k_loop), None, length=max_steps
    )
    return MatchResult(winner=winner, win_type=state.win_type, steps=state.step_count)


def summarize(result: MatchResult) -> Dict[str, float]:
    import numpy as np

    w = np.asarray(result.winner)
    n = len(w)
    finished = (w >= 0).sum()
    return {
        "games": n,
        "finished": int(finished),
        "win_rate_a": float((w == 0).sum() / max(finished, 1)),
        "win_rate_b": float((w == 1).sum() / max(finished, 1)),
        "unfinished": int((w < 0).sum()),
        "gammons": int((np.asarray(result.win_type) == 2).sum()),
        "backgammons": int((np.asarray(result.win_type) == 3).sum()),
    }
