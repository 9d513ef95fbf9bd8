"""Transcript parity: the batched jittable env vs the pure-python oracle env
under one injected dice stream and a shared deterministic policy.

Verifies, per step and game: side to move, legal-move count, reward, done —
and at the end: boards, win types, step counts. This is the fixed-seed
trajectory-parity requirement of BASELINE.md (config 2) at test scale.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv
from tests.helpers import jax_board_to_tuple

import dataclasses
from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig

# exact index-level transcript parity requires reference enumeration order;
# the canonical engine's env behavior is covered by
# test_movegen2.test_canonical_env_rollout_membership
CFG = Config(movegen=MoveGenConfig(algo="sorted"))
B_GAMES = 8
T_STEPS = 60


def _policy_action(t: int, g: int, count: int) -> int:
    return (t * 13 + 7 * g) % count if count else 0


def test_env_transcript_parity():
    rng = np.random.default_rng(99)
    nd = vec_env._ND_PAIRS
    opener = nd[rng.integers(0, 30, size=B_GAMES)]
    first = nd[rng.integers(0, 30, size=B_GAMES)]
    dice = rng.integers(1, 7, size=(T_STEPS, B_GAMES, 2)).astype(np.int32)

    @jax.jit
    def jit_step(state, action, next_dice):
        moves = legal_moves(state.board, state.player, state.dice, CFG.movegen)
        return moves.count, vec_env.step(state, moves, action, next_dice, CFG.env)

    state = vec_env.reset_from_rolls(jnp.asarray(opener), jnp.asarray(first))

    envs = [
        OracleEnv(iter([tuple(opener[g])] + [tuple(first[g])] + [tuple(d) for d in dice[:, g]]))
        for g in range(B_GAMES)
    ]
    for e in envs:
        e.reset()

    o_done = [False] * B_GAMES
    o_rewards = np.zeros((T_STEPS, B_GAMES), np.float32)

    for t in range(T_STEPS):
        # oracle side: compute counts and actions first
        counts = [0 if o_done[g] else envs[g].num_moves for g in range(B_GAMES)]
        actions = [_policy_action(t, g, counts[g]) for g in range(B_GAMES)]

        j_counts, res = jit_step(state, jnp.asarray(actions, dtype=jnp.int32), jnp.asarray(dice[t]))
        j_counts = np.asarray(j_counts)
        j_reward = np.asarray(res.reward)
        j_done = np.asarray(res.done)

        for g in range(B_GAMES):
            if o_done[g]:
                assert j_reward[g] == 0.0
                continue
            assert j_counts[g] == counts[g], (t, g)
            _, r, d, _ = envs[g].step(None if counts[g] == 0 else actions[g])
            o_rewards[t, g] = r
            assert np.isclose(j_reward[g], r), (t, g, j_reward[g], r)
            assert j_done[g] == d, (t, g)
            if d:
                o_done[g] = True
        state = res.state

    # final boards and win types agree
    wt_map = {None: 0, "regular": 1, "gammon": 2, "backgammon": 3}
    j_wt = np.asarray(state.win_type)
    for g in range(B_GAMES):
        assert jax_board_to_tuple(state.board, g) == envs[g].board, g
        assert j_wt[g] == wt_map[envs[g].win_type], g
        # player parity for games still running
        if not o_done[g]:
            assert int(np.asarray(state.player)[g]) == envs[g].player


def test_reset_distribution():
    """Starter is fair and the first roll is never doubles (Q5)."""
    st = vec_env.reset(jax.random.key(7), 4096)
    p = np.asarray(st.player)
    d = np.asarray(st.dice)
    assert (d[:, 0] != d[:, 1]).all()
    assert 0.45 < p.mean() < 0.55
    assert int(np.asarray(st.step_count).max()) == 0
