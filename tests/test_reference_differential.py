"""Differential validation against the EXECUTABLE reference (VERDICT.md #2).

Round 1 verified everything against oracle/rules.py — the builder's own
clean-room oracle. These tests close the loop by importing the reference's
actual code from /root/reference (via tests/refbridge.py) and comparing:

  * full-move enumeration: move sets AND order AND afterstates
    (reference generate_all_moves.py:7-66, handle_move_types.py:84-193)
  * 198-feature encoding (immutable_board.py:86-128)
  * stepwise env rewards/transitions/transcripts (backgammon_env.py:92-221)

against the oracle AND the canonical JAX engine.

Scale knob: REF_DIFF_N (default 1200 movegen cases) so the in-CI run stays
fast; scripts/run_reference_differential.py runs the >=10k-case version and
records the result in PARITY.md.
"""
from __future__ import annotations

import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlp_ppo_2ply_multi_tpu.oracle import rules, sampling
from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv
from tests import refbridge
from tests.helpers import boards_to_jax, jax_board_to_tuple

try:
    REF = refbridge.import_reference()
except ImportError:  # pragma: no cover - reference not mounted
    REF = None

pytestmark = [
    pytest.mark.skipif(REF is None, reason="/root/reference not importable"),
    # executes the reference implementation position-by-position: minutes-scale
    pytest.mark.slow,
]

N_CASES = int(os.environ.get("REF_DIFF_N", "1200"))
N_GAMES = int(os.environ.get("REF_DIFF_GAMES", "40"))


def _reference_fullmoves(board, player, roll):
    """Ordered [(submove-tuples, afterstate-board), ...] from the reference."""
    rb = refbridge.to_reference_board(REF, board)
    fms = REF.get_all_possible_moves(REF.Player(player), rb, list(roll))
    out = []
    for fm in fms:
        out.append(
            (
                refbridge.fullmove_to_tuples(fm),
                refbridge.reference_afterstate(REF, rb, REF.Player(player), fm),
            )
        )
    return out


def _cases(seed, n):
    rng = random.Random(seed)
    cases = []
    for _ in range(n):
        b = sampling.random_board(rng)
        p = rng.randint(0, 1)
        d = sampling.random_roll(rng, doubles_bias=0.4)
        cases.append((b, p, d))
    return cases


def _playout_cases(seed, games, cap):
    """Realistic decision points harvested from full random-policy games
    played by the oracle env (covers opening/midgame/bear-off organically)."""
    rng = random.Random(seed)
    cases = []
    for _ in range(games):
        dice = ((rng.randint(1, 6), rng.randint(1, 6)) for _ in iter(int, 1))
        env = OracleEnv(dice)
        env.reset()
        steps = 0
        while not env.game_over and steps < 400:
            if env.num_moves:
                cases.append((env.board, env.player, tuple(env.roll)))
                env.step(rng.randrange(env.num_moves))
            else:
                env.step(None)
            steps += 1
        if len(cases) >= cap:
            break
    return cases[:cap]


def run_movegen_parity(cases):
    """Shared by the test and scripts/run_reference_differential.py."""
    checked = 0
    for board, player, roll in cases:
        want = _reference_fullmoves(board, player, roll)
        got = rules.full_moves(board, player, list(roll))
        assert len(got) == len(want), (board, player, roll, len(got), len(want))
        for i, ((gmv, gb), (wmv, wb)) in enumerate(zip(got, want)):
            assert gmv == wmv, (board, player, roll, i, gmv, wmv)
            assert gb == wb, (board, player, roll, i)
        checked += 1
    return checked


def test_movegen_matches_reference_random_positions():
    assert run_movegen_parity(_cases(seed=101, n=N_CASES)) == N_CASES


def test_movegen_matches_reference_playout_positions():
    cases = _playout_cases(seed=202, games=N_GAMES, cap=N_CASES)
    assert run_movegen_parity(cases) == len(cases) > 0


def test_features_match_reference():
    rng = random.Random(303)
    n = max(200, N_CASES // 4)
    for _ in range(n):
        b = sampling.random_board(rng)
        p = rng.randint(0, 1)
        want = refbridge.reference_features(REF, b, p)
        got = rules.encode(b, p)
        # the reference computes in torch float32; the oracle in python f64 —
        # equality is required at f32 precision (bitwise after f32 rounding)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32), err_msg=str((b, p))
        )


def test_canonical_engine_matches_reference_order_nondoubles():
    """The JAX canonical engine vs the reference DIRECTLY (no oracle in the
    middle): exact insertion order for non-doubles rolls."""
    from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
    from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2

    n = min(256, N_CASES)
    cases = _cases(seed=404, n=n)
    boards = [c[0] for c in cases]
    players = [c[1] for c in cases]
    dice = [(d0, d0 % 6 + 1) if d0 == d1 else (d0, d1) for _, _, (d0, d1) in cases]

    cfg = MoveGenConfig(algo="canonical", dd_subbatch_div=0)
    ms = jax.tree.map(
        np.asarray,
        jax.jit(lambda b, p, d: MG2.legal_moves(b, p, d, cfg))(
            boards_to_jax(boards),
            jnp.asarray(players, jnp.int32),
            jnp.asarray(dice, jnp.int32),
        ),
    )
    for g in range(n):
        want = [b for _, b in _reference_fullmoves(boards[g], players[g], dice[g])]
        ks = np.where(np.asarray(ms.valid[g]))[0]
        got = [jax_board_to_tuple(ms.boards, g, int(k)) for k in ks]
        assert got == want, (g, boards[g], players[g], dice[g])


def test_canonical_engine_matches_reference_sets_doubles():
    from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
    from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2

    n = min(192, N_CASES)
    rng = random.Random(505)
    boards = [sampling.random_board(rng) for _ in range(n)]
    players = [rng.randint(0, 1) for _ in range(n)]
    dice = [(d, d) for d in (rng.randint(1, 6) for _ in range(n))]

    cfg = MoveGenConfig(algo="canonical", dd_subbatch_div=0)
    ms = jax.tree.map(
        np.asarray,
        jax.jit(lambda b, p, d: MG2.legal_moves(b, p, d, cfg))(
            boards_to_jax(boards),
            jnp.asarray(players, jnp.int32),
            jnp.asarray(dice, jnp.int32),
        ),
    )
    for g in range(n):
        want = {b for _, b in _reference_fullmoves(boards[g], players[g], dice[g])}
        ks = np.where(np.asarray(ms.valid[g]))[0]
        got = {jax_board_to_tuple(ms.boards, g, int(k)) for k in ks}
        assert got == want, (g, boards[g], players[g], dice[g])


# ---------------------------------------------------------------------------
# Env transcript parity: reference BackgammonEnv (dice monkeypatched) vs
# OracleEnv on identical dice + identical action indices.
# ---------------------------------------------------------------------------


def _make_reference_env(dice_list):
    env = REF.BackgammonEnv()
    it = iter(dice_list)

    def roll_dice():
        env.roll_result = list(next(it))

    env.roll_dice = roll_dice
    return env


def run_env_transcript_parity(n_games, seed):
    rng = random.Random(seed)
    games_checked, steps_checked = 0, 0
    for _ in range(n_games):
        dice = [(rng.randint(1, 6), rng.randint(1, 6)) for _ in range(3000)]
        ref_env = _make_reference_env(dice)
        ref_env.reset()
        our_env = OracleEnv(iter(dice))
        our_env.reset()

        assert our_env.player == int(ref_env.current_player)
        assert tuple(our_env.roll) == tuple(ref_env.roll_result)

        act_rng = random.Random(seed * 7919 + games_checked)
        done = False
        steps = 0
        while not done and steps < 600:
            n_ours = our_env.num_moves
            n_ref = int(ref_env.action_mask.sum().item())
            assert n_ours == min(n_ref, 500), (steps, n_ours, n_ref)
            assert refbridge.from_reference_board(ref_env.board) == our_env.board
            assert int(ref_env.current_player) == our_env.player

            obs_ref = [float(x) for x in ref_env.get_observation().tolist()]
            np.testing.assert_array_equal(
                np.asarray(our_env.observation(), np.float32),
                np.asarray(obs_ref, np.float32),
            )

            action = act_rng.randrange(n_ours) if n_ours else 0
            _, r_ref, d_ref, info_ref = ref_env.step(action)
            _, r_ours, d_ours, info_ours = our_env.step(
                action if n_ours else None
            )
            # reference rewards accumulate in torch f32 (0.3 -> 0.30000001);
            # the oracle uses python f64 — equality at f32 precision
            assert np.float32(float(r_ref)) == np.float32(r_ours), (steps, info_ref)
            assert bool(d_ref) == d_ours
            assert info_ref.get("close_out_reward") == info_ours.get(
                "close_out_reward"
            )
            assert info_ref.get("prime_reward") == info_ours.get("prime_reward")
            if d_ref:
                assert info_ref["win_type"] == info_ours["win_type"]
                assert int(info_ref["winner"]) == info_ours["winner"]
            done = bool(d_ref)
            steps += 1
        assert done, "game did not finish in 600 plies"
        games_checked += 1
        steps_checked += steps
    return games_checked, steps_checked


def test_env_transcripts_match_reference():
    games, steps = run_env_transcript_parity(n_games=max(6, N_GAMES // 4), seed=606)
    assert games >= 6 and steps > 200
