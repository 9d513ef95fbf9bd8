"""Differential tests: vectorized move enumeration vs the oracle.

Checks move COUNT, every afterstate BOARD, and the exact ORDER (reference
insertion order after dedup/filters) — the properties trajectory parity
depends on (SURVEY.md Q6/Q7).
"""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen as MG
from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.oracle import rules
from tests.helpers import boards_to_jax, jax_board_to_tuple, sample_cases

# this file tests the exact-reference-order "sorted" engine; the canonical
# engine has its own differential suite in test_movegen2.py
CFG = MoveGenConfig(algo="sorted")


@pytest.fixture(scope="module")
def jitted():
    return jax.jit(lambda b, p, d: MG.legal_moves(b, p, d, CFG))


def run_diff(jitted, seed, n, doubles_bias):
    boards, players, dice = sample_cases(seed, n, doubles_bias)
    jb = boards_to_jax(boards)
    ms = jax.tree.map(
        np.asarray,
        jitted(jb, jnp.asarray(players, dtype=jnp.int32), jnp.asarray(dice, dtype=jnp.int32)),
    )
    for g in range(n):
        want = rules.full_moves(boards[g], players[g], list(dice[g]))
        got_n = int(ms.count[g])
        assert got_n == len(want), (
            g, dice[g], players[g], boards[g], got_n, len(want)
        )
        for k in range(got_n):
            got_b = jax_board_to_tuple(ms.boards, g, k)
            assert got_b == want[k][1], (g, k, dice[g], players[g], boards[g])
        assert not ms.valid[g, got_n:].any()


def test_single_die_slots_match_oracle():
    boards, players, _ = sample_cases(77, 64)
    jb = boards_to_jax(boards)
    for die in range(1, 7):
        st = MG.slot_table(
            jb,
            jnp.asarray(players, dtype=jnp.int32),
            jnp.full((64,), die, dtype=jnp.int32),
        )
        start = np.asarray(st.start); end = np.asarray(st.end)
        hits = np.asarray(st.hits); valid = np.asarray(st.valid)
        for g in range(64):
            want = rules.one_die_moves(boards[g], players[g], die)
            got = [
                (int(start[g, s]), int(end[g, s]), bool(hits[g, s]))
                for s in range(MG.N_SLOTS)
                if valid[g, s]
            ]
            assert got == want, (g, die, players[g], boards[g])


def test_nondoubles_match_oracle(jitted):
    run_diff(jitted, 101, 64, doubles_bias=0.0)


def test_doubles_match_oracle(jitted):
    run_diff(jitted, 202, 64, doubles_bias=1.0)


def test_mixed_match_oracle(jitted):
    run_diff(jitted, 303, 64, doubles_bias=0.4)


def test_opening_rolls_match_oracle(jitted):
    """Every non-double opening roll from the start position, both players."""
    cases = []
    for d0 in range(1, 7):
        for d1 in range(1, 7):
            for p in (0, 1):
                cases.append((rules.start_board(), p, (d0, d1)))
    boards = [c[0] for c in cases]
    players = [c[1] for c in cases]
    dice = [c[2] for c in cases]
    # pad to the jitted batch width of 64 by repeating
    while len(boards) % 64:
        boards.append(boards[0]); players.append(players[0]); dice.append(dice[0])
    for s in range(0, len(boards), 64):
        jb = boards_to_jax(boards[s : s + 64])
        ms = jax.tree.map(
            np.asarray,
            jitted(
                jb,
                jnp.asarray(players[s : s + 64], dtype=jnp.int32),
                jnp.asarray(dice[s : s + 64], dtype=jnp.int32),
            ),
        )
        for g in range(64):
            want = rules.full_moves(boards[s + g], players[s + g], list(dice[s + g]))
            assert int(ms.count[g]) == len(want)
            for k in range(len(want)):
                assert jax_board_to_tuple(ms.boards, g, k) == want[k][1]


def test_forced_and_empty_positions(jitted):
    """Hand-crafted edge cases: dance on the bar (no moves), forced single
    entry, forced higher die, bear-off overshoot."""
    # P1 on the bar, opponent home fully closed -> 0 moves
    p2 = [0] * 24
    for i in range(0, 6):
        p2[i] = 2
    p1 = [0] * 24
    p1[12] = 14
    closed = (tuple(p1), tuple(p2), (1, 0), (0, 3))
    # P1 bear-off: single checker on 23, overshoot with any die
    p1b = [0] * 24; p1b[23] = 1
    p2b = [0] * 24; p2b[0] = 15
    bear = (tuple(p1b), tuple(p2b), (0, 0), (14, 0))
    cases = [
        (closed, 0, (3, 5)),
        (closed, 0, (2, 2)),
        (bear, 0, (6, 1)),
        (bear, 0, (4, 4)),
    ]
    boards = [c[0] for c in cases]; players = [c[1] for c in cases]; dice = [c[2] for c in cases]
    while len(boards) < 64:
        boards.append(rules.start_board()); players.append(0); dice.append((2, 1))
    jb = boards_to_jax(boards)
    ms = jax.tree.map(
        np.asarray,
        jitted(jb, jnp.asarray(players, dtype=jnp.int32), jnp.asarray(dice, dtype=jnp.int32)),
    )
    for g in range(len(boards)):
        want = rules.full_moves(boards[g], players[g], list(dice[g]))
        assert int(ms.count[g]) == len(want), (g, boards[g], dice[g])
        for k in range(len(want)):
            assert jax_board_to_tuple(ms.boards, g, k) == want[k][1]
    assert int(ms.count[0]) == 0  # dance
