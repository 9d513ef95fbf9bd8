"""Adversarial bounding of the doubles-order divergence classes (VERDICT
round-2 item 8 / PARITY.md divergence 3).

The one reachable class where our order-independent forced-shorter rule
could diverge from the reference's path-dependent recursion
(/root/reference/src/backgammon/moves/handle_move_types.py:84-193) is
NO-4-MOVE doubles positions: the longest playable sequence is 1-3 submoves,
so which partial sequences count as maximal depends on the enumeration
path. These tests CONSTRUCT that class deliberately (blocked chain
landings, bar stacks with made home boards — tests/helpers.py
blocked_doubles_case) instead of hoping random play visits it, and compare
against the EXECUTABLE reference:

  * oracle full_moves: exact count + submove order + afterstates;
  * canonical JAX engine (movegen2): exact afterstate sets;
  * Q7 reach check: presented counts in this class stay far below the
    production a_max (448), so canonical-vs-reference ORDER differences
    can never alter the presented SET through truncation.

Scale knob: REF_DIFF_ADV (default 250 decisions) for CI;
scripts/adversarial_doubles_sweep.py runs the large-N version and records
the count in PARITY.md.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.oracle import rules
from tests import refbridge
from tests.helpers import boards_to_jax, collect_no4move_doubles, jax_board_to_tuple

try:
    REF = refbridge.import_reference()
except ImportError:  # pragma: no cover - reference not mounted
    REF = None

pytestmark = [
    pytest.mark.skipif(REF is None, reason="/root/reference not importable"),
    # executes the reference implementation position-by-position: minutes-scale
    pytest.mark.slow,
]

N_ADV = int(os.environ.get("REF_DIFF_ADV", "250"))


@pytest.fixture(scope="module")
def cases():
    cs = collect_no4move_doubles(seed=808, n=N_ADV)
    assert len(cs) == N_ADV, "generator hit its draw cap before n cases"
    return cs


def reference_moves(board, player, die):
    rb = refbridge.to_reference_board(REF, board)
    fms = REF.get_all_possible_moves(REF.Player(player), rb, [die, die])
    return [
        (
            refbridge.fullmove_to_tuples(fm),
            refbridge.reference_afterstate(REF, rb, REF.Player(player), fm),
        )
        for fm in fms
    ]


def test_forced_shorter_matches_reference_exactly(cases):
    """Count + order + afterstates identical on constructed no-4-move
    doubles — the reference's path-dependent shorts recursion records
    exactly the same maximal sequences as our order-independent rule."""
    max_len_hist = {1: 0, 2: 0, 3: 0}
    for board, player, die in cases:
        want = reference_moves(board, player, die)
        got = rules.full_moves(board, player, [die, die])
        assert len(got) == len(want), (board, player, die, len(got), len(want))
        for i, ((gmv, gb), (wmv, wb)) in enumerate(zip(got, want)):
            assert gmv == wmv, (board, player, die, i, gmv, wmv)
            assert gb == wb, (board, player, die, i)
        max_len_hist[max(len(mv[0]) for mv in got)] += 1
    # the sampler really is exercising all three short lengths
    assert all(v > 0 for v in max_len_hist.values()), max_len_hist


def test_canonical_engine_sets_match_reference_no4move(cases):
    """The batched canonical engine emits identical afterstate SETS on the
    adversarial class, and the presented counts sit far below the production
    Q7 cap (448) — so the canonical order divergence cannot leak into the
    presented set via truncation anywhere in this class."""
    boards = [c[0] for c in cases]
    players = [c[1] for c in cases]
    dice = [(c[2], c[2]) for c in cases]

    cfg = MoveGenConfig(algo="canonical", dd_subbatch_div=0)
    ms = jax.tree.map(
        np.asarray,
        jax.jit(lambda b, p, d: MG2.legal_moves(b, p, d, cfg))(
            boards_to_jax(boards),
            jnp.asarray(players, jnp.int32),
            jnp.asarray(dice, jnp.int32),
        ),
    )
    max_presented = 0
    for g in range(len(cases)):
        want = {b for _, b in reference_moves(*cases[g])}
        ks = np.where(np.asarray(ms.valid[g]))[0]
        got = {jax_board_to_tuple(ms.boards, g, int(k)) for k in ks}
        assert got == want, (g, cases[g])
        max_presented = max(max_presented, len(ks))
        assert not bool(np.asarray(ms.overflow)[g]), (g, cases[g])
    assert max_presented <= MoveGenConfig.fast().a_max // 4, max_presented
