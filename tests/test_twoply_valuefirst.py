"""Exactness of the 2-ply scorer's value-first dedup path
(TwoPlyConfig.value_first_m + movegen2.nd_has_pair_exact).

The scorer only needs the top-5 DISTINCT reply values; duplicates carry
bit-equal values, so dedup can run AFTER a top-M-by-value select — provided
the max-submove filter's has_pair bit is computed exactly without the dedup.
nd_has_pair_exact's closed form (a pair can only equal an earlier single via
a chained bear-off) is validated against the oracle's actual move lists,
including constructed bear-off positions where the collapse fires; the full
scorer is validated bit-for-bit against the reference-order dedup path.
"""
import dataclasses
import random

import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.oracle import rules, sampling
from mlp_ppo_2ply_multi_tpu.twoply import expectimax
from tests.helpers import bearoff_doubles_case, boards_to_jax, sample_cases
import pytest

# rejected value-first pipeline exactness (kept default-off; PERF.md)
pytestmark = pytest.mark.slow


def _bearoff_nd_case(rng: random.Random):
    """Bear-off board + a NON-double roll; the chained-bear-off collapse
    (pair == earlier single) lives in this family."""
    board, p, _ = bearoff_doubles_case(rng)
    d1 = rng.randint(1, 6)
    d2 = rng.randint(1, 6)
    while d2 == d1:
        d2 = rng.randint(1, 6)
    return board, p, (d1, d2)


def test_nd_has_pair_exact_vs_oracle():
    """nd_has_pair_exact's theorem ("dedup can never eliminate ALL pairs
    while leaving singles") against the oracle's actual move lists, over
    random positions and constructed bear-off positions — the family where
    chained-bear-off duplicates (the only pair==single equality class)
    concentrate."""
    rng = random.Random(2025)
    cases = []
    for _ in range(1000):
        cases.append(
            (sampling.random_board(rng), rng.randint(0, 1),
             (rng.randint(1, 6), rng.randint(1, 6)))
        )
    for _ in range(1000):
        cases.append(_bearoff_nd_case(rng))
    cases = [c for c in cases if c[2][0] != c[2][1]]

    jb = boards_to_jax([c[0] for c in cases])
    pl = jnp.asarray([c[1] for c in cases], jnp.int32)
    dc = jnp.asarray([c[2] for c in cases], jnp.int32)

    @jax.jit
    def got_fn(b, p, d):
        pa, pb, valid, d_hi, d_lo = MG2._nd_candidates(b, p, d)
        skip_b = (~pa.any_pair) & (MG2._popcount(pa.single_valid) == 1)
        pvB = pb.pair_valid & ~skip_b[..., None, None]
        # naive = "any raw pass-B pair cell" without the reverse-order skip:
        # the formula must NOT reduce to this
        return MG2.nd_has_pair_exact(pa, pvB), pa.any_pair | jnp.any(
            pb.pair_valid, axis=(-1, -2)
        )

    got, naive = jax.tree.map(np.asarray, got_fn(jb, pl, dc))
    skip_mattered = 0
    for i, (board, p, dice) in enumerate(cases):
        mvs = rules.full_moves(board, p, list(dice))
        want = any(len(mv[0]) == 2 for mv in mvs)
        assert bool(got[i]) == want, (board, p, dice, bool(got[i]), want)
        if bool(naive[i]) != want:
            skip_mattered += 1
    # coverage: the sample must contain positions where the reverse-order
    # skip masking is load-bearing (raw pass-B pairs exist but the reference
    # never enumerates pass B)
    assert skip_mattered > 0


def test_raw_moveset_matches_enumerate_nondoubles_sets():
    """RawMoves must contain exactly the deduped move set's boards (as a
    multiset superset whose distinct boards match), with valid counts >= the
    deduped counts."""
    rng = random.Random(99)
    cases = []
    while len(cases) < 128:
        b, p = sampling.random_board(rng), rng.randint(0, 1)
        d = (rng.randint(1, 6), rng.randint(1, 6))
        if d[0] != d[1]:
            cases.append((b, p, d))
    jb = boards_to_jax([c[0] for c in cases])
    pl = jnp.asarray([c[1] for c in cases], jnp.int32)
    dc = jnp.asarray([c[2] for c in cases], jnp.int32)
    cfg = MoveGenConfig(algo="canonical", dd_subbatch_div=0)

    K = cfg.nd_dedup_k
    raw = jax.tree.map(
        np.asarray,
        jax.jit(lambda b, p, d: MG2.enumerate_nondoubles_raw(b, p, d, K))(
            jb, pl, dc
        ),
    )
    ms = jax.tree.map(
        np.asarray,
        jax.jit(lambda b, p, d: MG2.enumerate_nondoubles(b, p, d, cfg))(
            jb, pl, dc
        ),
    )
    from tests.helpers import jax_board_to_tuple

    for g in range(len(cases)):
        keep = {
            jax_board_to_tuple(ms.boards, g, k)
            for k in np.where(ms.valid[g])[0]
        }
        vmask = raw.valid[g] & (
            raw.kpair[g] | ~raw.has_pair[g]
        )
        raw_set = {
            jax_board_to_tuple(raw.boards, g, k) for k in np.where(vmask)[0]
        }
        assert raw_set == keep, (cases[g], len(raw_set), len(keep))


def test_value_first_scorer_matches_reference_order_path():
    """weighted_opponent_response with value_first_m vs the reference-order
    dedup path: equal scores (the top-5 distinct values are identical sets;
    summation-order drift only) and no inexact flags on random positions."""
    cfg0 = Config(
        movegen=MoveGenConfig(algo="canonical", dd_subbatch_div=0),
        twoply=TwoPlyConfig(enabled=True, value_first_m=0),
    )
    cfg_v = dataclasses.replace(
        cfg0, twoply=dataclasses.replace(cfg0.twoply, value_first_m=16)
    )
    params = td.init_train_state(jax.random.PRNGKey(0), cfg0).params
    boards, players, _ = sample_cases(seed=31, n=8)
    jb = boards_to_jax(boards)
    jb_k = Board(data=jb.data[:, None])  # K=1 candidate axis
    opp = jnp.asarray(players, jnp.int32)

    f0 = jax.jit(
        lambda p, b, o: expectimax.weighted_opponent_response(p, b, o, cfg0)
    )
    fv = jax.jit(
        lambda p, b, o: expectimax.weighted_opponent_response(
            p, b, o, cfg_v, return_flags=True
        )
    )
    want = np.asarray(f0(params, jb_k, opp))
    got, flags = fv(params, jb_k, opp)
    assert not np.asarray(flags).any()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)
