"""Canonical delta-signature dedup (MoveGenConfig.nd_sig_dedup) vs the
board-Gram dedup it replaces.

The signature is the afterstate's delta from the root in canonical form
(net mover cell-delta multiset + hit-cell multiset, movegen2._submove_sig),
so signature equality <=> board equality by construction. These tests check
the IMPLEMENTATION (param extraction, cancellation cases, sentinel packing)
by demanding bit-identical MoveSets from both dedup paths over families
chosen to hit every equality class:

* random positions (cross-pass same-submove swaps — the bulk class);
* constructed bear-off positions (chained bear-off collapses, double
  bear-off origin swaps — the classes behind nd_has_pair_exact);
* blot-rich positions (hit bookkeeping incl. chained-through hits and the
  vacate-refill leapfrog (6->8, 8->9*) == (7->9*, 6->7)).
"""
import dataclasses
import random

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.oracle import sampling
from mlp_ppo_2ply_multi_tpu.twoply import expectimax
from tests.helpers import bearoff_doubles_case, boards_to_jax, sample_cases
import pytest


def _nd_roll(rng):
    d1 = rng.randint(1, 6)
    d2 = rng.randint(1, 6)
    while d2 == d1:
        d2 = rng.randint(1, 6)
    return (d1, d2)


def _blotty_board(rng):
    """Sparse board: many singleton checkers on both sides -> dense hit and
    leapfrog interactions."""
    pts = [[0] * 24, [0] * 24]
    cells = rng.sample(range(24), 14)
    for i, c in enumerate(cells):
        pts[i % 2][c] = 1
    off = [15 - sum(pts[0]), 15 - sum(pts[1])]
    return (tuple(pts[0]), tuple(pts[1]), (0, 0), tuple(off))


def _case_batch(rng, n_random=600, n_bear=600, n_blot=600):
    cases = []
    for _ in range(n_random):
        cases.append((sampling.random_board(rng), rng.randint(0, 1), _nd_roll(rng)))
    for _ in range(n_bear):
        b, p, _ = bearoff_doubles_case(rng)
        cases.append((b, p, _nd_roll(rng)))
    for _ in range(n_blot):
        cases.append((_blotty_board(rng), rng.randint(0, 1), _nd_roll(rng)))
    return cases


@pytest.mark.slow
def test_sig_dedup_matches_gram_moveset():
    rng = random.Random(424242)
    cases = _case_batch(rng)
    jb = boards_to_jax([c[0] for c in cases])
    pl = jnp.asarray([c[1] for c in cases], jnp.int32)
    dc = jnp.asarray([c[2] for c in cases], jnp.int32)

    cfg_s = MoveGenConfig(algo="canonical", dd_subbatch_div=0, nd_sig_dedup=True)
    cfg_g = dataclasses.replace(cfg_s, nd_sig_dedup=False)

    def run(cfg):
        f = jax.jit(lambda b, p, d: MG2.enumerate_nondoubles(b, p, d, cfg))
        return jax.tree.map(np.asarray, f(jb, pl, dc))

    ms_s, ms_g = run(cfg_s), run(cfg_g)
    assert (ms_s.valid == ms_g.valid).all()
    assert (ms_s.count == ms_g.count).all()
    assert (ms_s.overflow == ms_g.overflow).all()
    diff = ms_s.boards.data * ms_s.valid[..., None] - ms_g.boards.data * ms_g.valid[..., None]
    assert (diff == 0).all()
    # the sample must actually exercise dedup (duplicates present somewhere)
    raw = jax.jit(
        lambda b, p, d: MG2.enumerate_nondoubles_raw(b, p, d, cfg_s.nd_dedup_k)
    )(jb, pl, dc)
    n_raw = np.asarray(MG2._popcount(raw.valid))
    assert (n_raw > np.asarray(ms_g.count)).any()


@pytest.mark.slow
def test_sig_dedup_matches_gram_tiered():
    """Same equivalence through the two-tier nd tail (narrow plane + wide
    sub-batch both use the signature path)."""
    rng = random.Random(31337)
    cases = _case_batch(rng, 400, 400, 400)
    jb = boards_to_jax([c[0] for c in cases])
    pl = jnp.asarray([c[1] for c in cases], jnp.int32)
    dc = jnp.asarray([c[2] for c in cases], jnp.int32)

    cfg_s = MoveGenConfig(
        algo="canonical", dd_subbatch_div=0, nd_tier=24, nd_wide_div=2,
        nd_sig_dedup=True,
    )
    cfg_g = dataclasses.replace(cfg_s, nd_sig_dedup=False)

    def run(cfg):
        f = jax.jit(lambda b, p, d: MG2.enumerate_nondoubles(b, p, d, cfg))
        return jax.tree.map(np.asarray, f(jb, pl, dc))

    ms_s, ms_g = run(cfg_s), run(cfg_g)
    assert (ms_s.valid == ms_g.valid).all()
    assert (ms_s.overflow == ms_g.overflow).all()
    diff = ms_s.boards.data * ms_s.valid[..., None] - ms_g.boards.data * ms_g.valid[..., None]
    assert (diff == 0).all()


@pytest.mark.slow
def test_sig_dedup_value_first_scorer():
    """weighted_opponent_response: the value-first scorer's top-M dedup via
    signatures equals the boards+Gram variant bit-for-bit (same reply sets,
    same flags)."""
    base = Config(
        movegen=MoveGenConfig(algo="canonical", dd_subbatch_div=0, nd_sig_dedup=True),
        twoply=TwoPlyConfig(enabled=True, value_first_m=16),
    )
    cfg_g = dataclasses.replace(
        base,
        movegen=dataclasses.replace(base.movegen, nd_sig_dedup=False),
    )
    params = td.init_train_state(jax.random.PRNGKey(0), base).params
    boards, players, _ = sample_cases(seed=77, n=8)
    jb = boards_to_jax(boards)
    from mlp_ppo_2ply_multi_tpu.engine.board import Board

    jb_k = Board(data=jb.data[:, None])
    opp = jnp.asarray(players, jnp.int32)

    def run(cfg):
        f = jax.jit(
            lambda p, b, o: expectimax.weighted_opponent_response(
                p, b, o, cfg, return_flags=True
            )
        )
        return jax.tree.map(np.asarray, f(params, jb_k, opp))

    got_s, flg_s = run(base)
    got_g, flg_g = run(cfg_g)
    np.testing.assert_array_equal(flg_s, flg_g)
    np.testing.assert_allclose(got_s, got_g, rtol=0, atol=0)
