"""Exactness of the hoisted opponent-side slot context (movegen.SlotCtx).

slot_valid(board, player, die, ctx-built-on-root) must equal
slot_table(board, player, die).valid bit-for-bit for every board reachable
from the root within one turn (children of any first submove, and multi-step
doubles chains) — the invariant the nd second-pass tables and the doubles
level expansions rely on. Reference semantics: get_moves_one_die.py.
"""
import random

import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.engine.board import apply_submove
from mlp_ppo_2ply_multi_tpu.engine.movegen import (
    N_SLOTS,
    board_expand,
    ctx_entry_axis,
    slot_ctx,
    slot_table,
    slot_valid,
)
from mlp_ppo_2ply_multi_tpu.oracle import sampling
from tests.helpers import boards_to_jax


def _random_batch(seed, n):
    rng = random.Random(seed)
    boards = boards_to_jax([sampling.random_board(rng) for _ in range(n)])
    players = jnp.asarray([rng.randint(0, 1) for _ in range(n)], jnp.int32)
    return boards, players


def test_slot_valid_matches_slot_table_on_children():
    """One submove deep (the nd second-pass case), every (d1, d2) pair."""
    boards, players = _random_batch(123, 64)

    @jax.jit
    def run(bd, pl):
        outs = []
        for d1 in range(1, 7):
            d1a = jnp.full(pl.shape, d1, jnp.int32)
            s1 = slot_table(bd, pl, d1a)
            b27 = board_expand(bd, N_SLOTS)
            b1 = apply_submove(
                b27, pl[:, None], s1.start, s1.end, s1.hits, s1.valid
            )
            for d2 in range(1, 7):
                d2a = jnp.full(pl.shape, d2, jnp.int32)
                ctx = slot_ctx(bd, pl, d2a)
                got, _ = slot_valid(
                    b1, pl[:, None], d2a[:, None], ctx_entry_axis(ctx)
                )
                want = slot_table(b1, pl[:, None], d2a[:, None]).valid
                # only children that exist (valid first submoves) must match
                outs.append((got == want) | ~s1.valid[..., None])
        return jnp.stack(outs)

    assert bool(jnp.all(run(boards, players)))


def test_slot_valid_matches_on_doubles_chains():
    """Three submoves deep along random legal chains (the doubles-expansion
    case): the SAME root ctx must stay exact at every level."""
    boards, players = _random_batch(321, 64)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(bd, pl, key):
        outs = []
        for d in range(1, 7):
            da = jnp.full(pl.shape, d, jnp.int32)
            ctx = slot_ctx(bd, pl, da)
            cur = bd
            for level in range(3):
                st = slot_table(cur, pl, da)
                got, _ = slot_valid(cur, pl, da, ctx)
                outs.append(got == st.valid)
                # pick one random valid submove per game and step the chain
                key_l = jax.random.fold_in(key, d * 4 + level)
                scores = jnp.where(
                    st.valid, jax.random.uniform(key_l, st.valid.shape), -1.0
                )
                pick = jnp.argmax(scores, axis=-1)
                oh = pick[:, None] == jnp.arange(N_SLOTS)
                any_v = jnp.any(st.valid, axis=-1)
                take = lambda a: jnp.sum(jnp.where(oh, a, 0), axis=-1)
                cur = apply_submove(
                    cur,
                    pl,
                    take(st.start),
                    take(st.end),
                    jnp.any(oh & st.hits, axis=-1),
                    any_v,
                )
        return jnp.stack(outs)

    assert bool(jnp.all(run(boards, players, key)))


def test_expand_ctx_equals_full_table_path():
    """enumerate_doubles' ctx-driven levels must reproduce the full
    slot_table path exactly (same frontiers, shorts, overflow)."""
    boards, players = _random_batch(555, 128)
    die = jnp.asarray(
        [random.Random(7).randint(1, 6) for _ in range(128)], jnp.int32
    )
    cfg = MoveGenConfig(algo="canonical", dd_subbatch_div=0)

    def chain(bd, pl, d, use_ctx):
        ctx = slot_ctx(bd, pl, d) if use_ctx else None
        s1 = slot_table(bd, pl, d)
        from mlp_ppo_2ply_multi_tpu.engine.movegen2 import (
            _Frontier,
            _expand,
            _select_set_bits,
        )
        from mlp_ppo_2ply_multi_tpu.engine.movegen import slot_params

        root_cc = MG2._popcount(s1.valid)
        idx1, ok1 = _select_set_bits(s1.valid, cfg.w1)
        b0 = board_expand(bd, cfg.w1)
        sg, eg, hg = slot_params(b0, pl[:, None], d[:, None], idx1)
        b1 = apply_submove(b0, pl[:, None], sg, eg, hg, ok1)
        from mlp_ppo_2ply_multi_tpu.core.types import BAR, BEAR_OFF

        adj = jnp.where(pl[:, None] == 0, sg, 23 - sg)
        rank1 = jnp.where(sg == BAR, -1, 2 * adj + (eg == BEAR_OFF))
        front = _Frontier(
            boards=b1,
            last_rank=rank1,
            only=jnp.broadcast_to((root_cc == 1)[:, None], ok1.shape),
            valid=ok1,
        )
        f2, sh1, ov2 = _expand(front, pl, d, cfg.w2, ctx)
        f3, sh2, ov3 = _expand(f2, pl, d, cfg.w3, ctx)
        return f2, f3, sh1, sh2, ov2, ov3

    got = jax.jit(lambda b, p, d: chain(b, p, d, True))(boards, players, die)
    want = jax.jit(lambda b, p, d: chain(b, p, d, False))(boards, players, die)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
