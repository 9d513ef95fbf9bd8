"""Batched 2-ply expectimax rerank.

Reference semantics (/root/reference/src/multi/two_ply.py — present there only
as dead code, wired live here as a policy option):

  * the top-4 1-ply candidates by value are reranked (two_ply.py:157-192);
  * for each candidate afterstate, the opponent's expected response is the
    sum over the 21 distinct rolls of P(roll) * mean(top-5 opponent afterstate
    values) (:93-150); rolls with no legal reply contribute 0 (:123);
  * [1,1],[2,2],[3,3] replies are capped at 50 moves — the reference
    subsamples with random.sample (:119-121), we keep the FIRST 50 in
    enumeration order so the scorer is deterministic (documented divergence,
    TwoPlyConfig.small_double_cap);
  * score = alpha * V(candidate) - beta * E[opponent response], alpha=1.0,
    beta=0.9 (:44-90);
  * fewer than 4 legal moves -> plain 1-ply softmax selection (:157,:193).

TPU shape: candidates fold into the batch axis; the 21 rolls are a lax.scan
(keeps peak memory at one roll's reply set); every reply set is evaluated in
one fused [B, K, A_reply, 198] value pass.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.engine.movegen import (
    MoveSet,
    board_take,
    board_take_onehot,
)
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.model import value_net

_NEG = -1e9

# The 21 distinct rolls and their outcome counts /36 (two_ply.py:10-35).
ROLLS = np.asarray(
    [
        [1, 1], [1, 2], [1, 3], [1, 4], [1, 5], [1, 6],
        [2, 2], [2, 3], [2, 4], [2, 5], [2, 6],
        [3, 3], [3, 4], [3, 5], [3, 6],
        [4, 4], [4, 5], [4, 6],
        [5, 5], [5, 6],
        [6, 6],
    ],
    dtype=np.int32,
)
COUNTS = np.asarray(
    [1, 2, 2, 2, 2, 2, 1, 2, 2, 2, 2, 1, 2, 2, 2, 1, 2, 2, 1, 2, 1],
    dtype=np.float32,
)
PROBS = COUNTS / 36.0
# [1,1],[2,2],[3,3] get the 50-move cap (two_ply.py:119-121).
SMALL_DOUBLE = np.asarray(
    [r[0] == r[1] and r[0] <= 3 for r in ROLLS], dtype=bool
)


def topk_small(v: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """top_k along the last axis for small static k, as k rounds of masked
    max (VPU compare-reduces). ``jax.lax.top_k`` lowers to a full SORT on
    this TPU toolchain — measured 36ms for top-4 of [1024, 448] and 14ms for
    the in-scan top-5, ~50ms of a 278ms 2-ply step. Tie handling matches
    top_k: the earlier index wins each round, equal values at later indices
    surface in later rounds."""
    vals, idxs = [], []
    cur = v
    n = v.shape[-1]
    lanes = jnp.arange(n, dtype=jnp.int32)
    for _ in range(k):
        m = jnp.max(cur, axis=-1, keepdims=True)
        first = jnp.argmax(cur == m, axis=-1)
        vals.append(m[..., 0])
        idxs.append(first)
        cur = jnp.where(lanes == first[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _values(params, boards, flag, cfg: Config) -> jax.Array:
    """Candidate values via the fused Pallas kernel when the actor has it
    enabled (same numerics class as the 1-ply actor), else encode+forward."""
    if cfg.model.fused_actor_kernel:
        from mlp_ppo_2ply_multi_tpu.ops.fused_value import fused_value

        return fused_value(boards.data, flag, params)
    return value_net.forward(params, encode_board(boards, flag), cfg.model)


def oriented_values(params, boards, mover, cfg: Config) -> jax.Array:
    """Afterstate values oriented so HIGHER is better for ``mover`` under the
    configured td_mode. Reference mode: V with the mover's (non-truthful)
    side flag, both players maximize (Q3). side0 mode: V estimates side-0's
    outcome with the truthful opponent-on-roll flag; side 1 minimizes, so
    its values are negated. ``mover`` must broadcast against the boards'
    batch shape."""
    if cfg.train.td_mode == "side0":
        v = _values(params, boards, 1 - mover, cfg)
        return v * jnp.where(mover == 0, 1.0, -1.0)
    return _values(params, boards, mover, cfg)


def reply_movegen_cfg(cfg: Config) -> MoveGenConfig:
    """Reduced-width enumeration for opponent replies; the scorer only needs
    the top-5 values so deep doubles tails beyond reply_a_max are waste."""
    a = cfg.twoply.reply_a_max
    return dataclasses.replace(
        cfg.movegen, w2=min(cfg.movegen.w2, a), w3=min(cfg.movegen.w3, a),
        w4=min(cfg.movegen.w4, a), a_max=a,
        # replies are capped at a anyway; a wider dedup window would only
        # preserve candidates that the a_max cap then drops
        nd_dedup_k=min(cfg.movegen.nd_dedup_k, a),
        # the scorer evaluates each FIXED roll for every game — the iid-dice
        # doubles sub-batch compaction would overflow on the 6 double rolls
        dd_subbatch_div=0,
        # reply-tail tiering: the wide fraction is roll-correlated (a high
        # nd roll widens EVERY (game, candidate) in the same scan iteration),
        # so the divisor is the scorer's own conservative reply_wide_div
        nd_tier=cfg.twoply.reply_nd_tier,
        nd_wide_div=cfg.twoply.reply_wide_div,
    )


def weighted_opponent_response(
    params, boards, opp: jax.Array, cfg: Config, return_flags: bool = False
) -> jax.Array:
    """E[opponent response] per candidate board (two_ply.py:93-150).

    ``boards`` batch shape [..., K] (candidate afterstates), ``opp`` int[...].
    Returns float32[..., K] (and, with ``return_flags``, a bool[..., K]
    "inexact" flag — True where the value-first dedup's top-M window or the
    reply_a_max cap may have truncated the true top-5; see
    TwoPlyConfig.value_first_m).

    The 15 non-double rolls and 6 double rolls run as separate scans so each
    evaluates only its own enumeration path (a combined scan would compute
    BOTH the non-doubles and doubles programs for all 21 rolls — measured
    ~2x the device time).
    """
    from mlp_ppo_2ply_multi_tpu.engine import movegen2
    from mlp_ppo_2ply_multi_tpu.engine.board import pack_board

    mg = reply_movegen_cfg(cfg)
    opp_k = opp[..., None]  # [..., 1] broadcasts over K
    topn = cfg.twoply.top_n_responses
    cap = cfg.twoply.small_double_cap

    def score_moveset(ms, probs_c, cap_active):
        """Scores for a [C, ..., K] roll-chunked move set; probs_c float[C],
        cap_active bool[C]. Returns the probability-weighted chunk sum.

        "first cap moves in enumeration order" — by VALID-entry rank, since
        the canonical engine's valid mask need not be contiguous."""
        lead = (slice(None),) + (None,) * (ms.valid.ndim - 1)
        rank = jnp.cumsum(ms.valid.astype(jnp.int32), axis=-1)
        valid = ms.valid & ((rank <= cap) | ~cap_active[lead])
        # reply values oriented for the OPPONENT (the reply's mover): in
        # side0 mode this is -sgn(p) * V(reply, p-on-roll) — without the
        # orientation the scorer maximizes the wrong side for player 1
        v = oriented_values(params, ms.boards, opp_k[..., None], cfg)  # [C, ..., K, A]
        v = jnp.where(valid, v, _NEG)
        top, _ = topk_small(v, topn)  # [C, ..., K, topn]
        present = top > _NEG / 2
        n = jnp.maximum(jnp.sum(present.astype(jnp.float32), axis=-1), 1.0)
        avg = jnp.sum(jnp.where(present, top, 0.0), axis=-1) / n
        has_reply = jnp.any(valid, axis=-1)
        return jnp.sum(
            jnp.where(has_reply, avg * probs_c[lead[:-1]], 0.0), axis=0
        )

    def score_raw(raw, probs_c):
        """REJECTED EXPERIMENT (default-off: TwoPlyConfig.value_first_m=0;
        evidence in core/config.py and experimental/__init__.py).

        Value-first scoring of an undeduped reply set (RawMoves): values
        over all present candidates (max-submove filter applied via the
        exact closed-form has_pair), top-M by value, dedup only those M
        boards, mean of the first top_n distinct. Exact unless more than
        M - top_n of the M highest-valued replies are duplicates (flagged).
        Duplicates carry bit-equal values, and value ties at the top_n
        boundary cannot change the MEAN, so the result equals the
        reference-order dedup path whenever the flag is clear."""
        m = cfg.twoply.value_first_m
        assert m >= topn, "value_first_m must cover top_n_responses"
        lead = (slice(None),) + (None,) * (raw.valid.ndim - 1)
        vmask = raw.valid & (raw.kpair | ~raw.has_pair[..., None])
        v = oriented_values(params, raw.boards, opp_k[..., None], cfg)
        v = jnp.where(vmask, v, _NEG)
        top, ti = topk_small(v, m)  # [C, ..., K, m]
        ok = top > _NEG / 2
        if cfg.movegen.nd_sig_dedup:
            # canonical delta signatures: dedup the top-M via an int compare
            # (one-hot take of an int32 lane instead of boards+pack+Gram)
            oh = ti[..., :, None] == jnp.arange(
                raw.sig.shape[-1], dtype=jnp.int32
            )
            sig_m = jnp.sum(
                jnp.where(oh, raw.sig[..., None, :], 0), axis=-1
            )
            dup = movegen2._dup_earlier_sig(sig_m, ok)
        else:
            dup = movegen2._dup_earlier_mask(
                pack_board(board_take_onehot(raw.boards, ti)), ok
            )
        surv = ok & ~dup
        rank = jnp.cumsum(surv.astype(jnp.int32), axis=-1)
        use = surv & (rank <= topn)
        n = jnp.maximum(jnp.sum(use.astype(jnp.float32), axis=-1), 1.0)
        avg = jnp.sum(jnp.where(use, top, 0.0), axis=-1) / n
        has_reply = jnp.any(vmask, axis=-1)
        n_present = jnp.sum(vmask.astype(jnp.int32), axis=-1)
        # Flags only the NEW failure mode of this path: more than m - top_n
        # of the m highest-valued replies were duplicates. raw.overflow (the
        # pre-dedup candidate count exceeding reply_a_max) is the same
        # truncation class the reference-order path has always had at this
        # cap and is deliberately NOT folded in — both paths truncate that
        # tail identically (probe_reply_widths.py sizes the cap).
        inexact = (n_present > m) & (
            jnp.sum(surv.astype(jnp.int32), axis=-1) < topn
        )
        total = jnp.sum(
            jnp.where(has_reply, avg * probs_c[lead[:-1]], 0.0), axis=0
        )
        return total, jnp.any(inexact, axis=0)

    nd_mask = ROLLS[:, 0] != ROLLS[:, 1]
    batch_shape = boards.batch_shape

    if (
        cfg.twoply.unroll_rolls
        and cfg.twoply.roll_chunk <= 1
        and not cfg.twoply.value_first_m
    ):
        out = _wor_unrolled(params, boards, opp, cfg, mg, topn, cap)
        return out if return_flags else out[0]

    c = max(1, cfg.twoply.roll_chunk)
    bc = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (c, *a.shape)), boards
    )

    # Shared first-ply expansion: the 15 fixed nd rolls need only 6 distinct
    # (first die -> slot table, children) results, not 30 (movegen2
    # .die_tables); each scan iteration gathers its two dies from the [6]
    # axis. The doubles scan reuses the root tables as its level-1 input.
    s1_all, b1_all = movegen2.die_tables(boards, opp_k)
    # Root opponent-side context per die: the reply pass's second-ply table
    # only needs validity, so each scan iteration runs the mover-side-only
    # slot_valid against the root ctx of its second die instead of a full
    # slot_table over every (candidate, first-submove-child) board.
    ctx_all = movegen2.die_ctxs(boards, opp_k)
    take_die = lambda t, i: jax.tree.map(lambda a: jnp.take(a, i, axis=0), t)

    def chunks(*arrs):
        """Stack roll-constant arrays into scan chunks of C; the last chunk
        is padded with repeats of its final roll whose probability (always
        the second array) is zeroed."""
        n = len(arrs[0])
        pad = (-n) % c
        out = []
        for i, a in enumerate(arrs):
            a = np.asarray(a)
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
            if i == 1 and pad:
                a[-pad:] = 0.0
            out.append(jnp.asarray(a.reshape(-1, c, *a.shape[1:])))
        return out

    nd_rolls, nd_probs = chunks(ROLLS[nd_mask], PROBS[nd_mask])
    dd_dies, dd_probs, dd_small = chunks(
        ROLLS[~nd_mask][:, 0], PROBS[~nd_mask], SMALL_DOUBLE[~nd_mask]
    )

    init = (
        jnp.zeros(batch_shape, jnp.float32),
        jnp.zeros(batch_shape, bool),
    )

    def per_nd(carry, xs):
        total, flg = carry
        rolls_c, probs_c = xs  # [C, 2], [C]
        dice = jnp.broadcast_to(
            rolls_c[:, None, None, :], (c, *batch_shape, 2)
        )
        hi = jnp.maximum(rolls_c[:, 0], rolls_c[:, 1]) - 1  # [C] die index
        lo = jnp.minimum(rolls_c[:, 0], rolls_c[:, 1]) - 1
        lead = (slice(None),) + (None,) * len(batch_shape)
        d_hi = jnp.broadcast_to((hi + 1)[lead], (c, *batch_shape))
        d_lo = jnp.broadcast_to((lo + 1)[lead], (c, *batch_shape))
        pa = movegen2._run_pass_pre(
            take_die(s1_all, hi), take_die(b1_all, hi), opp_k[None], d_lo,
            ctx=take_die(ctx_all, lo),
        )
        pb = movegen2._run_pass_pre(
            take_die(s1_all, lo), take_die(b1_all, lo), opp_k[None], d_hi,
            ctx=take_die(ctx_all, hi),
        )
        if cfg.twoply.value_first_m:
            raw = movegen2.enumerate_nondoubles_raw_batched(
                bc, opp_k[None], dice, mg.a_max, passes=(pa, pb)
            )
            t, ix = score_raw(raw, probs_c)
            return (total + t, flg | ix), None
        ms = movegen2.enumerate_nondoubles_batched(
            bc, opp_k[None], dice, mg, passes=(pa, pb)
        )
        no_cap = jnp.zeros((c,), bool)
        return (total + score_moveset(ms, probs_c, no_cap), flg), None

    def per_dd(carry, xs):
        total, flg = carry
        dies_c, probs_c, small_c = xs
        die = jnp.broadcast_to(dies_c[:, None, None], (c, *batch_shape))
        ms = movegen2.enumerate_doubles_batched(
            bc, opp_k[None], die, mg, s1=take_die(s1_all, dies_c - 1)
        )
        return (total + score_moveset(ms, probs_c, small_c), flg), None

    (total, flags), _ = jax.lax.scan(per_nd, init, (nd_rolls, nd_probs))
    (total, flags), _ = jax.lax.scan(
        per_dd, (total, flags), (dd_dies, dd_probs, dd_small)
    )
    return (total, flags) if return_flags else total


def _wor_unrolled(
    params, boards, opp: jax.Array, cfg: Config, mg: MoveGenConfig, topn, cap
) -> Tuple[jax.Array, jax.Array]:
    """Unrolled-roll variant of weighted_opponent_response (see
    TwoPlyConfig.unroll_rolls): the 15 non-double + 6 double reply
    evaluations emit as one flat program — XLA overlaps independent rolls'
    fusions instead of serializing them through a lax.scan carry — with the
    SAME per-roll math and the same accumulation order (score contributions
    add in ROLLS order), so results are bit-identical to the scan path at
    equal widths (tests/test_twoply_unroll.py).

    When TwoPlyConfig.dd_reply_widths is set, each double's enumeration
    runs at its own static widths; truncation beyond them surfaces through
    the returned inexact flag (OR of the narrow MoveSet.overflow)."""
    from mlp_ppo_2ply_multi_tpu.engine import movegen2

    opp_k = opp[..., None]
    batch_shape = boards.batch_shape

    def score_one(ms, prob: float, cap_active: bool) -> jax.Array:
        with jax.named_scope("score"):
            valid = ms.valid
            if cap_active:
                rank = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
                valid = valid & (rank <= cap)
            v = oriented_values(params, ms.boards, opp_k[..., None], cfg)
            v = jnp.where(valid, v, _NEG)
            top, _ = topk_small(v, topn)
            present = top > _NEG / 2
            n = jnp.maximum(jnp.sum(present.astype(jnp.float32), axis=-1), 1.0)
            avg = jnp.sum(jnp.where(present, top, 0.0), axis=-1) / n
            has_reply = jnp.any(valid, axis=-1)
            return jnp.where(has_reply, avg * prob, 0.0)

    s1_all, b1_all = movegen2.die_tables(boards, opp_k)
    ctx_all = movegen2.die_ctxs(boards, opp_k)
    # die-independent mover-side stats of each first-die child set, computed
    # once instead of per (first-die, second-die) pair (10 slot_valid calls
    # per set across the 15 nd rolls recompute them otherwise)
    from mlp_ppo_2ply_multi_tpu.engine.movegen import slot_stats

    stats_all = slot_stats(b1_all, opp_k[None, ..., None])
    at = lambda t, i: jax.tree.map(lambda a: a[i], t)
    # NEGATIVE (round 4): precomputing all 30 (first-die, second-die)
    # s2_valid grids in ONE batched slot_valid_stats call ([30,B,K,27,27],
    # ~90MB) measured ~4ms/step SLOWER than the per-roll recompute below —
    # the HBM materialization + per-roll reads lose to XLA fusing the
    # (cheap) stats->valid combine into each roll's consumers.
    # _run_pass_pre(s2_valid=...) remains for future experiments.

    total = jnp.zeros(batch_shape, jnp.float32)
    flags = jnp.zeros(batch_shape, bool)
    # all 15 non-doubles first, then the 6 doubles — the same accumulation
    # order as the scan path, so the f32 total is bit-identical to it
    order = sorted(range(len(ROLLS)), key=lambda i: ROLLS[i, 0] == ROLLS[i, 1])
    nd_pos = 0
    for i in order:
        (r0, r1), prob = ROLLS[i].tolist(), float(PROBS[i])
        if r0 != r1:
            hi, lo = max(r0, r1), min(r0, r1)
            d_hi = jnp.full(batch_shape, hi, jnp.int32)
            d_lo = jnp.full(batch_shape, lo, jnp.int32)
            with jax.named_scope("ndpass"):
                pa = movegen2._run_pass_pre(
                    at(s1_all, hi - 1), at(b1_all, hi - 1), opp_k, d_lo,
                    ctx=at(ctx_all, lo - 1), stats=at(stats_all, hi - 1),
                )
                pb = movegen2._run_pass_pre(
                    at(s1_all, lo - 1), at(b1_all, lo - 1), opp_k, d_hi,
                    ctx=at(ctx_all, hi - 1), stats=at(stats_all, lo - 1),
                )
            dice = jnp.broadcast_to(
                jnp.asarray([r0, r1], jnp.int32), (*batch_shape, 2)
            )
            if cfg.twoply.nd_reply_widths:
                k = cfg.twoply.nd_reply_widths[nd_pos]
                mgr = dataclasses.replace(mg, nd_dedup_k=k, a_max=k)
            else:
                mgr = mg
            nd_pos += 1
            with jax.named_scope(f"nd{hi}{lo}"):
                ms = movegen2.enumerate_nondoubles_batched(
                    boards, opp_k, dice, mgr, passes=(pa, pb)
                )
                total = total + score_one(ms, prob, False)
            if cfg.twoply.nd_reply_widths and ms.overflow is not None:
                flags = flags | ms.overflow
        else:
            if cfg.twoply.dd_reply_widths:
                w2, w3, w4, am = cfg.twoply.dd_reply_widths[r0 - 1]
                mgd = dataclasses.replace(
                    mg, w2=w2, w3=w3, w4=w4, a_max=am,
                    nd_dedup_k=min(mg.nd_dedup_k, am),
                )
            else:
                mgd = mg
            die = jnp.full(batch_shape, r0, jnp.int32)
            with jax.named_scope(f"dd{r0}"):
                ms = movegen2.enumerate_doubles_batched(
                    boards, opp_k, die, mgd, s1=at(s1_all, r0 - 1)
                )
                total = total + score_one(ms, prob, r0 <= 3)
            if cfg.twoply.dd_reply_widths and ms.overflow is not None:
                flags = flags | ms.overflow
    return total, flags


def select_action_2ply(
    params,
    state: vec_env.EnvState,
    moves: MoveSet,
    key: jax.Array,
    temperature: jax.Array,
    cfg: Config,
) -> Tuple[jax.Array, jax.Array]:
    """2-ply move selection: softmax(score/T) over the reranked top-k
    candidates where >= k legal moves exist, 1-ply softmax(V/T) otherwise
    (two_ply.py:153-193). Returns (action, v_obs)."""
    k = cfg.twoply.top_k_candidates
    v_obs = value_net.forward(
        params, encode_board(state.board, state.player), cfg.model
    )
    v_moves = oriented_values(params, moves.boards, state.player[..., None], cfg)
    v_masked = jnp.where(moves.valid, v_moves, _NEG)

    topv, topi = topk_small(v_masked, k)  # [B, k]
    top_valid = jnp.take_along_axis(moves.valid, topi, axis=-1)
    cand_boards = board_take(moves.boards, topi)

    w_o = weighted_opponent_response(params, cand_boards, 1 - state.player, cfg)
    scores = cfg.twoply.alpha * topv - cfg.twoply.beta * w_o
    k_2ply, k_1ply = jax.random.split(key)
    logits2 = jnp.where(top_valid, scores / temperature, _NEG)
    pick = jax.random.categorical(k_2ply, logits2, axis=-1)
    action_2ply = jnp.take_along_axis(topi, pick[..., None], axis=-1)[..., 0]

    logits1 = jnp.where(moves.valid, v_masked / temperature, _NEG)
    action_1ply = jax.random.categorical(k_1ply, logits1, axis=-1)

    use_2ply = moves.count >= k
    return jnp.where(use_2ply, action_2ply, action_1ply), v_obs
