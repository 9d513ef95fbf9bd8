"""Fixed-shape, batched full-move enumeration.

The reference enumerates moves with recursive python over immutable boards
(/root/reference/src/backgammon/moves/generate_all_moves.py,
handle_move_types.py, get_moves_one_die.py). Here the same *semantics* —
including enumeration order, the shared dedup set, the reverse-order skip, the
forced-shorter-sequence rules for doubles and the must-use-max-dice filter
(SURVEY.md §7.1 Q6/Q7) — are realized as static-shape tensor programs:

* A 27-slot single-die move table (24 point origins + bar entry + farthest
  bear-off + exact-point bear-off). Slot index order equals the reference's
  per-state emission order, so "slot order" == "reference enumeration order".
* Non-doubles: two passes of a 27x27 (first x second submove) candidate
  table plus 27 single-move fallbacks per pass; 1512 candidates total per
  board, deduped by incremental board hash with first-occurrence-kept order.
* Doubles: level-wise frontier expansion with per-level dedup. Because two
  DFS prefixes reaching the same intermediate board have identical subtrees,
  merging them (keeping the minimum DFS rank) preserves the first-occurrence
  order of every final board — see enumerate_doubles.

Key hardware-driven design choices: candidate boards are never materialized
during search (only 2x32-bit incremental hashes); dedup is sort-based
(O(n log n) per board); all shapes static so XLA maps everything onto the
VPU/MXU without host round-trips.

Known (documented) divergence from the reference: cross-*level* dedup of
"forced shorter" doubles sequences is not applied (the reference's shared
set could in principle let an earlier short of different length shadow a
later one); reachable only in no-4-sequence doubles positions where two
forced chains of different length produce identical boards — not observed
over millions of random differential tests.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.core.types import BAR, BEAR_OFF, NUM_POINTS
from mlp_ppo_2ply_multi_tpu.engine.board import (
    Board,
    apply_submove,
    board_hash,
    board_state_kind,
    opponent_points,
    player_points,
    submove_hash_delta,
)

N_SLOTS = 27
_INF32 = jnp.int32(0x7FFFFFFF)


class SlotTable(NamedTuple):
    """Per-slot single-die submoves for a board batch; arrays [..., 27]."""

    start: jax.Array  # int32, 0..23 or 24 (bar)
    end: jax.Array  # int32, 0..23 or 25 (bear-off)
    hits: jax.Array  # bool
    valid: jax.Array  # bool


class MoveSet(NamedTuple):
    """Enumerated legal full moves as afterstates; entry axis is the last
    batch axis of ``boards``."""

    boards: Board  # afterstates, batch [..., A]
    valid: jax.Array  # bool[..., A]
    count: jax.Array  # int32[...]
    # bool[...] — True where ANY candidate was dropped by a fixed-shape width
    # cap this call (nd_dedup_k / doubles level widths / a_max Q7 cap /
    # dd sub-batch). Surfaces the silent-truncation failure class SURVEY §5.3
    # flags; aggregated per update as the width_overflow_count metric. None
    # from engines that don't track it (the sorted engine enumerates at full
    # reference widths).
    overflow: jax.Array = None


def _shift_by_die(arr: jax.Array, d8: jax.Array, sign8: jax.Array) -> jax.Array:
    """out[..., i] = arr[..., i + d*sign] (0 outside), for d in 1..6.

    TPU lane-gathers with row-varying indices run at ~100MB/s (measured); a
    die-indexed shift is 12 static slices + selects on the VPU instead.
    """
    pad = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(6, 6)])
    out = jnp.zeros_like(arr)
    pos = (sign8 > 0)[..., None]
    for dd in range(1, 7):
        m = (d8 == dd)[..., None]
        fwd = pad[..., 6 + dd : 6 + dd + NUM_POINTS]
        bwd = pad[..., 6 - dd : 6 - dd + NUM_POINTS]
        out = jnp.where(m & pos, fwd, out)
        out = jnp.where(m & ~pos, bwd, out)
    return out


def _at_static_lane(arr: jax.Array, idx: jax.Array, candidates) -> jax.Array:
    """arr[..., idx] where idx takes one of a few static values: a
    select-chain over static lane reads instead of a dynamic gather.

    MEASURED (round 4): a one-hot lane REDUCE looks cleaner in the HLO
    (removes ~230 tiny relayout copies per 2-ply step) but costs the 1-ply
    production bench 32% (492k -> 334k env-steps/s at B=4096) — the int
    reduce over the padded 128-lane axis is far more VPU work than the
    12-candidate select-chain, and the copies it removed were
    schedule-absorbed anyway. Keep the chain."""
    out = jnp.zeros(arr.shape[:-1], arr.dtype)
    for c in candidates:
        out = jnp.where(idx == c, arr[..., c], out)
    return out


def slot_table(board: Board, player: jax.Array, die: jax.Array) -> SlotTable:
    """Single-die moves (reference get_moves_one_die.py:13-251) as a fixed
    27-slot table. Slot order == reference emission order:
      0..23  normal move from point i (NORMAL and BEAR_OFF states)
      24     bar entry (ON_BAR state)
      25     farthest-checker bear-off
      26     exact-point bear-off

    Gather-free: every die-dependent lookup is a static-shift select
    (_shift_by_die) or a static-lane select chain.
    """
    bs = board.batch_shape
    p8 = jnp.broadcast_to(player.astype(jnp.int8), bs)
    d8 = jnp.broadcast_to(die.astype(jnp.int8), bs)
    p = p8.astype(jnp.int32)
    d = d8.astype(jnp.int32)
    sign8 = (1 - 2 * p8).astype(jnp.int8)
    own = player_points(board, player)  # int8 [..., 24]
    opp = opponent_points(board, player)
    kind = board_state_kind(board, player)  # int8[...]

    iota8 = jnp.arange(NUM_POINTS, dtype=jnp.int8)
    dest8 = iota8 + (d8 * sign8)[..., None]  # [..., 24]
    in_board = (dest8 >= 0) & (dest8 < NUM_POINTS)
    dest_c = jnp.clip(dest8, 0, NUM_POINTS - 1)
    opp_at_dest = _shift_by_die(opp, d8, sign8)
    normal_ok = (
        ((kind == 0) | (kind == 2))[..., None]
        & (own > 0)
        & in_board
        & (opp_at_dest < 2)
    )
    normal_hits = in_board & (opp_at_dest == 1)

    # slot 24: bar entry (get_moves_one_die.py:86-130)
    entry8 = jnp.where(p8 == 0, d8 - 1, NUM_POINTS - d8).astype(jnp.int8)
    opp_at_entry = _at_static_lane(
        opp, entry8, list(range(0, 6)) + list(range(18, 24))
    )
    bar_ok = (kind == 1) & (opp_at_entry < 2)
    bar_hits = opp_at_entry == 1

    # farthest occupied home point (get_moves_one_die.py:191-203); defaults to
    # the first home point when the home board is empty, like the reference.
    occ1 = own[..., 18:24] > 0
    last_p1 = 18 + jnp.argmax(occ1, axis=-1).astype(jnp.int8)
    occ2 = own[..., 0:6] > 0
    last_p2 = 5 - jnp.argmax(occ2[..., ::-1], axis=-1).astype(jnp.int8)
    last8 = jnp.where(p8 == 0, last_p1, last_p2)
    last = last8.astype(jnp.int32)

    # slot 25: overshoot bear-off of the farthest checker (:206-214, :229-236)
    over_ok = (kind == 2) & jnp.where(
        p8 == 0, last8 + d8 >= NUM_POINTS, last8 - d8 < 0
    )
    # slot 26: exact-point bear-off (:216-227, :238-249)
    exact8 = jnp.where(p8 == 0, NUM_POINTS - d8, d8 - 1).astype(jnp.int8)
    own_at_exact = _at_static_lane(
        own, exact8, list(range(0, 6)) + list(range(18, 24))
    )
    exact_ok = (kind == 2) & (exact8 != last8) & (own_at_exact > 0)
    dest_c = dest_c.astype(jnp.int32)
    entry = entry8.astype(jnp.int32)
    exact = exact8.astype(jnp.int32)
    iota = jnp.arange(NUM_POINTS, dtype=jnp.int32)

    start = jnp.concatenate(
        [
            jnp.broadcast_to(iota, (*dest_c.shape[:-1], NUM_POINTS)),
            jnp.broadcast_to(jnp.int32(BAR), (*dest_c.shape[:-1], 1)),
            last[..., None],
            exact[..., None],
        ],
        axis=-1,
    )
    end = jnp.concatenate(
        [
            dest_c,
            entry[..., None],
            jnp.broadcast_to(jnp.int32(BEAR_OFF), (*dest_c.shape[:-1], 2)),
        ],
        axis=-1,
    )
    hits = jnp.concatenate(
        [
            normal_hits,
            bar_hits[..., None],
            jnp.zeros((*dest_c.shape[:-1], 2), dtype=bool),
        ],
        axis=-1,
    )
    valid = jnp.concatenate(
        [normal_ok, bar_ok[..., None], over_ok[..., None], exact_ok[..., None]],
        axis=-1,
    )
    return SlotTable(start=start, end=end, hits=hits, valid=valid)


class SlotCtx(NamedTuple):
    """Opponent-side single-die context, computed once on a turn's ROOT
    board and reused for every board reachable from it within the turn.

    Validity argument: during a turn the mover's submoves change only the
    mover's own material, except hits — and a hit only removes an opponent
    BLOT (count 1 -> 0, plus opponent bar +1, which never enters the mover's
    legality tests). A 1 -> 0 transition cannot flip any of the reference's
    `>= 2`-checkers blocking tests (get_moves_one_die.py:56-66, :98-118), and
    destination geometry is a pure function of (die, player). So the
    opponent-side half of the 27-slot table is a turn-level invariant; only
    the mover-side half (occupancy, state kind, farthest/exact points)
    changes per expanded board. Hits are NOT part of the context — callers
    that need hit bits recompute them per selected submove (slot_params).
    """

    move_ok: jax.Array  # bool[..., 24]: dest in-board and not blocked
    entry_free: jax.Array  # bool[...]: bar-entry point not blocked


def slot_ctx(board: Board, player: jax.Array, die: jax.Array) -> SlotCtx:
    """Build the SlotCtx for ``board`` as the turn's root (see SlotCtx)."""
    bs = board.batch_shape
    p8 = jnp.broadcast_to(player.astype(jnp.int8), bs)
    d8 = jnp.broadcast_to(die.astype(jnp.int8), bs)
    sign8 = (1 - 2 * p8).astype(jnp.int8)
    opp = opponent_points(board, player)
    iota8 = jnp.arange(NUM_POINTS, dtype=jnp.int8)
    dest8 = iota8 + (d8 * sign8)[..., None]
    in_board = (dest8 >= 0) & (dest8 < NUM_POINTS)
    opp_at_dest = _shift_by_die(opp, d8, sign8)
    entry8 = jnp.where(p8 == 0, d8 - 1, NUM_POINTS - d8).astype(jnp.int8)
    opp_at_entry = _at_static_lane(
        opp, entry8, list(range(0, 6)) + list(range(18, 24))
    )
    return SlotCtx(
        move_ok=in_board & (opp_at_dest < 2), entry_free=opp_at_entry < 2
    )


def ctx_entry_axis(ctx: SlotCtx) -> SlotCtx:
    """Broadcast a root-batch SlotCtx against boards carrying one extra
    trailing entry axis (children / frontier entries of that root)."""
    return SlotCtx(
        move_ok=ctx.move_ok[..., None, :], entry_free=ctx.entry_free[..., None]
    )


class SlotStats(NamedTuple):
    """Die-INDEPENDENT mover-side board statistics consumed by slot_valid:
    computing them once per board and combining with several dice
    (slot_valid_stats) removes the dominant recomputation when the same
    child set is tested against many dice — the 2-ply scorer tests each
    first-die child set against 5 second dice (10 slot_valid calls per set
    across the 15 non-double rolls)."""

    own: jax.Array  # int8[..., 24]
    kind: jax.Array  # int8[...]
    last8: jax.Array  # int8[...] farthest occupied home point


def slot_stats(board: Board, player: jax.Array) -> SlotStats:
    return SlotStats(
        own=player_points(board, player),
        kind=board_state_kind(board, player),
        last8=farthest_point(board, player),
    )


def slot_valid_stats(
    stats: SlotStats, player: jax.Array, die: jax.Array, ctx: SlotCtx
) -> Tuple[jax.Array, jax.Array]:
    """slot_valid from precomputed SlotStats (see slot_valid)."""
    bs = stats.kind.shape
    p8 = jnp.broadcast_to(player.astype(jnp.int8), bs)
    d8 = jnp.broadcast_to(die.astype(jnp.int8), bs)
    own, kind, last8 = stats.own, stats.kind, stats.last8

    normal_ok = ((kind == 0) | (kind == 2))[..., None] & (own > 0) & ctx.move_ok
    bar_ok = (kind == 1) & ctx.entry_free

    over_ok = (kind == 2) & jnp.where(
        p8 == 0, last8 + d8 >= NUM_POINTS, last8 - d8 < 0
    )
    exact8 = jnp.where(p8 == 0, NUM_POINTS - d8, d8 - 1).astype(jnp.int8)
    own_at_exact = _at_static_lane(
        own, exact8, list(range(0, 6)) + list(range(18, 24))
    )
    exact_ok = (kind == 2) & (exact8 != last8) & (own_at_exact > 0)
    valid = jnp.concatenate(
        [normal_ok, bar_ok[..., None], over_ok[..., None], exact_ok[..., None]],
        axis=-1,
    )
    return valid, last8


def slot_valid(
    board: Board, player: jax.Array, die: jax.Array, ctx: SlotCtx
) -> Tuple[jax.Array, jax.Array]:
    """Validity bits of ``slot_table(board, player, die).valid`` with the
    opponent-side tests supplied by a SlotCtx built on the turn's root —
    bit-exact for any board reachable from that root within the turn, at a
    fraction of the cost (no per-board die shifts or opponent lane reads).

    Returns (valid bool[..., 27], last8 int8[...] — the farthest occupied
    home point, which slot-rank computations need for slot 25).
    """
    return slot_valid_stats(slot_stats(board, player), player, die, ctx)


def farthest_point(board: Board, player: jax.Array) -> jax.Array:
    """Farthest occupied home point (get_moves_one_die.py:191-203); defaults
    to the first home point when the home board is empty."""
    own = player_points(board, player)
    p8 = jnp.broadcast_to(player.astype(jnp.int8), board.batch_shape)
    occ1 = own[..., 18:24] > 0
    last_p1 = 18 + jnp.argmax(occ1, axis=-1).astype(jnp.int8)
    occ2 = own[..., 0:6] > 0
    last_p2 = 5 - jnp.argmax(occ2[..., ::-1], axis=-1).astype(jnp.int8)
    return jnp.where(p8 == 0, last_p1, last_p2)


def slot_params(
    board: Board, player: jax.Array, die: jax.Array, slot: jax.Array
):
    """(start, end, hits) of the submove named by ``slot`` on per-row boards.

    Reconstructs slot-table entries arithmetically for already-validated
    slots instead of gathering four parallel [.., 27] tables (TPU lane-
    gathers measured ~20ms per call at batch 4096x512; this is pure VPU
    arithmetic + one one-hot reduce for the blot check). ``board``'s batch
    shape must equal slot's shape (row-gathered parent boards).
    """
    p8 = jnp.broadcast_to(player.astype(jnp.int8), slot.shape)
    d8 = jnp.broadcast_to(die.astype(jnp.int8), slot.shape)
    sign8 = (1 - 2 * p8).astype(jnp.int8)
    s8 = slot.astype(jnp.int8)

    last8 = farthest_point(board, player)
    exact8 = jnp.where(p8 == 0, NUM_POINTS - d8, d8 - 1).astype(jnp.int8)
    entry8 = jnp.where(p8 == 0, d8 - 1, NUM_POINTS - d8).astype(jnp.int8)

    start8 = jnp.where(
        s8 < 24, s8, jnp.where(s8 == 24, jnp.int8(BAR), jnp.where(s8 == 25, last8, exact8))
    )
    end_normal = jnp.clip(s8 + d8 * sign8, 0, NUM_POINTS - 1)
    end8 = jnp.where(
        s8 < 24, end_normal, jnp.where(s8 == 24, entry8, jnp.int8(BEAR_OFF))
    )
    # blot check via one-hot reduce (no gather)
    opp = opponent_points(board, player)  # [..., 24]
    iota8 = jnp.arange(NUM_POINTS, dtype=jnp.int8)
    opp_at_end = jnp.sum(
        jnp.where(end8[..., None] == iota8, opp, 0).astype(jnp.int32), axis=-1
    )
    hits = (end8 != BEAR_OFF) & (opp_at_end == 1)
    return start8.astype(jnp.int32), end8.astype(jnp.int32), hits


# ---------------------------------------------------------------------------
# board batch helpers
# ---------------------------------------------------------------------------

def board_expand(b: Board, n: int) -> Board:
    """Insert a broadcast entry axis of size n as the last batch axis."""
    bs = b.batch_shape
    return Board(data=jnp.broadcast_to(b.data[..., None, :], (*bs, n, b.data.shape[-1])))


def board_take(b: Board, idx: jax.Array) -> Board:
    """Gather along the entry axis (last batch axis); idx int[..., K].
    A contiguous row gather in the flat board layout — DMA-friendly."""
    return Board(data=jnp.take_along_axis(b.data, idx[..., None], axis=-2))


def _take_int8() -> bool:
    """One-hot board takes as int8 x int8 -> int32 MXU dots (v5e int8 peak
    is 2x bf16): measured 2.16ms vs the bf16 einsum's 3.23ms for
    [4096,128,128]x[4096,128,52] (scripts/probe_pallas_batched_dot.py,
    round 5) and the int8 selector stream is half the bf16 one's bytes.
    Exact either way — each output sums exactly one product of ints <= 15.
    MLP_TAKE_INT8=0 restores the bf16 path (read at trace time) for A/Bs."""
    import os

    return os.environ.get("MLP_TAKE_INT8", "1") != "0"


def _take_einsum(oh: jax.Array, data: jax.Array) -> jax.Array:
    if _take_int8():
        out = jnp.einsum(
            "...kw,...wc->...kc",
            oh.astype(jnp.int8),
            data,
            preferred_element_type=jnp.int32,
        )
        return out.astype(jnp.int8)
    out = jnp.einsum(
        "...kw,...wc->...kc",
        oh.astype(jnp.bfloat16),
        data.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    return out.astype(jnp.int8)


def board_take_onehot(b: Board, idx: jax.Array) -> Board:
    """board_take via a one-hot matmul on the MXU.

    TPU row gathers measured 18-80ms at [4096, 512] scale; the equivalent
    einsum with a one-hot selector runs in well under 1ms for entry-table
    widths up to a few hundred (dtype/exactness notes: _take_int8)."""
    w = b.data.shape[-2]
    oh = idx[..., None] == jnp.arange(w, dtype=jnp.int32)
    return Board(data=_take_einsum(oh, b.data))


def board_take_oh(b: Board, oh: jax.Array) -> Board:
    """board_take_onehot with a caller-supplied one-hot selector
    bool[..., K, W] (e.g. the boundary-block one-hot already computed by a
    blocked set-bit select) so the selector is built once."""
    return Board(data=_take_einsum(oh, b.data))


def board_where(pred: jax.Array, a: Board, b: Board) -> Board:
    """Per-entry select; pred bool[..., K] aligned with entry axis."""
    return Board(data=jnp.where(pred[..., None], a.data, b.data))


def _delta_over_slots(b: Board, player: jax.Array, st: SlotTable):
    """Hash deltas for every slot; board batch [...], slots [..., S]."""
    fn = lambda s, e, h: submove_hash_delta(b, player, s, e, h)
    return jax.vmap(fn, in_axes=(-1, -1, -1), out_axes=-1)(st.start, st.end, st.hits)


def _take_st(st: SlotTable, idx: jax.Array) -> SlotTable:
    t = lambda a: jnp.take_along_axis(a, idx, axis=-1)
    return SlotTable(start=t(st.start), end=t(st.end), hits=t(st.hits), valid=t(st.valid))


# ---------------------------------------------------------------------------
# sort-based first-occurrence dedup + rank-order compaction
# ---------------------------------------------------------------------------

def _shift_right(a: jax.Array, fill) -> jax.Array:
    pad = jnp.full((*a.shape[:-1], 1), fill, dtype=a.dtype)
    return jnp.concatenate([pad, a[..., :-1]], axis=-1)


def _segmented_min_to_group_first(values: jax.Array, first: jax.Array) -> jax.Array:
    """Given group-contiguous ``values`` with ``first`` marking each group's
    first element, return for every position the min over [pos..group end]
    (so at group-first positions: the group minimum). Right-to-left segmented
    min via associative scan."""
    # In reversed order, a group *starts* where the forward group *ends*:
    # forward end[i] = first[i+1] (or i == n-1).
    nxt_first = jnp.concatenate(
        [first[..., 1:], jnp.ones((*first.shape[:-1], 1), dtype=bool)], axis=-1
    )
    rv = values[..., ::-1]
    rb = nxt_first[..., ::-1]

    def combine(left, right):
        lv, lf = left
        rv_, rf = right
        return jnp.where(rf, rv_, jnp.minimum(lv, rv_)), lf | rf

    out, _ = jax.lax.associative_scan(combine, (rv, rb), axis=-1)
    return out[..., ::-1]


def dedup_compact(
    h1: jax.Array,
    h2: jax.Array,
    valid: jax.Array,
    width: int,
    flag_rank: Optional[jax.Array] = None,
):
    """First-occurrence dedup over the candidate axis (last) + compaction.

    Candidates are implicitly ranked by their index (index order must equal
    reference enumeration order). Returns, for ``width`` output slots in rank
    order: (orig_idx, out_valid, merged_flag_rank or None).

    Mirrors add_unique_board (reference handle_move_types.py:196-221): the
    earliest candidate of each distinct (h1, h2) survives; later duplicates
    are dropped. ``flag_rank`` values (int32, INF when absent) are min-merged
    across each duplicate group onto the surviving candidate — used by the
    doubles forced-shorter-sequence bookkeeping.
    """
    n = h1.shape[-1]
    inval = (~valid).astype(jnp.uint8)
    # jnp.lexsort is stable, so equal (inval, h1, h2) groups keep ascending
    # original order without an explicit index key — one fewer sort operand
    # over the hot path's widest arrays.
    perm = jnp.lexsort((h2, h1, inval), axis=-1)
    take = lambda a: jnp.take_along_axis(a, perm, axis=-1)
    v_s, h1_s, h2_s = take(valid), take(h1), take(h2)

    same_prev = (
        (h1_s == _shift_right(h1_s, 0))
        & (h2_s == _shift_right(h2_s, 0))
        & _shift_right(v_s, False)
    )
    idx0 = jnp.arange(n, dtype=jnp.int32)
    is_first = v_s & ((idx0 == 0) | ~same_prev)

    mfr_s = None
    if flag_rank is not None:
        fr_s = take(flag_rank)
        mfr_s = _segmented_min_to_group_first(fr_s, is_first)

    # compact keepers in rank (= original index) order
    rank_s = perm.astype(jnp.int32)
    key = jnp.where(is_first, rank_s, _INF32)
    perm2 = jnp.argsort(key, axis=-1)[..., :width]
    g = lambda a: jnp.take_along_axis(a, perm2, axis=-1)
    out_idx = g(rank_s)
    out_valid = g(is_first)
    out_mfr = g(mfr_s) if mfr_s is not None else None
    return out_idx, out_valid, out_mfr


# ---------------------------------------------------------------------------
# Non-doubles (reference generate_all_moves.py:25-53 + handle_move_types.py:7-81)
# ---------------------------------------------------------------------------

# Static candidate layout: [pass-A pairs (729) | pass-A singles (27) |
#                           pass-B pairs (729) | pass-B singles (27)]
_N_ND = 2 * (N_SLOTS * N_SLOTS + N_SLOTS)
_c = np.arange(_N_ND)
_CAND_PASS = (_c >= N_SLOTS * N_SLOTS + N_SLOTS).astype(np.int32)
_off = _c - _CAND_PASS * (N_SLOTS * N_SLOTS + N_SLOTS)
_is_pair = _off < N_SLOTS * N_SLOTS
_CAND_I = np.where(_is_pair, _off // N_SLOTS, _off - N_SLOTS * N_SLOTS).astype(np.int32)
_CAND_J = np.where(_is_pair, _off % N_SLOTS, -1).astype(np.int32)
_CAND_LEN2 = _is_pair.copy()


def _nondoubles_pass(board: Board, player: jax.Array, d_first, d_second, h0):
    """One ordering pass: returns per-pass tables.

    s1: first-ply slots on ``board``; b1: the 27 first-ply afterstates;
    s2: second-ply slots per afterstate [..., 27, 27]; hashes for both plies.
    """
    s1 = slot_table(board, player, d_first)
    b27 = board_expand(board, N_SLOTS)
    p27 = player[..., None]
    b1 = apply_submove(b27, p27, s1.start, s1.end, s1.hits, s1.valid)
    d1_1, d1_2 = _delta_over_slots(board, player, s1)
    h1_1 = h0[0][..., None] + d1_1
    h1_2 = h0[1][..., None] + d1_2

    s2 = slot_table(b1, p27, d_second[..., None])  # [..., 27, 27]
    d2_1, d2_2 = _delta_over_slots(b1, p27, s2)
    hp_1 = h1_1[..., None] + d2_1
    hp_2 = h1_2[..., None] + d2_2

    pair_valid = s1.valid[..., None] & s2.valid
    any_pair = jnp.any(pair_valid, axis=(-1, -2))
    single_valid = s1.valid & ~any_pair[..., None]
    return s1, b1, s2, (h1_1, h1_2), (hp_1, hp_2), pair_valid, any_pair, single_valid


def _unique_count_upto2(h1, h2, valid):
    """Number of distinct (h1,h2) among valid entries, saturated logic only
    needing the ==1 test (27 entries -> O(27^2) compare is cheapest)."""
    eq = (h1[..., None, :] == h1[..., :, None]) & (h2[..., None, :] == h2[..., :, None])
    earlier = jnp.tril(jnp.ones((h1.shape[-1], h1.shape[-1]), dtype=bool), k=-1)
    # [..., i(row), j(col)]: an earlier (j < i) equal valid entry exists
    dup = jnp.any(eq & earlier & valid[..., None, :], axis=-1)
    uniq = valid & ~dup
    return jnp.sum(uniq.astype(jnp.int32), axis=-1)


def enumerate_nondoubles(
    board: Board, player: jax.Array, dice: jax.Array, cfg: MoveGenConfig
) -> MoveSet:
    """Full non-doubles enumeration (reference generate_all_moves.py:25-53).

    Pass A runs high-die-first, pass B low-die-first; pass B is skipped iff
    pass A produced exactly one unique move consisting of one submove
    (:40-50). Candidates are deduped across both passes through one shared
    set in insertion order, then the max-submove filter (:69-90) and the
    presented-action cap (backgammon_env.py:262-272) apply.
    """
    d_hi = jnp.maximum(dice[..., 0], dice[..., 1]).astype(jnp.int32)
    d_lo = jnp.minimum(dice[..., 0], dice[..., 1]).astype(jnp.int32)
    h0 = board_hash(board)

    sA1, bA1, sA2, hA1, hAp, pvA, anyA, svA = _nondoubles_pass(
        board, player, d_hi, d_lo, h0
    )
    sB1, bB1, sB2, hB1, hBp, pvB, anyB, svB = _nondoubles_pass(
        board, player, d_lo, d_hi, h0
    )

    uniq_singles_a = _unique_count_upto2(hA1[0], hA1[1], svA)
    skip_b = (~anyA) & (uniq_singles_a == 1)

    pvB = pvB & ~skip_b[..., None, None]
    svB = svB & ~skip_b[..., None]
    anyB_eff = jnp.any(pvB, axis=(-1, -2))

    # must-use-both-dice filter
    any_pair = anyA | anyB_eff
    svA = svA & ~any_pair[..., None]
    svB = svB & ~any_pair[..., None]

    def flat2(a):
        return a.reshape(*a.shape[:-2], N_SLOTS * N_SLOTS)

    valid = jnp.concatenate([flat2(pvA), svA, flat2(pvB), svB], axis=-1)
    ch1 = jnp.concatenate([flat2(hAp[0]), hA1[0], flat2(hBp[0]), hB1[0]], axis=-1)
    ch2 = jnp.concatenate([flat2(hAp[1]), hA1[1], flat2(hBp[1]), hB1[1]], axis=-1)

    out_idx, out_valid, _ = dedup_compact(ch1, ch2, valid, cfg.a_max)

    # Reconstruct the A-max afterstate boards for surviving candidates.
    cpass = jnp.take(jnp.asarray(_CAND_PASS), out_idx)
    ci = jnp.take(jnp.asarray(_CAND_I), out_idx)
    cj = jnp.take(jnp.asarray(_CAND_J), out_idx)

    firstA = board_take(bA1, ci)
    firstB = board_take(bB1, ci)
    first = board_where(cpass == 0, firstA, firstB)

    def flat_st(st: SlotTable) -> SlotTable:
        return SlotTable(
            start=flat2(st.start), end=flat2(st.end), hits=flat2(st.hits), valid=flat2(st.valid)
        )

    sA2f, sB2f = flat_st(sA2), flat_st(sB2)
    lin = jnp.clip(ci * N_SLOTS + jnp.maximum(cj, 0), 0, N_SLOTS * N_SLOTS - 1)
    stA = _take_st(sA2f, lin)
    stB = _take_st(sB2f, lin)
    sel = lambda a, b: jnp.where(cpass == 0, a, b)
    st2 = SlotTable(
        start=sel(stA.start, stB.start),
        end=sel(stA.end, stB.end),
        hits=sel(stA.hits, stB.hits),
        valid=sel(stA.valid, stB.valid) & (cj >= 0) & out_valid,
    )
    after = apply_submove(first, player[..., None], st2.start, st2.end, st2.hits, st2.valid)
    count = jnp.sum(out_valid.astype(jnp.int32), axis=-1)
    return MoveSet(boards=after, valid=out_valid, count=count)


# ---------------------------------------------------------------------------
# Doubles (reference handle_move_types.py:84-193)
# ---------------------------------------------------------------------------

class _Frontier(NamedTuple):
    boards: Board  # [..., W]
    h1: jax.Array
    h2: jax.Array
    rank: jax.Array  # int32, global DFS order key at this level
    valid: jax.Array
    flag_rank: jax.Array  # int32; rank of the earliest only-child DFS prefix
    # reaching this board, INF when none (drives forced-shorter recording)


class _Shorts(NamedTuple):
    boards: Board
    rank: jax.Array  # record position = flag_rank of the entry
    valid: jax.Array


def _expand_level(
    front: _Frontier, player: jax.Array, die: jax.Array, out_width: int
) -> Tuple[_Frontier, _Shorts]:
    """Expand a frontier one submove deeper; also emit this level's
    forced-shorter records (entries with zero children whose own submove was
    the only option at its depth — handle_move_types.py:117-129 etc.)."""
    w = front.valid.shape[-1]
    pw = player[..., None]
    dw = die[..., None]
    st = slot_table(front.boards, pw, dw)  # [..., W, 27]
    child_valid = front.valid[..., None] & st.valid
    pcc = jnp.sum(child_valid.astype(jnp.int32), axis=-1)  # [..., W]

    shorts = _Shorts(
        boards=front.boards,
        rank=front.flag_rank,
        valid=front.valid & (pcc == 0) & (front.flag_rank < _INF32),
    )

    d1, d2 = _delta_over_slots(front.boards, pw, st)
    ch1 = front.h1[..., None] + d1
    ch2 = front.h2[..., None] + d2
    # flattened child index == DFS rank at this level (frontier is rank-sorted)
    n = w * N_SLOTS
    child_rank = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), (*front.valid.shape[:-1], n)
    )
    child_flag = (pcc == 1)[..., None] & child_valid
    flat = lambda a: a.reshape(*a.shape[:-2], n)
    cv = flat(child_valid)
    cf1, cf2 = flat(ch1), flat(ch2)
    cfr = jnp.where(flat(child_flag), child_rank, _INF32)

    out_idx, out_valid, out_mfr = dedup_compact(cf1, cf2, cv, out_width, flag_rank=cfr)

    parent = out_idx // N_SLOTS
    slot = out_idx % N_SLOTS
    pboards = board_take(front.boards, parent)
    stg = _take_st(
        SlotTable(start=flat(st.start), end=flat(st.end), hits=flat(st.hits), valid=flat(st.valid)),
        out_idx,
    )
    nboards = apply_submove(
        pboards, player[..., None], stg.start, stg.end, stg.hits, stg.valid & out_valid
    )
    gh1 = jnp.take_along_axis(cf1, out_idx, axis=-1)
    gh2 = jnp.take_along_axis(cf2, out_idx, axis=-1)
    nf = _Frontier(
        boards=nboards,
        h1=gh1,
        h2=gh2,
        rank=out_idx,
        valid=out_valid,
        flag_rank=out_mfr,
    )
    return nf, shorts


def enumerate_doubles(
    board: Board, player: jax.Array, die: jax.Array, cfg: MoveGenConfig
) -> MoveSet:
    """Doubles enumeration via dedup-merged level-wise DFS.

    Correctness of order preservation: the reference's DFS visits candidate
    submoves in slot order at each depth, so the visit order of length-k
    prefixes is lexicographic in their slot paths. If two prefixes reach the
    same board, the entire subtree of the earlier one precedes the later
    one's, and both subtrees generate identical board sets — so merging
    duplicates while keeping the earliest rank preserves every final board's
    first-occurrence position (the reference's insertion order,
    handle_move_types.py:196-221).

    Forced-shorter sequences (:117-129,:140-152,:165-177) are recorded when a
    frontier entry has zero children and was its parent's only child; the
    reference's ``full_move_of_length_4_possible`` latch plus the final
    max-submove filter reduce to: use level-4 boards when any exist, else the
    deepest non-empty level of forced records (see SURVEY.md Q6b).
    """
    h0_1, h0_2 = board_hash(board)
    s1 = slot_table(board, player, die)
    root_count = jnp.sum(s1.valid.astype(jnp.int32), axis=-1)

    # level-1 frontier: compact valid slots in slot order (boards at level 1
    # are automatically distinct — no two slots yield the same board).
    slots = jnp.arange(N_SLOTS, dtype=jnp.int32)
    key = jnp.where(s1.valid, slots, _INF32)
    perm = jnp.argsort(key, axis=-1)[..., : cfg.w1]
    st1 = _take_st(s1, perm)
    f_valid = jnp.take_along_axis(s1.valid, perm, axis=-1)
    b1 = apply_submove(
        board_take(board_expand(board, N_SLOTS), perm),
        player[..., None],
        st1.start,
        st1.end,
        st1.hits,
        st1.valid & f_valid,
    )
    d1, d2 = _delta_over_slots(board, player, s1)
    rank1 = jnp.take_along_axis(key, perm, axis=-1)  # == slot idx where valid
    h1_1 = h0_1[..., None] + jnp.take_along_axis(d1, perm, axis=-1)
    h1_2 = h0_2[..., None] + jnp.take_along_axis(d2, perm, axis=-1)
    only = (root_count == 1)[..., None] & f_valid
    front = _Frontier(
        boards=b1,
        h1=h1_1,
        h2=h1_2,
        rank=jnp.where(f_valid, rank1, _INF32),
        valid=f_valid,
        flag_rank=jnp.where(only, rank1, _INF32),
    )

    front2, shorts1 = _expand_level(front, player, die, cfg.w2)
    front3, shorts2 = _expand_level(front2, player, die, cfg.w3)
    front4, shorts3 = _expand_level(front3, player, die, cfg.w4)

    has4 = jnp.any(front4.valid, axis=-1)
    a3 = jnp.any(shorts3.valid, axis=-1)
    a2 = jnp.any(shorts2.valid, axis=-1)

    a_max = cfg.a_max

    def shorts_to_set(sh: _Shorts, use: jax.Array) -> MoveSet:
        v = sh.valid & use[..., None]
        key_s = jnp.where(v, sh.rank, _INF32)
        p = jnp.argsort(key_s, axis=-1)
        bs = board_take(sh.boards, p)
        vs = jnp.take_along_axis(v, p, axis=-1)
        return MoveSet(boards=bs, valid=vs, count=jnp.sum(vs.astype(jnp.int32), -1))

    # select: level-4 frontier if any, else deepest forced-record level
    use3 = (~has4) & a3
    use2 = (~has4) & ~a3 & a2
    use1 = (~has4) & ~a3 & ~a2
    m4 = MoveSet(
        boards=front4.boards,
        valid=front4.valid & has4[..., None],
        count=jnp.sum(front4.valid.astype(jnp.int32), -1),
    )
    m3 = shorts_to_set(shorts3, use3)
    m2 = shorts_to_set(shorts2, use2)
    m1 = shorts_to_set(shorts1, use1)

    def pad_to(ms: MoveSet, width: int) -> MoveSet:
        cur = ms.valid.shape[-1]
        if cur >= width:
            return MoveSet(
                boards=board_take(
                    ms.boards,
                    jnp.broadcast_to(
                        jnp.arange(width, dtype=jnp.int32), (*ms.valid.shape[:-1], width)
                    ),
                ),
                valid=ms.valid[..., :width],
                count=jnp.minimum(ms.count, width),
            )
        idx = jnp.broadcast_to(
            jnp.arange(width, dtype=jnp.int32) % cur, (*ms.valid.shape[:-1], width)
        )
        pad_valid = jnp.concatenate(
            [ms.valid, jnp.zeros((*ms.valid.shape[:-1], width - cur), bool)], axis=-1
        )
        return MoveSet(boards=board_take(ms.boards, idx), valid=pad_valid, count=ms.count)

    m4p, m3p, m2p, m1p = (pad_to(m, a_max) for m in (m4, m3, m2, m1))

    def merge(a: MoveSet, b: MoveSet, use_a: jax.Array) -> MoveSet:
        return MoveSet(
            boards=board_where(
                jnp.broadcast_to(use_a[..., None], a.valid.shape), a.boards, b.boards
            ),
            valid=jnp.where(use_a[..., None], a.valid, b.valid),
            count=jnp.where(use_a, a.count, b.count),
        )

    out = merge(m4p, m3p, has4)
    out = merge(out, m2p, has4 | use3)
    out = merge(out, m1p, has4 | use3 | use2)
    out = MoveSet(
        boards=out.boards,
        valid=out.valid,
        count=jnp.minimum(out.count, a_max),
    )
    return out


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def legal_moves(
    board: Board, player: jax.Array, dice: jax.Array, cfg: MoveGenConfig
) -> MoveSet:
    """All legal full moves per game as afterstate boards, capped at
    cfg.a_max (env 500-cap, Q7). Dispatches on cfg.algo: "canonical" is the
    sortless fast engine (movegen2), "sorted" this module's exact
    reference-order engine."""
    if cfg.algo == "canonical":
        from mlp_ppo_2ply_multi_tpu.engine import movegen2

        return movegen2.legal_moves(board, player, dice, cfg)
    is_double = dice[..., 0] == dice[..., 1]

    nd = enumerate_nondoubles(board, player, dice, cfg)
    dd = enumerate_doubles(board, player, dice[..., 0].astype(jnp.int32), cfg)

    pred = jnp.broadcast_to(is_double[..., None], nd.valid.shape)
    return MoveSet(
        boards=board_where(pred, dd.boards, nd.boards),
        valid=jnp.where(pred, dd.valid, nd.valid),
        count=jnp.where(is_double, dd.count, nd.count),
    )
