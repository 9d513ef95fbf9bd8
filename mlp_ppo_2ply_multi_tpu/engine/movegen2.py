"""Sortless full-move enumeration (the fast engine, algo="canonical").

The sort-based engine (movegen.py) reproduces the reference's insertion order
exactly but spends its time in wide multi-key sorts — measured at ~475ms per
call at batch 256 on TPU v5e, with XLA compile times that explode with batch
size. This engine produces the same move SETS with zero sorts, built from ops
measured at ~0.03ms each (gathers, cumsums, batched binary search):

* Non-doubles (exact reference order and dedup semantics,
  generate_all_moves.py:25-53): all 1512 candidate cells (pass-A pairs,
  pass-A singles, pass-B pairs, pass-B singles — index order == reference
  insertion order) carry incremental board hashes. The valid ones are
  compacted (cumsum + batched binary search, no sort) into nd_dedup_k slots
  preserving order, then a pairwise O(K^2) "equal to any earlier candidate"
  comparison reproduces the reference's shared seen-set exactly — including
  its quirky sequencing where dedup runs BEFORE the max-submove filter (a
  pass-B pair whose board equals an earlier pass-A single is dropped as a
  duplicate, which can leave a 1-submove move as the only survivor). A
  pairwise pass is used instead of analytic duplicate patterns because
  same-board collisions are richer than transpose/chain symmetry: e.g. the
  vacate-refill "leapfrog" (6->8, 8->9*) == (7->9*, 6->7).

* Doubles (canonical order; same SET as the reference, handle_move_types.py:
  84-193): a full move's afterstate is determined by the MULTISET of
  (start, end) submoves — with one die value, by the multiset of origins
  (count-delta telescoping is injective). Enumerating only canonical
  sequences whose submove ranks are nondecreasing — rank = direction-adjusted
  start position, bar entries first, bear-offs after same-origin normal
  moves — visits every multiset exactly once, so there are no duplicates to
  remove, ever. Availability and slot dynamics (farthest-checker, all-home
  gating) are evaluated on the frontier board, and a canonical realization is
  always legal because prerequisites (bar entries, arrivals feeding later
  departures, home-filling before bear-off) always carry lower ranks.
  Enumeration order for player 1 matches the reference's DFS order; for
  player 2 the canonical order differs (the reference scans origins 0..23 for
  both players, canonical follows travel direction) — sets are identical,
  presented indices may differ (SURVEY.md Q6 ledger; tests compare sets).

Forced-shorter doubles sequences (reference :117-129 semantics): a canonical
frontier entry is recorded at length k < 4 iff it has no legal continuation at
all (full slot table empty — order-independent) and the submove that created
it was its parent's only legal child in the FULL (unconstrained) expansion.
The reference's path-dependent variant can record a few more shorts when a
non-canonical path happens to be forced; divergence is reachable only in
no-4-sequence positions and is tested empirically against the oracle.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.core.types import BAR, BEAR_OFF, NUM_POINTS
from mlp_ppo_2ply_multi_tpu.engine.board import (
    Board,
    apply_submove,
    pack_board,
)
from mlp_ppo_2ply_multi_tpu.engine.movegen import (
    MoveSet,
    _take_int8,
    N_SLOTS,
    SlotCtx,
    SlotTable,
    board_expand,
    board_take_oh,
    board_take_onehot,
    board_where,
    ctx_entry_axis,
    farthest_point,
    slot_ctx,
    slot_params,
    slot_table,
    slot_valid,
)

_INF32 = jnp.int32(0x7FFFFFFF)


def _popcount(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


def _select_set_bits(valid: jax.Array, width: int) -> Tuple[jax.Array, jax.Array]:
    """Indices of the first ``width`` True positions per row, in order.

    Returns (idx int32[..., width] clipped in-range, ok bool[..., width]).
    Sortless: idx[k] = #(i : cs[i] <= k) — a fused compare+reduce, measured
    ~8ms at [4096, 1512] x 576 on v5e (binary-search variants lower to
    sequential scans on TPU and are ~30x slower).
    """
    cs = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    total = cs[..., -1]
    ks = jnp.arange(width, dtype=jnp.int32)
    idx = jnp.sum(
        (cs[..., :, None] <= ks).astype(jnp.int32), axis=-2, dtype=jnp.int32
    )
    ok = ks < total[..., None]
    return jnp.minimum(idx, cs.shape[-1] - 1), ok


def _select_set_bits_blocked(
    valid2: jax.Array, width: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Two-level k-th-set-bit select over a [..., NB, BLOCK] blocked mask.

    Equivalent to ``_select_set_bits(valid2.reshape(..., NB*BLOCK), width)``
    with the flat index decomposed as ``blk * BLOCK + loc``, but the
    irreducible width x n compare-reduce (the VPU hot spot of the flat
    version, ~8ms at [4096, 1512] x 384) is restructured:

      * boundary-block search:  width x NB int compares (n/BLOCK of the work)
      * per-block local ranks:  NB x BLOCK x BLOCK, values <= BLOCK
      * the width x NB x BLOCK product runs as a one-hot einsum on the MXU —
        exact, since local cumsums <= BLOCK and one-hot rows have a single
        nonzero (f32 accumulation)

    Returns (blk int32[..., width], loc int32[..., width], ok bool, and the
    boundary-block one-hot bool[..., width, NB] — callers that gather
    per-parent data (boards, flags) can reuse it instead of building their
    own selector).
    """
    nb, block = valid2.shape[-2], valid2.shape[-1]
    # the [.., NB, BLOCK] grids stay int8 (local counts <= BLOCK <= 54):
    # they are the widest streams of this select and int32 quadruples them
    vi = valid2.astype(jnp.int8)
    c = jnp.sum(vi, axis=-1, dtype=jnp.int32)  # [..., NB]
    cum = jnp.cumsum(c, axis=-1)  # inclusive
    total = cum[..., -1]
    ks = jnp.arange(width, dtype=jnp.int32)
    if nb >= 48 and nb % 8 == 0:
        # two-level boundary search: the [.., width, NB] compare+reduce for
        # (blk, start) is the VPU bulk of this select at dd level-4 shapes
        # ([1024, 224, 27] -> 448: ~2 x 100M int ops). Grouping the NB axis
        # into G groups of S replaces it with [.., width, G] + [.., width, S]
        # compares plus two tiny one-hot f32 einsums (exact: every count
        # fits f32 integers, one nonzero per product row).
        S = 16 if nb % 16 == 0 else 8
        G = nb // S
        cgrp = c.reshape(*c.shape[:-1], G, S)
        cg = jnp.sum(cgrp, axis=-1)  # [..., G]
        cumg = jnp.cumsum(cg, axis=-1)
        le_g = cumg[..., None, :] <= ks[..., :, None]  # [..., width, G]
        grp = jnp.minimum(jnp.sum(le_g.astype(jnp.int32), axis=-1), G - 1)
        # rank offset of the boundary GROUP: sum of whole groups before it
        start_g = jnp.sum(jnp.where(le_g, cg[..., None, :], 0), axis=-1)
        oh_g = (grp[..., None] == jnp.arange(G, dtype=jnp.int32))
        cumin = jnp.cumsum(cgrp, axis=-1)  # [..., G, S]
        ohf = oh_g.astype(jnp.float32)
        sel_cumin = jnp.einsum("...kg,...gs->...ks", ohf, cumin.astype(jnp.float32))
        sel_cin = jnp.einsum("...kg,...gs->...ks", ohf, cgrp.astype(jnp.float32))
        r2 = (ks - start_g).astype(jnp.float32)[..., None]
        le_s = sel_cumin <= r2  # [..., width, S]
        blk_loc = jnp.minimum(jnp.sum(le_s.astype(jnp.int32), axis=-1), S - 1)
        blk = grp * S + blk_loc
        start = start_g + jnp.sum(
            jnp.where(le_s, sel_cin, 0.0), axis=-1
        ).astype(jnp.int32)
    else:
        blk = jnp.sum((cum[..., :, None] <= ks).astype(jnp.int32), axis=-2)
        blk = jnp.minimum(blk, nb - 1)
        start = jnp.sum(
            jnp.where(
                blk[..., None] == jnp.arange(nb, dtype=jnp.int32),
                (cum - c)[..., None, :],
                0,
            ),
            axis=-1,
        )  # rank offset of the boundary block
    oh_b = blk[..., None] == jnp.arange(nb, dtype=jnp.int32)  # [..., width, NB]
    r = ks - start  # local rank within the boundary block
    lcs = jnp.cumsum(vi, axis=-1)  # int8[..., NB, BLOCK], values <= BLOCK
    if _take_int8():
        # int8 x int8 -> int32 MXU dot (exact: one nonzero per output, local
        # cumsums <= BLOCK <= 54): halves both operand streams and replaces
        # the f32 [..., width, BLOCK] product + f32 compare of the bf16
        # version (movegen._take_int8 has the measured A/B and the switch)
        sel_lcs = jnp.einsum(
            "...kb,...bj->...kj",
            oh_b.astype(jnp.int8),
            lcs,
            preferred_element_type=jnp.int32,
        )
        loc = jnp.sum((sel_lcs <= r[..., None]).astype(jnp.int32), axis=-1)
        loc = jnp.minimum(loc, block - 1)
        ok = ks < total[..., None]
        return blk, loc, ok, oh_b
    sel_lcs = jnp.einsum(
        "...kb,...bj->...kj",
        oh_b.astype(jnp.bfloat16),
        lcs.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    loc = jnp.sum((sel_lcs <= r[..., None].astype(jnp.float32)).astype(jnp.int32), axis=-1)
    loc = jnp.minimum(loc, block - 1)
    ok = ks < total[..., None]
    return blk, loc, ok, oh_b


_BLOCK_OF = {}  # n -> block size (divisor near sqrt(n)), memoized


def _pick_block(n: int) -> int:
    if n not in _BLOCK_OF:
        root = int(np.sqrt(n))
        cands = [b for b in range(max(2, root // 3), min(n, root * 3) + 1) if n % b == 0]
        _BLOCK_OF[n] = min(cands, key=lambda b: abs(b - root)) if cands else 0
    return _BLOCK_OF[n]


def _select_set_bits_fast(valid: jax.Array, width: int) -> Tuple[jax.Array, jax.Array]:
    """Drop-in _select_set_bits that uses the blocked path when the flat
    width factors nicely and is big enough to matter."""
    n = valid.shape[-1]
    block = _pick_block(n)
    if n < 256 or block == 0:
        return _select_set_bits(valid, width)
    v2 = valid.reshape(*valid.shape[:-1], n // block, block)
    blk, loc, ok, _ = _select_set_bits_blocked(v2, width)
    return jnp.minimum(blk * block + loc, n - 1), ok


# ---------------------------------------------------------------------------
# Non-doubles
# ---------------------------------------------------------------------------

# Candidate layout (identical to movegen.py's): [A pairs 729 | A singles 27 |
# B pairs 729 | B singles 27] — index order IS reference insertion order.
_N_ND = 2 * (N_SLOTS * N_SLOTS + N_SLOTS)
_c = np.arange(_N_ND)
_CAND_PASS = (_c >= N_SLOTS * N_SLOTS + N_SLOTS).astype(np.int32)
_off = _c - _CAND_PASS * (N_SLOTS * N_SLOTS + N_SLOTS)
_is_pair = _off < N_SLOTS * N_SLOTS
_CAND_I = np.where(_is_pair, _off // N_SLOTS, _off - N_SLOTS * N_SLOTS).astype(np.int32)
_CAND_J = np.where(_is_pair, _off % N_SLOTS, -1).astype(np.int32)


class _Pass(NamedTuple):
    s1: SlotTable  # first-ply slots on the root board
    b1: Board  # 27 first-ply afterstates
    s2_valid: jax.Array  # second-ply slot validity per afterstate [..., 27, 27]
    pair_valid: jax.Array
    any_pair: jax.Array
    single_valid: jax.Array


def _run_pass_pre(
    s1: SlotTable, b1: Board, player, d_second, ctx: SlotCtx = None,
    stats=None, s2_valid=None,
) -> _Pass:
    """Pass from a precomputed first-die slot table + children (die_tables).

    The second-ply table is needed only for VALIDITY (the tail rebuilds
    submove params arithmetically on selected cells), so with a root SlotCtx
    for ``d_second`` it runs as the cheap mover-side-only slot_valid; without
    one it falls back to the full slot_table. ``stats`` additionally supplies
    the children's die-independent SlotStats (movegen.slot_stats) so callers
    that test the SAME child set against several second dice — the 2-ply
    scorer — pay for them once."""
    from mlp_ppo_2ply_multi_tpu.engine.movegen import slot_valid_stats

    p27 = player[..., None]
    if s2_valid is not None:
        pass  # caller supplies the grid (batched across rolls upstream)
    elif stats is not None:
        assert ctx is not None
        s2_valid, _ = slot_valid_stats(
            stats, p27, d_second[..., None], ctx_entry_axis(ctx)
        )
    elif ctx is None:
        s2_valid = slot_table(b1, p27, d_second[..., None]).valid
    else:
        s2_valid, _ = slot_valid(b1, p27, d_second[..., None], ctx_entry_axis(ctx))
    pair_valid = s1.valid[..., None] & s2_valid
    any_pair = jnp.any(pair_valid, axis=(-1, -2))
    single_valid = s1.valid & ~any_pair[..., None]
    return _Pass(s1, b1, s2_valid, pair_valid, any_pair, single_valid)


def _run_pass(board: Board, player, d_first, d_second) -> _Pass:
    s1 = slot_table(board, player, d_first)
    b27 = board_expand(board, N_SLOTS)
    p27 = player[..., None]
    b1 = apply_submove(b27, p27, s1.start, s1.end, s1.hits, s1.valid)
    return _run_pass_pre(
        s1, b1, player, d_second, ctx=slot_ctx(board, player, d_second)
    )


def die_tables(board: Board, player: jax.Array) -> Tuple[SlotTable, Board]:
    """First-ply slot tables and children boards for ALL SIX die values in
    one batched pass: SlotTable fields [6, ..., 27], children [6, ..., 27].

    The 2-ply scorer evaluates 15 fixed non-double rolls per decision; naive
    per-roll enumeration recomputes the first die's single-die expansion 30
    times (15 rolls x 2 pass orders) when only 6 distinct (die -> slot table,
    children) results exist. Computing them once and gathering per roll
    removes 24/30 of the first-ply expansion work (PERF.md round 2)."""
    dies = jnp.arange(1, 7, dtype=jnp.int32)
    bs = board.batch_shape
    b6 = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (6, *a.shape)), board)
    p6 = jnp.broadcast_to(player, (6, *bs))
    d6 = jnp.broadcast_to(dies.reshape(6, *([1] * len(bs))), (6, *bs))
    s1 = slot_table(b6, p6, d6)
    b27 = board_expand(b6, N_SLOTS)
    b1 = apply_submove(b27, p6[..., None], s1.start, s1.end, s1.hits, s1.valid)
    return s1, b1


def die_ctxs(board: Board, player: jax.Array) -> SlotCtx:
    """Root SlotCtx for ALL SIX die values, fields stacked on a leading [6]
    axis (companion of die_tables; the 2-ply scorer gathers per-roll second
    dies from it instead of rebuilding opponent-side context per roll)."""
    dies = jnp.arange(1, 7, dtype=jnp.int32)
    bs = board.batch_shape
    b6 = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (6, *a.shape)), board)
    p6 = jnp.broadcast_to(player, (6, *bs))
    d6 = jnp.broadcast_to(dies.reshape(6, *([1] * len(bs))), (6, *bs))
    return slot_ctx(b6, p6, d6)


_SIG_SENT = jnp.int32(31)  # sorts after every real cell id (0..25)


def _submove_sig(s1, e1, h1, s2, e2, h2, is_pair) -> jax.Array:
    """Canonical afterstate signature of a 1- or 2-submove candidate, packed
    into one int32: signature equality <=> afterstate equality (on a shared
    root board). The afterstate is root + (net mover cell-delta multiset) +
    (hit-cell multiset: opp -1 there, opp bar +1 each), and both multisets
    are computed here in canonical (sorted, sentinel-padded) form:

    * mover delta: cells {s1-, e1+, s2-, e2+}. A cell appearing as both a
      start and an end cancels; same-direction movement makes s1==e1,
      s2==e2, and (s1==e2 & s2==e1) impossible, so the only cancellations
      are s2==e1 (chain: the second submove continues from the first's
      endpoint cell) and s1==e2 (refill: the second lands on the vacated
      origin) — never both. This collapses chains/leapfrogs/bear-off
      collapses to their net delta with no pattern analysis: the docstring's
      leapfrog (6->8, 8->9*) == (7->9*, 6->7) both canonicalize to
      minus{6} plus{9} hits{9}.
    * hits: recorded at e1/e2 when flagged, independent of cancellation (a
      chained-through hit still removes the blot).

    Layout: 6 five-bit lanes (minus-lo, minus-hi, plus-lo, plus-hi, hit-lo,
    hit-hi), sentinel 31 = absent; 30 bits total.
    """
    pair = is_pair
    cancel1 = pair & (s1 == e2)
    cancel2 = pair & (s2 == e1)
    both = pair & ~cancel1 & ~cancel2
    m1 = jnp.where(cancel1, s2, s1)
    m2 = jnp.where(both, s2, _SIG_SENT)
    p1 = jnp.where(cancel2, e2, e1)
    p2 = jnp.where(both, e2, _SIG_SENT)
    t1 = jnp.where(h1, e1, _SIG_SENT)
    t2 = jnp.where(pair & h2, e2, _SIG_SENT)
    mlo, mhi = jnp.minimum(m1, m2), jnp.maximum(m1, m2)
    plo, phi = jnp.minimum(p1, p2), jnp.maximum(p1, p2)
    tlo, thi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
    sig = mlo
    for lane in (mhi, plo, phi, tlo, thi):
        sig = sig * 32 + lane
    return sig


def _dup_earlier_sig(sig: jax.Array, ok: jax.Array) -> jax.Array:
    """dup[i] = exists valid j < i with identical signature — the signature
    form of _dup_earlier_mask (no board packing, no Gram matmul)."""
    k = sig.shape[-1]
    eq = sig[..., :, None] == sig[..., None, :]
    earlier = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    return jnp.any(eq & earlier & ok[..., None, :], axis=-1)


def _nd_tail_front(
    b0: Board,
    b1a: Board,
    b1b: Board,
    valid: jax.Array,
    player: jax.Array,
    d_hi: jax.Array,
    d_lo: jax.Array,
    K: int,
) -> Tuple[Board, jax.Array, jax.Array, jax.Array]:
    """Compaction half of the non-doubles tail: select the first K valid
    candidate cells in insertion order and materialize their afterstates.
    Returns (afterstates [..., K], kok presence mask, kpair "is a 2-submove
    move" mask, canonical delta signature int32[..., K]) — no dedup, no
    max-submove filter, no Q7 cap. ``b0`` is the root board (first-submove
    params are recomputed on it for the signature)."""
    valid2 = valid.reshape(*valid.shape[:-1], 2 * (N_SLOTS + 1), N_SLOTS)
    blk, loc, kok, _ = _select_set_bits_blocked(valid2, K)
    cpass = (blk >= N_SLOTS + 1).astype(jnp.int32)
    bb = blk - cpass * (N_SLOTS + 1)
    is_pair = bb < N_SLOTS
    ci = jnp.where(is_pair, bb, loc)
    cj = jnp.where(is_pair, loc, -1)

    # one take over the concatenated [.., 54, 52] child table instead of a
    # take per pass + a full-width board_where merge: same selection, one
    # fewer [.., K, 52] einsum + materialization per nd roll
    b1cat = Board(data=jnp.concatenate([b1a.data, b1b.data], axis=-2))
    first = board_take_onehot(b1cat, ci + cpass * N_SLOTS)

    # second-submove parameters recomputed arithmetically on the gathered
    # first-ply boards; compacted cells are valid by construction, so the
    # application mask is just kok & "is a pair".
    d_second = jnp.where(cpass == 0, d_lo[..., None], d_hi[..., None])
    s2, e2, h2 = slot_params(first, player[..., None], d_second, jnp.maximum(cj, 0))
    app = kok & (cj >= 0)
    after = apply_submove(first, player[..., None], s2, e2, h2, app)

    # first-submove params on the (broadcast) root board -> delta signature
    d_first = jnp.where(cpass == 0, d_hi[..., None], d_lo[..., None])
    s1, e1, h1 = slot_params(
        board_expand(b0, K), player[..., None], d_first, ci
    )
    sig = _submove_sig(s1, e1, h1, s2, e2, h2, app)
    return after, kok, cj >= 0, sig


def _nd_tail(
    b0: Board,
    b1a: Board,
    b1b: Board,
    valid: jax.Array,
    player: jax.Array,
    d_hi: jax.Array,
    d_lo: jax.Array,
    K: int,
    a_max: int,
    sig_dedup: bool = True,
) -> Tuple[Board, jax.Array, jax.Array]:
    """The width-K back half of non-doubles enumeration: compact the valid
    candidate cells, materialize afterstates, first-occurrence dedup,
    max-submove filter, Q7 cap. Exact for any game whose pre-dedup candidate
    count is <= K. Returns (afterstates [..., K], keep mask, pre-cap survivor
    total)."""
    after, kok, kpair, sig = _nd_tail_front(
        b0, b1a, b1b, valid, player, d_hi, d_lo, K
    )

    # First-occurrence dedup — the reference's shared seen-set
    # (handle_move_types.py:196-221) — by exact pairwise afterstate equality:
    # canonical delta signatures (MoveGenConfig.nd_sig_dedup) or the board
    # Gram fallback.
    if sig_dedup:
        dup = _dup_earlier_sig(sig, kok)
    else:
        dup = _dup_earlier_mask(pack_board(after), kok)
    keep = kok & ~dup

    # max-submove filter AFTER dedup (generate_all_moves.py:69-90): if any
    # surviving candidate is a 2-submove pair, all singles drop.
    has_pair = jnp.any(keep & kpair, axis=-1)
    keep = keep & (kpair | ~has_pair[..., None])

    # Q7 cap in survivor-rank order, but NO final compaction gather (a
    # [4096, 512]-row gather measured 82ms): the move set keeps width K with
    # a non-contiguous valid mask.
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=-1)
    pre_cap_total = rank[..., -1]
    keep = keep & (rank <= a_max)
    return after, keep, pre_cap_total


def _dup_earlier_mask(packed: jax.Array, ok: jax.Array) -> jax.Array:
    """dup[i] = exists valid j < i with identical board.

    Exact pairwise equality via a Gram matrix on the MXU: boards are small
    nonnegative integer vectors (counts <= 15), so squared distances computed
    with bf16 inputs and f32 accumulation are exact (products <= 225 and sums
    <= 11700 are exactly representable).
    """
    k = packed.shape[-2]
    x = packed.astype(jnp.bfloat16)
    g = jnp.einsum("...ic,...jc->...ij", x, x, preferred_element_type=jnp.float32)
    n = jnp.sum(packed.astype(jnp.float32) ** 2, axis=-1)
    d2 = n[..., :, None] + n[..., None, :] - 2.0 * g
    earlier = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    return jnp.any((d2 <= 0.0) & earlier & ok[..., None, :], axis=-1)


def _nd_candidates(
    board: Board,
    player: jax.Array,
    dice: jax.Array,
    passes: Tuple[_Pass, _Pass] = None,
):
    """Front half of non-doubles enumeration: the two expansion passes and
    the 1512-cell candidate validity bits in exact reference insertion order
    (generate_all_moves.py:25-53), including the reverse-order skip
    (:40-50 — within-pass singles are always distinct, so "one unique single
    move" == popcount 1). Returns (pa, pb, valid, d_hi, d_lo)."""
    d_hi = jnp.maximum(dice[..., 0], dice[..., 1]).astype(jnp.int32)
    d_lo = jnp.minimum(dice[..., 0], dice[..., 1]).astype(jnp.int32)

    if passes is None:
        pa = _run_pass(board, player, d_hi, d_lo)
        pb = _run_pass(board, player, d_lo, d_hi)
    else:
        pa, pb = passes

    skip_b = (~pa.any_pair) & (_popcount(pa.single_valid) == 1)
    pvB = pb.pair_valid & ~skip_b[..., None, None]
    svB = pb.single_valid & ~skip_b[..., None]

    flat2 = lambda a: a.reshape(*a.shape[:-2], N_SLOTS * N_SLOTS)
    valid = jnp.concatenate(
        [flat2(pa.pair_valid), pa.single_valid, flat2(pvB), svB], axis=-1
    )
    return pa, pb, valid, d_hi, d_lo


class NdPlanes(NamedTuple):
    """Internals of the two-tier non-doubles tail, exposed so consumers can
    work on the NARROW planes directly (legal_moves_split) instead of the
    width-K reconstruction enumerate_nondoubles builds from them."""

    after_n: Board  # [n, T, 52] tier-1 afterstates (exact when n_pre <= T)
    keep_n: jax.Array  # [n, T]
    after_w: Board  # [wn, K, 52] full-width tail on the wide sub-batch
    keep_w: jax.Array  # [wn, K]
    in_sub: jax.Array  # [n] row's result lives in the wide plane
    slot: jax.Array  # [n] row index into the wide plane (clipped)
    overflow: jax.Array  # [n] truncation ledger (Q7 class)


def _nd_two_tier(
    board: Board,
    pa: _Pass,
    pb: _Pass,
    valid: jax.Array,
    player: jax.Array,
    d_hi: jax.Array,
    d_lo: jax.Array,
    cfg: MoveGenConfig,
) -> NdPlanes:
    """Two-tier tail (MoveGenConfig.nd_tier): every per-candidate-slot op
    of the tail — the width x n select, the one-hot board takes, the
    submove application, the O(K^2) dedup Gram, the filter cumsums —
    scales with K while the median decision has ~14 pre-dedup
    candidates and P(n_pre > 96) ~ 2-4% (PERF.md round 2). Tier 1 runs
    the whole tail at width T for every game, which is EXACT whenever
    n_pre <= T (all candidates present, identical order). Tier 2
    gathers the wide games into a batch/div sub-batch and runs the
    full-width tail there. A wide game beyond the sub-batch capacity
    keeps its tier-1 result (exact first-T prefix; its max-submove
    filter saw only the prefix) and is flagged via overflow — the same
    surfaced-truncation class as the Q7 cap."""
    K = cfg.nd_dedup_k
    T = cfg.nd_tier
    n_pre = _popcount(valid)
    n = valid.shape[0]
    with jax.named_scope("nd_tail_t1"):
        after_n, keep_n, pct_n = _nd_tail(
            board, pa.b1, pb.b1, valid, player, d_hi, d_lo, T, cfg.a_max,
            cfg.nd_sig_dedup,
        )
    wide = n_pre > T
    wn = max(8, n // cfg.nd_wide_div)
    sel, sel_ok = _select_set_bits(wide, wn)
    valid_w = jnp.take(valid, sel, axis=0) & sel_ok[:, None]
    with jax.named_scope("nd_tail_t2"):
        after_w, keep_w, pct_w = _nd_tail(
            _flat_take0(board, sel),
            _flat_take0(pa.b1, sel),
            _flat_take0(pb.b1, sel),
            valid_w,
            jnp.take(player, sel),
            jnp.take(d_hi, sel),
            jnp.take(d_lo, sel),
            K,
            cfg.a_max,
            cfg.nd_sig_dedup,
        )
    rank = jnp.cumsum(wide.astype(jnp.int32)) - 1
    in_sub = wide & (rank < wn)
    slot = jnp.clip(rank, 0, wn - 1)
    pct = jnp.where(in_sub, jnp.take(pct_w, slot), pct_n)
    dropped = wide & ~in_sub
    overflow = (in_sub & ((n_pre > K) | (pct > cfg.a_max))) | dropped
    return NdPlanes(after_n, keep_n, after_w, keep_w, in_sub, slot, overflow)


def enumerate_nondoubles(
    board: Board,
    player: jax.Array,
    dice: jax.Array,
    cfg: MoveGenConfig,
    passes: Tuple[_Pass, _Pass] = None,
) -> MoveSet:
    """Sortless non-doubles enumeration; exact reference order
    (generate_all_moves.py:25-53). ``passes`` supplies precomputed
    (high-first, low-first) passes built from shared die_tables (the 2-ply
    scorer's fixed-roll fan-out)."""
    with jax.named_scope("nd_front"):
        pa, pb, valid, d_hi, d_lo = _nd_candidates(board, player, dice, passes)

    # Back half: compact valid candidates (order preserved == insertion
    # order), materialize afterstates, dedup + filters. Candidate index ->
    # (pass, i, j) is closed-form arithmetic inside _nd_tail (table gathers
    # measured ~17ms each at B=4096). Blocked select over the natural 27-wide
    # structure: blocks 0..26 are pass-A pairs (block = first slot i, local =
    # second slot j), block 27 is pass-A singles (local = i), blocks 28..54
    # pass-B pairs, 55 B singles.
    K = cfg.nd_dedup_k
    n_pre = _popcount(valid)
    T = cfg.nd_tier

    if T and T < K and valid.ndim == 2:
        pl = _nd_two_tier(board, pa, pb, valid, player, d_hi, d_lo, cfg)
        pad = K - T
        after = board_where(
            pl.in_sub[:, None],
            _flat_take0(pl.after_w, pl.slot),
            Board(data=jnp.pad(pl.after_n.data, ((0, 0), (0, pad), (0, 0)))),
        )
        keep = jnp.where(
            pl.in_sub[:, None],
            jnp.take(pl.keep_w, pl.slot, axis=0),
            jnp.pad(pl.keep_n, ((0, 0), (0, pad))),
        )
        overflow = pl.overflow
    elif cfg.nd_tail_kernel and cfg.nd_sig_dedup and valid.ndim == 2:
        from mlp_ppo_2ply_multi_tpu.experimental.nd_tail import nd_tail_fused

        after_d, keep, n_pre_k, pct, _ = nd_tail_fused(
            valid,
            pa.b1.data,
            pb.b1.data,
            board.data,
            jnp.broadcast_to(player, board.batch_shape),
            jnp.broadcast_to(d_hi, board.batch_shape),
            jnp.broadcast_to(d_lo, board.batch_shape),
            K,
            cfg.a_max,
            interpret=jax.default_backend() == "cpu",
        )
        after = Board(data=after_d)
        overflow = (n_pre_k > K) | (pct > cfg.a_max)
    else:
        with jax.named_scope("nd_tail"):
            after, keep, pct = _nd_tail(
                board, pa.b1, pb.b1, valid, player, d_hi, d_lo, K, cfg.a_max,
                cfg.nd_sig_dedup,
            )
        # truncation observability: candidates lost to the dedup-slot cap or
        # the Q7 presented-action cap
        overflow = (n_pre > K) | (pct > cfg.a_max)
    return MoveSet(boards=after, valid=keep, count=_popcount(keep), overflow=overflow)


class RawMoves(NamedTuple):
    """Undeduped non-doubles afterstates for top-k-BY-VALUE consumers (the
    2-ply scorer): every valid candidate cell in insertion order — no
    first-occurrence dedup, no max-submove filter, no Q7 cap — plus the
    EXACT post-dedup ``has_pair`` bit those filters would have produced
    (closed form, nd_has_pair_exact). Duplicates carry bit-equal boards and
    therefore bit-equal values, so consumers that only need the top-N
    DISTINCT values can dedup after a top-M value select at M^2 cost instead
    of K^2."""

    boards: Board  # [..., K]
    valid: jax.Array  # bool[..., K] presence (insertion order)
    kpair: jax.Array  # bool[..., K] candidate is a 2-submove move
    has_pair: jax.Array  # bool[...] exact max-submove filter bit
    overflow: jax.Array  # bool[...] more than K pre-dedup candidates
    sig: jax.Array  # int32[..., K] canonical delta signature (_submove_sig)


def nd_has_pair_exact(pa: _Pass, pvB: jax.Array) -> jax.Array:
    """Exact "some 2-submove move survives the reference's first-occurrence
    dedup" — WITHOUT running the dedup. This is the bit the max-submove
    filter consumes (generate_all_moves.py:69-90 against the shared seen-set
    of handle_move_types.py:196-221). ``pvB`` is the skip-masked pass-B pair
    grid (reverse-order skip applied, generate_all_moves.py:40-50).

    Equal to ``any_pair_A | any(pvB)`` — i.e. dedup can never eliminate ALL
    pairs while leaving singles. Proof sketch:

    * Pass-A pairs are the earliest candidates in insertion order, so any
      valid one survives dedup (first occurrence).
    * A pass-B pair can be dropped only against an EARLIER equal board; with
      no A-pairs, the earlier candidates are exactly the pass-A singles. A
      2-submove board equals a 1-submove board only via a CHAINED BEAR-OFF:
      net cell deltas {i1-, e1+, i2-, e2+} collapse to a single's {s-, e+}
      only when e1 == i2 (same-direction movement excludes every other
      cancellation), an in-board chain moves d_lo + d_hi pips vs the
      single's d_hi (only a BEAR_OFF end absorbs the difference), and the
      matching single is then "bear off from s = i1 with d_hi" — which must
      itself be a valid, emitted pass-A single.
    * But such a collapse implies has_pair is already decided: the chain
      needs s -> s+d_lo open on the root, and the only A-single that removes
      the checker at s is that same bear-off (a normal hi-move from
      s = exact/farthest-overage origin leaves the board, and the two
      bear-off slots have distinct origins). So EVERY other A-single's child
      still contains s with s+d_lo open — an A-pair, contradicting "no
      A-pairs". Hence either the bear-off from s is the ONLY A-single (the
      reverse-order skip zeroes pass B entirely) or an A-pair exists. In the
      branch where any(pvB) matters, no B-pair can collapse.

    Validated against the oracle's actual move lists over random and
    constructed bear-off positions (tests/test_twoply_valuefirst.py).
    """
    return pa.any_pair | jnp.any(pvB, axis=(-1, -2))


def enumerate_nondoubles_raw(
    board: Board,
    player: jax.Array,
    dice: jax.Array,
    K: int,
    passes: Tuple[_Pass, _Pass] = None,
) -> RawMoves:
    """Non-doubles enumeration WITHOUT the dedup/filter/cap tail (see
    RawMoves); candidate order is still exact reference insertion order."""
    with jax.named_scope("nd_front"):
        pa, pb, valid, d_hi, d_lo = _nd_candidates(board, player, dice, passes)
    after, kok, kpair, sig = _nd_tail_front(
        board, pa.b1, pb.b1, valid, player, d_hi, d_lo, K
    )
    skip_b = (~pa.any_pair) & (_popcount(pa.single_valid) == 1)
    pvB = pb.pair_valid & ~skip_b[..., None, None]
    has_pair = nd_has_pair_exact(pa, pvB)
    return RawMoves(after, kok, kpair, has_pair, _popcount(valid) > K, sig)


def enumerate_nondoubles_raw_batched(
    board: Board,
    player: jax.Array,
    dice: jax.Array,
    K: int,
    passes: Tuple[_Pass, _Pass] = None,
) -> RawMoves:
    """enumerate_nondoubles_raw over an arbitrary batch shape (the 2-ply
    scorer's [chunk, ..., K-candidates] fan-out)."""
    bs = board.batch_shape
    n = int(np.prod(bs)) if bs else 1
    flat = lambda t: jax.tree.map(lambda a: a.reshape(n, *a.shape[len(bs):]), t)
    fb = flat(board)
    fp = jnp.broadcast_to(player, bs).reshape(n)
    fd = jnp.broadcast_to(dice, (*bs, 2)).reshape(n, 2)
    fpasses = None if passes is None else (flat(passes[0]), flat(passes[1]))
    raw = enumerate_nondoubles_raw(fb, fp, fd, K, fpasses)
    return RawMoves(
        boards=jax.tree.map(
            lambda x: x.reshape(*bs, K, *x.shape[2:]), raw.boards
        ),
        valid=raw.valid.reshape(*bs, K),
        kpair=raw.kpair.reshape(*bs, K),
        has_pair=raw.has_pair.reshape(bs),
        overflow=raw.overflow.reshape(bs),
        sig=raw.sig.reshape(*bs, K),
    )


# ---------------------------------------------------------------------------
# Doubles — canonical multiset enumeration
# ---------------------------------------------------------------------------

def _slot_rank(st: SlotTable, player: jax.Array) -> jax.Array:
    """Canonical rank per slot: direction-adjusted start position, doubled,
    +1 for bear-off slots (normal-before-bear-off at equal start); bar = -1
    (must always come first)."""
    pos = st.start  # 0..23 for normal/bear-off slots, 24 for bar
    p = player.astype(jnp.int32)
    while p.ndim < pos.ndim:
        p = p[..., None]
    adj = jnp.where(p == 0, pos, NUM_POINTS - 1 - pos)
    is_off = st.end == BEAR_OFF
    rank = 2 * adj + is_off.astype(jnp.int32)
    return jnp.where(st.start == BAR, -1, rank).astype(jnp.int8)


class _Frontier(NamedTuple):
    boards: Board  # [..., W]
    last_rank: jax.Array  # int32[..., W]
    only: jax.Array  # bool: arriving submove was parent's only full child
    valid: jax.Array


def _rank_lanes(last8: jax.Array, player: jax.Array, die: jax.Array) -> jax.Array:
    """Canonical rank per slot (same formula as _slot_rank) without a
    materialized SlotTable: slot starts are static per (player, die) except
    the farthest-bear-off lane, which takes ``last8``."""
    p = player.astype(jnp.int32)
    d = die.astype(jnp.int32)
    iota = jnp.arange(NUM_POINTS, dtype=jnp.int32)
    p_ = p[..., None]
    adj_i = jnp.where(p_ == 0, iota, NUM_POINTS - 1 - iota)
    adj_i = jnp.broadcast_to(adj_i, (*jnp.shape(last8), NUM_POINTS))
    last = last8.astype(jnp.int32)
    adj_last = jnp.where(p == 0, last, NUM_POINTS - 1 - last)
    exact = jnp.where(p == 0, NUM_POINTS - d, d - 1)
    adj_exact = jnp.broadcast_to(
        jnp.where(p == 0, exact, NUM_POINTS - 1 - exact), jnp.shape(last8)
    )
    neg1 = jnp.broadcast_to(jnp.int32(-1), jnp.shape(last8))
    # int8 lanes: ranks are in [-1, 49]; the [.., W, 27] grid is one of the
    # widest streams of every dd level expansion (int32 quadruples it)
    return jnp.concatenate(
        [
            2 * adj_i,
            neg1[..., None],
            (2 * adj_last + 1)[..., None],
            (2 * adj_exact + 1)[..., None],
        ],
        axis=-1,
    ).astype(jnp.int8)


def _expand(
    front: _Frontier,
    player: jax.Array,
    die: jax.Array,
    width: int,
    ctx: SlotCtx = None,
) -> Tuple[_Frontier, MoveSet, jax.Array]:
    """One canonical level expansion; also returns this level's forced-short
    records as a (boards, valid, count) set in frontier order, plus a
    bool[...] overflow flag (more legal children than ``width`` slots —
    dropped children could have produced final moves). ``ctx`` (the root
    SlotCtx for this die) replaces the full per-frontier slot_table with the
    mover-side-only slot_valid — exact, since every frontier board is
    reachable from the root within the turn."""
    pw = player[..., None]
    with jax.named_scope("slotv"):
        if ctx is None:
            st = slot_table(front.boards, pw, die[..., None])  # [..., W, 27]
            valid27 = st.valid
            rank = _slot_rank(st, pw)
        else:
            valid27, last8 = slot_valid(
                front.boards, pw, die[..., None], ctx_entry_axis(ctx)
            )
            rank = _rank_lanes(last8, pw, die[..., None])
    full_cc = _popcount(valid27)  # [..., W]

    shorts_valid = front.valid & front.only & (full_cc == 0)
    shorts = MoveSet(
        boards=front.boards, valid=shorts_valid, count=_popcount(shorts_valid)
    )

    child_valid = front.valid[..., None] & valid27 & (rank >= front.last_rank[..., None])

    # Blocked select over the natural [W, 27] structure: the boundary block
    # IS the parent frontier entry and the local position the slot index, so
    # no //27 decode is needed and the boundary one-hot doubles as the
    # parent-gather selector (row gathers measured 5-20ms here; submove
    # params recomputed arithmetically from the slot index).
    with jax.named_scope("sel"):
        parent, slot, out_ok, oh_p = _select_set_bits_blocked(child_valid, width)
    with jax.named_scope("take"):
        pboards = board_take_oh(front.boards, oh_p)
        pw2 = player[..., None]
        sg, eg, hg = slot_params(pboards, pw2, die[..., None], slot)
        nboards = apply_submove(pboards, pw2, sg, eg, hg, out_ok)
    # canonical rank of the applied submove (same formula as _slot_rank)
    p32 = jnp.broadcast_to(player.astype(jnp.int32)[..., None], slot.shape)
    adj = jnp.where(p32 == 0, sg, NUM_POINTS - 1 - sg)
    nrank = jnp.where(sg == BAR, -1, 2 * adj + (eg == BEAR_OFF)).astype(jnp.int8)
    ponly = jnp.any(oh_p & (full_cc == 1)[..., None, :], axis=-1)
    n_children = jnp.sum(child_valid.astype(jnp.int32), axis=(-1, -2))
    return (
        _Frontier(boards=nboards, last_rank=nrank, only=ponly, valid=out_ok),
        shorts,
        n_children > width,
    )


def enumerate_doubles(
    board: Board,
    player: jax.Array,
    die: jax.Array,
    cfg: MoveGenConfig,
    s1: SlotTable = None,
) -> MoveSet:
    """Canonical doubles enumeration — zero sorts, zero dedup (see module
    docstring for the uniqueness argument). ``s1`` supplies a precomputed
    root slot table for this die (die_tables). The three level expansions
    share one root SlotCtx (the die is constant for the whole turn), so
    opponent-side blocking tests run once instead of per frontier entry."""
    ctx = slot_ctx(board, player, die)
    if s1 is None:
        s1 = slot_table(board, player, die)
    root_cc = _popcount(s1.valid)
    idx1, ok1 = _select_set_bits(s1.valid, cfg.w1)
    b0 = board_expand(board, cfg.w1)
    pw = player[..., None]
    sg, eg, hg = slot_params(b0, pw, die[..., None], idx1)
    b1 = apply_submove(b0, pw, sg, eg, hg, ok1)
    p32 = jnp.broadcast_to(player.astype(jnp.int32)[..., None], idx1.shape)
    adj = jnp.where(p32 == 0, sg, NUM_POINTS - 1 - sg)
    rank1 = jnp.where(sg == BAR, -1, 2 * adj + (eg == BEAR_OFF)).astype(jnp.int8)
    front = _Frontier(
        boards=b1,
        last_rank=rank1,
        only=jnp.broadcast_to((root_cc == 1)[..., None], ok1.shape),
        valid=ok1,
    )

    with jax.named_scope("dd_L2"):
        front2, shorts1, ov2 = _expand(front, player, die, cfg.w2, ctx)
    with jax.named_scope("dd_L3"):
        front3, shorts2, ov3 = _expand(front2, player, die, cfg.w3, ctx)
    with jax.named_scope("dd_L4"):
        front4, shorts3, ov4 = _expand(front3, player, die, cfg.w4, ctx)

    has4 = jnp.any(front4.valid, axis=-1)
    a3 = jnp.any(shorts3.valid, axis=-1)
    a2 = jnp.any(shorts2.valid, axis=-1)

    a_max = cfg.a_max

    def level(ms: MoveSet, use: jax.Array, width: int) -> MoveSet:
        """Gate a level's set and bring it to ``width`` slots. When the level
        already fits (its frontier is <= width — always true for the shorts,
        and for the w4 frontier whenever w4 <= a_max), the valid mask stays
        in frontier order and is merely PADDED: consumers all handle
        non-contiguous masks, and skipping the select + one-hot board take
        here removed ~1ms/step at B=4096 (PERF.md). Only a frontier wider
        than a_max needs the rank-capped compaction (Q7 truncation)."""
        v = ms.valid & use[..., None]
        w = v.shape[-1]
        if w <= width:
            pad = width - w
            if pad:
                ms = MoveSet(
                    boards=Board(
                        data=jnp.pad(ms.boards.data, ((0, 0), (0, pad), (0, 0)))
                    ),
                    valid=jnp.pad(v, ((0, 0), (0, pad))),
                    count=None,
                )
            else:
                ms = MoveSet(boards=ms.boards, valid=v, count=None)
            return MoveSet(
                boards=ms.boards, valid=ms.valid, count=_popcount(ms.valid)
            )
        idx, ok = _select_set_bits_fast(v, width)
        return MoveSet(
            boards=board_take_onehot(ms.boards, idx), valid=ok, count=_popcount(ok)
        )

    m4 = level(
        MoveSet(boards=front4.boards, valid=front4.valid, count=None), has4, a_max
    )
    # progressive widths: each shorts level is brought only to the NEXT
    # level's width before its merge (16 -> 96 -> 224 -> a_max instead of
    # three merges at full a_max) — ~57% fewer merge bytes, same result
    m3 = level(shorts3, (~has4) & a3, min(cfg.w3, a_max))
    m2 = level(shorts2, (~has4) & ~a3 & a2, min(cfg.w2, a_max))
    m1 = level(shorts1, (~has4) & ~a3 & ~a2, min(cfg.w1, a_max))

    def merge(a: MoveSet, b: MoveSet, use_a: jax.Array) -> MoveSet:
        return MoveSet(
            boards=board_where(
                jnp.broadcast_to(use_a[..., None], a.valid.shape), a.boards, b.boards
            ),
            valid=jnp.where(use_a[..., None], a.valid, b.valid),
            count=jnp.where(use_a, a.count, b.count),
        )

    def pad_ms(ms: MoveSet, width: int) -> MoveSet:
        p = width - ms.valid.shape[-1]
        if p <= 0:
            return ms
        return MoveSet(
            boards=Board(
                data=jnp.pad(ms.boards.data, ((0, 0), (0, p), (0, 0)))
            ),
            valid=jnp.pad(ms.valid, ((0, 0), (0, p))),
            count=ms.count,
        )

    w12 = max(m1.valid.shape[-1], m2.valid.shape[-1])
    out = merge(pad_ms(m2, w12), pad_ms(m1, w12), a2)
    w123 = max(w12, m3.valid.shape[-1])
    out = merge(pad_ms(m3, w123), pad_ms(out, w123), a3)
    out = merge(m4, pad_ms(out, a_max), has4)
    # any frontier-width drop can lose final moves regardless of which level
    # is ultimately selected (a dropped level-2 entry could have spawned
    # level-4 children); OR in the Q7 cap on the selected level's set —
    # including shorts levels whose slot width exceeds a_max (unreachable
    # with all shipped configs where w2,w3 <= a_max, but a custom config
    # with w3 > a_max would otherwise rank-cap silently in level()).
    def _cap_ov(valid, use, width):
        if valid.shape[-1] <= width:
            return jnp.zeros_like(has4)
        return _popcount(valid & use[..., None]) > width

    overflow = (
        (root_cc > cfg.w1) | ov2 | ov3 | ov4
        | (jnp.where(has4, _popcount(front4.valid & has4[..., None]), 0) > a_max)
        | _cap_ov(shorts3.valid, (~has4) & a3, a_max)
        | _cap_ov(shorts2.valid, (~has4) & ~a3 & a2, a_max)
        | _cap_ov(shorts1.valid, (~has4) & ~a3 & ~a2, a_max)
    )
    return MoveSet(boards=out.boards, valid=out.valid, count=out.count,
                   overflow=overflow)


def _flat_take0(tree, idx: jax.Array):
    return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), tree)


def _unflatten_moveset(ms: MoveSet, batch_shape) -> MoveSet:
    a = ms.valid.shape[-1]
    return MoveSet(
        boards=jax.tree.map(
            lambda x: x.reshape(*batch_shape, a, *x.shape[2:]), ms.boards
        ),
        valid=ms.valid.reshape(*batch_shape, a),
        count=ms.count.reshape(batch_shape),
        overflow=None if ms.overflow is None else ms.overflow.reshape(batch_shape),
    )


def enumerate_nondoubles_batched(
    board: Board,
    player: jax.Array,
    dice: jax.Array,
    cfg: MoveGenConfig,
    passes: Tuple[_Pass, _Pass] = None,
) -> MoveSet:
    """enumerate_nondoubles over an arbitrary batch shape (player/dice may
    broadcast); used by the 2-ply scorer's fixed non-double rolls."""
    bs = board.batch_shape
    n = int(np.prod(bs)) if bs else 1
    flat = lambda t: jax.tree.map(lambda a: a.reshape(n, *a.shape[len(bs):]), t)
    fb = flat(board)
    fp = jnp.broadcast_to(player, bs).reshape(n)
    fd = jnp.broadcast_to(dice, (*bs, 2)).reshape(n, 2)
    fpasses = None if passes is None else (flat(passes[0]), flat(passes[1]))
    return _unflatten_moveset(enumerate_nondoubles(fb, fp, fd, cfg, fpasses), bs)


def enumerate_doubles_batched(
    board: Board,
    player: jax.Array,
    die: jax.Array,
    cfg: MoveGenConfig,
    s1: SlotTable = None,
) -> MoveSet:
    """enumerate_doubles over an arbitrary batch shape, padded to the same
    output width as the non-doubles path so scan carries stay uniform."""
    bs = board.batch_shape
    n = int(np.prod(bs)) if bs else 1
    flat = lambda t: jax.tree.map(lambda a: a.reshape(n, *a.shape[len(bs):]), t)
    fb = flat(board)
    fp = jnp.broadcast_to(player, bs).reshape(n)
    fd = jnp.broadcast_to(die, bs).reshape(n).astype(jnp.int32)
    ms = enumerate_doubles(fb, fp, fd, cfg, None if s1 is None else flat(s1))
    width = max(cfg.a_max, cfg.nd_dedup_k)
    p = width - ms.valid.shape[-1]
    if p > 0:
        ms = MoveSet(
            boards=Board(data=jnp.pad(ms.boards.data, ((0, 0), (0, p), (0, 0)))),
            valid=jnp.pad(ms.valid, ((0, 0), (0, p))),
            count=ms.count,
            overflow=ms.overflow,
        )
    return _unflatten_moveset(ms, bs)


def legal_moves(
    board: Board, player: jax.Array, dice: jax.Array, cfg: MoveGenConfig
) -> MoveSet:
    """Sortless dispatch; same MoveSet contract as movegen.legal_moves.

    Doubles are enumerated on a compacted sub-batch: in lockstep play only
    ~1/6 of games roll doubles per step, so running the (expensive) doubles
    expansion on every game wastes ~3x its cost. Games with doubles are
    gathered into a batch/3 sub-batch (P(overflow) is astronomically small —
     30 sigma at batch 4096; overflow games would present zero moves), the
    canonical expansion runs there, and each game gathers its result back by
    its rank among doubles games.
    """
    batch_shape = board.batch_shape  # player/dice may broadcast into it
    n = int(np.prod(batch_shape)) if batch_shape else 1
    fboard = jax.tree.map(lambda a: a.reshape(n, *a.shape[len(batch_shape):]), board)
    fplayer = jnp.broadcast_to(player, batch_shape).reshape(n)
    fdice = jnp.broadcast_to(dice, (*batch_shape, 2)).reshape(n, 2)
    is_double = fdice[:, 0] == fdice[:, 1]

    nd = enumerate_nondoubles(fboard, fplayer, fdice, cfg)

    if n <= 64 or cfg.dd_subbatch_div <= 0:
        dd = enumerate_doubles(fboard, fplayer, fdice[:, 0].astype(jnp.int32), cfg)
        dd_boards, dd_valid, dd_count = dd.boards, dd.valid, dd.count
        dd_overflow = dd.overflow
    else:
        w_dd = max(8, -(-n // cfg.dd_subbatch_div))
        sel_idx, sel_ok = _select_set_bits(is_double, w_dd)
        sub_board = _flat_take0(fboard, sel_idx)
        sub_player = jnp.take(fplayer, sel_idx)
        sub_die = jnp.take(fdice[:, 0].astype(jnp.int32), sel_idx)
        if cfg.dd_tier:
            # rejected experiment, kept behind its flag (experimental/__init__.py)
            from mlp_ppo_2ply_multi_tpu.experimental.tiered import doubles_two_tier

            sub = doubles_two_tier(sub_board, sub_player, sub_die, sel_ok, cfg)
        else:
            sub = enumerate_doubles(sub_board, sub_player, sub_die, cfg)
        sub_valid = sub.valid & sel_ok[:, None]
        raw_slot = jnp.cumsum(is_double.astype(jnp.int32)) - 1
        # overflow guard: a game beyond the sub-batch width presents zero
        # moves (env auto-pass) instead of silently reading another game's
        in_range = raw_slot < w_dd
        slot = jnp.clip(raw_slot, 0, w_dd - 1)
        dd_boards = _flat_take0(sub.boards, slot)
        dd_valid = jnp.take(sub_valid, slot, axis=0) & in_range[:, None]
        dd_count = jnp.where(in_range, jnp.take(sub.count, slot), 0)
        # sub-batch overflow presents zero moves — flag it as truncation
        dd_overflow = jnp.where(in_range, jnp.take(sub.overflow, slot), True)

    # nd keeps width nd_dedup_k (non-contiguous valid); dd is width a_max
    # (contiguous). Pad the narrower side before merging.
    width = max(nd.valid.shape[-1], dd_valid.shape[-1])
    def pad_to(boards_, valid_):
        p = width - valid_.shape[-1]
        if p <= 0:
            return boards_, valid_
        return (
            Board(data=jnp.pad(boards_.data, ((0, 0), (0, p), (0, 0)))),
            jnp.pad(valid_, ((0, 0), (0, p))),
        )

    with jax.named_scope("mg_merge"):
        dd_boards, dd_valid = pad_to(dd_boards, dd_valid)
        nd_boards, nd_valid = pad_to(nd.boards, nd.valid)
        nd = MoveSet(
            boards=nd_boards, valid=nd_valid, count=nd.count, overflow=nd.overflow
        )
        pred = jnp.broadcast_to(is_double[:, None], nd.valid.shape)
        out = MoveSet(
            boards=board_where(pred, dd_boards, nd.boards),
            valid=jnp.where(pred, dd_valid, nd.valid),
            count=jnp.where(is_double, dd_count, nd.count),
            overflow=jnp.where(is_double, dd_overflow, nd.overflow),
        )
    return _unflatten_moveset(out, batch_shape)


class SplitMoves(NamedTuple):
    """legal_moves without the padded merge: the three natural planes of the
    production enumeration (narrow nd tier, wide-nd sub-batch, doubles
    sub-batch) plus the merged per-row facts (valid/count/overflow).

    The merged [n, W, 52] board tensor legal_moves materializes is ~97%
    padding rows at the production distribution (p50 count 14, tier 96):
    building it costs a [n, K->W] pad, a [wd -> n] row-gather of the doubles
    plane, and a full-width board_where — ~0.7GB of HBM traffic per step at
    B=4096 whose bytes the actor then immediately re-compacts down to
    [n, 96, 52]. Consumers that sample one move (actor.select_action_split)
    read the planes directly; the merged VALID mask (bools, ~2MB) is enough
    to keep slot coordinates and sampling order bit-identical to the merged
    path. Reference analog: every candidate at full width per decision
    (env_helper.py:7-24) — the planes are the TPU-shaped replacement.
    """

    nd_boards: Board  # [n, T, 52] tier-1 nd afterstates
    nd_keep: jax.Array  # [n, T]
    ndw_boards: Board  # [wn, K, 52] wide-nd sub-batch
    ndw_keep: jax.Array  # [wn, K]
    ndw_in: jax.Array  # [n] row's nd result lives in the wide plane
    ndw_slot: jax.Array  # [n] row index into the wide plane (clipped)
    dd_boards: Board  # [wd, A, 52] doubles sub-batch
    dd_valid: jax.Array  # [wd, A]
    dd_in: jax.Array  # [n] row is a double resolved in the sub-batch
    dd_slot: jax.Array  # [n]
    valid: jax.Array  # [n, W] merged valid mask, bit-equal to legal_moves'
    count: jax.Array  # [n]
    overflow: jax.Array  # [n]


def legal_moves_split(
    board: Board, player: jax.Array, dice: jax.Array, cfg: MoveGenConfig
) -> SplitMoves:
    """Plane-form legal_moves (SplitMoves docstring). Requires the tiered nd
    tail (cfg.nd_tier > 0) and the doubles sub-batch; flat [n] batch only."""
    assert cfg.nd_tier and cfg.nd_tier < cfg.nd_dedup_k, "needs nd_tier"
    assert cfg.dd_subbatch_div > 0, "needs the doubles sub-batch"
    batch_shape = board.batch_shape
    assert len(batch_shape) == 1, "flat batch only"
    n = batch_shape[0]
    fplayer = jnp.broadcast_to(player, batch_shape)
    fdice = jnp.broadcast_to(dice, (*batch_shape, 2))
    is_double = fdice[:, 0] == fdice[:, 1]

    with jax.named_scope("nd_front"):
        pa, pb, valid_cells, d_hi, d_lo = _nd_candidates(board, fplayer, fdice)
    pl = _nd_two_tier(board, pa, pb, valid_cells, fplayer, d_hi, d_lo, cfg)

    # doubles sub-batch — same gather discipline as legal_moves, but the
    # board plane STAYS in the sub-batch; only the valid mask fans out
    w_dd = max(8, -(-n // cfg.dd_subbatch_div))
    sel_idx, sel_ok = _select_set_bits(is_double, w_dd)
    sub = enumerate_doubles(
        _flat_take0(board, sel_idx),
        jnp.take(fplayer, sel_idx),
        jnp.take(fdice[:, 0].astype(jnp.int32), sel_idx),
        cfg,
    )
    sub_valid = sub.valid & sel_ok[:, None]
    raw_slot = jnp.cumsum(is_double.astype(jnp.int32)) - 1
    in_range = raw_slot < w_dd
    dd_slot = jnp.clip(raw_slot, 0, w_dd - 1)
    dd_in = is_double & in_range

    # merged facts (bit-equal to legal_moves): bools only, no board bytes
    W = max(cfg.a_max, cfg.nd_dedup_k, sub.valid.shape[-1])
    K, T = cfg.nd_dedup_k, cfg.nd_tier

    def pad_w(v):
        return jnp.pad(v, ((0, 0), (0, W - v.shape[-1])))

    nd_valid = jnp.where(
        pl.in_sub[:, None],
        pad_w(jnp.take(pl.keep_w, pl.slot, axis=0)),
        pad_w(pl.keep_n),
    )
    dd_valid_rows = pad_w(jnp.take(sub_valid, dd_slot, axis=0)) & dd_in[:, None]
    valid = jnp.where(is_double[:, None], dd_valid_rows, nd_valid)
    count = _popcount(valid)
    dd_overflow = jnp.where(in_range, jnp.take(sub.overflow, dd_slot), True)
    overflow = jnp.where(is_double, dd_overflow, pl.overflow)
    return SplitMoves(
        nd_boards=pl.after_n,
        nd_keep=pl.keep_n,
        ndw_boards=pl.after_w,
        ndw_keep=pl.keep_w,
        ndw_in=pl.in_sub,
        ndw_slot=pl.slot,
        dd_boards=sub.boards,
        dd_valid=sub_valid,
        dd_in=dd_in,
        dd_slot=dd_slot,
        valid=valid,
        count=count,
        overflow=overflow,
    )
