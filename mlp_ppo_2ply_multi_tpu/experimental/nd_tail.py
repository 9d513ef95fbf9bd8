"""Fused non-doubles tail kernel (Pallas): blocked k-th-set-bit select,
parent one-hot takes, second-submove application, canonical delta
signatures, first-occurrence dedup and the max-submove filter — the whole
back half of non-doubles enumeration (movegen2._nd_tail) in ONE kernel with
every intermediate resident in VMEM.

Why: the XLA pipeline spends the 2-ply scorer's non-doubles scan in a flat
soup of ~500 small fusions per roll — each streaming [rows, K, 27/52]-class
intermediates through HBM — with the one-hot takes alone measured at ~2.5 ms
per [4096,128,128]x[4096,128,52] einsum (scripts/probe_pallas_batched_dot).
Here HBM traffic is exactly: candidate bits + two child sets in, afterstates
+ keep masks out.

NEGATIVE RESULT on v5e (round 4): at the VMEM-feasible tile size the fused
kernel is SLOWER than the XLA chain it replaces — rows_per_tile=64 exceeds
the 16M scoped-vmem limit (39M live set), and at rows_per_tile=16 the
kernel compiles but runs at ~12 ms per [4096, K=96] call vs ~2 ms for the
XLA path: 256 sequential grid steps of per-row batched [96,27]x[27,52]
dots starve the MXU, while XLA's op soup — for all its HBM round trips —
keeps the units busy by overlapping independent fusions. Kept in-tree
behind MoveGenConfig.nd_tail_kernel (default OFF) with full exactness
tests, like the round-1 Pallas dedup kernel before it (PERF.md).

Semantics are bit-identical to movegen2._nd_tail (same reference order,
dedup and filter quirks — generate_all_moves.py:25-90,
handle_move_types.py:196-221 via the canonical signatures); the exactness
test (tests/test_nd_tail_kernel.py) compares every output cell against the
XLA path. Integer math throughout; the only matmuls are one-hot takes and
triangular-matrix cumsums with f32 accumulation (exact for these ranges).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SLOTS = 27
N_BLOCKS = 2 * (N_SLOTS + 1)  # 56
N_CAND = N_BLOCKS * N_SLOTS  # 1512
N_CELLS = 52
BAR, BEAR_OFF, NUM_POINTS = 24, 25, 24
_SENT = 31  # signature sentinel lane (movegen2._SIG_SENT)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _farthest(own: jax.Array, p: jax.Array) -> jax.Array:
    """Farthest occupied home point (movegen.farthest_point semantics,
    including the empty-home defaults). own int32[..., 24], p int32[...]."""
    occ1 = own[..., 18:24] > 0
    i6 = _iota(occ1.shape, occ1.ndim - 1)
    first1 = jnp.min(jnp.where(occ1, i6, 6), axis=-1)
    last_p1 = 18 + jnp.where(first1 == 6, 0, first1)
    occ2 = own[..., 0:6] > 0
    last2 = jnp.max(jnp.where(occ2, i6, -1), axis=-1)
    last_p2 = jnp.where(last2 == -1, 5, last2)
    return jnp.where(p == 0, last_p1, last_p2)


def _lane_at(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[..., idx] via one-hot reduce (values small ints)."""
    lanes = _iota(arr.shape, arr.ndim - 1)
    return jnp.sum(jnp.where(idx[..., None] == lanes, arr, 0), axis=-1)


def _slot_params(board, p, d, slot):
    """(start, end, hits) of ``slot`` on int32 boards [..., 52]
    (movegen.slot_params semantics). p, d, slot int32[...]."""
    own = jnp.where(
        (p == 0)[..., None], board[..., 0:24], board[..., 24:48]
    )
    opp = jnp.where(
        (p == 0)[..., None], board[..., 24:48], board[..., 0:24]
    )
    sign = 1 - 2 * p
    last = _farthest(own, p)
    exact = jnp.where(p == 0, NUM_POINTS - d, d - 1)
    entry = jnp.where(p == 0, d - 1, NUM_POINTS - d)
    start = jnp.where(
        slot < 24, slot, jnp.where(slot == 24, BAR, jnp.where(slot == 25, last, exact))
    )
    end_normal = jnp.clip(slot + d * sign, 0, NUM_POINTS - 1)
    end = jnp.where(slot < 24, end_normal, jnp.where(slot == 24, entry, BEAR_OFF))
    opp_at_end = _lane_at(opp, jnp.minimum(end, NUM_POINTS - 1))
    hits = (end != BEAR_OFF) & (opp_at_end == 1)
    return start, end, hits


def _apply(board, p, start, end, hits, valid):
    """apply_submove on int32 boards [..., 52] (board.apply_submove)."""
    q = 1 - p
    v = valid.astype(jnp.int32)
    hit = (hits & valid).astype(jnp.int32)
    own_from = jnp.where(start == BAR, 48 + p, start + 24 * p)
    own_to = jnp.where(end == BEAR_OFF, 50 + p, end + 24 * p)
    opp_at = end + 24 * q
    opp_bar = 48 + q
    iota = _iota((*board.shape[:-1], N_CELLS), board.ndim - 1)
    delta = v[..., None] * (
        (own_to[..., None] == iota).astype(jnp.int32)
        - (own_from[..., None] == iota).astype(jnp.int32)
    ) + hit[..., None] * (
        (opp_bar[..., None] == iota).astype(jnp.int32)
        - (opp_at[..., None] == iota).astype(jnp.int32)
    )
    return board + delta


def _sig(s1, e1, h1, s2, e2, h2, is_pair):
    """Canonical delta signature (movegen2._submove_sig)."""
    pair = is_pair
    cancel1 = pair & (s1 == e2)
    cancel2 = pair & (s2 == e1)
    both = pair & ~cancel1 & ~cancel2
    m1 = jnp.where(cancel1, s2, s1)
    m2 = jnp.where(both, s2, _SENT)
    p1 = jnp.where(cancel2, e2, e1)
    p2 = jnp.where(both, e2, _SENT)
    t1 = jnp.where(h1, e1, _SENT)
    t2 = jnp.where(pair & h2, e2, _SENT)
    mlo, mhi = jnp.minimum(m1, m2), jnp.maximum(m1, m2)
    plo, phi = jnp.minimum(p1, p2), jnp.maximum(p1, p2)
    tlo, thi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
    sig = mlo
    for lane in (mhi, plo, phi, tlo, thi):
        sig = sig * 32 + lane
    return sig


def _make_kernel(R: int, K: int, a_max: int):
    def kernel(
        valid_ref, b1a_ref, b1b_ref, b0_ref, p_ref, dhi_ref, dlo_ref,
        tri56_ref, tri27_ref, triK_ref,
        after_ref, keep_ref, npre_ref, pct_ref, kok_ref,
    ):
        valid2 = valid_ref[...]  # int8 0/1 [R, 56, 27]
        # NOTE: every intermediate stays rank >= 2 — rank-1 values trip a
        # Mosaic layout CHECK (layout.h:320 implicit_dim) on this toolchain.
        p1 = p_ref[...].astype(jnp.int32)  # [R, 1]
        dhi1 = dhi_ref[...].astype(jnp.int32)  # [R, 1]
        dlo1 = dlo_ref[...].astype(jnp.int32)  # [R, 1]

        vi = valid2.astype(jnp.float32)
        c = jnp.sum(vi, axis=-1)  # [R, 56] block counts
        cum = jnp.dot(c, tri56_ref[...], preferred_element_type=jnp.float32)
        total = jnp.sum(c, axis=-1, keepdims=True).astype(jnp.int32)  # [R, 1]
        cum_i = cum.astype(jnp.int32)
        c_i = c.astype(jnp.int32)

        ks = _iota((R, K), 1)
        # boundary block: #(b: cum[b] <= k)
        blk = jnp.sum(
            (cum_i[:, None, :] <= ks[:, :, None]).astype(jnp.int32), axis=-1
        )
        blk = jnp.minimum(blk, N_BLOCKS - 1)
        oh_b = blk[:, :, None] == _iota((R, K, N_BLOCKS), 2)  # [R,K,56]
        start_rank = jnp.sum(
            jnp.where(oh_b, (cum_i - c_i)[:, None, :], 0), axis=-1
        )
        r_loc = ks - start_rank
        # local cumsums within each 27-block, then select boundary block's
        lcs = jnp.dot(
            vi.reshape(R * N_BLOCKS, N_SLOTS), tri27_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(R, N_BLOCKS, N_SLOTS)
        sel_lcs = jax.lax.dot_general(
            oh_b.astype(jnp.float32), lcs,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [R, K, 27]
        loc = jnp.sum(
            (sel_lcs <= r_loc[:, :, None].astype(jnp.float32)).astype(jnp.int32),
            axis=-1,
        )
        loc = jnp.minimum(loc, N_SLOTS - 1)
        kok = ks < total  # [R, K]

        # candidate decode (blocks: A pairs 0..26 | A singles 27 | B pairs
        # 28..54 | B singles 55)
        cpass = (blk >= N_SLOTS + 1).astype(jnp.int32)
        bb = blk - cpass * (N_SLOTS + 1)
        is_pair = bb < N_SLOTS
        ci = jnp.where(is_pair, bb, loc)
        cj = jnp.where(is_pair, loc, -1)

        # first-ply board take from the right pass
        ohc = (ci[:, :, None] == _iota((R, K, N_SLOTS), 2)).astype(jnp.float32)
        firstA = jax.lax.dot_general(
            ohc, b1a_ref[...].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )
        firstB = jax.lax.dot_general(
            ohc, b1b_ref[...].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )
        first = jnp.where(
            (cpass == 0)[..., None], firstA, firstB
        ).astype(jnp.int32)  # [R, K, 52]

        pk = p1
        d_second = jnp.where(cpass == 0, dlo1, dhi1)
        s2, e2, h2 = _slot_params(first, pk, d_second, jnp.maximum(cj, 0))
        app = kok & (cj >= 0)
        after = _apply(first, pk, s2, e2, h2, app)

        # first-submove params on the root board -> delta signature
        b0 = b0_ref[...].astype(jnp.int32)[:, None, :]  # [R, 1, 52]
        b0k = jnp.broadcast_to(b0, (R, K, N_CELLS))
        d_first = jnp.where(cpass == 0, dhi1, dlo1)
        s1, e1, h1 = _slot_params(b0k, pk, d_first, ci)
        sig = _sig(s1, e1, h1, s2, e2, h2, app)

        # first-occurrence dedup + max-submove filter + Q7 cap
        eq = sig[:, :, None] == sig[:, None, :]
        earlier = _iota((R, K, K), 2) < _iota((R, K, K), 1)
        dup = jnp.any(eq & earlier & kok[:, None, :], axis=-1)
        keep = kok & ~dup
        kpair = cj >= 0
        has_pair = jnp.any(keep & kpair, axis=-1, keepdims=True)  # [R, 1]
        keep = keep & (kpair | ~has_pair)
        rank = jnp.dot(
            keep.astype(jnp.float32), triK_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        pct = jnp.sum(keep.astype(jnp.int32), axis=-1, keepdims=True)
        keep = keep & (rank <= a_max)

        after_ref[...] = after.astype(jnp.int8)
        keep_ref[...] = keep.astype(jnp.int8)
        npre_ref[...] = total
        pct_ref[...] = pct
        kok_ref[...] = (kok & (cj >= 0)).astype(jnp.int8)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("K", "a_max", "rows_per_tile", "interpret")
)
def nd_tail_fused(
    valid: jax.Array,  # bool[N, 1512] candidate bits, insertion order
    b1a: jax.Array,  # int8[N, 27, 52] pass-A (hi-first) children
    b1b: jax.Array,  # int8[N, 27, 52] pass-B (lo-first) children
    b0: jax.Array,  # int8[N, 52] root boards
    player: jax.Array,  # int32[N]
    d_hi: jax.Array,  # int32[N]
    d_lo: jax.Array,  # int32[N]
    K: int,
    a_max: int,
    rows_per_tile: int = 64,
    interpret: bool = False,
):
    """Fused movegen2._nd_tail. Returns (after int8[N,K,52], keep bool[N,K],
    n_pre int32[N], pct int32[N], kpair bool[N,K]); ``after`` is only
    defined where the XLA path defines it (selected cells)."""
    n = valid.shape[0]
    R = rows_per_tile
    nt = -(-n // R)
    npad = nt * R
    pad = lambda a: jnp.pad(a, [(0, npad - n)] + [(0, 0)] * (a.ndim - 1))
    valid = pad(valid.astype(jnp.int8).reshape(n, N_BLOCKS, N_SLOTS))
    b1a, b1b, b0 = pad(b1a), pad(b1b), pad(b0)
    col = lambda a: pad(a.astype(jnp.int32)[:, None])
    player, d_hi, d_lo = col(player), col(d_hi), col(d_lo)

    grid = (nt,)
    row2 = lambda w: pl.BlockSpec((R, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row3 = lambda a, b: pl.BlockSpec(
        (R, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((npad, K, N_CELLS), jnp.int8),
        jax.ShapeDtypeStruct((npad, K), jnp.int8),
        jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        jax.ShapeDtypeStruct((npad, K), jnp.int8),
    )
    after, keep, npre, pct, kpair = pl.pallas_call(
        _make_kernel(R, K, a_max),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            row3(N_BLOCKS, N_SLOTS),
            row3(N_SLOTS, N_CELLS),
            row3(N_SLOTS, N_CELLS),
            row2(N_CELLS),
            row2(1),
            row2(1),
            row2(1),
            full(N_BLOCKS, N_BLOCKS),
            full(N_SLOTS, N_SLOTS),
            full(K, K),
        ],
        out_specs=(
            row3(K, N_CELLS), row2(K), row2(1), row2(1), row2(K),
        ),
        interpret=interpret,
    )(
        valid, b1a, b1b, b0, player, d_hi, d_lo,
        jnp.asarray(np.tril(np.ones((N_BLOCKS, N_BLOCKS), np.float32)).T),
        jnp.asarray(np.tril(np.ones((N_SLOTS, N_SLOTS), np.float32)).T),
        jnp.asarray(np.tril(np.ones((K, K), np.float32)).T),
    )
    return (
        after[:n],
        keep[:n].astype(bool),
        npre[:n, 0],
        pct[:n, 0],
        kpair[:n].astype(bool),
    )
