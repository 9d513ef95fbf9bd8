"""Vectorized struct-of-arrays board state and primitive operations.

The reference keeps one frozen python dataclass per board with per-player
24-tuples (/root/reference/src/backgammon/board/immutable_board.py:16-24) and
copies it on every submove (:183-258). Here a *batch* of boards is a pytree of
small integer arrays with leading batch dimensions, and every operation is a
pure jittable function over the whole batch — the TPU-native analog.

Layout:
    points: int8[..., 2, 24]   checkers per (player, point)
    bar:    int8[..., 2]       checkers on the bar per player
    off:    int8[..., 2]       checkers borne off per player

All predicates mirror reference semantics exactly (file:line cited per
function) so that differential tests against the pure-python oracle pass
bit-for-bit.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.types import (
    BAR,
    BEAR_OFF,
    CHECKERS_PER_PLAYER,
    NUM_POINTS,
)


class Board(NamedTuple):
    points: jax.Array  # int8[..., 2, 24]
    bar: jax.Array  # int8[..., 2]
    off: jax.Array  # int8[..., 2]

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.points.shape[:-2]


# Starting position, reference immutable_board.py:27-70.
_INITIAL_POINTS = np.zeros((2, NUM_POINTS), dtype=np.int8)
_INITIAL_POINTS[0, 0] = 2
_INITIAL_POINTS[0, 11] = 5
_INITIAL_POINTS[0, 16] = 3
_INITIAL_POINTS[0, 18] = 5
_INITIAL_POINTS[1, 23] = 2
_INITIAL_POINTS[1, 12] = 5
_INITIAL_POINTS[1, 7] = 3
_INITIAL_POINTS[1, 5] = 5


def initial_board(batch_shape: Tuple[int, ...] = ()) -> Board:
    """Batch of starting positions (reference immutable_board.py:27-70)."""
    pts = jnp.broadcast_to(
        jnp.asarray(_INITIAL_POINTS), (*batch_shape, 2, NUM_POINTS)
    ).astype(jnp.int8)
    zeros2 = jnp.zeros((*batch_shape, 2), dtype=jnp.int8)
    return Board(points=pts, bar=zeros2, off=zeros2)


_POINT_IOTA = np.arange(NUM_POINTS, dtype=np.int32)


def player_points(board: Board, player: jax.Array) -> jax.Array:
    p = player.astype(jnp.int32)[..., None]
    return jnp.take_along_axis(board.points, p[..., None], axis=-2).squeeze(-2)


def opponent_points(board: Board, player: jax.Array) -> jax.Array:
    return player_points(board, 1 - player)


def _scalar2_sel(arr: jax.Array, player: jax.Array) -> jax.Array:
    """Select arr[..., player] for [..., 2]-shaped arr."""
    p = player.astype(jnp.int32)
    return jnp.where(p == 0, arr[..., 0], arr[..., 1])


def apply_submove(
    board: Board,
    player: jax.Array,
    start: jax.Array,
    end: jax.Array,
    hits: jax.Array,
    valid: jax.Array,
) -> Board:
    """Apply one submove per batch element; no-op where ``valid`` is False.

    Semantics of reference immutable_board.py:183-258 (checked moves) /
    env_helper.py:27-91 (unchecked fast path): remove a checker from ``start``
    (or the bar when start==BAR), send a hit blot to the opponent's bar, add
    the checker to ``end`` (or the player's off tray when end==BEAR_OFF).

    start/end are int32 arrays with the same batch shape as the board; hits
    and valid are bools.
    """
    p = player.astype(jnp.int32)
    q = 1 - p
    v = valid.astype(jnp.int8)
    hit = (hits & valid).astype(jnp.int8)

    iota = jnp.asarray(_POINT_IOTA)
    start_oh = (start[..., None] == iota).astype(jnp.int8)  # zero if start==BAR
    end_oh = (end[..., None] == iota).astype(jnp.int8)  # zero if end==BEAR_OFF

    # start_oh is all-zero when start == BAR (iota only covers 0..23) and
    # end_oh is all-zero when end == BEAR_OFF, so no extra guards are needed.
    own_delta = v[..., None] * (end_oh - start_oh)
    opp_delta = -hit[..., None] * end_oh

    p_oh = (jnp.asarray([0, 1], dtype=jnp.int32) == p[..., None]).astype(jnp.int8)
    q_oh = 1 - p_oh

    delta_points = (
        p_oh[..., :, None] * own_delta[..., None, :]
        + q_oh[..., :, None] * opp_delta[..., None, :]
    )
    new_points = board.points + delta_points

    from_bar = (v * (start == BAR).astype(jnp.int8))[..., None]
    to_off = (v * (end == BEAR_OFF).astype(jnp.int8))[..., None]
    new_bar = board.bar - p_oh * from_bar + q_oh * hit[..., None]
    new_off = board.off + p_oh * to_off
    return Board(points=new_points, bar=new_bar, off=new_off)


# ---------------------------------------------------------------------------
# Predicates (reference conditions.py / env_helper.py)
# ---------------------------------------------------------------------------

_HOME_MASK = np.zeros((2, NUM_POINTS), dtype=bool)
_HOME_MASK[0, 18:24] = True  # P1 home, conditions.py:173
_HOME_MASK[1, 0:6] = True  # P2 home, conditions.py:171


def has_won(board: Board, player: jax.Array) -> jax.Array:
    """reference conditions.py:137-149 (borne_off == 15)."""
    return _scalar2_sel(board.off, player) == CHECKERS_PER_PLAYER


def on_bar(board: Board, player: jax.Array) -> jax.Array:
    """reference conditions.py:122-134."""
    return _scalar2_sel(board.bar, player) > 0


def all_checkers_home(board: Board, player: jax.Array) -> jax.Array:
    """reference conditions.py:152-194: no bar checkers and no checkers
    outside the home board (borne-off checkers count toward the 15)."""
    own = player_points(board, player)
    home = jnp.where(
        player.astype(jnp.int32)[..., None] == 0,
        jnp.asarray(_HOME_MASK[0]),
        jnp.asarray(_HOME_MASK[1]),
    )
    outside = jnp.sum(jnp.where(home, 0, own.astype(jnp.int32)), axis=-1)
    return (~on_bar(board, player)) & (outside == 0)


def board_state_kind(board: Board, player: jax.Array) -> jax.Array:
    """reference conditions.py:5-22 priority: GAME_OVER > ON_BAR > BEAR_OFF >
    NORMAL. Returns int8 codes from BoardStateKind."""
    kind = jnp.zeros(jnp.shape(player), dtype=jnp.int8)
    kind = jnp.where(all_checkers_home(board, player), 2, kind)
    kind = jnp.where(on_bar(board, player), 1, kind)
    kind = jnp.where(has_won(board, player), 3, kind)
    return kind


def is_gammon(board: Board, winner: jax.Array) -> jax.Array:
    """reference env_helper.py:120-127: opponent borne off nothing."""
    return _scalar2_sel(board.off, 1 - winner) == 0


def is_backgammon(board: Board, winner: jax.Array) -> jax.Array:
    """reference env_helper.py:130-163: opponent borne off nothing AND has a
    checker in the winner's home board or on the bar."""
    opp = 1 - winner
    opp_pts = player_points(board, opp)
    winner_home = jnp.where(
        winner.astype(jnp.int32)[..., None] == 0,
        jnp.asarray(_HOME_MASK[0]),
        jnp.asarray(_HOME_MASK[1]),
    )
    in_home = jnp.sum(jnp.where(winner_home, opp_pts.astype(jnp.int32), 0), axis=-1) > 0
    return is_gammon(board, winner) & (in_home | on_bar(board, opp))


def is_closed_out(board: Board, player: jax.Array) -> jax.Array:
    """reference env_helper.py:218-242: opponent on the bar and every point of
    the player's home board holds >= 2 of the player's checkers."""
    own = player_points(board, player)
    home = jnp.where(
        player.astype(jnp.int32)[..., None] == 0,
        jnp.asarray(_HOME_MASK[0]),
        jnp.asarray(_HOME_MASK[1]),
    )
    all_made = jnp.all(jnp.where(home, own >= 2, True), axis=-1)
    return on_bar(board, 1 - player) & all_made


def has_five_prime(board: Board, player: jax.Array) -> jax.Array:
    """reference env_helper.py:167-215: a run of >=5 consecutive points each
    holding >=2 of the player's checkers, with at least one opponent checker
    "behind" the prime (ahead of it in the player's direction of travel).

    Vectorized: run lengths via a 5-wide AND window; the reference's per-index
    early-return loop is equivalent to an exists() over window positions.
    """
    own = player_points(board, player)
    opp = player_points(board, 1 - player)
    made = own >= 2  # [..., 24]

    # window_all[i] = all(made[i:i+5]); valid for i in 0..19
    w = made
    for shift in range(1, 5):
        w = w & jnp.roll(made, -shift, axis=-1)
    idx = jnp.asarray(_POINT_IOTA)
    window_ok = w & (idx <= NUM_POINTS - 5)

    opp_any = (opp > 0).astype(jnp.int32)
    # For P1 (direction +1): prime spanning [i, i+4] traps opponents on points
    # > i+4 (env_helper.py:199). For P2: prime [i, i+4] traps points < i
    # (env_helper.py:205).
    suffix = jnp.cumsum(opp_any[..., ::-1], axis=-1)[..., ::-1]  # sum over [i..23]
    prefix = jnp.cumsum(opp_any, axis=-1)  # sum over [0..i]
    # opponents strictly after i+4: suffix shifted by 5
    after = jnp.concatenate(
        [suffix[..., 5:], jnp.zeros((*suffix.shape[:-1], 5), suffix.dtype)], axis=-1
    )
    # opponents strictly before i: prefix shifted by 1
    before = jnp.concatenate(
        [jnp.zeros((*prefix.shape[:-1], 1), prefix.dtype), prefix[..., :-1]], axis=-1
    )
    p = player.astype(jnp.int32)[..., None]
    behind = jnp.where(p == 0, after, before) > 0
    return jnp.any(window_ok & behind, axis=-1)


def checker_conservation_ok(board: Board) -> jax.Array:
    """Property invariant: each player's points + bar + off == 15."""
    totals = (
        jnp.sum(board.points.astype(jnp.int32), axis=-1)
        + board.bar.astype(jnp.int32)
        + board.off.astype(jnp.int32)
    )
    return jnp.all(totals == CHECKERS_PER_PLAYER, axis=-1)


# ---------------------------------------------------------------------------
# Board hashing — the dedup key for move enumeration.
#
# The reference dedups afterstates with python set() over frozen dataclasses
# (generate_all_moves.py / handle_move_types.py:196-221). On TPU we use two
# independent additive 32-bit hashes over per-(player, location, count) random
# tables; deltas are computable incrementally from a submove without
# materializing the child board. Collision probability per candidate pair is
# ~2^-64 (the tables are uniform random, so equal sums across both tables form
# a random linear relation).
# ---------------------------------------------------------------------------

_rng = np.random.default_rng(0xB0A2D5EED)
# tables[h][player, location, count]; locations 0..23 points, 24 bar, 25 off.
_HASH_TABLES = _rng.integers(
    0, 2**32, size=(2, 2, 26, CHECKERS_PER_PLAYER + 1), dtype=np.uint32
)


def _tables() -> jax.Array:
    return jnp.asarray(_HASH_TABLES)


def board_hash(board: Board) -> Tuple[jax.Array, jax.Array]:
    """Full (h1, h2) uint32 hashes of a board batch."""
    t = _tables()  # [2, 2, 26, 16]
    cnt = board.points.astype(jnp.int32)  # [..., 2, 24]

    def one(table: jax.Array) -> jax.Array:
        # table: uint32[2, 26, 16]
        pt = table[:, :NUM_POINTS, :]  # [2,24,16]
        gathered = jnp.take_along_axis(
            jnp.broadcast_to(pt, (*cnt.shape, CHECKERS_PER_PLAYER + 1)),
            cnt[..., None].astype(jnp.int32),
            axis=-1,
        ).squeeze(-1)
        h = jnp.sum(gathered, axis=(-1, -2), dtype=jnp.uint32)
        barv = jnp.take_along_axis(
            jnp.broadcast_to(table[:, BAR, :], (*board.bar.shape, 16)),
            board.bar[..., None].astype(jnp.int32),
            axis=-1,
        ).squeeze(-1)
        offv = jnp.take_along_axis(
            jnp.broadcast_to(table[:, BEAR_OFF, :], (*board.off.shape, 16)),
            board.off[..., None].astype(jnp.int32),
            axis=-1,
        ).squeeze(-1)
        return h + jnp.sum(barv, axis=-1, dtype=jnp.uint32) + jnp.sum(
            offv, axis=-1, dtype=jnp.uint32
        )

    return one(t[0]), one(t[1])


def submove_hash_delta(
    board: Board,
    player: jax.Array,
    start: jax.Array,
    end: jax.Array,
    hits: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(dh1, dh2) such that hash(child) = hash(parent) + dh, for the submove
    applied to ``board`` by ``player``. Caller masks invalid submoves itself.

    Touched cells: own start (point or bar) count c -> c-1; own end (point or
    off) count e -> e+1; on a hit, opponent end 1 -> 0 and opponent bar
    b -> b+1.
    """
    t = _tables()  # [2, 2, 26, 16]
    p = player.astype(jnp.int32)
    q = 1 - p

    own = player_points(board, player).astype(jnp.int32)  # [...,24]
    opp = player_points(board, 1 - player).astype(jnp.int32)
    own_bar = _scalar2_sel(board.bar, player).astype(jnp.int32)
    opp_bar = _scalar2_sel(board.bar, 1 - player).astype(jnp.int32)
    own_off = _scalar2_sel(board.off, player).astype(jnp.int32)

    s_clip = jnp.clip(start, 0, NUM_POINTS - 1)
    e_clip = jnp.clip(end, 0, NUM_POINTS - 1)
    c_start = jnp.where(
        start == BAR, own_bar, jnp.take_along_axis(own, s_clip[..., None], -1).squeeze(-1)
    )
    c_end = jnp.where(
        end == BEAR_OFF, own_off, jnp.take_along_axis(own, e_clip[..., None], -1).squeeze(-1)
    )
    start_loc = start  # already 0..24 (bar)
    end_loc = jnp.where(end == BEAR_OFF, BEAR_OFF, end)

    hit = hits.astype(jnp.int32)

    def one(table: jax.Array) -> jax.Array:
        # lookup(table, player, loc, count) with batched player/loc/count.
        def lut(pl, loc, count):
            flat = table.reshape(-1)  # [2*26*16]
            lin = (pl * 26 + loc) * (CHECKERS_PER_PLAYER + 1) + count
            return jnp.take(flat, lin)

        d = lut(p, start_loc, c_start - 1) - lut(p, start_loc, c_start)
        d = d + lut(p, end_loc, c_end + 1) - lut(p, end_loc, c_end)
        d_hit = (
            lut(q, end_loc, jnp.zeros_like(c_end))
            - lut(q, end_loc, jnp.ones_like(c_end))
            + lut(q, jnp.full_like(start_loc, BAR), opp_bar + 1)
            - lut(q, jnp.full_like(start_loc, BAR), opp_bar)
        )
        return d + jnp.where(hit > 0, d_hit, jnp.zeros_like(d_hit))

    return one(t[0]), one(t[1])


def pack_board(board: Board) -> jax.Array:
    """Pack a board batch into int8[..., 52] for compact episode storage:
    48 point counts + 2 bar + 2 off."""
    flat_pts = board.points.reshape(*board.batch_shape, 2 * NUM_POINTS)
    return jnp.concatenate([flat_pts, board.bar, board.off], axis=-1)


def unpack_board(packed: jax.Array) -> Board:
    pts = packed[..., : 2 * NUM_POINTS].reshape(*packed.shape[:-1], 2, NUM_POINTS)
    return Board(points=pts, bar=packed[..., 48:50], off=packed[..., 50:52])
