"""Vectorized board state and primitive operations (flat 52-cell layout).

The reference keeps one frozen python dataclass per board with per-player
24-tuples (/root/reference/src/backgammon/board/immutable_board.py:16-24) and
copies it on every submove (:183-258). Here a *batch* of boards is ONE int8
array with a 52-cell minor axis and every operation is a pure jittable
function over the whole batch.

Layout of the 52 cells (one lane-tile row per board):
    [ 0:24)  player-0 checkers per point
    [24:48)  player-1 checkers per point
    [48:50)  bar counts (p0, p1)
    [50:52)  borne-off counts (p0, p1)

Why flat: TPU tiles the two minor dims of every array; a [..., 2, 24] int8
points array pads (2, 24) -> (32, 128), an ~85x physical blowup that made
every board op memory-bound at ~5ms (measured on v5e). The flat [..., 52]
row pads only 52 -> 128 lanes and keeps all slicing in-lane, and gathering
whole boards (the move-enumeration hot path) is a contiguous row gather.

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

N_CELLS = 52
_BAR0, _OFF0 = 48, 50


class Board(NamedTuple):
    data: jax.Array  # int8[..., 52]

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.data.shape[:-1]


# Starting position, reference immutable_board.py:27-70.
_INITIAL = np.zeros(N_CELLS, dtype=np.int8)
_INITIAL[0], _INITIAL[11], _INITIAL[16], _INITIAL[18] = 2, 5, 3, 5
_INITIAL[24 + 23], _INITIAL[24 + 12], _INITIAL[24 + 7], _INITIAL[24 + 5] = 2, 5, 3, 5


def initial_board(batch_shape: Tuple[int, ...] = ()) -> Board:
    """Batch of starting positions (reference immutable_board.py:27-70)."""
    return Board(
        data=jnp.broadcast_to(jnp.asarray(_INITIAL), (*batch_shape, N_CELLS))
    )


def make_board(points: np.ndarray, bar: np.ndarray, off: np.ndarray) -> Board:
    """Assemble from [..., 2, 24] points + [..., 2] bar/off (host-side)."""
    pts = np.asarray(points, np.int8)
    flat = pts.reshape(*pts.shape[:-2], 48)
    data = np.concatenate(
        [flat, np.asarray(bar, np.int8), np.asarray(off, np.int8)], axis=-1
    )
    return Board(data=jnp.asarray(data))


_POINT_IOTA = np.arange(NUM_POINTS, dtype=np.int32)


def player_points(board: Board, player: jax.Array) -> jax.Array:
    """int8[..., 24] checkers of ``player`` (lane-slice select)."""
    p = player.astype(jnp.int32)[..., None]
    return jnp.where(p == 0, board.data[..., 0:24], board.data[..., 24:48])


def opponent_points(board: Board, player: jax.Array) -> jax.Array:
    return player_points(board, 1 - player)


def _sel2(board: Board, base: int, player: jax.Array) -> jax.Array:
    p = player.astype(jnp.int32)
    return jnp.where(p == 0, board.data[..., base], board.data[..., base + 1])


def bar_count(board: Board, player: jax.Array) -> jax.Array:
    return _sel2(board, _BAR0, player)


def off_count(board: Board, player: jax.Array) -> jax.Array:
    return _sel2(board, _OFF0, player)


def _cell_iota() -> jax.Array:
    return jnp.arange(N_CELLS, dtype=jnp.int32)


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
    """
    p = player.astype(jnp.int32)
    q = 1 - p
    v = valid.astype(jnp.int8)
    hit = (hits & valid).astype(jnp.int8)

    start = start.astype(jnp.int32)
    end = end.astype(jnp.int32)
    own_from = jnp.where(start == BAR, _BAR0 + p, start + 24 * p)
    own_to = jnp.where(end == BEAR_OFF, _OFF0 + p, end + 24 * p)
    opp_at = end + 24 * q  # only used when hit (end is then a point)
    opp_bar = _BAR0 + q

    iota = _cell_iota()
    delta = v[..., None] * (
        (own_to[..., None] == iota).astype(jnp.int8)
        - (own_from[..., None] == iota).astype(jnp.int8)
    ) + hit[..., None] * (
        (opp_bar[..., None] == iota).astype(jnp.int8)
        - (opp_at[..., None] == iota).astype(jnp.int8)
    )
    return Board(data=board.data + delta)


# ---------------------------------------------------------------------------
# Predicates (reference conditions.py / env_helper.py)
# ---------------------------------------------------------------------------

_HOME_MASK = np.zeros((2, NUM_POINTS), dtype=bool)
_HOME_MASK[0, 18:24] = True  # P1 home, conditions.py:173
_HOME_MASK[1, 0:6] = True  # P2 home, conditions.py:171


def _home_mask(player: jax.Array) -> jax.Array:
    return jnp.where(
        player.astype(jnp.int32)[..., None] == 0,
        jnp.asarray(_HOME_MASK[0]),
        jnp.asarray(_HOME_MASK[1]),
    )


def has_won(board: Board, player: jax.Array) -> jax.Array:
    """reference conditions.py:137-149 (borne_off == 15)."""
    return off_count(board, player) == CHECKERS_PER_PLAYER


def on_bar(board: Board, player: jax.Array) -> jax.Array:
    """reference conditions.py:122-134."""
    return bar_count(board, player) > 0


def all_checkers_home(board: Board, player: jax.Array) -> jax.Array:
    """reference conditions.py:152-194: no bar checkers and no checkers
    outside the home board (borne-off checkers count toward the 15)."""
    own = player_points(board, player)
    outside = jnp.sum(
        jnp.where(_home_mask(player), 0, own.astype(jnp.int32)), axis=-1
    )
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
    return off_count(board, 1 - winner) == 0


def is_backgammon(board: Board, winner: jax.Array) -> jax.Array:
    """reference env_helper.py:130-163: opponent borne off nothing AND has a
    checker in the winner's home board or on the bar."""
    opp = 1 - winner
    opp_pts = player_points(board, opp)
    in_home = (
        jnp.sum(jnp.where(_home_mask(winner), opp_pts.astype(jnp.int32), 0), axis=-1)
        > 0
    )
    return is_gammon(board, winner) & (in_home | on_bar(board, opp))


def is_closed_out(board: Board, player: jax.Array) -> jax.Array:
    """reference env_helper.py:218-242: opponent on the bar and every point of
    the player's home board holds >= 2 of the player's checkers."""
    own = player_points(board, player)
    all_made = jnp.all(jnp.where(_home_mask(player), own >= 2, True), axis=-1)
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

    w = made
    for shift in range(1, 5):
        w = w & jnp.roll(made, -shift, axis=-1)
    idx = jnp.asarray(_POINT_IOTA)
    window_ok = w & (idx <= NUM_POINTS - 5)

    opp_any = (opp > 0).astype(jnp.int32)
    suffix = jnp.cumsum(opp_any[..., ::-1], axis=-1)[..., ::-1]
    prefix = jnp.cumsum(opp_any, axis=-1)
    after = jnp.concatenate(
        [suffix[..., 5:], jnp.zeros((*suffix.shape[:-1], 5), suffix.dtype)], axis=-1
    )
    before = jnp.concatenate(
        [jnp.zeros((*prefix.shape[:-1], 1), prefix.dtype), prefix[..., :-1]], axis=-1
    )
    p = player.astype(jnp.int32)[..., None]
    behind = jnp.where(p == 0, after, before) > 0
    return jnp.any(window_ok & behind, axis=-1)


def checker_conservation_ok(board: Board) -> jax.Array:
    """Property invariant: each player's points + bar + off == 15."""
    d = board.data.astype(jnp.int32)
    t0 = jnp.sum(d[..., 0:24], axis=-1) + d[..., _BAR0] + d[..., _OFF0]
    t1 = jnp.sum(d[..., 24:48], axis=-1) + d[..., _BAR0 + 1] + d[..., _OFF0 + 1]
    return (t0 == CHECKERS_PER_PLAYER) & (t1 == CHECKERS_PER_PLAYER)


# ---------------------------------------------------------------------------
# Board hashing — dedup keys for the "sorted" reference-order engine.
# Two independent additive 32-bit hashes over per-(cell, count) random tables;
# deltas computable incrementally from a submove without materializing the
# child board. (The canonical engine dedups by exact board comparison on the
# MXU instead and does not use these.)
# ---------------------------------------------------------------------------

_rng = np.random.default_rng(0xB0A2D5EED)
_HASH_TABLES = _rng.integers(
    0, 2**32, size=(2, N_CELLS, CHECKERS_PER_PLAYER + 1), dtype=np.uint32
)


def board_hash(board: Board) -> Tuple[jax.Array, jax.Array]:
    """Full (h1, h2) uint32 hashes of a board batch."""
    t = jnp.asarray(_HASH_TABLES)  # [2, 52, 16]
    cnt = board.data.astype(jnp.int32)  # [..., 52]

    def one(table: jax.Array) -> jax.Array:
        flat = table.reshape(-1)  # [52*16]
        lin = _cell_iota() * (CHECKERS_PER_PLAYER + 1) + cnt
        return jnp.sum(jnp.take(flat, lin), axis=-1, dtype=jnp.uint32)

    return one(t[0]), one(t[1])


def submove_hash_delta(
    board: Board,
    player: jax.Array,
    start: jax.Array,
    end: jax.Array,
    hits: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(dh1, dh2) such that hash(child) = hash(parent) + dh, for the submove
    applied to ``board`` by ``player``. Caller masks invalid submoves."""
    t = jnp.asarray(_HASH_TABLES)
    p = player.astype(jnp.int32)
    q = 1 - p
    start = start.astype(jnp.int32)
    end = end.astype(jnp.int32)

    own_from = jnp.where(start == BAR, _BAR0 + p, start + 24 * p)
    own_to = jnp.where(end == BEAR_OFF, _OFF0 + p, end + 24 * p)
    opp_at = jnp.clip(end, 0, NUM_POINTS - 1) + 24 * q
    opp_bar = _BAR0 + q

    def cnt_at(cell):
        return jnp.take_along_axis(
            board.data.astype(jnp.int32), cell[..., None], axis=-1
        )[..., 0]

    c_from, c_to, c_bar = cnt_at(own_from), cnt_at(own_to), cnt_at(opp_bar)
    hit = hits.astype(jnp.int32)

    def one(table: jax.Array) -> jax.Array:
        flat = table.reshape(-1)
        w = CHECKERS_PER_PLAYER + 1

        def lut(cell, count):
            return jnp.take(flat, cell * w + count)

        d = lut(own_from, c_from - 1) - lut(own_from, c_from)
        d = d + lut(own_to, c_to + 1) - lut(own_to, c_to)
        d_hit = (
            lut(opp_at, jnp.zeros_like(c_to))
            - lut(opp_at, jnp.ones_like(c_to))
            + lut(opp_bar, c_bar + 1)
            - lut(opp_bar, c_bar)
        )
        return d + jnp.where(hit > 0, d_hit, jnp.zeros_like(d_hit))

    return one(t[0]), one(t[1])


def pack_board(board: Board) -> jax.Array:
    """int8[..., 52] compact form — the identity in the flat layout."""
    return board.data


def unpack_board(packed: jax.Array) -> Board:
    return Board(data=packed)
