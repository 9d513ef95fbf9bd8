"""Tiered two-plane movegen pipeline + two-tier doubles expansion.

REJECTED EXPERIMENT (kept default-off; see experimental/__init__.py for the
measured A/B evidence). Exact up to surfaced ``overflow`` flags; exercised
by the ``slow``-marked tier cases in tests/test_movegen2.py and wired
through ``train --tiered`` / MoveGenConfig.tiered / MoveGenConfig.dd_tier.

Reference analog: none — the reference materializes every candidate at full
width per decision (env_helper.py:7-24); this pipeline was an attempt to
avoid the merged [B, a_max, 52] HBM streams the TPU port pays instead.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.model import value_net
from mlp_ppo_2ply_multi_tpu.engine.movegen import (
    MoveSet,
    board_take_onehot,
    board_where,
)
from mlp_ppo_2ply_multi_tpu.engine.movegen2 import (
    _flat_take0,
    _nd_candidates,
    _nd_tail,
    _popcount,
    _select_set_bits,
    enumerate_doubles,
    legal_moves,
)

_NEG = -1e9


def doubles_two_tier(
    board: Board,
    player: jax.Array,
    die: jax.Array,
    ok: jax.Array,
    cfg: MoveGenConfig,
) -> MoveSet:
    """Two-tier doubles expansion (MoveGenConfig.dd_tier) over an already
    compacted [W] doubles sub-batch.

    Tier 1 runs the full canonical chain at the narrow (t2, t3, t4) level
    widths for every game. _expand reports n_children > width BEFORE
    truncating (and the root select's shortfall is root_cc > w1), so the
    narrow run's MoveSet.overflow is exactly "this game needed more than the
    narrow widths" — those games re-run at the full w2/w3/w4 on a W/div
    sub-sub-batch (tier 2). A wide game beyond that capacity keeps the
    narrow result and stays overflow-flagged — the same surfaced-truncation
    class as the nd tier and the Q7 cap."""
    t2, t3, t4 = cfg.dd_tier
    ncfg = dataclasses.replace(
        cfg, w2=t2, w3=t3, w4=t4, a_max=min(cfg.a_max, t4)
    )
    narrow = enumerate_doubles(board, player, die, ncfg)

    wide = narrow.overflow & ok
    w = ok.shape[0]
    wn = max(8, w // cfg.dd_wide_div)
    sel, sel_ok = _select_set_bits(wide, wn)
    wsub = enumerate_doubles(
        _flat_take0(board, sel), jnp.take(player, sel), jnp.take(die, sel), cfg
    )

    pad = wsub.valid.shape[-1] - narrow.valid.shape[-1]
    nb = Board(data=jnp.pad(narrow.boards.data, ((0, 0), (0, pad), (0, 0))))
    nv = jnp.pad(narrow.valid, ((0, 0), (0, pad)))
    rank = jnp.cumsum(wide.astype(jnp.int32)) - 1
    in_sub = wide & (rank < wn)
    slot = jnp.clip(rank, 0, wn - 1)
    return MoveSet(
        boards=board_where(in_sub[:, None], _flat_take0(wsub.boards, slot), nb),
        valid=jnp.where(in_sub[:, None], jnp.take(wsub.valid, slot, axis=0), nv),
        count=jnp.where(in_sub, jnp.take(wsub.count, slot), narrow.count),
        overflow=jnp.where(in_sub, jnp.take(wsub.overflow, slot), narrow.overflow),
    )


class Tiered(NamedTuple):
    """Two-plane legal-move set (MoveGenConfig.tiered).

    The merged full-width MoveSet costs several [B, a_max, 52] HBM streams
    (pad + dd scatter + nd/dd merge) that exist only so the actor can
    re-compact them back down to its tier width. Instead: a ``narrow`` plane
    holds every game's enumeration at width T = nd_tier (EXACT for nd games
    with n_pre <= T and dd games that fit the dd_tier widths — the measured
    production distribution puts ~97% of decisions there), and the games the
    narrow enumeration itself flags re-run through the ordinary full-width
    ``legal_moves`` on a batch/tiered_wide_div sub-batch (``wide``). A
    flagged game beyond the wide capacity keeps its narrow result and
    surfaces in ``overflow`` — the same truncation class as the Q7 cap.
    """

    narrow_boards: Board  # [B, T]
    narrow_valid: jax.Array  # bool[B, T] (non-contiguous survivor mask)
    wide: MoveSet  # [Wb, >=a_max] full-fidelity sub-batch
    wide_player: jax.Array  # int32[Wb] mover of each wide row
    in_wide: jax.Array  # bool[B] game's result lives in the wide plane
    wide_slot: jax.Array  # int32[B] row in the wide plane (clipped)
    count: jax.Array  # int32[B]
    overflow: jax.Array  # bool[B]


def legal_moves_tiered(
    board: Board, player: jax.Array, dice: jax.Array, cfg: MoveGenConfig
) -> Tiered:
    """Tiered dispatch over a flat [B] batch (iid dice). Requires nd_tier
    and dd_tier configured; the wide plane runs the unsub-batched,
    untired ``legal_moves`` so its rows are bit-identical to the parity
    engine's output."""
    T = cfg.nd_tier
    assert T and cfg.dd_tier, "legal_moves_tiered needs nd_tier and dd_tier"
    t2, t3, t4 = cfg.dd_tier
    assert t4 <= T, "dd_tier level-4 width must fit the narrow plane"
    n = board.batch_shape[0]
    is_dd = dice[:, 0] == dice[:, 1]

    # ---- narrow nd: candidate front half + width-T tail for every game ----
    pa, pb, valid, d_hi, d_lo = _nd_candidates(board, player, dice)
    n_pre = _popcount(valid)
    after_n, keep_n, _ = _nd_tail(
        board, pa.b1, pb.b1, valid, player, d_hi, d_lo, T, cfg.a_max,
        cfg.nd_sig_dedup,
    )
    nd_wide = ~is_dd & (n_pre > T)

    # ---- narrow dd: compacted sub-batch chain at the dd_tier widths ----
    w_dd = max(8, -(-n // cfg.dd_subbatch_div)) if cfg.dd_subbatch_div else n
    seld, okd = _select_set_bits(is_dd, w_dd)
    ncfg = dataclasses.replace(cfg, w2=t2, w3=t3, w4=t4, a_max=min(cfg.a_max, t4))
    dnarrow = enumerate_doubles(
        _flat_take0(board, seld),
        jnp.take(player, seld),
        jnp.take(dice[:, 0].astype(jnp.int32), seld),
        ncfg,
    )
    pad_d = T - dnarrow.valid.shape[-1]
    d_boards = Board(data=jnp.pad(dnarrow.boards.data, ((0, 0), (0, pad_d), (0, 0))))
    d_valid = jnp.pad(dnarrow.valid & okd[:, None], ((0, 0), (0, pad_d)))
    rank_d = jnp.cumsum(is_dd.astype(jnp.int32)) - 1
    in_dd_sub = is_dd & (rank_d < w_dd)
    slot_d = jnp.clip(rank_d, 0, w_dd - 1)

    # ---- merge planes at width T (the ONLY [B, T, 52] materialization) ----
    narrow_boards = board_where(
        is_dd[:, None], _flat_take0(d_boards, slot_d), after_n
    )
    narrow_valid = jnp.where(
        is_dd[:, None], jnp.take(d_valid, slot_d, axis=0) & in_dd_sub[:, None], keep_n
    )
    narrow_count = _popcount(narrow_valid)

    # ---- wide plane: full-fidelity legal_moves on the flagged games ----
    # a dd game needs it when its narrow chain overflowed the dd_tier widths
    # OR it missed the dd sub-batch entirely (no narrow result at all)
    wide_mask = nd_wide | (
        is_dd & (~in_dd_sub | jnp.take(dnarrow.overflow, slot_d))
    )
    wb = max(8, n // cfg.tiered_wide_div)
    selw, okw = _select_set_bits(wide_mask, wb)
    wcfg = dataclasses.replace(cfg, dd_subbatch_div=0, nd_tier=0, dd_tier=())
    wide_player = jnp.take(player, selw)
    wide = legal_moves(
        _flat_take0(board, selw), wide_player, _flat_take0(dice, selw), wcfg
    )
    wide = MoveSet(
        boards=wide.boards,
        valid=wide.valid & okw[:, None],
        count=jnp.where(okw, wide.count, 0),
        overflow=wide.overflow,
    )
    rank_w = jnp.cumsum(wide_mask.astype(jnp.int32)) - 1
    in_wide = wide_mask & (rank_w < wb)
    slot_w = jnp.clip(rank_w, 0, wb - 1)

    count = jnp.where(in_wide, jnp.take(wide.count, slot_w), narrow_count)
    # overflow: wide rows report the full program's own caps; narrow nd rows
    # are exact by construction (n_pre <= T < a_max) and narrow dd rows fit
    # their dd_tier widths; flagged games beyond the wide capacity are
    # truncated to their narrow result (dd games that also missed the dd
    # sub-batch present zero moves)
    dropped = wide_mask & ~in_wide
    overflow = (
        jnp.where(in_wide, jnp.take(wide.overflow, slot_w), False) | dropped
    )
    return Tiered(
        narrow_boards=narrow_boards,
        narrow_valid=narrow_valid,
        wide=wide,
        wide_player=wide_player,
        in_wide=in_wide,
        wide_slot=slot_w,
        count=count,
        overflow=overflow,
    )

def chosen_tiered(
    params, state, tiered, key, temperature, cfg: Config
) -> Tuple[jax.Array, jax.Array]:
    """Sample a move per plane of a Tiered set and return the
    CHOSEN BOARD directly (vec_env.step_chosen consumes it; the merged
    [B, A, 52] move tensor never exists). Same softmax(V/T) semantics as
    select_action; the narrow plane needs no compaction — it IS the tier."""
    from mlp_ppo_2ply_multi_tpu.ops.fused_value import fused_value

    side0 = cfg.train.td_mode == "side0"
    k1, k2 = jax.random.split(key)
    v_obs = value_net.forward(
        params, encode_board(state.board, state.player), cfg.model
    )

    # narrow plane: [B, T]
    p = state.player
    cand_flag = (1 - p) if side0 else p
    v1 = fused_value(tiered.narrow_boards.data, cand_flag[..., None], params)
    if side0:
        v1 = v1 * jnp.where(p == 0, 1.0, -1.0)[..., None]
    logits1 = jnp.where(tiered.narrow_valid, v1 / temperature, _NEG)
    pick1 = jax.random.categorical(k1, logits1, axis=-1)
    c1 = board_take_onehot(tiered.narrow_boards, pick1[..., None]).data[..., 0, :]

    # wide plane: [Wb, A]
    wp = tiered.wide_player
    wflag = (1 - wp) if side0 else wp
    v2 = fused_value(tiered.wide.boards.data, wflag[..., None], params)
    if side0:
        v2 = v2 * jnp.where(wp == 0, 1.0, -1.0)[..., None]
    logits2 = jnp.where(tiered.wide.valid, v2 / temperature, _NEG)
    pick2 = jax.random.categorical(k2, logits2, axis=-1)
    c2 = board_take_onehot(tiered.wide.boards, pick2[..., None]).data[..., 0, :]

    chosen = jnp.where(
        tiered.in_wide[..., None], jnp.take(c2, tiered.wide_slot, axis=0), c1
    )
    return Board(data=chosen), v_obs
