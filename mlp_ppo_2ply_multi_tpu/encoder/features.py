"""Tesauro 198-feature board encoding as a batched tensor op.

The layout replicates the reference's *live* encoder
(/root/reference/src/backgammon/board/immutable_board.py:86-128), NOT the
deprecated interleaved layout (:130-181) — quirk Q11 in SURVEY.md:

    [  0: 96)  player-1 points 0..23 x (>=1, >=2, >=3, (n-3)/2 clamped >= 0)
    [ 96:192)  player-2 points, same 4-tuple per point
    [192]      bar[P1] / 2
    [193]      off[P1] / 15
    [194]      bar[P2] / 2
    [195]      off[P2] / 15
    [196:198)  side-to-move one-hot (P1, P2)

Checkpoint compatibility with the reference's shipped .pth files requires
this exact ordering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.types import FEATURE_DIM
from mlp_ppo_2ply_multi_tpu.engine.board import Board


def encode_board(board: Board, player: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Encode a board batch from ``player``'s side-to-move perspective.

    board arrays have batch shape S; player is int[...]=S; returns
    float[S + (198,)].
    """
    cnt = board.data[..., :48].astype(dtype)  # [..., 48] cells in (player, point) order
    f1 = (cnt >= 1).astype(dtype)
    f2 = (cnt >= 2).astype(dtype)
    f3 = (cnt >= 3).astype(dtype)
    f4 = jnp.maximum(cnt - 3.0, 0.0) * 0.5
    # [..., 48, 4] -> [..., 192]: cell-major (player then point) with the
    # 4-tuple minor, exactly torch.stack([...], dim=2).view(-1) in the
    # reference (immutable_board.py:103-112).
    stack = jnp.stack([f1, f2, f3, f4], axis=-1)
    point_feats = stack.reshape(*cnt.shape[:-1], 192)

    tail_d = board.data[..., 48:52].astype(dtype)
    bs = tail_d[..., 0].shape  # board batch shape (player may broadcast into it)
    tail = jnp.stack(
        [
            tail_d[..., 0] / 2.0,  # bar p0
            tail_d[..., 2] / 15.0,  # off p0
            tail_d[..., 1] / 2.0,  # bar p1
            tail_d[..., 3] / 15.0,  # off p1
            jnp.broadcast_to((player == 0).astype(dtype), bs),
            jnp.broadcast_to((player == 1).astype(dtype), bs),
        ],
        axis=-1,
    )
    out = jnp.concatenate([point_feats, tail], axis=-1)
    assert out.shape[-1] == FEATURE_DIM
    return out
