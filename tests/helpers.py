"""Shared helpers for differential tests between the JAX engine and the
pure-python oracle."""
from __future__ import annotations

import random
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.oracle.rules import BoardT


def boards_to_jax(boards: Sequence[BoardT]) -> Board:
    pts = np.array([[b[0], b[1]] for b in boards], dtype=np.int8)
    bar = np.array([b[2] for b in boards], dtype=np.int8)
    off = np.array([b[3] for b in boards], dtype=np.int8)
    return Board(points=jnp.asarray(pts), bar=jnp.asarray(bar), off=jnp.asarray(off))


def jax_board_to_tuple(b, g: int, k: int = None) -> BoardT:
    """Extract game g (and entry k if given) as an oracle board tuple."""
    pts = np.asarray(b.points)
    bar = np.asarray(b.bar)
    off = np.asarray(b.off)
    if k is not None:
        pts, bar, off = pts[g, k], bar[g, k], off[g, k]
    else:
        pts, bar, off = pts[g], bar[g], off[g]
    return (
        tuple(int(x) for x in pts[0]),
        tuple(int(x) for x in pts[1]),
        tuple(int(x) for x in bar),
        tuple(int(x) for x in off),
    )


def sample_cases(
    seed: int, n: int, doubles_bias: float = 0.4
) -> Tuple[List[BoardT], List[int], List[Tuple[int, int]]]:
    from mlp_ppo_2ply_multi_tpu.oracle import sampling

    rng = random.Random(seed)
    boards, players, dice = [], [], []
    for _ in range(n):
        boards.append(sampling.random_board(rng))
        players.append(rng.randint(0, 1))
        dice.append(sampling.random_roll(rng, doubles_bias=doubles_bias))
    return boards, players, dice
