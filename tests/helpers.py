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
    data = np.array(
        [list(b[0]) + list(b[1]) + list(b[2]) + list(b[3]) for b in boards],
        dtype=np.int8,
    )
    return Board(data=jnp.asarray(data))


def jax_board_to_tuple(b, g: int, k: int = None) -> BoardT:
    """Extract game g (and entry k if given) as an oracle board tuple."""
    d = np.asarray(b.data)
    d = d[g, k] if k is not None else d[g]
    return (
        tuple(int(x) for x in d[0:24]),
        tuple(int(x) for x in d[24:48]),
        (int(d[48]), int(d[49])),
        (int(d[50]), int(d[51])),
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
