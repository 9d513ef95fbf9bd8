"""Pallas first-occurrence duplicate mask (the non-doubles dedup hot op).

The XLA path (engine/movegen2._dup_earlier_mask) computes an exact pairwise
squared-distance Gram matrix and reduces it; at [4096, 384] the f32
[B, K, K] distance tensor round-trips ~2.3ms of HBM traffic per step in its
compare-reduce epilogue alone (see PERF.md). This kernel keeps each game's
Gram tile in VMEM: HBM traffic is just the int8 boards in and a [B, K] mask
out.

Exactness matches the XLA path's argument: board cells are integers <= 15,
so bf16 products (<= 225) are exact and f32 accumulation over 52 cells is
exact; d2 == 0 iff boards are identical.

Row validity is applied as a column factor; columns (the "later" candidate
i) need no mask because dup[i] for invalid i is ignored downstream.
In-kernel [1,K] -> [K,1] "transposes" are identity-matrix dots (Mosaic has
no cheap vector transpose).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GAMES = 8  # games per kernel instance (f32 output tile height)


def _kernel(cells_ref, okf_ref, ones_ref, out_ref):
    """Axes per game: i (the later candidate) on sublanes, j (the earlier
    candidate) on lanes. Every operand is produced in its consumed layout —
    norms are computed twice by two differently-shaped dots rather than
    transposed, the lane reduce lands in the [G, K, 1] column the output
    block expects."""
    g, k = cells_ref.shape[0], cells_ref.shape[1]
    j_lt_i = jax.lax.broadcasted_iota(
        jnp.int32, (g, k, k), 2
    ) < jax.lax.broadcasted_iota(jnp.int32, (g, k, k), 1)
    xg = cells_ref[...].astype(jnp.bfloat16)  # [G, K, 52]
    g2 = jax.lax.dot_general(
        xg, xg, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, K(i), K(j)] batched inner products
    xx = xg * xg
    n_i = jax.lax.dot_general(
        xx, ones_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G, K, 1] squared norms, sublane-resident
    n_j = jax.lax.dot_general(
        ones_ref[...], xx, (((0,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, G, K] same values, lane-resident
    d2 = n_i + n_j[0][:, None, :] - 2.0 * g2  # [G, K, K]
    ok_j = okf_ref[...][:, None, :]  # [G, 1, K] validity of the earlier cand
    same_earlier = jnp.where((d2 <= 0.0) & j_lt_i, ok_j, 0.0)
    out_ref[...] = jnp.max(same_earlier, axis=2, keepdims=True)  # [G, K, 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dup_earlier_pallas(packed: jax.Array, ok: jax.Array, interpret: bool = False):
    """dup[i] = exists valid j < i with an identical board.

    packed int8[..., K, C], ok bool[..., K]; returns bool[..., K]. Same
    contract as movegen2._dup_earlier_mask.
    """
    *lead, k, c = packed.shape
    b = 1
    for d in lead:
        b *= d
    cells = packed.reshape(b, k, c)
    okf = ok.reshape(b, k).astype(jnp.float32)
    bpad = -(-b // _GAMES) * _GAMES
    if bpad != b:
        cells = jnp.pad(cells, ((0, bpad - b), (0, 0), (0, 0)))
        okf = jnp.pad(okf, ((0, bpad - b), (0, 0)))
    ones = jnp.ones((c, 1), jnp.bfloat16)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((bpad, k, 1), jnp.float32),
        grid=(bpad // _GAMES,),
        in_specs=[
            pl.BlockSpec((_GAMES, k, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_GAMES, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_GAMES, k, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cells, okf, ones)
    return (out[:b, :, 0] > 0.5).reshape(*lead, k)
