"""Fused board->value Pallas kernel (the actor's hot forward).

The standard path materializes a [B, A, 198] feature tensor in HBM
(encoder/features.py -> model/value_net.py); at B=4096, A=448 the XLA
program spends ~9ms/step on pure data movement for it (feature-stack
fusion, two layout copies, a 198-wide concatenate — measured via
utils/profiling.device_op_times, see PERF.md). This kernel instead streams
the int8 board rows through VMEM and computes the whole value net per tile:
features never touch HBM.

It relies on an exact algebraic reformulation of Tesauro encoding (reference
immutable_board.py:86-128): for integer counts n and thresholds k,

    [n>=1] = relu(n) - relu(n-1)
    [n>=2] = relu(n-1) - relu(n-2)
    [n>=3] = relu(n-2) - relu(n-3)
    max(n-3, 0)/2 = relu(n-3)/2

so the first layer's pre-activation  feats @ W1  telescopes into

    relu(cnt @ REP - K) @ G

where REP int[52, 208] replicates each of the 52 board cells into 4 lanes,
K = [0,1,2,3] per cell, and G recombines W1 rows (differences of adjacent
rows; bar/off cells are linear and use only their k=0 lane). The
side-to-move one-hot enters layer 1 linearly (w196*(1-f) + w197*f), so the
kernel emits BOTH turn variants and the caller selects — cheaper than a
per-row flag input, whose concatenate cost a measured 0.65ms HBM copy.

Exact for the integer inputs of this domain (counts <= 15, flag in {0,1}):
all intermediates are integers <= 15 representable in bfloat16, and each
one-hot/replication matmul accumulates in float32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


N_CELLS = 52  # 48 point cells + bar x2 + off x2 (board.py flat layout)
N_REP = 4 * N_CELLS  # 208
_ROWS = 4096  # board rows per kernel instance (= output lanes per block)


def _rep_matrix() -> np.ndarray:
    rep = np.zeros((N_CELLS, N_REP), np.float32)
    for u in range(N_CELLS):
        for k in range(4):
            rep[u, 4 * u + k] = 1.0
    return rep


def _k_vector() -> np.ndarray:
    return np.tile(np.arange(4, dtype=np.float32), N_CELLS)[None, :]


def recombine_params(params, dtype=jnp.bfloat16):
    """Build (G [212, h], b1' [1, h], w2 [1, h], b2) from the standard
    pytree. Cheap (a few [h]-row ops); runs per forward call under jit."""
    w1 = params["w1"].astype(jnp.float32)  # [198, h]
    h = w1.shape[1]
    g = jnp.zeros((N_REP, h), jnp.float32)
    # point cells 0..47 map to feature rows 4c..4c+3
    w0 = w1[0:192:4]  # [48, h] rows (n>=1)
    w1_ = w1[1:192:4]
    w2_ = w1[2:192:4]
    w3_ = w1[3:192:4]
    idx = np.arange(48)
    g = g.at[4 * idx + 0].set(w0)
    g = g.at[4 * idx + 1].set(w1_ - w0)
    g = g.at[4 * idx + 2].set(w2_ - w1_)
    g = g.at[4 * idx + 3].set(0.5 * w3_ - w2_)
    # board tail layout (engine/board.py): [48]=bar p0, [49]=bar p1,
    # [50]=off p0, [51]=off p1; feature rows 192=bar0/2, 193=off0/15,
    # 194=bar1/2, 195=off1/15 (encoder/features.py:46-55)
    g = g.at[4 * 48].set(w1[192] / 2.0)
    g = g.at[4 * 49].set(w1[194] / 2.0)
    g = g.at[4 * 50].set(w1[193] / 15.0)
    g = g.at[4 * 51].set(w1[195] / 15.0)
    # turn one-hot: w196*(1-f) + w197*f = (b1 + w196) + f*(w197 - w196)
    b1p = (params["b1"].astype(jnp.float32) + w1[196])[None, :]
    tflip = (w1[197] - w1[196])[None, :]
    w2r = params["w2"].astype(jnp.float32).reshape(1, h)
    return g.astype(dtype), b1p, tflip, w2r.astype(dtype), params["b2"].astype(jnp.float32)


def _kernel(cells_ref, rep_ref, k_ref, g_ref, b1_ref, tflip_ref, w2_ref, o0_ref, o1_ref):
    cnt = cells_ref[...].astype(jnp.bfloat16)  # [ROWS, 52]
    cr = jnp.dot(cnt, rep_ref[...], preferred_element_type=jnp.float32)  # [ROWS, 208]
    r = jnp.maximum(cr - k_ref[...], 0.0).astype(jnp.bfloat16)
    z = jnp.dot(r, g_ref[...], preferred_element_type=jnp.float32)  # [ROWS, h]
    # both side-to-move variants: the flag enters the first layer linearly
    # (w196*(1-f) + w197*f), so evaluating f=0 and f=1 costs one extra
    # sigmoid+head on the VPU instead of a per-row flag input (whose
    # concatenate was a measured 0.65ms HBM copy at [4096,448,53])
    for flip, out_ref in ((0, o0_ref), (1, o1_ref)):
        zz = z + b1_ref[...] if flip == 0 else z + (b1_ref[...] + tflip_ref[...])
        hid = jax.nn.sigmoid(zz).astype(jnp.bfloat16)
        # head as one wide [1,h] x [ROWS,h]^T dot; the [1, ROWS] lane-major
        # result maps straight onto the (1, 1, ROWS) output block
        vt = jax.lax.dot_general(
            w2_ref[...], hid, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, ROWS]
        out_ref[...] = vt[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_value_rows(cells: jax.Array, params, interpret: bool) -> jax.Array:
    """V over row-major int8 cell rows [N, 53] -> f32 [N]."""
    n = cells.shape[0]
    nt = -(-n // _ROWS)
    npad = nt * _ROWS
    if npad != n:
        cells = jnp.pad(cells, ((0, npad - n), (0, 0)))
    g, b1p, tflip, w2r, b2 = recombine_params(params)
    rep = jnp.asarray(_rep_matrix(), jnp.bfloat16)
    kvec = jnp.asarray(_k_vector(), jnp.float32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    # out [nt, 1, ROWS]: the (1, 1, ROWS) block's last two dims equal the
    # array's (Mosaic's divisible-by-(8,128)-or-equal rule), and each
    # instance's [1, ROWS] head result lands without any lane<->sublane
    # relayout; row-major reshape outside restores [N]
    out_spec = pl.BlockSpec((1, 1, _ROWS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((nt, 1, _ROWS), jnp.float32)
    v0, v1 = pl.pallas_call(
        _kernel,
        out_shape=(out_sds, out_sds),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((_ROWS, N_CELLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((N_CELLS, N_REP)),
            full((1, N_REP)),
            full((N_REP, g.shape[1])),
            full((1, b1p.shape[1])),
            full((1, tflip.shape[1])),
            full((1, w2r.shape[1])),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(cells, rep, kvec, g, b1p, tflip, w2r)
    return v0.reshape(npad)[:n] + b2, v1.reshape(npad)[:n] + b2


def fused_value(boards_data: jax.Array, flag: jax.Array, params) -> jax.Array:
    """V(board, side-to-move) for any batch shape.

    boards_data int8[..., 52] (engine/board.py flat layout), flag
    int[...] broadcastable side-to-move. Equivalent to
    ``value_net.forward(params, encode_board(boards, flag), cfg)`` with a
    bfloat16 compute dtype, with features kept in VMEM. The kernel evaluates
    both turn variants (the flag enters layer 1 linearly); the select here
    is an elementwise [...]-shaped where.
    """
    bs = boards_data.shape[:-1]
    rows = boards_data.reshape(-1, N_CELLS)
    interpret = jax.default_backend() == "cpu"
    v0, v1 = _fused_value_rows(rows, params, interpret)
    f = jnp.broadcast_to(flag, bs)
    return jnp.where(f == 0, v0.reshape(bs), v1.reshape(bs))
