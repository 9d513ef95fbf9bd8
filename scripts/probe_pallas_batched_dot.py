"""Feasibility probe for the movegen expansion kernel: does Mosaic compile a
batched per-row one-hot take ([R, K, W] @ [R, W, 52]) inside one pallas_call,
and how fast vs the XLA einsum? Also probes a fori_loop-of-2D-dots fallback.

Usage: python scripts/probe_pallas_batched_dot.py [mode] [N] [R]
  mode: one of the keys of the `fm` dispatch dict at the bottom of this file
        (batched | loop | xla | bf16acc | int8 | int8acc | f32 | packed |
         ohonly | dotonly | bf16T | bdiag4 | bdiag8 | bdiag16 | gather | fused)
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = sys.argv[1] if len(sys.argv) > 1 else "batched"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
R = int(sys.argv[3]) if len(sys.argv) > 3 else 128  # rows per kernel instance
K, W, C = 128, 128, 52

key = jax.random.PRNGKey(0)
boards = jax.random.randint(key, (N, W, C), 0, 5, jnp.int8)
parent = jax.random.randint(jax.random.fold_in(key, 1), (N, K), 0, W, jnp.int32)


def kernel_batched(oh_ref, b_ref, o_ref):
    oh = oh_ref[...]  # [R, K, W] bf16
    b = b_ref[...].astype(jnp.bfloat16)  # [R, W, C]
    out = jax.lax.dot_general(
        oh, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = out.astype(jnp.int8)


def kernel_loop(oh_ref, b_ref, o_ref):
    def body(i, _):
        oh = oh_ref[i]  # [K, W]
        b = b_ref[i].astype(jnp.bfloat16)  # [W, C]
        o_ref[i] = jnp.dot(
            oh, b, preferred_element_type=jnp.float32
        ).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, R, body, 0)


import functools


@functools.partial(jax.jit, static_argnames=("mode",))
def take_pallas(boards, parent, mode):
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.bfloat16)
    kern = kernel_batched if mode == "batched" else kernel_loop
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, K, C), jnp.int8),
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R, K, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, K, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(oh, boards)


@jax.jit
def take_gather(boards, parent):
    return jnp.take_along_axis(boards, parent[..., None], axis=1)


def kernel_fused(p_ref, b_ref, o_ref):
    oh = (p_ref[...][..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (R, K, W), 2)).astype(jnp.bfloat16)
    b = b_ref[...].astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        oh, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = out.astype(jnp.int8)


@jax.jit
def take_pallas_fused(boards, parent):
    return pl.pallas_call(
        kernel_fused,
        out_shape=jax.ShapeDtypeStruct((N, K, C), jnp.int8),
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec((R, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, K, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(parent, boards)


@jax.jit
def take_xla(boards, parent):
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.bfloat16)
    out = jnp.einsum(
        "nkw,nwc->nkc", oh, boards.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int8)


@jax.jit
def take_xla_bf16acc(boards, parent):
    # the production board_take_onehot: bf16 accumulation (exact for counts<=15)
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.bfloat16)
    out = jnp.einsum(
        "nkw,nwc->nkc", oh, boards.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    return out.astype(jnp.int8)


@jax.jit
def take_int8(boards, parent):
    # int8-native MXU path: v5e int8 peak is 2x bf16; exact by construction
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.int8)
    out = jnp.einsum(
        "nkw,nwc->nkc", oh, boards,
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.int8)


@jax.jit
def take_int8_i8acc(boards, parent):
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.int8)
    out = jnp.einsum(
        "nkw,nwc->nkc", oh, boards,
        preferred_element_type=jnp.int8,
    )
    return out


@jax.jit
def take_f32(boards, parent):
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.float32)
    out = jnp.einsum(
        "nkw,nwc->nkc", oh, boards.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int8)


@jax.jit
def take_packed(boards, parent):
    # pack 3 int8 cells (values in [0,16)) into one bf16 lane via base-32
    # digits: bf16 mantissa (8 bits) holds ints <= 256 exactly... too small.
    # use f32 lanes: 4 base-32 digits = 20 bits < 24-bit mantissa. C 52 -> 13.
    CP = -(-C // 4)  # ceil(C/4); pad lanes must decode to the +16 bias below
    b = boards.astype(jnp.float32)
    pad = jnp.full((N, W, CP * 4 - C), 16.0, jnp.float32)
    bp = jnp.concatenate([b + 16.0, pad], axis=-1).reshape(N, W, CP, 4)
    scale = jnp.asarray([1.0, 32.0, 32.0 ** 2, 32.0 ** 3], jnp.float32)
    packed = (bp * scale).sum(-1)  # [N, W, 13]
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.float32)
    out = jnp.einsum("nkw,nwc->nkc", oh, packed,
                     preferred_element_type=jnp.float32)  # [N,K,13]
    d0 = jnp.floor_divide(out, 1.0) % 32.0
    d1 = jnp.floor_divide(out, 32.0) % 32.0
    d2 = jnp.floor_divide(out, 32.0 ** 2) % 32.0
    d3 = jnp.floor_divide(out, 32.0 ** 3) % 32.0
    unp = jnp.stack([d0, d1, d2, d3], -1).reshape(N, K, CP * 4)[..., :C]
    return (unp - 16.0).astype(jnp.int8)


@jax.jit
def oh_only(boards, parent):
    # cost of materializing + streaming the one-hot alone (reduce to keep it live)
    oh = (parent[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.bfloat16)
    return oh.sum(axis=-1)


@jax.jit
def dot_only(boards, oh):
    # the batched dot with a pre-materialized one-hot input
    out = jnp.einsum("nkw,nwc->nkc", oh, boards.astype(jnp.bfloat16),
                     preferred_element_type=jnp.bfloat16)
    return out.astype(jnp.int8)


@jax.jit
def take_bf16T(boards, parent):
    # selector built pre-transposed [N, W, K]; contraction over the W sublane
    # axis of both operands — probes whether XLA's layout assignment was
    # paying a relayout copy on the [N, K, W] orientation
    ohT = (parent[:, None, :] == jnp.arange(W, dtype=jnp.int32)[None, :, None]
           ).astype(jnp.bfloat16)  # [N, W, K]
    out = jnp.einsum("nwk,nwc->nkc", ohT, boards.astype(jnp.bfloat16),
                     preferred_element_type=jnp.bfloat16)
    return out.astype(jnp.int8)


def _bdiag_kernel(targ_ref, tab_ref, o_ref, *, r, k, w, c):
    # block-diagonal one-hot: row (i, j) of the R*K logical rows selects
    # column i*W + idx[i, j] of the R*W stacked table rows. targ carries the
    # i*W offset already (computed outside the kernel).
    targ = targ_ref[...]  # [R, K] int32
    col = jax.lax.broadcasted_iota(jnp.int32, (r, k, r * w), 2)
    oh = (col == targ[..., None]).astype(jnp.bfloat16)  # [R, K, R*W]
    tab = tab_ref[...].astype(jnp.bfloat16)  # [R*W, C]
    out = jax.lax.dot_general(
        oh, tab, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, K, C]
    o_ref[...] = out.astype(jnp.int8)


def take_bdiag(boards, parent, r):
    n, w, c = boards.shape
    k = parent.shape[1]
    # per-tile row offset folded into the index outside the kernel
    targ = parent + w * (jnp.arange(n, dtype=jnp.int32)[:, None] % r)
    tab_flat = boards.reshape(n * w, c)
    return pl.pallas_call(
        functools.partial(_bdiag_kernel, r=r, k=k, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((n, k, c), jnp.int8),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r * w, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, k, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(targ, tab_flat)


fm = {"xla": take_xla, "gather": take_gather, "fused": take_pallas_fused,
      "bf16acc": take_xla_bf16acc, "int8": take_int8, "int8acc": take_int8_i8acc,
      "f32": take_f32, "packed": take_packed, "ohonly": oh_only, "dotonly": dot_only,
      "bf16T": take_bf16T,
      "bdiag4": jax.jit(lambda b, p: take_bdiag(b, p, 4)),
      "bdiag8": jax.jit(lambda b, p: take_bdiag(b, p, 8)),
      "bdiag16": jax.jit(lambda b, p: take_bdiag(b, p, 16))}
f = fm.get(MODE) or (lambda b, p: take_pallas(b, p, MODE))
if MODE == "dotonly":
    oh_pre = jax.device_put(
        (np.asarray(parent)[..., None] == np.arange(W)).astype(np.float32)
    ).astype(jnp.bfloat16)
    raw_f = f
    f = lambda b, p: raw_f(b, oh_pre)
out = f(boards, parent)
jax.block_until_ready(out)
if MODE == "ohonly":
    ok = "n/a"
else:
    ref = np.take_along_axis(np.asarray(boards), np.asarray(parent)[..., None], axis=1)
    ok = np.array_equal(np.asarray(out), ref)
print("exact:", ok)
t0 = time.perf_counter()
for i in range(20):
    out = f(boards, parent)
jax.block_until_ready(out)
print(f"{MODE}: {(time.perf_counter()-t0)/20*1000:.3f} ms for [{N},{K},{W}]x[{N},{W},{C}]")
