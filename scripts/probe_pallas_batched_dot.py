"""Feasibility probe for the movegen expansion kernel: does Mosaic compile a
batched per-row one-hot take ([R, K, W] @ [R, W, 52]) inside one pallas_call,
and how fast vs the XLA einsum? Also probes a fori_loop-of-2D-dots fallback.

Usage: python scripts/probe_pallas_batched_dot.py [mode] [R]
  mode: batched | loop | xla
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


fm = {"xla": take_xla, "gather": take_gather, "fused": take_pallas_fused}
f = fm.get(MODE) or (lambda b, p: take_pallas(b, p, MODE))
out = f(boards, parent)
jax.block_until_ready(out)
ref = np.take_along_axis(np.asarray(boards), np.asarray(parent)[..., None], axis=1)
ok = np.array_equal(np.asarray(out), ref)
print("exact:", ok)
t0 = time.perf_counter()
for i in range(20):
    out = f(boards, parent)
jax.block_until_ready(out)
print(f"{MODE}: {(time.perf_counter()-t0)/20*1000:.3f} ms for [{N},{K},{W}]x[{N},{W},{C}]")
