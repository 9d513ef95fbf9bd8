"""Bisect enumerate_nondoubles stages with unique inputs."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.engine.board import board_hash
from mlp_ppo_2ply_multi_tpu.env import vec_env

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = 6
cfg = Config().movegen
key = jax.random.PRNGKey(0)
state = vec_env.reset(key, B)
dices = [jax.random.randint(jax.random.PRNGKey(200 + i), (B, 2), 1, 7) for i in range(N + 1)]

def timeit(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(dices[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(d) for d in dices[1:]]
    jax.block_until_ready(outs)
    tr = (time.perf_counter() - t0) / N
    print(f"{name}: compile {tc:.0f}s steady {tr*1000:.1f}ms", flush=True)

bd, pl = state.board, state.player

def passes_only(d):
    h0 = board_hash(bd)
    hi = jnp.maximum(d[..., 0], d[..., 1]); lo = jnp.minimum(d[..., 0], d[..., 1])
    pa = MG2._run_pass(bd, pl, hi, lo, h0)
    pb = MG2._run_pass(bd, pl, lo, hi, h0)
    return pa.h1p.sum() + pb.h1p.sum() + pa.pair_valid.sum() + pb.pair_valid.sum()
timeit("2x_run_pass", passes_only)

def upto_select(d):
    h0 = board_hash(bd)
    hi = jnp.maximum(d[..., 0], d[..., 1]); lo = jnp.minimum(d[..., 0], d[..., 1])
    pa = MG2._run_pass(bd, pl, hi, lo, h0)
    pb = MG2._run_pass(bd, pl, lo, hi, h0)
    skip_b = (~pa.any_pair) & (MG2._popcount(pa.single_valid) == 1)
    pvB = pb.pair_valid & ~skip_b[..., None, None]
    svB = pb.single_valid & ~skip_b[..., None]
    flat2 = lambda a: a.reshape(*a.shape[:-2], 27 * 27)
    valid = jnp.concatenate([flat2(pa.pair_valid), pa.single_valid, flat2(pvB), svB], axis=-1)
    kidx, kok = MG2._select_set_bits(valid, cfg.nd_dedup_k)
    return kidx.sum() + kok.sum()
timeit("passes+select576", upto_select)

# isolated: select_set_bits on realistic sparsity
v = jax.random.uniform(key, (B, 1512)) < 0.05
def sel_only(d):
    vv = v ^ (d[:, :1] > 3)
    kidx, kok = MG2._select_set_bits(vv, 576)
    return kidx.sum()
timeit("select576_alone", sel_only)

# isolated pairwise on [B,576]
kh1 = jax.random.randint(key, (B, 576), 0, 1 << 30, dtype=jnp.int32)
def pair_only(d):
    k1 = kh1 + d[:, :1]
    eq = (k1[..., :, None] == k1[..., None, :])
    earlier = jnp.tril(jnp.ones((576, 576), dtype=bool), k=-1)
    dup = jnp.any(eq & earlier, axis=-1)
    return dup.sum()
timeit("pairwise576", pair_only)
