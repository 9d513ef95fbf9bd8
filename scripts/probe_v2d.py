"""Measure compaction & gather alternatives with unique inputs."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import functools

B = 4096
N = 6
key = jax.random.PRNGKey(0)
vs = [jax.random.uniform(jax.random.PRNGKey(i), (B, 1512)) < 0.04 for i in range(N + 1)]
tbls = [jax.random.randint(jax.random.PRNGKey(50 + i), (B, 1512), 0, 1 << 30, dtype=jnp.int32) for i in range(N + 1)]
idxs = [jax.random.randint(jax.random.PRNGKey(80 + i), (B, 576), 0, 1512) for i in range(N + 1)]
rows = [jax.random.randint(jax.random.PRNGKey(110 + i), (B, 1512, 56), -3, 5, dtype=jnp.int8) for i in range(N + 1)]

def timeit(name, fn, args):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(*args[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*a) for a in args[1:]]
    jax.block_until_ready(outs)
    tr = (time.perf_counter() - t0) / N
    print(f"{name}: compile {tc:.0f}s steady {tr*1000:.2f}ms", flush=True)

# baseline: one lane-gather [B,576] <- [B,1512]
timeit("lane_gather576", lambda t, i: jnp.take_along_axis(t, i, axis=-1), list(zip(tbls, idxs)))
# row-gather [B,576,56] <- [B,1512,56]
timeit("row_gather576x56", lambda r, i: jnp.take_along_axis(r, i[..., None], axis=-2), list(zip(rows, idxs)))
# compare-reduce compaction: out_idx[k] = sum_i (cs[i] <= k)
K = 576
ks = jnp.arange(K, dtype=jnp.int32)
def cmp_reduce(v):
    cs = jnp.cumsum(v.astype(jnp.int32), axis=-1)
    out = jnp.sum((cs[:, :, None] <= ks[None, None, :]), axis=1, dtype=jnp.int32)
    ok = ks < cs[:, -1:]
    return out, ok
timeit("cmpreduce_576", cmp_reduce, [(v,) for v in vs])
# matmul form: step matrix via clip diff -> MXU not applicable; try f32 dot of indicators
def cmp_dot(v):
    cs = jnp.cumsum(v.astype(jnp.int32), axis=-1)
    le = (cs[:, :, None] <= ks[None, None, :]).astype(jnp.bfloat16)
    out = jnp.sum(le, axis=1)
    return out
timeit("cmpdot_576", cmp_dot, [(v,) for v in vs])
# searchsorted method='compare_all'
def ss_cmp(v):
    cs = jnp.cumsum(v.astype(jnp.int32), axis=-1)
    kq = jnp.arange(1, K + 1, dtype=jnp.int32)
    f = jax.vmap(lambda c: jnp.searchsorted(c, kq, side="left", method="compare_all"))
    return f(cs)
timeit("searchsorted_compare_all", ss_cmp, [(v,) for v in vs])
# searchsorted method='sort'
def ss_sort(v):
    cs = jnp.cumsum(v.astype(jnp.int32), axis=-1)
    kq = jnp.arange(1, K + 1, dtype=jnp.int32)
    f = jax.vmap(lambda c: jnp.searchsorted(c, kq, side="left", method="sort"))
    return f(cs)
timeit("searchsorted_sort", ss_sort, [(v,) for v in vs])
# Gram-matrix pairwise equality on 576 rows of 56 bytes
g_rows = [jax.random.randint(jax.random.PRNGKey(150 + i), (B, 576, 56), 0, 6, dtype=jnp.int8) for i in range(N + 1)]
def gram(x):
    xf = x.astype(jnp.bfloat16)
    g = jnp.einsum("bkc,bjc->bkj", xf, xf, preferred_element_type=jnp.float32)
    n = jnp.sum(xf.astype(jnp.float32) ** 2, axis=-1)
    d2 = n[:, :, None] + n[:, None, :] - 2 * g
    earlier = jnp.tril(jnp.ones((576, 576), dtype=bool), k=-1)
    dup = jnp.any((d2 <= 0.5) & earlier, axis=-1)
    return dup
timeit("gram_dedup576x56", gram, [(r,) for r in g_rows])
