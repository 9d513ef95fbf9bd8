"""Microbenchmarks for movegen-v2 building blocks on the real chip."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = 10
key = jax.random.PRNGKey(0)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(REPS)]
    jax.block_until_ready(outs)
    tr = (time.perf_counter() - t0) / REPS
    print(f"{name}: compile {tc:.1f}s steady {tr*1000:.2f}ms", flush=True)

tbl = jax.random.normal(key, (B, 1512))
idx512 = jax.random.randint(key, (B, 512), 0, 1512)
idx27 = jax.random.randint(key, (B, 27), 0, 729)
small = jax.random.normal(key, (B, 729))
boards = jax.random.randint(key, (B, 512, 52), -3, 5, dtype=jnp.int8)
bigidx = jax.random.randint(key, (B, 512), 0, 13824)
bigtbl = jax.random.normal(key, (B, 13824))

timeit("gather[B,512]from[B,1512]", lambda t, i: jnp.take_along_axis(t, i, axis=-1), tbl, idx512)
timeit("gather[B,512]from[B,13824]", lambda t, i: jnp.take_along_axis(t, i, axis=-1), bigtbl, bigidx)
timeit("gather[B,27]from[B,729]", lambda t, i: jnp.take_along_axis(t, i, axis=-1), small, idx27)
timeit("gather_boards[B,512,52]", lambda b, i: jnp.take_along_axis(b, (i % 512)[..., None], axis=-2), boards, idx512)
timeit("transpose[B,27,27]", lambda t: jnp.swapaxes(t[:, :729].reshape(B, 27, 27), -1, -2).reshape(B, 729), tbl)
timeit("cumsum[B,1512]", lambda t: jnp.cumsum((t > 0).astype(jnp.int32), axis=-1), tbl)
timeit("argsort[B,1512]u32", lambda t: jnp.argsort(t.view(jnp.int32) if t.dtype==jnp.float32 else t, axis=-1), tbl)

# searchsorted: select k-th set bit via binary search over cumsum
def take_kth(t):
    cs = jnp.cumsum((t > 0).astype(jnp.int32), axis=-1)
    ks = jnp.arange(1, 513, dtype=jnp.int32)
    return jax.vmap(lambda c: jnp.searchsorted(c, ks))(cs)
timeit("searchsorted512of1512", take_kth, tbl)

# chunked fused value pass: 6 chunks of [B,252,198]@[198,128]
w1 = jax.random.normal(key, (198, 128), jnp.float32)
w2 = jax.random.normal(key, (128, 1), jnp.float32)
feats = jax.random.normal(key, (B, 1512, 52)).astype(jnp.bfloat16)
wproj = jax.random.normal(key, (52, 198), jnp.float32)
def chunked(feats):
    def body(c, chunk):
        x = jnp.dot(chunk, wproj.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        h = jax.nn.sigmoid(jnp.dot(x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), preferred_element_type=jnp.float32))
        v = jnp.dot(h.astype(jnp.bfloat16), w2.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return c, v[..., 0]
    _, vs = jax.lax.scan(body, 0, jnp.moveaxis(feats.reshape(B, 6, 252, 52), 1, 0))
    return vs
timeit("chunked_fwd 6x[B,252]", chunked, feats)

# one-shot forward [B,1512,198] materialized
feats198 = jax.random.normal(key, (B, 1512, 198)).astype(jnp.bfloat16)
def oneshot(x):
    h = jax.nn.sigmoid(jnp.dot(x, w1.astype(jnp.bfloat16), preferred_element_type=jnp.float32))
    return jnp.dot(h.astype(jnp.bfloat16), w2.astype(jnp.bfloat16), preferred_element_type=jnp.float32)[..., 0]
timeit("oneshot_fwd[B,1512,198]bf16", oneshot, feats198)
