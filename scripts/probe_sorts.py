import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen as MG
from mlp_ppo_2ply_multi_tpu.engine import board as BD
from mlp_ppo_2ply_multi_tpu.env import vec_env

B, REPS = 256, 8
cfg = MoveGenConfig()
state = vec_env.reset(jax.random.PRNGKey(0), B)
bd, pl = state.board, state.player
die = state.dice[..., 0].astype(jnp.int32)
k1 = jax.random.randint(jax.random.PRNGKey(1), (B, 1512), 0, 1 << 30, dtype=jnp.int32)
k2 = jax.random.randint(jax.random.PRNGKey(2), (B, 1512), 0, 1 << 30, dtype=jnp.int32)

def timeit(name, body):
    @jax.jit
    def f(bd, pl, die):
        def step(c, _):
            out = body(bd, pl, die + c)
            return c + 1, jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), out)
        _, outs = jax.lax.scan(step, jnp.int32(0), None, length=REPS)
        return outs
    t0 = time.perf_counter(); jax.block_until_ready(f(bd, pl, die))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(f(bd, pl, die))
    tr = time.perf_counter() - t0
    print(f"{name}: compile {tc:.0f}s steady {tr/REPS*1000:.1f}ms/iter", flush=True)

dcol = lambda d: d[..., None]
timeit("argsort1512", lambda bd, pl, d: jnp.argsort(k1 + dcol(d), axis=-1))
timeit("lexsort1512x3", lambda bd, pl, d: jnp.lexsort((k2, k1, (k1 + dcol(d)) % 2), axis=-1))
timeit("dedup1512", lambda bd, pl, d: MG.dedup_compact((k1 + dcol(d)).astype(jnp.uint32), k2.astype(jnp.uint32), k2 % 3 != 0, cfg.a_max)[:2])
def ndpass(bd, pl, d):
    h0 = BD.board_hash(bd)
    return MG._nondoubles_pass(bd, pl, 1 + (d % 6), 1 + ((d + 1) % 6), h0)[4]
timeit("nondoubles_pass(no dedup)", ndpass)
def dexp(bd, pl, d):
    st = MG.slot_table(bd, pl, 1 + (d % 6))
    key = jnp.where(st.valid, jnp.arange(27, dtype=jnp.int32), jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(key, axis=-1)[..., :16]
    st1 = MG._take_st(st, perm)
    fv = jnp.take_along_axis(st.valid, perm, axis=-1)
    b1 = MG.apply_submove(MG.board_take(MG.board_expand(bd, 27), perm), pl[..., None], st1.start, st1.end, st1.hits, st1.valid & fv)
    h1, h2 = BD.board_hash(b1)
    fr = MG._Frontier(boards=b1, h1=h1, h2=h2, rank=perm, valid=fv, flag_rank=jnp.full_like(perm, 0x7FFFFFFF))
    nf, sh = MG._expand_level(fr, pl, 1 + (d % 6), 128)
    return nf.h1
timeit("doubles_expand_16->128", dexp)
timeit("argsort_13824", lambda bd, pl, d: jnp.argsort(jnp.tile(k1 + dcol(d), (1, 10))[:, :13824], axis=-1))
