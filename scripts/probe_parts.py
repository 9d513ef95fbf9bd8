"""Localize the slow op: time each movegen sub-phase in a scanned jit."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen as MG
from mlp_ppo_2ply_multi_tpu.engine import board as BD
from mlp_ppo_2ply_multi_tpu.env import vec_env

B, REPS = 256, 8
cfg = MoveGenConfig()
state = vec_env.reset(jax.random.PRNGKey(0), B)
bd, pl = state.board, state.player
die = state.dice[..., 0].astype(jnp.int32)

def timeit(name, body):
    @jax.jit
    def f(bd, pl, die):
        def step(c, _):
            out = body(bd, pl, die + c)  # vary die to defeat CSE
            return c + 1, jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), out)
        _, outs = jax.lax.scan(step, jnp.int32(0), None, length=REPS)
        return outs
    t0 = time.perf_counter(); jax.block_until_ready(f(bd, pl, die))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(f(bd, pl, die))
    tr = time.perf_counter() - t0
    print(f"{name}: compile {tc:.0f}s steady {tr/REPS*1000:.1f}ms/iter", flush=True)

# 1. slot table only
timeit("slot_table", lambda bd, pl, d: MG.slot_table(bd, pl, 1 + (d % 6)))

# 2. apply 27 submoves
def apply27(bd, pl, d):
    st = MG.slot_table(bd, pl, 1 + (d % 6))
    b27 = MG.board_expand(bd, MG.N_SLOTS)
    return MG.apply_submove(b27, pl[..., None], st.start, st.end, st.hits, st.valid).points
timeit("slots+apply27", apply27)

# 3. hash deltas over 27 slots
def hashes(bd, pl, d):
    st = MG.slot_table(bd, pl, 1 + (d % 6))
    return MG._delta_over_slots(bd, pl, st)
timeit("slots+hashdelta27", hashes)

# 4. full board hash
timeit("board_hash", lambda bd, pl, d: BD.board_hash(bd))

# 5. lexsort of [B, 1512] x3 keys
k1 = jax.random.randint(jax.random.PRNGKey(1), (B, 1512), 0, 1 << 30, dtype=jnp.int32)
k2 = jax.random.randint(jax.random.PRNGKey(2), (B, 1512), 0, 1 << 30, dtype=jnp.int32)
def sort1512(bd, pl, d):
    return jnp.lexsort((k2 + d, k1, (k1 + d) % 2), axis=-1)
timeit("lexsort1512x3", sort1512)

# 6. dedup_compact on 1512 candidates
def dedup(bd, pl, d):
    return MG.dedup_compact((k1 + d).astype(jnp.uint32), k2.astype(jnp.uint32), k2 % 3 != 0, cfg.a_max)[:2]
timeit("dedup1512", dedup)

# 7. one nondoubles pass (no dedup)
def ndpass(bd, pl, d):
    h0 = BD.board_hash(bd)
    out = MG._nondoubles_pass(bd, pl, 1 + (d % 6), 1 + ((d + 1) % 6), h0)
    return out[4]
timeit("nondoubles_pass(no dedup)", ndpass)

# 8. doubles level expand: w2 from w1=16
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
