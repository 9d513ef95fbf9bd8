"""Bisect _run_pass internals with unique inputs."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.engine.movegen import slot_table, board_expand, _delta_over_slots
from mlp_ppo_2ply_multi_tpu.engine.board import board_hash, apply_submove
from mlp_ppo_2ply_multi_tpu.env import vec_env

B, N = 4096, 6
key = jax.random.PRNGKey(0)
state = vec_env.reset(key, B)
bd, pl = state.board, state.player
dices = [jax.random.randint(jax.random.PRNGKey(300 + i), (B,), 1, 7) for i in range(N + 1)]

def timeit(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(dices[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(d) for d in dices[1:]]
    jax.block_until_ready(outs)
    tr = (time.perf_counter() - t0) / N
    print(f"{name}: compile {tc:.0f}s steady {tr*1000:.2f}ms", flush=True)

timeit("slot_table_root", lambda d: slot_table(bd, pl, d).valid.sum())

def mk_b1(d):
    s1 = slot_table(bd, pl, d)
    b27 = board_expand(bd, 27)
    return apply_submove(b27, pl[..., None], s1.start, s1.end, s1.hits, s1.valid)
timeit("apply27", lambda d: mk_b1(d).points.sum())
timeit("slot_table_b1[B,27]", lambda d: slot_table(mk_b1(d), pl[..., None], d[..., None]).valid.sum())
timeit("hashdelta_root", lambda d: sum(x.sum() for x in _delta_over_slots(bd, pl, slot_table(bd, pl, d))))
def hd_b1(d):
    b1 = mk_b1(d)
    st2 = slot_table(b1, pl[..., None], d[..., None])
    return sum(x.sum() for x in _delta_over_slots(b1, pl[..., None], st2))
timeit("hashdelta_b1[B,27]x27", hd_b1)
timeit("board_hash_root", lambda d: sum((x + d[0]).sum() for x in board_hash(bd)))
