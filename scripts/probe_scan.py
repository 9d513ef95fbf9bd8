import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves
from mlp_ppo_2ply_multi_tpu.env import vec_env

B = 256
cfg_small = MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64)
state = vec_env.reset(jax.random.PRNGKey(0), B)

# 1) small movegen, no scan (baseline: compiled 82s before)
f = jax.jit(lambda st: legal_moves(st.board, st.player, st.dice, cfg_small).count)
t0=time.perf_counter(); f(state).block_until_ready()
print(f"small no-scan compile: {time.perf_counter()-t0:.1f}s", flush=True)

# 2) small movegen inside scan length 4
@jax.jit
def g(st):
    def body(c, _):
        return c, legal_moves(c.board, c.player, c.dice, cfg_small).count
    _, out = jax.lax.scan(body, st, None, length=4)
    return out
t0=time.perf_counter(); g(state).block_until_ready()
print(f"small scan4 compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); g(state).block_until_ready()
print(f"small scan4 steady: {time.perf_counter()-t0:.3f}s", flush=True)
