"""Bisect TPU tunnel behavior: tiny ops -> movegen -> rollout."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)

t0=time.perf_counter()
x = jnp.ones((1024,1024)); y = (x@x).block_until_ready()
print(f"matmul 1024^2: {time.perf_counter()-t0:.2f}s", flush=True)

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves
from mlp_ppo_2ply_multi_tpu.env import vec_env
cfg_small = MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64)

key = jax.random.PRNGKey(0)
state = vec_env.reset(key, 256)
f = jax.jit(lambda b,p,d: legal_moves(b,p,d,cfg_small).count)
t0=time.perf_counter()
c = f(state.board, state.player, state.dice).block_until_ready()
print(f"movegen small B=256 compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(10): c = f(state.board, state.player, state.dice)
c.block_until_ready()
print(f"movegen small steady x10: {time.perf_counter()-t0:.3f}s", flush=True)

f2 = jax.jit(lambda b,p,d: legal_moves(b,p,d,MoveGenConfig()).count)
t0=time.perf_counter()
c = f2(state.board, state.player, state.dice).block_until_ready()
print(f"movegen FULL B=256 compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(10): c = f2(state.board, state.player, state.dice)
c.block_until_ready()
print(f"movegen FULL steady x10: {time.perf_counter()-t0:.3f}s", flush=True)
