"""Canonical-engine perf on the real chip: compile + steady per batch."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor

cfg = Config()
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params

for B in (1024, 4096):
    state = vec_env.reset(key, B)
    f = jax.jit(lambda st, s: MG2.legal_moves(
        st.board, st.player, jnp.clip(st.dice + s, 1, 6), cfg.movegen).count)
    t0 = time.perf_counter(); f(state, 0).block_until_ready()
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(state, i % 3) for i in range(8)]
    jax.block_until_ready(outs)
    tr = (time.perf_counter() - t0) / 8
    print(f"movegen2 B={B}: compile {tc:.0f}s steady {tr*1000:.1f}ms -> {B/tr:,.0f}/s", flush=True)

B = 4096
state = vec_env.reset(key, B)
temp = jnp.float32(1.0)
g = jax.jit(lambda st, k: actor.rollout_step(params, st, k, temp, cfg, True)[0])
t0 = time.perf_counter(); jax.block_until_ready(g(state, jax.random.PRNGKey(1)))
tc = time.perf_counter() - t0
st = state
t0 = time.perf_counter()
for i in range(8):
    st = g(st, jax.random.PRNGKey(i))
jax.block_until_ready(st)
tr = (time.perf_counter() - t0) / 8
print(f"rollout_step(v2) B={B}: compile {tc:.0f}s steady {tr*1000:.1f}ms -> {B/tr:,.0f} env-steps/s", flush=True)
