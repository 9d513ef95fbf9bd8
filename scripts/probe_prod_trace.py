"""Device-op trace of a rollout-step variant.

Usage: python scripts/probe_prod_trace.py [variant] [batch]
  variant: any bench_r2_sweep variant name (prod, tier0, tiered, twoply,
           twoply_tier; default prod)
  batch:   game batch (default 4096; 1024 for twoply variants)
"""
import os, sys
sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from bench_r2_sweep import variant_cfg
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.utils.profiling import device_op_times

name = sys.argv[1] if len(sys.argv) > 1 else "prod"
default_b = 1024 if name.startswith("twoply") else 4096
B = int(sys.argv[2]) if len(sys.argv) > 2 else default_b
cfg = variant_cfg(name)
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

@jax.jit
def step(state, key):
    new_state, _ = actor.rollout_step(params, state, key, temp, cfg, continuous=True)
    return new_state

state = step(state, jax.random.PRNGKey(9))  # compile
times = device_op_times(step, state, jax.random.PRNGKey(10))
tot = sum(times.values())
print(f"{name} B={B}: total device {tot:.1f}ms")
for k, v in list(times.items())[:40]:
    print(f"{v:8.2f}ms  {k}")
