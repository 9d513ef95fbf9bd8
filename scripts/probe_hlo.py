"""Dump optimized HLO of the production step; look up hot op names."""
import sys, re
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from bench import production_config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

B = 4096
cfg = production_config()
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

def step(state, key):
    new_state, _ = actor.rollout_step(params, state, key, temp, cfg, continuous=True)
    return new_state

txt = jax.jit(step).lower(state, key).compile().as_text()
open("/tmp/prod_step.hlo", "w").write(txt)
names = sys.argv[1:]
for ln in txt.splitlines():
    s = ln.strip()
    for nm in names:
        if s.startswith(f"%{nm} ") or s.startswith(f"{nm} ") or f" {nm} = " in s or s.startswith(f"%{nm}.") is False and re.match(rf"^%?{re.escape(nm)}\s*=", s):
            print(s[:400]); break
