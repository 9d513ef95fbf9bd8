"""Device-op trace of the 2-ply production step at B=1024."""
import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from bench import production_config
from mlp_ppo_2ply_multi_tpu.core.config import TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.utils.profiling import device_op_times

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
cfg = production_config().replace(twoply=TwoPlyConfig(enabled=True))
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

@jax.jit
def step(state, key):
    ns, _ = actor.rollout_step(params, state, key, temp, cfg, continuous=True)
    return ns

state = step(state, jax.random.PRNGKey(9))
times = device_op_times(step, state, jax.random.PRNGKey(10))
tot = sum(times.values())
print(f"total device {tot:.1f}ms")
for k, v in list(times.items())[:25]:
    print(f"{v:8.2f}ms  {k}")
