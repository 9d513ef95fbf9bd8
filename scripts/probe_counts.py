"""Distribution of presented legal-move counts at the production config —
sizes the two-tier candidate compaction (narrow tier width / wide sub-batch
divisor)."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import production_config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
cfg = production_config()
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)


@jax.jit
def step(state, key):
    ns, t = actor.rollout_step(params, state, key, temp, cfg, continuous=True)
    return ns, t.num_moves


counts = []
for i in range(STEPS):
    state, c = step(state, jax.random.fold_in(key, 100 + i))
    counts.append(np.asarray(c))
c = np.concatenate(counts)
print("samples:", c.shape[0], "mean", round(float(c.mean()), 2))
for q in (50, 90, 99, 99.9, 99.99, 100):
    print(f"p{q}: {np.percentile(c, q):.0f}")
for w in (32, 48, 64, 96, 128, 192, 256):
    print(f"P(count > {w}) = {(c > w).mean():.6f}")
