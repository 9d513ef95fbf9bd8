"""Rollout performance probe: compile time + steady-state env-steps/s per
batch size on the current backend. Run from the repo root:

    python scripts/probe_rollout.py [batch ...]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    cfg = Config()
    key = jax.random.PRNGKey(0)
    params = td.init_train_state(key, cfg).params
    temp = jnp.float32(1.0)

    for batch in batches:
        state = vec_env.reset(jax.random.fold_in(key, batch), batch)
        t0 = time.perf_counter()
        state, _ = actor.rollout(
            params, state, jax.random.PRNGKey(1), temp, cfg, 16, continuous=True
        )
        jax.block_until_ready(state)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, _ = actor.rollout(
            params, state, jax.random.PRNGKey(2), temp, cfg, 16, continuous=True
        )
        jax.block_until_ready(state)
        t16 = time.perf_counter() - t0
        print(
            f"B={batch}: compile+first(T=16) {t_compile:.1f}s; steady T=16 "
            f"{t16:.3f}s -> {batch * 16 / t16:,.0f} env-steps/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
