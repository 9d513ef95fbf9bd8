"""2-ply expectimax throughput (BASELINE.md asks for env-steps/s at 1-ply AND
2-ply). Run on the TPU: python scripts/bench_twoply.py [batch] [steps]"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    from bench import production_config, production_twoply_config

    # production actor config (fast widths, bf16, fused kernel) + the tuned
    # 2-ply scorer (unrolled rolls, per-die doubles widths); pass "plain" as
    # argv[3] for the untuned scan scorer
    if len(sys.argv) > 3 and sys.argv[3] == "plain":
        cfg = production_config().replace(twoply=TwoPlyConfig(enabled=True))
    else:
        cfg = production_twoply_config()
    key = jax.random.PRNGKey(0)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

    import numpy as np

    k = jax.random.PRNGKey(1)
    for _ in range(2):
        k, sub = jax.random.split(k)
        state, _ = actor._jit_step(params, state, sub, temp, cfg, True)
    # host fetch so warmup/compile cannot spill into the timed window
    np.asarray(state.board.data)

    t0 = time.perf_counter()
    for _ in range(steps):
        k, sub = jax.random.split(k)
        state, _ = actor._jit_step(params, state, sub, temp, cfg, True)
    # force a host fetch: block_until_ready alone has been observed to return
    # before device completion through the tunnel backend
    np.asarray(state.board.data)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_2ply",
                "value": round(batch * steps / dt, 1),
                "unit": "env-steps/s/chip",
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
