"""Headline benchmark: 1-ply self-play env-steps/s on one chip.

Measures the full actor hot path (move enumeration -> feature encode -> fused
value forward over all afterstates -> softmax(V/T) sampling -> env
transition) in continuous rollout mode — the TPU-native replacement for the
reference's 7-process worker pipeline (/root/reference/src/multi/worker.py).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 1e6 — the driver-set north-star target of 1M
env-steps/s/chip (BASELINE.md; the reference itself publishes no numbers).
"""
from __future__ import annotations

import json
import time

import jax

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td


def run(batch: int, steps_per_call: int, calls: int, warmup: int = 2, cfg=None) -> float:
    cfg = cfg or Config()
    key = jax.random.PRNGKey(0)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    temp = td.temperature(jax.numpy.zeros((), jax.numpy.int32), cfg)

    k = jax.random.PRNGKey(1)
    for _ in range(warmup):
        k, sub = jax.random.split(k)
        state, traj = actor.rollout(
            params, state, sub, temp, cfg, steps_per_call, continuous=True
        )
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(calls):
        k, sub = jax.random.split(k)
        state, traj = actor.rollout(
            params, state, sub, temp, cfg, steps_per_call, continuous=True
        )
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return batch * steps_per_call * calls / dt


def main() -> None:
    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel:
        value = run(batch=4096, steps_per_call=32, calls=8)
    else:
        # CPU smoke mode: tiny shapes + reduced movegen widths so the run
        # (dominated by XLA compile time) finishes in minutes.
        from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig

        cfg = Config(movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64))
        value = run(batch=32, steps_per_call=4, calls=1, warmup=1, cfg=cfg)
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_1ply",
                "value": round(value, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(value / 1_000_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
