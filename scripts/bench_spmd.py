"""Weak-scaling SPMD benchmark: sustained train-step throughput over an
n-device data mesh with per-device batch held constant (SURVEY.md §6(b):
"host-count scaling"). On the 1-chip environment this measures the sharded
train step at n=1; on a pod slice the same script produces the scaling
column (env-steps/s at 1, 2, 4, ... devices; near-linear = flat
per-device rate).

Usage: python scripts/bench_spmd.py [--per-device-batch 4096] [--steps 20]
       [--devices N]   # default: every power of two up to all devices
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MLP_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])
import jax.numpy as jnp
import numpy as np


def bench_n(n: int, per_dev_batch: int, num_steps: int, steps: int, cfg) -> float:
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.learner import td
    from mlp_ppo_2ply_multi_tpu.parallel import sharding

    mesh = sharding.make_mesh(n, 1, devices=jax.devices()[:n])
    batch = per_dev_batch * n
    key = jax.random.PRNGKey(0)
    state = td.init_train_state(key, cfg)
    env_state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    state = sharding.shard_train_state(state, mesh, tp=False)
    env_state = sharding.shard_env_state(env_state, mesh)
    step = sharding.make_train_step(mesh, cfg, num_steps=num_steps, tp=False)

    k = jax.random.PRNGKey(2)
    for i in range(3):
        state, env_state, m = step(state, env_state, jax.random.fold_in(k, i))
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, env_state, m = step(state, env_state, jax.random.fold_in(k, 100 + i))
    np.asarray(m["loss"])
    dt = time.perf_counter() - t0
    return batch * num_steps * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=4096)
    ap.add_argument("--num-steps", type=int, default=64,
                    help="env steps per train step (rollout length)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--production", action="store_true", default=True)
    args = ap.parse_args()

    from bench import production_config
    from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig

    if jax.default_backend() == "cpu":
        cfg = Config(movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64))
        args.per_device_batch = min(args.per_device_batch, 16)
        args.num_steps, args.steps = 4, 2
    else:
        cfg = production_config()

    total = len(jax.devices())
    if args.devices:
        ns = [args.devices]
    else:
        ns = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= total]
    for n in ns:
        rate = bench_n(n, args.per_device_batch, args.num_steps, args.steps, cfg)
        print(json.dumps({
            "devices": n,
            "env_steps_per_s": round(rate, 1),
            "per_device": round(rate / n, 1),
            "per_device_batch": args.per_device_batch,
        }), flush=True)


if __name__ == "__main__":
    main()
