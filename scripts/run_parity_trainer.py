"""Matched-hyperparameter parity training run for learning-curve comparison
against scripts/run_reference_trainer.py (VERDICT #5).

td_mode="reference" (Q3 parity targets), per-episode sequential Adam steps
(Q2), 200 episodes per update, sync rollout (every column one complete or
300-step-truncated episode) — the reference trainer's semantics on the TPU
engine. Saves torch .pth checkpoints at the same episode milestones as the
reference run so eval_learning_curve.py can compare both with one evaluator.

Usage:
  python scripts/run_parity_trainer.py --episodes 12000 --seed 0 \
      --out /tmp/ourrun_s0
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MLP_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])
import jax.numpy as jnp
import torch

from mlp_ppo_2ply_multi_tpu.core.config import Config, TrainConfig
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.model import value_net


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=12000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/ourrun")
    ap.add_argument("--ckpt-every", type=int, default=1500)
    args = ap.parse_args()

    cfg = Config(
        train=TrainConfig(
            batch_games=200,
            per_episode_updates=True,
            td_mode="reference",
            rollout_mode="sync",
            seed=args.seed,
        )
    )
    os.makedirs(args.out, exist_ok=True)
    log = open(os.path.join(args.out, "train.jsonl"), "w")

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    state = td.init_train_state(k_init, cfg)

    def save(total):
        sd = value_net.to_torch_state_dict(jax.device_get(state.params))
        torch.save(sd, os.path.join(args.out, f"ep{total:08d}.pth"))

    B, T = cfg.train.batch_games, cfg.env.max_timesteps
    total = 0
    next_ckpt = 0
    t0 = time.time()
    while total < args.episodes:
        if total >= next_ckpt:
            save(total)
            next_ckpt += args.ckpt_every
        key, k_reset, k_roll = jax.random.split(key, 3)
        env_state = vec_env.reset(k_reset, B)
        temp = td.temperature(state.version, cfg)
        env_state, traj = actor.rollout(
            state.params, env_state, k_roll, temp, cfg, T, continuous=False
        )
        state, metrics = td.update(state, traj, cfg)
        total = int(state.episode_count)
        rec = {
            "episodes": total,
            "version": int(state.version),
            "temperature": float(temp),
            "loss": float(metrics["loss"]),
            "eps_per_sec": total / (time.time() - t0),
        }
        log.write(json.dumps(rec) + "\n")
        log.flush()
    save(total)
    print(f"done: {total} episodes in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
