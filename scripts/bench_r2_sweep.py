"""Round-2 TPU bench sweep: measure the two-tier nd tail and the 2-ply
shared die tables immediately when the tunnel returns.

Each variant is one jitted production rollout step driven from Python
(bench.py methodology; inputs varied per call — the tunnel memoizes
identical dispatches). Prints one JSON line per variant.

Usage: python scripts/bench_r2_sweep.py [--batch 4096] [--steps 30] \
          [--variants prod,tier0,twoply,twoply_tier] [--twoply-batch 1024]

A ``@N`` suffix on any variant name overrides its batch size, e.g.
``prod@8192,tiered@8192`` measures the B=8192 scaling lever.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import production_config
from mlp_ppo_2ply_multi_tpu.core.config import Config, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td


def bench_rollout(cfg: Config, batch: int, steps: int, warmup: int) -> float:
    key = jax.random.PRNGKey(0)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

    @jax.jit
    def step(state, key):
        new_state, _ = actor.rollout_step(
            params, state, key, temp, cfg, continuous=True
        )
        return new_state

    keys = jax.random.split(jax.random.PRNGKey(1), warmup + steps)
    for i in range(warmup):
        state = step(state, keys[i])
    np.asarray(state.board.data)
    t0 = time.perf_counter()
    for i in range(steps):
        state = step(state, keys[warmup + i])
    np.asarray(state.board.data)
    return batch * steps / (time.perf_counter() - t0)


def variant_cfg(name: str) -> Config:
    cfg = production_config()
    if name == "prod":
        return cfg
    if name == "tier0":
        import dataclasses

        return cfg.replace(movegen=dataclasses.replace(cfg.movegen, nd_tier=0))
    if name == "tiered":
        import dataclasses

        return cfg.replace(
            movegen=dataclasses.replace(
                cfg.movegen, tiered=True, dd_tier=(48, 96, 96)
            )
        )
    if name.startswith("prod_dd"):
        # dd_tier two-tier doubles expansion alone (no tiered pipeline);
        # widths from the name: prod_dd48x96x96 -> (48, 96, 96)
        import dataclasses

        widths = tuple(
            int(w) for w in (name[len("prod_dd"):] or "48x96x96").split("x")
        )
        return cfg.replace(
            movegen=dataclasses.replace(cfg.movegen, dd_tier=widths)
        )
    if name == "split":
        # round-5: plane-form pipeline — no merged [B, W, 52] move tensor
        import dataclasses

        return cfg.replace(
            movegen=dataclasses.replace(cfg.movegen, split_planes=True)
        )
    if name == "prod_notier":
        # A/B: actor two-tier candidate evaluation OFF (all a_max slots
        # through the fused kernel) — re-validates the round-2 win per chip
        import dataclasses

        return cfg.replace(
            model=dataclasses.replace(cfg.model, actor_tier_width=0)
        )
    if name == "prod_gram":
        # A/B: board-Gram first-occurrence dedup instead of delta signatures
        import dataclasses

        return cfg.replace(
            movegen=dataclasses.replace(cfg.movegen, nd_sig_dedup=False)
        )
    if name == "twoply":
        return cfg.replace(twoply=TwoPlyConfig(enabled=True))
    if name == "twoply_tuned":
        # round-4 production scorer: unrolled rolls + per-die dd widths +
        # width-96 nd replies (the 14.3k env-steps/s headline)
        from bench import production_twoply_config

        return production_twoply_config()
    if name == "twoply_scan":
        # round-3 scan scorer (unroll OFF) for cross-round A/B
        return cfg.replace(
            twoply=TwoPlyConfig(enabled=True, unroll_rolls=False)
        )
    if name == "twoply_vf0":
        # value-first dedup OFF: the round-2 reference-order dedup path
        return cfg.replace(twoply=TwoPlyConfig(enabled=True, value_first_m=0))
    if name == "twoply_vf16":
        # value-first dedup ON (lost the TPU A/B 9.1k vs 11.0k; default off)
        return cfg.replace(twoply=TwoPlyConfig(enabled=True, value_first_m=16))
    if name == "twoply_tier":
        # the two-tier reply tail lives in the reference-order path, which
        # value-first dedup bypasses — disable it so the tier is measured
        return cfg.replace(
            twoply=TwoPlyConfig(
                enabled=True, value_first_m=0, reply_nd_tier=96,
                reply_wide_div=2,
            )
        )
    raise SystemExit(f"unknown variant {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--twoply-batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--twoply-steps", type=int, default=8)
    ap.add_argument(
        "--variants",
        default=(
            "prod,prod_gram,tier0,tiered,prod@8192,tiered@8192,"
            "twoply,twoply_vf0,twoply_tier,twoply@4096"
        ),
    )
    args = ap.parse_args()

    for name in args.variants.split(","):
        base, _, suffix = name.partition("@")
        cfg = variant_cfg(base)
        two = name.startswith("twoply")
        b = args.twoply_batch if two else args.batch
        if suffix:
            b = int(suffix)
        s = args.twoply_steps if two else args.steps
        t0 = time.perf_counter()
        rate = bench_rollout(cfg, b, s, warmup=3 if two else 8)
        print(
            json.dumps(
                {
                    "variant": name,
                    "batch": b,
                    "env_steps_per_s": round(rate, 1),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
