"""Headline benchmark: 1-ply self-play env-steps/s on one chip.

Measures the full actor hot path (move enumeration -> feature encode -> fused
value forward over all afterstates -> softmax(V/T) sampling -> env
transition) in continuous rollout mode — the TPU-native replacement for the
reference's 7-process worker pipeline (/root/reference/src/multi/worker.py).

The step is jitted once and driven from a Python loop with device-resident
state (dispatches pipeline; a lax.scan over time compiles pathologically
slowly on the current toolchain for matmul-bearing bodies).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 1e6 — the driver-set north-star target of 1M
env-steps/s/chip (BASELINE.md; the reference itself publishes no numbers).
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td


def run(
    batch: int,
    steps: int,
    warmup: int = 8,
    cfg=None,
    chunk: int = 4,
    cost: dict | None = None,
) -> float:
    """``chunk`` > 1 scans that many env steps per dispatch with the env
    state donated — measured +5% at B=4096 on v5e (fewer state copies;
    scripts/probe_chunked.py). chunk=1 falls back to one step per dispatch
    (the CPU smoke mode keeps it: scan bodies compile slower)."""
    cfg = cfg or Config()
    key = jax.random.PRNGKey(0)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

    def step_fn(state, key):
        if chunk > 1:
            def body(st, k):
                st, _ = actor.rollout_step(params, st, k, temp, cfg, True)
                return st, None

            state, _ = jax.lax.scan(body, state, jax.random.split(key, chunk))
            return state
        new_state, _ = actor.rollout_step(
            params, state, key, temp, cfg, continuous=True
        )
        return new_state

    step = jax.jit(step_fn, donate_argnums=(0,))
    if cost is not None:
        # XLA cost analysis of the compiled step (for mfu/achieved_bw_frac;
        # scripts/roofline.py has the full machinery + measured chip peaks)
        keys0 = jax.random.split(jax.random.PRNGKey(1), max(chunk, 2))
        ca = step.lower(state, keys0[0]).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        cost["flops_per_disp"] = float(ca.get("flops", 0.0))
        cost["hbm_bytes_per_disp"] = float(ca.get("bytes accessed", 0.0))
        cost["steps_per_disp"] = chunk

    import numpy as np

    n_warm = max(warmup // chunk, 2)
    n_disp = max(steps // chunk, 1)
    keys = jax.random.split(jax.random.PRNGKey(1), n_warm + n_disp)
    for i in range(n_warm):
        state = step(state, keys[i])
    np.asarray(state.board.data)

    t0 = time.perf_counter()
    for i in range(n_disp):
        state = step(state, keys[n_warm + i])
    # host fetch: block_until_ready alone has been observed to return before
    # device completion through the tunnel backend
    np.asarray(state.board.data)
    dt = time.perf_counter() - t0
    return batch * chunk * n_disp / dt


def production_config() -> Config:
    """Single authority: core/config.py Config.production."""
    return Config.production()


def production_twoply_config() -> Config:
    """Single authority: core/config.py Config.production_twoply (tuned
    scorer documented at TwoPlyConfig.tuned)."""
    return Config.production_twoply()


def main() -> None:
    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel:
        cost = {}
        value = run(batch=4096, steps=50, cfg=production_config(), cost=cost)
    else:
        # CPU smoke mode: tiny shapes + reduced movegen widths so the run
        # (dominated by XLA compile time) finishes in minutes.
        from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig

        cfg = Config(movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64))
        value = run(batch=32, steps=4, warmup=1, cfg=cfg, chunk=1)
        cost = None
    out = {
        "metric": "env_steps_per_sec_per_chip_1ply",
        "value": round(value, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(value / 1_000_000.0, 4),
    }
    if cost:
        # utilization vs v5e datasheet peaks (197 bf16 TFLOP/s, 819 GB/s);
        # measured chip peaks are ~90% / ~73% of those (PERF.md roofline)
        disp_per_s = value / (4096 * cost["steps_per_disp"])
        out["mfu"] = round(cost["flops_per_disp"] * disp_per_s / 197e12, 4)
        out["achieved_bw_frac"] = round(
            cost["hbm_bytes_per_disp"] * disp_per_s / 819e9, 4
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
