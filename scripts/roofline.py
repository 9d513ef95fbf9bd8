"""Roofline / MFU verdict for the production 1-ply step and the 2-ply step.

VERDICT round-4 item 1: nobody can currently say whether 503k env-steps/s is
the v5e envelope or 30% of it. This script answers that with three numbers
per workload:

  1. measured wall ms/step (same timing discipline as bench.py),
  2. XLA cost-analysis FLOPs and HBM bytes for the compiled step,
  3. achieved FLOP/s and GB/s as fractions of BOTH the v5e datasheet peaks
     (197 bf16 TFLOP/s, 819 GB/s HBM) AND empirically measured chip peaks
     so the verdict doesn't hinge on datasheet optimism through the tunnel
     backend.

Probe discipline (hard-won, PERF.md "Hardware lessons"): the tunnel
memoizes repeated identical dispatches and adds ~25ms latency per dispatch,
so every peak probe (a) varies its inputs by chaining each dispatch's
output into the next (donated), and (b) amortizes dispatch overhead by
chaining many ops inside one jitted call. A separate probe measures the
per-dispatch overhead floor explicitly.

Timing uses plain jit calls; the AOT `lower().compile()` object is used for
`cost_analysis()` ONLY (calling it directly trips an input-count mismatch
on this toolchain when closure constants are hoisted, e.g. the 2-ply roll
tables).

Replaces the reference's NVML utilization prints (trainer.py:54-62,170-184)
with an actual roofline: the reference HAD a utilization metric; this repo
now does too (bench.py emits mfu/achieved_bw_frac from the same machinery).

Usage: python scripts/roofline.py [oneply|twoply|peaks|all]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_HBM_GBS = 819.0


def measure_dispatch_overhead() -> dict:
    """Per-dispatch cost floor through the tunnel: a trivial scalar program
    dispatched 50x with each call consuming the previous output (so nothing
    memoizes), fetched once at the end (pipelined) and once per call
    (round-trip latency)."""

    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros(())
    x = f(x)
    np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(50):
        x = f(x)
    np.asarray(x)
    pipelined_ms = (time.perf_counter() - t0) / 50 * 1e3
    t0 = time.perf_counter()
    for _ in range(10):
        x = f(x)
        np.asarray(x)
    roundtrip_ms = (time.perf_counter() - t0) / 10 * 1e3
    return {
        "dispatch_pipelined_ms": round(pipelined_ms, 3),
        "dispatch_roundtrip_ms": round(roundtrip_ms, 3),
    }


def measure_peak_flops() -> float:
    """Empirical bf16 matmul ceiling (TFLOP/s): 8 chained 8192^3 matmuls per
    dispatch, output donated into the next dispatch (inputs vary, overhead
    amortized over 8 x 1.1 TFLOP)."""
    n = 8192
    chain = 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.fold_in(key, 1), (n, n), jnp.bfloat16)
    b = b / jnp.sqrt(jnp.float32(n)).astype(jnp.bfloat16)  # keep values sane

    @jax.jit
    def mm(x, b):
        for _ in range(chain):
            x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        return x

    x = mm(x, b)  # warm (compile)
    np.asarray(x[0, :1])
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        x = mm(x, b)
    np.asarray(x[0, :1])
    dt = time.perf_counter() - t0
    flops = 2 * n * n * n * chain * reps
    return flops / dt / 1e12


def measure_peak_bw() -> float:
    """Empirical HBM bandwidth ceiling (GB/s): a sequential fori_loop whose
    carry is a 1GB f32 buffer — each iteration is 2 reads + 1 write that
    MUST materialize to HBM (an unrolled elementwise chain fuses into one
    kernel and overcounts traffic 16x; the loop's sequential carry cannot)."""
    n = 1024 * 1024 * 1024 // 4  # 1GB per operand
    chain = 16
    x = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 1e-9, jnp.float32)

    @jax.jit
    def add(x, b):
        return jax.lax.fori_loop(0, chain, lambda i, x: x + b, x)

    x = add(x, b)
    np.asarray(x[:1])
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        x = add(x, b)
    np.asarray(x[:1])
    dt = time.perf_counter() - t0
    gbytes = 3 * n * 4 * chain * reps / 1e9
    return gbytes / dt


def analyze(name: str, step, params, state, keys, batch: int, steps_per_disp: int):
    """Time (plain jit) then cost-analyze (AOT) one (params, state, key) step.

    ORDER MATTERS on the tunnel backend: executing a program AFTER AOT-
    compiling it panics the tunnel client when the program has hoisted
    closure constants (e.g. the 2-ply roll tables: 94 executable inputs vs
    13 user args — 'index out of bounds: the len is 13 but the index is
    85'). cost_analysis() never executes, so it is safe LAST."""
    # warm + time (bench.py discipline: host fetch to defeat async-through-
    # tunnel; state is donated so every dispatch's inputs differ)
    st = state
    for i in range(3):
        st = step(params, st, keys[i])
    np.asarray(jax.tree.leaves(st)[0])
    n = min(30, len(keys) - 3)
    t0 = time.perf_counter()
    for i in range(n):
        st = step(params, st, keys[3 + i])
    np.asarray(jax.tree.leaves(st)[0])
    dt = time.perf_counter() - t0
    ms_per_disp = dt / n * 1e3
    ms_per_step = ms_per_disp / steps_per_disp

    ca = step.lower(params, state, keys[0]).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    t_disp = dt / n
    achieved_tflops = flops / t_disp / 1e12
    achieved_gbs = bytes_acc / t_disp / 1e9
    intensity = flops / bytes_acc if bytes_acc else 0.0
    return {
        "workload": name,
        "batch": batch,
        "ms_per_step": round(ms_per_step, 3),
        "env_steps_per_s": round(batch / (ms_per_step / 1e3), 1),
        "flops_per_disp": flops,
        "hbm_bytes_per_disp": bytes_acc,
        "arithmetic_intensity_flop_per_byte": round(intensity, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "achieved_gbs": round(achieved_gbs, 1),
        "mfu_vs_datasheet": round(achieved_tflops / V5E_PEAK_TFLOPS_BF16, 4),
        "bw_frac_vs_datasheet": round(achieved_gbs / V5E_PEAK_HBM_GBS, 4),
    }


def oneply():
    from bench import production_config
    from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.learner import td

    cfg = production_config()
    batch, chunk = 4096, 4
    key = jax.random.PRNGKey(0)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

    def step_fn(params, state, key):
        def body(st, k):
            st, _ = actor.rollout_step(params, st, k, temp, cfg, True)
            return st, None

        state, _ = jax.lax.scan(body, state, jax.random.split(key, chunk))
        return state

    step = jax.jit(step_fn, donate_argnums=(1,))
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    return analyze("1ply_production", step, params, state, keys, batch, chunk)


def twoply():
    from bench import production_twoply_config
    from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.learner import td

    cfg = production_twoply_config()
    batch = 1024
    key = jax.random.PRNGKey(0)
    params = td.init_train_state(key, cfg).params
    state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

    def step_fn(params, state, key):
        st, _ = actor.rollout_step(params, state, key, temp, cfg, True)
        return st

    step = jax.jit(step_fn, donate_argnums=(1,))
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    return analyze("2ply_production", step, params, state, keys, batch, 1)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    if which in ("peaks", "all"):
        out.update(measure_dispatch_overhead())
        out["measured_peak_tflops_bf16"] = round(measure_peak_flops(), 1)
        out["measured_peak_hbm_gbs"] = round(measure_peak_bw(), 1)
        print(json.dumps(out), flush=True)
    for label, fn in (("oneply", oneply), ("twoply", twoply)):
        if which in (label, "all"):
            r = fn()
            if "measured_peak_tflops_bf16" in out:
                r["mfu_vs_measured"] = round(
                    r["achieved_tflops"] / out["measured_peak_tflops_bf16"], 4
                )
                r["bw_frac_vs_measured"] = round(
                    r["achieved_gbs"] / out["measured_peak_hbm_gbs"], 4
                )
            out[label] = r
            print(json.dumps(r), flush=True)
    with open("/tmp/roofline.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
