"""Attribute the training-mode throughput gap (VERDICT round-4 item 4).

Round-3 RESULTS recorded sustained continuous training at 274k env-steps/s
vs 494k rollout-only. This probe times each phase of one production update
cycle (B=4096, steps_per_update=64) separately:

  rollout   — 16 donated 4-step scan-chunk dispatches (rollout_chunked,
              the production pipeline) + device concat
  update    — td.update on the [64, B] trajectory
  get       — jax.device_get of metrics + boundary (tunnel round trips)
  hist      — writer.param_histograms (device_get params + TB write)
  memstats  — utils.profiling.device_memory_stats (tunnel query)
  fused     — the sharding.make_train_step(1-device mesh) program that does
              rollout+update in ONE jit (the bench_spmd n=1 program)

Run ONE mode per process. The round-5 toolchain breaks repeated
shard_map calls two ways: (a) on CPU, after OTHER programs have compiled,
the third call dies with "Execution supplied 24 buffers but compiled
program expected 49" (hoisted closure constants go missing); (b) on the
TPU tunnel the SECOND call of any shard_map program hangs forever — even
a minimal pmean step in a clean process. Rounds 3-4 ran the same programs
fine (bench_spmd recorded 531.8k), so this is a toolchain regression, and
it is why `train --mode continuous` defaults to the chunked python-loop
pipeline this round (--fused-rollout opts back in).

Usage: python scripts/probe_train_gap.py [pyloop|fused] [updates]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MLP_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from bench import production_config
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

MODE = sys.argv[1] if len(sys.argv) > 1 else "pyloop"
UPDATES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B, SPU = 4096, 64

cfg = production_config()
if jax.default_backend() == "cpu":
    from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig

    cfg = Config(movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64))
    B, SPU = 16, 8
# mirror train_continuous_single: the fused batched TD update, NOT the Q2
# parity scan of B sequential Adam steps (838ms/update at B=4096 — a
# parity-mode cost the production trainer never pays)
import dataclasses as _dc

cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, per_episode_updates=False))

total_steps = UPDATES * B * SPU


def run_pyloop():
    from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
    from mlp_ppo_2ply_multi_tpu.io.metrics import MetricsWriter
    from mlp_ppo_2ply_multi_tpu.utils.profiling import device_memory_stats

    key = jax.random.PRNGKey(0)
    state = td.init_train_state(key, cfg)
    env_state = vec_env.reset(jax.random.fold_in(key, 1), B)
    temp = td.temperature(state.version, cfg)
    writer = MetricsWriter("/tmp/probe_train_gap_runs")
    acc = {k: 0.0 for k in ("rollout", "update", "get", "hist", "memstats")}

    def tick(name, t0):
        acc[name] += time.perf_counter() - t0
        return time.perf_counter()

    chunk = 4 if SPU % 4 == 0 else 1
    # warm
    env_state, traj = actor.rollout_chunked(
        state.params, env_state, jax.random.PRNGKey(9), temp, cfg, SPU,
        chunk=chunk, continuous=True,
    )
    _, metrics = td.update(state, traj, cfg)
    jax.block_until_ready(metrics["loss"])

    k = jax.random.PRNGKey(2)
    t_all0 = time.perf_counter()
    for u in range(UPDATES):
        tu0 = t0 = time.perf_counter()
        env_state, traj = actor.rollout_chunked(
            state.params, env_state, jax.random.fold_in(k, u), temp, cfg, SPU,
            chunk=chunk, continuous=True,
        )
        jax.block_until_ready(traj.reward)
        t0 = tick("rollout", t0)
        state, metrics = td.update(state, traj, cfg)
        jax.block_until_ready(metrics["loss"])
        t0 = tick("update", t0)
        # the trainer's single packed pull (episode counters folded in)
        metrics["episodes_done"] = jnp.sum(traj.boundary.astype(jnp.int32))
        metrics["episode_count"] = state.episode_count
        names, vec = td.pack_metrics(metrics)
        _ = dict(zip(names, np.asarray(jax.device_get(vec)).tolist()))
        t0 = tick("get", t0)
        if u % 10 == 0:  # trainer default --histograms-every 10
            writer.param_histograms(u, state.params)
        t0 = tick("hist", t0)
        _ = device_memory_stats()
        t0 = tick("memstats", t0)
        # per-update print: the tunnel's block_until_ready does NOT wait for
        # a program whose server-side compile is still in flight, so a
        # front-loaded stall here = compile amortization, not steady state
        print(f"  update {u}: {time.perf_counter() - tu0:6.2f}s", flush=True)
    t_all = time.perf_counter() - t_all0
    print(f"python-loop pipeline: {UPDATES} updates, {t_all:.2f}s "
          f"-> {total_steps / t_all:,.0f} env-steps/s sustained")
    for k_, v in acc.items():
        print(f"  {k_:9s} {v / UPDATES * 1e3:8.1f} ms/update  "
              f"({v / t_all * 100:4.1f}%)")


def run_fused():
    from mlp_ppo_2ply_multi_tpu.parallel import sharding

    mesh = sharding.make_mesh(1, 1, devices=jax.devices()[:1])
    state = sharding.shard_train_state(
        td.init_train_state(jax.random.PRNGKey(0), cfg), mesh, tp=False
    )
    env = sharding.shard_env_state(vec_env.reset(jax.random.PRNGKey(1), B), mesh)
    step = sharding.make_train_step(mesh, cfg, num_steps=SPU, tp=False)
    t0 = time.perf_counter()
    state, env, m = step(state, env, jax.random.PRNGKey(3))
    jax.block_until_ready(m["loss"])
    print(f"fused train step compile+first: {time.perf_counter() - t0:.1f}s")
    k = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    for u in range(UPDATES):
        state, env, m = step(state, env, jax.random.fold_in(k, 1000 + u))
        _ = jax.device_get(m)  # same per-update host pull as the real loop
    dt = time.perf_counter() - t0
    print(f"fused pipeline: {total_steps / dt:,.0f} env-steps/s sustained "
          f"({dt / UPDATES * 1e3:.1f} ms/update)")


if MODE == "pyloop":
    run_pyloop()
elif MODE == "fused":
    run_fused()
else:
    raise SystemExit(f"unknown mode {MODE}")
