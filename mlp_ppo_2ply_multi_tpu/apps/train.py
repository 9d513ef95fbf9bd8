"""Training CLI — replaces the reference's orchestrator
(/root/reference/src/main.py) with a single-program on-device actor-learner.

Two rollout modes (TrainConfig.rollout_mode):
  * ``sync``   — reference-comparable episode semantics: reset B games, play
    them to completion (or the 300-step cap, Q9), then update. With
    --per-episode-updates this reproduces the reference's 200 sequential Adam
    steps per batch (Q2).
  * ``continuous`` — the fast path: finished games auto-reset so every
    lockstep step does useful work; updates happen every --steps-per-update
    env steps; runs SPMD over a {data, model} device mesh.

Usage:
    python -m mlp_ppo_2ply_multi_tpu.apps.train --mode continuous \
        --batch-games 4096 --updates 1000 [--data N --model M]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

# Some transitive imports (optax/orbax) may initialize the JAX backend, after
# which jax_platforms can no longer change — honor the env override first.
if os.environ.get("MLP_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig, TrainConfig
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.io import checkpoint as ckpt
from mlp_ppo_2ply_multi_tpu.io.metrics import MetricsWriter, Throughput
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.parallel import sharding


_STOP = False


def _request_stop(signum, frame):
    """SIGTERM/SIGINT: finish the current update, then save and exit — the
    checkpoint-restart fault-tolerance model (SURVEY.md §5.3; the reference
    terminates workers without saving, main.py:156-157)."""
    global _STOP
    _STOP = True
    print(f"signal {signum}: will checkpoint and exit after this update", flush=True)


def install_signal_handlers() -> None:
    import signal

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)


def build_config(args) -> Config:
    train = TrainConfig(
        batch_games=args.batch_games,
        per_episode_updates=args.per_episode_updates,
        td_mode=args.td_mode,
        rollout_mode=args.mode,
        seed=args.seed,
        checkpoint_every_episodes=args.checkpoint_every,
        checkpoint_dir=args.checkpoint_dir,
        metrics_dir=args.metrics_dir,
    )
    cfg = Config(train=train)
    if args.small_movegen:
        cfg = dataclasses.replace(
            cfg, movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64)
        )
    if args.production:
        # fast audit-validated movegen widths + bf16/fused-Pallas actor
        # forward (bench.py production_config); the LEARNER stays f32 — only
        # the sampling path changes numerics class. --full-widths keeps the
        # parity enumeration widths under the production model config — the
        # control arm of the fast-vs-full quality experiment (RESULTS.md).
        from mlp_ppo_2ply_multi_tpu.core.config import ModelConfig

        cfg = dataclasses.replace(
            cfg,
            movegen=MoveGenConfig() if args.full_widths else MoveGenConfig.fast(),
            model=ModelConfig(
                dtype="bfloat16", fused_actor_kernel=True, actor_tier_width=96
            ),
        )
    if args.tiered:
        # two-plane tiered pipeline (experimental.tiered.legal_moves_tiered): the
        # merged [B, a_max, 52] move tensor never materializes. The pipeline
        # requires the fused actor kernel (actor.rollout_step asserts it), so
        # enable it here even without --production.
        from mlp_ppo_2ply_multi_tpu.core.config import ModelConfig as _MC

        cfg = dataclasses.replace(
            cfg,
            movegen=dataclasses.replace(
                cfg.movegen,
                tiered=True,
                nd_tier=cfg.movegen.nd_tier or 96,
                dd_tier=cfg.movegen.dd_tier or (48, 96, 96),
            ),
            model=dataclasses.replace(
                cfg.model,
                fused_actor_kernel=True,
                actor_tier_width=cfg.model.actor_tier_width or 96,
            ),
        )
    if args.max_timesteps is not None:
        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env, max_timesteps=args.max_timesteps)
        )
    if getattr(args, "two_ply", False):
        from mlp_ppo_2ply_multi_tpu.core.config import TwoPlyConfig

        # 2-ply self-play training (VERDICT round-2 item 9): the rollout's
        # action selection goes through twoply.select_action_2ply; the
        # tiered pipeline is 1-ply-only so it is disabled here. With
        # --production the TUNED scorer drives the rollout (the throughput
        # config; decision-identical to exact on 4096 guarded positions —
        # artifacts/twoply_decision_guard.json); otherwise exact.
        tw = TwoPlyConfig.tuned() if args.production else TwoPlyConfig(enabled=True)
        cfg = dataclasses.replace(
            cfg,
            twoply=tw,
            movegen=dataclasses.replace(cfg.movegen, tiered=False),
        )
    return cfg


def train_sync(cfg: Config, args, writer: MetricsWriter) -> td.TrainState:
    """Single-device episode-synchronous training (reference semantics)."""
    key = jax.random.PRNGKey(cfg.train.seed)
    key, k_init = jax.random.split(key)
    state = td.init_train_state(k_init, cfg)
    if args.resume:
        state, key, step0 = ckpt.restore(cfg.train.checkpoint_dir, state)
        print(f"resumed from step {step0}")

    tput = Throughput()
    last_saved = int(state.episode_count)
    B, T = cfg.train.batch_games, cfg.env.max_timesteps
    for u in range(args.updates):
        if _STOP:
            break
        key, k_reset, k_roll = jax.random.split(key, 3)
        env_state = vec_env.reset(k_reset, B)
        temp = td.temperature(state.version, cfg)
        env_state, traj = actor.rollout(
            state.params, env_state, k_roll, temp, cfg, T, continuous=False
        )
        state, metrics = td.update(state, traj, cfg)
        metrics = jax.device_get(metrics)
        tput.add(episodes=B, env_steps=B * T)
        writer.scalars(
            int(state.episode_count),
            {**{k: float(v) for k, v in metrics.items()}, **tput.rates(),
             "temperature": float(temp)},
        )
        if args.histograms_every and u % args.histograms_every == 0:
            # per-update weight/bias histograms (reference trainer.py:222-226)
            writer.param_histograms(int(state.episode_count), state.params)
        if int(state.episode_count) - last_saved >= cfg.train.checkpoint_every_episodes:
            ckpt.save(cfg.train.checkpoint_dir, state, key)
            last_saved = int(state.episode_count)
        if u % max(1, args.log_every) == 0:
            print(
                f"update {u} episodes {int(state.episode_count)} "
                f"loss {metrics['loss']:.5f} eps/s {tput.rates()['eps_per_sec']:.1f}"
            )
    return state, key


def train_continuous_single(cfg: Config, args, writer: MetricsWriter):
    """Single-device continuous training driven by a python-loop rollout.

    Dispatches 4-step donated scan chunks (actor.rollout_chunked — the
    bench.py production discipline) and runs the fused TD(0) update per
    window. The all-in-one mesh train step is faster when the toolchain
    supports repeated shard_map calls (--fused-rollout; see
    train_continuous's docstring for the round-5 regression).
    """
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, per_episode_updates=False)
    )
    key = jax.random.PRNGKey(cfg.train.seed)
    key, k_init, k_env = jax.random.split(key, 3)
    state = td.init_train_state(k_init, cfg)
    if args.resume:
        state, key, step0 = ckpt.restore(cfg.train.checkpoint_dir, state)
        print(f"resumed from step {step0}")
    env_state = vec_env.reset(k_env, cfg.train.batch_games)

    tput = Throughput()
    last_saved = int(state.episode_count)
    for u in range(args.updates):
        if _STOP:
            break
        key, k_roll = jax.random.split(key)
        temp = td.temperature(state.version, cfg)
        chunk = 4 if args.steps_per_update % 4 == 0 else 1
        env_state, traj = actor.rollout_chunked(
            state.params, env_state, k_roll, temp, cfg,
            args.steps_per_update, chunk=chunk, continuous=True,
        )
        state, metrics = td.update(state, traj, cfg)
        # ONE host pull per update, as ONE packed vector: every per-update
        # scalar — the metrics dict, the episode counters — rides a single
        # ~24ms tunnel round trip (td.pack_metrics; a leaf-by-leaf dict
        # fetch costs ~2x that and each extra int(state.episode_count) is
        # another full round trip)
        metrics["episodes_done"] = jnp.sum(traj.boundary.astype(jnp.int32))
        metrics["episode_count"] = state.episode_count
        names, vec = td.pack_metrics(metrics)
        metrics = dict(zip(names, np.asarray(jax.device_get(vec)).tolist()))
        eps = int(metrics.pop("episodes_done"))
        ec = int(metrics.pop("episode_count"))
        tput.add(episodes=eps, env_steps=cfg.train.batch_games * args.steps_per_update)
        from mlp_ppo_2ply_multi_tpu.utils.profiling import device_memory_stats

        # HBM stats are a tunnel query — sample at the log cadence, not
        # every update
        mem = device_memory_stats() if u % max(1, args.log_every) == 0 else {}
        writer.scalars(
            ec,
            {**metrics, **tput.rates(), "temperature": float(temp), **mem},
        )
        if args.histograms_every and u % args.histograms_every == 0:
            writer.param_histograms(ec, state.params)
        if ec - last_saved >= cfg.train.checkpoint_every_episodes:
            ckpt.save(cfg.train.checkpoint_dir, state, key)
            last_saved = ec
        if u % max(1, args.log_every) == 0:
            r = tput.rates()
            print(
                f"update {u} episodes {ec} "
                f"loss {metrics['loss']:.5f} "
                f"env-steps/s {r['env_steps_per_sec']:.0f}",
                flush=True,
            )
    return state, key


def train_continuous(cfg: Config, args, writer: MetricsWriter) -> td.TrainState:
    """SPMD continuous training over a {data, model} mesh.

    Single-device (data=1, model=1) runs default to the python-loop
    pipeline with CHUNKED dispatches (actor.rollout_chunked): the fused
    1x1-mesh train step measured 531.8k env-steps/s in round 4, but on the
    ROUND-5 toolchain repeated shard_map calls are broken — on the TPU
    tunnel the SECOND call of any shard_map program hangs forever, and on
    CPU the third call after other compiled programs fails with missing
    hoisted-constant buffers (scripts/probe_train_gap.py documents both).
    ``--fused-rollout`` opts back into the mesh step for toolchains where
    it works; multi-device meshes have no alternative and keep it."""
    if args.data == 1 and args.model == 1 and not args.fused_rollout:
        return train_continuous_single(cfg, args, writer)
    mesh = sharding.make_mesh(args.data, args.model)
    tp = args.model > 1
    key = jax.random.PRNGKey(cfg.train.seed)
    key, k_init, k_env = jax.random.split(key, 3)
    state = td.init_train_state(k_init, cfg)
    if args.resume:
        state, key, step0 = ckpt.restore(cfg.train.checkpoint_dir, state)
        print(f"resumed from step {step0}")
    env_state = vec_env.reset(k_env, cfg.train.batch_games)
    state = sharding.shard_train_state(state, mesh, tp=tp)
    env_state = sharding.shard_env_state(env_state, mesh)

    step_fn = sharding.make_train_step(mesh, cfg, args.steps_per_update, tp=tp)
    tput = Throughput()
    last_saved = int(jax.device_get(state.episode_count))
    for u in range(args.updates):
        if _STOP:
            break
        key, sub = jax.random.split(key)
        state, env_state, metrics = step_fn(state, env_state, sub)
        metrics = jax.device_get(metrics)
        tput.add(
            episodes=int(metrics["episodes_done"]), env_steps=int(metrics["env_steps"])
        )
        writer.scalars(
            int(jax.device_get(state.episode_count)),
            {**{k: float(v) for k, v in metrics.items()}, **tput.rates()},
        )
        if args.histograms_every and u % args.histograms_every == 0:
            writer.param_histograms(
                int(jax.device_get(state.episode_count)),
                jax.device_get(state.params),
            )
        ec = int(jax.device_get(state.episode_count))
        if ec - last_saved >= cfg.train.checkpoint_every_episodes:
            ckpt.save(cfg.train.checkpoint_dir, jax.device_get(state), key)
            last_saved = ec
        if u % max(1, args.log_every) == 0:
            r = tput.rates()
            print(
                f"update {u} episodes {ec} loss {metrics['loss']:.5f} "
                f"env-steps/s {r['env_steps_per_sec']:.0f}"
            )
    return state, key


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("sync", "continuous"), default="continuous")
    ap.add_argument("--batch-games", type=int, default=256)
    ap.add_argument("--updates", type=int, default=100)
    ap.add_argument("--steps-per-update", type=int, default=64)
    ap.add_argument("--per-episode-updates", action="store_true",
                    help="Q2 parity: sequential Adam step per episode (sync mode)")
    ap.add_argument("--td-mode", choices=("reference", "negamax", "side0"),
                    default="reference",
                    help="TD semantics (RESULTS.md): reference = Q3 parity; "
                         "side0 = TD-Gammon fix (side-0 value, side 1 "
                         "minimizes); negamax kept as a negative result")
    ap.add_argument("--data", type=int, default=None,
                    help="data-axis mesh size (default: all devices / --model)")
    ap.add_argument("--model", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--checkpoint-every", type=int, default=50_000)
    ap.add_argument("--metrics-dir", default="runs")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--histograms-every", type=int, default=None,
                    help="write weight/bias histograms every N updates; "
                         "0 disables. Default: 1 in sync mode (the "
                         "reference writes per update, trainer.py:222-226) "
                         "and 10 in continuous mode (each write pulls every "
                         "param to the host, ~100-200ms through the tunnel)")
    ap.add_argument("--small-movegen", action="store_true",
                    help="reduced enumeration widths (fast compile, CPU smoke)")
    ap.add_argument("--production", action="store_true",
                    help="fast movegen widths + bf16 fused actor forward "
                         "(peak throughput; learner stays f32)")
    ap.add_argument("--tiered", action="store_true",
                    help="two-plane tiered movegen/actor pipeline (needs "
                         "the fused kernel; implies production tier widths)")
    ap.add_argument("--full-widths", action="store_true",
                    help="with --production: keep the full parity movegen "
                         "widths (fast-vs-full quality control arm)")
    ap.add_argument("--fused-rollout", action="store_true",
                    help="continuous single-device mode: use the fused "
                         "1x1-mesh train step instead of the chunked "
                         "python-loop pipeline. Faster when it works — "
                         "but on the round-5 toolchain the second call of "
                         "any shard_map program hangs the TPU tunnel "
                         "(PERF.md round 5), so the python loop is the "
                         "default")
    ap.add_argument("--two-ply", action="store_true",
                    help="self-play with the LIVE 2-ply expectimax rerank "
                         "policy (the reference shipped this as dead code, "
                         "two_ply.py:153-193; here it trains end-to-end)")
    ap.add_argument("--remote-dir", default=None,
                    help="fsspec URI (gs://..., memory://...) mirrored with "
                         "metrics and checkpoints — the reference's S3 "
                         "streaming (logger.py, parameter_manager.py) analog")
    ap.add_argument("--max-timesteps", type=int, default=None,
                    help="override episode step cap (default 300, Q9)")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                    help="force a JAX backend (must be set before first use)")
    args = ap.parse_args(argv)
    if args.histograms_every is None:
        args.histograms_every = 1 if args.mode == "sync" else 10
    if args.two_ply and args.mode == "continuous":
        # the 2-ply scorer inside a scan-of-64 body is a compile hazard on
        # the current toolchain; its demonstrated path is the python loop
        args.fused_rollout = False
    install_signal_handlers()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.data is None:
        args.data = max(1, len(jax.devices()) // args.model)

    cfg = build_config(args)
    remote = args.remote_dir
    writer = MetricsWriter(
        cfg.train.metrics_dir,
        remote_uri=(remote.rstrip("/") + "/runs") if remote else None,
    )
    t0 = time.time()
    if args.mode == "sync":
        state, key = train_sync(cfg, args, writer)
    else:
        state, key = train_continuous(cfg, args, writer)
    state = jax.device_get(state)
    ckpt.save(cfg.train.checkpoint_dir, state, key)
    writer.close()
    if remote:
        from mlp_ppo_2ply_multi_tpu.io.remote import sync_dir

        sync_dir(cfg.train.checkpoint_dir, remote.rstrip("/") + "/checkpoints")
    print(
        f"done: {int(state.episode_count)} episodes, "
        f"{int(state.version)} updates in {time.time() - t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
