"""TD(0) bootstrap-regression learner.

Reference semantics (/root/reference/src/agents/trainer.py:48-166):
  * target[t] = r[t] + gamma * V(obs[t+1]).detach() for all but the last
    experience; the last gets its raw reward (:111-116). No sign flip across
    turns — the side-to-move features let one net carry both perspectives
    (quirk Q3).
  * MSE loss per episode, grad-clip by global norm 1.0, Adam(1e-3), and an
    optimizer STEP PER EPISODE — 200 sequential updates per training batch
    (:81-139, quirk Q2). ``per_episode_updates=True`` reproduces this with a
    lax.scan over episode columns; False runs one fused batched update.

Pass steps are not experiences (worker.py:106-113): the bootstrap value for
experience t comes from the *next recorded* step, which here is found with a
reverse scan over the time axis instead of list compaction.

Temperature schedule: linear from the update counter
(parameter_manager.py:93-111, quirk Q12) — in the synchronous design the
"version" is simply the number of updates and staleness is zero.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.actor.rollout import Transition
from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.engine.board import unpack_board
from mlp_ppo_2ply_multi_tpu.model import value_net


class TrainState(NamedTuple):
    params: Dict[str, jax.Array]
    opt_state: optax.OptState
    version: jax.Array  # int32 update counter (== reference version - 1)
    episode_count: jax.Array  # int64-ish int32 total episodes consumed


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam + global-norm clip (reference trainer.py:33-39). The reference
    also STORES lr_decay/lr_decay_steps (configuration.py:19-20) but never
    applies them (trainer.py:36-37 is the only use) — here the hook is live:
    lr_decay < 1 applies stepwise exponential decay over Adam update counts.
    """
    lr = cfg.train.learning_rate
    if cfg.train.lr_decay < 1.0:
        lr = optax.exponential_decay(
            init_value=lr,
            transition_steps=cfg.train.lr_decay_steps,
            decay_rate=cfg.train.lr_decay,
            staircase=True,
        )
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(lr),
    )


def init_train_state(key: jax.Array, cfg: Config) -> TrainState:
    params = value_net.init_params(key, cfg.model)
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        version=jnp.zeros((), jnp.int32),
        episode_count=jnp.zeros((), jnp.int32),
    )


def temperature(version: jax.Array, cfg: Config) -> jax.Array:
    """Linear schedule 1.5 -> 0.5 over 4000 updates
    (parameter_manager.py:93-111; version there starts at 1)."""
    t = cfg.train
    frac = jnp.clip(version.astype(jnp.float32) / t.temperature_decay_updates, 0.0, 1.0)
    return t.initial_temperature - (t.initial_temperature - t.final_temperature) * frac


def _episode_targets(
    v: jax.Array,
    reward: jax.Array,
    recorded: jax.Array,
    boundary: jax.Array,
    gamma: float,
    td_mode: str = "reference",
    player: jax.Array = None,
) -> jax.Array:
    """Per-column TD targets over the time axis (axis 0).

    Reverse scan carrying the value of the next recorded experience; the
    carry resets at episode boundaries so truncated episodes bootstrap with
    just their final reward (quirk Q9).

    td_mode (TrainConfig.td_mode, measured comparison in RESULTS.md):
      "reference" — positive bootstrap from the opponent's state (Q3).
      "negamax"   — successor value negated when the next recorded mover is
        the OTHER player (consecutive recorded steps can share a mover when
        the opponent danced on the bar, worker.py:106-113, so the sign
        compares players rather than alternating blindly).
      "side0"     — rewards signed by mover (+ for side 0, - for side 1),
        no bootstrap flip: V estimates side-0's discounted outcome.
    """
    if player is None:
        player = jnp.zeros_like(recorded, dtype=jnp.int32)

    def back(carry, xs):
        nxt_v, nxt_pl, nxt_has = carry
        v_t, r_t, rec_t, bnd_t, pl_t = xs
        has = nxt_has & ~bnd_t
        if td_mode == "negamax":
            s = jnp.where(pl_t == nxt_pl, 1.0, -1.0)
        else:
            s = 1.0
        if td_mode == "side0":
            r_t = jnp.where(pl_t == 0, r_t, -r_t)
        tgt = r_t + jnp.where(has, s * gamma * nxt_v, 0.0)
        nxt_v = jnp.where(rec_t, v_t, nxt_v)
        nxt_pl = jnp.where(rec_t, pl_t, nxt_pl)
        nxt_has = rec_t | (nxt_has & ~bnd_t)
        return (nxt_v, nxt_pl, nxt_has), tgt

    init = (
        jnp.zeros_like(v[0]),
        jnp.zeros_like(player[0]),
        jnp.zeros_like(recorded[0]),
    )
    _, targets = jax.lax.scan(
        back, init, (v, reward, recorded, boundary, player), reverse=True
    )
    return targets


def episode_loss_and_metrics(
    params, obs, reward, recorded, boundary, cfg: Config, player=None
):
    """Masked per-episode-mean MSE (trainer.py:104-118) over [T, ...] data."""
    import dataclasses as _dc

    # the learner always computes in f32 — a bf16 cfg.model.dtype only
    # changes the actor's sampling path, never the gradients
    v = value_net.forward(params, obs, _dc.replace(cfg.model, dtype="float32"))
    targets = jax.lax.stop_gradient(
        _episode_targets(
            v, reward, recorded, boundary, cfg.train.gamma,
            td_mode=cfg.train.td_mode, player=player,
        )
    )
    m = recorded.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=0), 1.0)
    err = (v - targets) * m
    mse = jnp.sum(err * err, axis=0) / n  # per episode column
    loss = jnp.mean(mse)
    td_abs = jnp.sum(jnp.abs(err), axis=0) / n
    return loss, {
        "td_abs": jnp.mean(td_abs),
        "v_mean": jnp.sum(v * m) / jnp.maximum(jnp.sum(m), 1.0),
    }


def encode_traj(traj: Transition, cfg: Config) -> jax.Array:
    return encode_board(unpack_board(traj.packed_board), traj.player)


@functools.partial(jax.jit, static_argnames=("cfg",))
def update(state: TrainState, traj: Transition, cfg: Config):
    """One training batch over a [T, B] trajectory stack where each column is
    one episode (sync rollout). Returns (new_state, metrics)."""
    opt = make_optimizer(cfg)
    obs = encode_traj(traj, cfg)  # [T, B, 198]
    grad_fn = jax.value_and_grad(episode_loss_and_metrics, has_aux=True)

    if cfg.train.per_episode_updates:
        # Q2 parity: sequential Adam step per episode column.
        def body(carry, ep):
            params, opt_state = carry
            (loss, aux), grads = grad_fn(
                params,
                ep["obs"],
                ep["reward"],
                ep["recorded"],
                ep["boundary"],
                cfg,
                ep["player"],
            )
            gnorm = optax.global_norm(grads)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {
                "loss": loss,
                "grad_norm": gnorm,
                **aux,
            }

        # scan over episode columns: leading axis B, each slice time-major
        episodes = {
            "obs": jnp.swapaxes(obs, 0, 1),  # [B, T, 198]
            "reward": traj.reward.T,
            "recorded": traj.recorded.T,
            "boundary": traj.boundary.T,
            "player": traj.player.T,
        }
        (params, opt_state), ms = jax.lax.scan(
            body, (state.params, state.opt_state), episodes
        )
        metrics = {k: jnp.mean(v) for k, v in ms.items()}
    else:
        (loss, aux), grads = grad_fn(
            state.params, obs, traj.reward, traj.recorded, traj.boundary, cfg,
            traj.player,
        )
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": gnorm, **aux}

    n_eps = traj.reward.shape[1]
    ep_len = jnp.sum(traj.recorded.astype(jnp.float32)) / n_eps
    metrics.update(
        {
            "reward_per_episode": jnp.sum(traj.reward) / n_eps,
            "episode_length": ep_len,
            "wins_regular": jnp.sum(traj.win_type == 1),
            "wins_gammon": jnp.sum(traj.win_type == 2),
            "wins_backgammon": jnp.sum(traj.win_type == 3),
            # Q4 note: the reference multiplies these counts by episode length
            # when logging (trainer.py:87-102); we log true counts.
            "close_out_count": jnp.sum(traj.close_out),
            "prime_count": jnp.sum(traj.prime),
        }
    )
    if traj.overflow is not None:
        # decisions whose presented move set was width-truncated (Q7 ledger)
        metrics["width_overflow_count"] = jnp.sum(traj.overflow.astype(jnp.int32))
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        version=state.version + 1,
        episode_count=state.episode_count + n_eps,
    )
    return new_state, metrics


@functools.lru_cache(maxsize=16)
def _metrics_packer(names):
    @jax.jit
    def pack(metrics):
        return jnp.stack(
            [jnp.mean(metrics[n].astype(jnp.float32)) for n in names]
        )

    return pack


def pack_metrics(metrics: Dict[str, jax.Array]):
    """Stack a dict of device metric leaves into ONE float32 vector.

    On the tunnel backend every device->host transfer is a ~24ms round
    trip and jax.device_get of a dict fetches leaf by leaf (measured
    43.7ms for 13 scalars vs 23.2ms for one packed vector,
    scripts/probe_train_gap.py). The training loop folds every per-update
    scalar — metrics, episode counters — into one packed fetch. Non-scalar
    leaves are reduced with mean (MetricsWriter.scalars applied np.mean on
    the host before this existed).

    Returns (names, vec) with names in sorted order; unpack with
    ``dict(zip(names, jax.device_get(vec)))``.
    """
    names = tuple(sorted(metrics))
    return names, _metrics_packer(names)(metrics)
