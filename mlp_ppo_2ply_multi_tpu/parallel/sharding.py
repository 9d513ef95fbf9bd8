"""Device-mesh parallelism: SPMD train step over a {data, model} mesh.

The reference scales with 7 OS processes + a multiprocessing parameter server
(/root/reference/src/main.py:86-91, src/multi/parameter_manager.py) and has no
collective communication at all (SURVEY.md §2.2). The TPU-native replacement
is one shard_map-compiled program:

  * **data axis** — the game batch is sharded; every device runs the identical
    rollout on its local games, computes local gradients, and the gradient
    all-reduce is a single `psum` over the axis (rides ICI within a slice,
    DCN across slices — XLA picks the transport from the mesh layout).
  * **model axis** — tensor parallelism of the MLP hidden layer: w1/b1 are
    column-sharded, w2 row-sharded, and the head matmul psums partial results
    (value_net.forward with cfg.model.model_axis set). For the flagship
    198→128→1 net this axis exists to prove the code path scales to bigger
    value nets; it defaults to size 1.

The parameter server disappears: weights live replicated on device, "publish"
is the updated pytree entering the next rollout, staleness is zero
(SURVEY.md §5.8). Pipeline / sequence / expert axes are structurally
inapplicable to this model family (no layers to split, no attention, no
experts — SURVEY.md §2.2, §5.7).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.model import value_net

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data * model`` must equal the device
    count used; defaults to all visible devices."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# PartitionSpecs
# ---------------------------------------------------------------------------

def param_specs(tp: bool):
    """Specs for the value-net param dict. With tp, the hidden axis is
    sharded over MODEL_AXIS (w1 columns, w2 rows, b1)."""
    if not tp:
        return {"w1": P(), "b1": P(), "w2": P(), "b2": P()}
    return {
        "w1": P(None, MODEL_AXIS),
        "b1": P(MODEL_AXIS),
        "w2": P(MODEL_AXIS, None),
        "b2": P(),
    }


def opt_state_specs(opt_state_shape, p_specs):
    """Specs for an optax state pytree: any leaf stored under a param name
    (adam's mu/nu mirror the param dict) inherits that param's spec; scalar
    bookkeeping (count) is replicated."""

    def spec_for(path, leaf):
        for entry in reversed(path):
            if isinstance(entry, jax.tree_util.DictKey) and entry.key in p_specs:
                return p_specs[entry.key]
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, opt_state_shape)


def train_state_specs(state_shape: jax.ShapeDtypeStruct, tp: bool):
    ps = param_specs(tp)
    return td.TrainState(
        params=ps,
        opt_state=opt_state_specs(state_shape.opt_state, ps),
        version=P(),
        episode_count=P(),
    )


def shard_train_state(state: td.TrainState, mesh: Mesh, tp: bool) -> td.TrainState:
    """Place a (host or single-device) TrainState onto the mesh."""
    specs = train_state_specs(jax.eval_shape(lambda s: s, state), tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_env_state(state: vec_env.EnvState, mesh: Mesh) -> vec_env.EnvState:
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


# ---------------------------------------------------------------------------
# the SPMD train step
# ---------------------------------------------------------------------------

def _tp_config(cfg: Config, tp: bool) -> Config:
    model = dataclasses.replace(cfg.model, model_axis=MODEL_AXIS if tp else None)
    # Q2 parity mode scans Adam steps over the episode axis, which cannot be
    # partitioned over devices — the multi-chip fast path always uses the
    # fused batched update (documented divergence; single-chip parity runs
    # keep per_episode_updates).
    train = dataclasses.replace(cfg.train, per_episode_updates=False)
    return dataclasses.replace(cfg, model=model, train=train)


def make_train_step(mesh: Mesh, cfg: Config, num_steps: int, tp: bool = False):
    """Build the jitted SPMD train step:

        (train_state, env_state, key) -> (train_state, env_state, metrics)

    Rollout runs ``num_steps`` lockstep env steps in continuous mode (done
    games auto-reset) on each device's local game shard, then one fused TD(0)
    update with gradient psum over the data axis.
    """
    lcfg = _tp_config(cfg, tp)
    p_specs = param_specs(tp)

    def local_step(state: td.TrainState, env_state: vec_env.EnvState, key):
        di = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(key, di)
        temp = td.temperature(state.version, lcfg)
        env_state, traj = actor.rollout(
            state.params, env_state, key, temp, lcfg, num_steps, continuous=True
        )

        obs = td.encode_traj(traj, lcfg)
        grad_fn = jax.value_and_grad(td.episode_loss_and_metrics, has_aux=True)
        (loss, aux), grads = grad_fn(
            state.params, obs, traj.reward, traj.recorded, traj.boundary, lcfg,
            traj.player,
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        aux = jax.lax.pmean(aux, DATA_AXIS)

        opt = td.make_optimizer(lcfg)
        gnorm = optax.global_norm(grads)
        if tp:
            # local grad shards contribute disjoint hidden slices to the norm
            gnorm = jnp.sqrt(jax.lax.psum(gnorm**2, MODEL_AXIS))
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        episodes_done = jax.lax.psum(
            jnp.sum(traj.boundary.astype(jnp.int32)), DATA_AXIS
        )
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            **aux,
            "episodes_done": episodes_done,
            "env_steps": jnp.int32(num_steps) * jax.lax.psum(
                jnp.int32(traj.reward.shape[1]), DATA_AXIS
            ),
            "wins_regular": jax.lax.psum(jnp.sum(traj.win_type == 1), DATA_AXIS),
            "wins_gammon": jax.lax.psum(jnp.sum(traj.win_type == 2), DATA_AXIS),
            "wins_backgammon": jax.lax.psum(jnp.sum(traj.win_type == 3), DATA_AXIS),
            "close_out_count": jax.lax.psum(jnp.sum(traj.close_out), DATA_AXIS),
            "prime_count": jax.lax.psum(jnp.sum(traj.prime), DATA_AXIS),
            "reward_sum": jax.lax.psum(jnp.sum(traj.reward), DATA_AXIS),
            "width_overflow_count": jax.lax.psum(
                jnp.sum(traj.overflow.astype(jnp.int32)), DATA_AXIS
            ),
        }
        new_state = td.TrainState(
            params=params,
            opt_state=opt_state,
            version=state.version + 1,
            episode_count=state.episode_count + episodes_done,
        )
        return new_state, env_state, metrics

    state_spec_fn = lambda s: train_state_specs(s, tp)

    def step(state, env_state, key):
        specs = state_spec_fn(jax.eval_shape(lambda x: x, state))
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(specs, P(DATA_AXIS), P()),
            out_specs=(specs, P(DATA_AXIS), P()),
            check_vma=False,
        )
        return fn(state, env_state, key)

    return jax.jit(step)


def make_update_step(mesh: Mesh, cfg: Config, tp: bool = False):
    """Build the update-only SPMD step: (train_state, traj) -> (state, loss).

    The trajectory's game axis (axis 1 of every [T, B, ...] leaf) is sharded
    over the data axis; each device computes gradients on its local episode
    columns and the psum(grads)/n equals the global-batch gradient exactly
    (equal shard sizes, per-episode-mean loss). Used by training pipelines
    that separate rollout from update, and by the DP-equivalence test
    (tests/test_parallel.py) which checks psum-of-shards == one-device
    global-batch update on identical trajectories."""
    lcfg = _tp_config(cfg, tp)

    def local_update(state: td.TrainState, traj):
        obs = td.encode_traj(traj, lcfg)
        grad_fn = jax.value_and_grad(td.episode_loss_and_metrics, has_aux=True)
        (loss, _), grads = grad_fn(
            state.params, obs, traj.reward, traj.recorded, traj.boundary, lcfg,
            traj.player,
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        opt = td.make_optimizer(lcfg)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = td.TrainState(
            params=params,
            opt_state=opt_state,
            version=state.version + 1,
            episode_count=state.episode_count + jax.lax.psum(
                jnp.sum(traj.boundary.astype(jnp.int32)), DATA_AXIS
            ),
        )
        return new_state, loss

    def step(state, traj):
        specs = train_state_specs(jax.eval_shape(lambda x: x, state), tp)
        fn = shard_map(
            local_update,
            mesh=mesh,
            in_specs=(specs, P(None, DATA_AXIS)),
            out_specs=(specs, P()),
            check_vma=False,
        )
        return fn(state, traj)

    return jax.jit(step)
