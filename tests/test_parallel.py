"""SPMD train-step tests on a virtual 8-device CPU mesh (SURVEY.md §4:
multi-host behavior validated via xla_force_host_platform_device_count)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig, TrainConfig
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.parallel import sharding

# tiny movegen widths keep compile time reasonable on 8 CPU devices
TINY = Config(
    movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64),
    train=TrainConfig(batch_games=16, per_episode_updates=False),
)


def _init(key, batch):
    state = td.init_train_state(key, TINY)
    env_state = vec_env.reset(jax.random.fold_in(key, 1), batch)
    return state, env_state


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_train_step_runs_on_mesh(data, model):
    assert len(jax.devices()) >= 8
    mesh = sharding.make_mesh(data, model)
    key = jax.random.PRNGKey(0)
    state, env_state = _init(key, batch=16)
    state = sharding.shard_train_state(state, mesh, tp=model > 1)
    env_state = sharding.shard_env_state(env_state, mesh)

    step = sharding.make_train_step(mesh, TINY, num_steps=8, tp=model > 1)
    state2, env_state2, metrics = step(state, env_state, jax.random.PRNGKey(7))
    jax.block_until_ready(state2)

    assert int(state2.version) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(metrics["env_steps"]) == 8 * 16
    # params changed and contain no NaNs
    for k in state2.params:
        arr = np.asarray(jax.device_get(state2.params[k]))
        assert np.isfinite(arr).all()


def test_dp_matches_single_device_update():
    """psum-of-shards == single-device global-batch update on IDENTICAL
    trajectories: roll out ONE unsharded trajectory, then apply (a) the fused
    single-device update and (b) the 8-way data-sharded update to the same
    TrainState, and require the resulting parameters to match."""
    from mlp_ppo_2ply_multi_tpu.actor import rollout as actor

    key = jax.random.PRNGKey(3)
    state, env_state = _init(key, batch=16)
    temp = td.temperature(state.version, TINY)
    _, traj = actor.rollout(
        state.params, env_state, jax.random.PRNGKey(11), temp, TINY, 6,
        continuous=True,
    )

    # (a) single-device fused update (per_episode_updates=False in TINY)
    out_one, m_one = td.update(state, traj, TINY)

    # (b) the same trajectory sharded over the 8-way data mesh
    mesh = sharding.make_mesh(8, 1)
    sh_state = sharding.shard_train_state(state, mesh, tp=False)
    sh_traj = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))
        ),
        traj,
    )
    upd = sharding.make_update_step(mesh, TINY, tp=False)
    out_sh, loss_sh = upd(sh_state, sh_traj)

    np.testing.assert_allclose(
        float(m_one["loss"]), float(loss_sh), rtol=1e-6, atol=1e-7
    )
    for k in state.params:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(out_one.params[k])),
            np.asarray(jax.device_get(out_sh.params[k])),
            rtol=1e-5,
            atol=1e-6,
            err_msg=k,
        )
    # episode accounting conventions differ by design: td.update (sync) counts
    # columns, the sharded update counts episode boundaries — not compared.
    assert int(out_sh.version) == int(out_one.version) == 1


@pytest.mark.slow
def test_tp_matches_no_tp():
    """Tensor-parallel (model=2) forward/update must match the pure-DP result
    bitwise-closely: the hidden-axis split changes only summation order."""
    key = jax.random.PRNGKey(5)
    state, env_state = _init(key, batch=16)

    mesh_dp = sharding.make_mesh(4, 1, devices=jax.devices()[:4])
    st_dp = sharding.shard_train_state(state, mesh_dp, tp=False)
    env_dp = sharding.shard_env_state(env_state, mesh_dp)
    step_dp = sharding.make_train_step(mesh_dp, TINY, num_steps=5, tp=False)
    out_dp, _, m_dp = step_dp(st_dp, env_dp, jax.random.PRNGKey(2))

    mesh_tp = sharding.make_mesh(4, 2)
    st_tp = sharding.shard_train_state(state, mesh_tp, tp=True)
    env_tp = sharding.shard_env_state(env_state, mesh_tp)
    step_tp = sharding.make_train_step(mesh_tp, TINY, num_steps=5, tp=True)
    out_tp, _, m_tp = step_tp(st_tp, env_tp, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-5, atol=1e-6
    )
    for k in state.params:
        # hidden-axis split changes only summation order; Adam's
        # normalization amplifies the float noise slightly
        np.testing.assert_allclose(
            np.asarray(jax.device_get(out_dp.params[k])),
            np.asarray(jax.device_get(out_tp.params[k])),
            rtol=1e-4,
            atol=5e-5,
        )
