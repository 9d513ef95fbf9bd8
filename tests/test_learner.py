"""Learner unit tests: TD target structure, parity-mode sequential updates,
and temperature schedule (quirks Q2/Q3/Q9/Q12)."""
import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import Config, TrainConfig
from mlp_ppo_2ply_multi_tpu.learner import td

CFG = Config()


def test_td_targets_skip_passes_and_respect_boundaries():
    # One column, T=7: decisions at t=0,1,3,5; pass at t=2; win at t=5 (done);
    # frozen afterwards.
    v = jnp.asarray([[0.1], [0.2], [0.9], [0.3], [0.9], [0.4], [0.0]])
    r = jnp.asarray([[0.0], [0.0], [0.0], [0.2], [0.0], [1.0], [0.0]])
    rec = jnp.asarray([[1], [1], [0], [1], [0], [1], [0]], dtype=bool)
    bnd = jnp.asarray([[0], [0], [0], [0], [0], [1], [0]], dtype=bool)
    g = CFG.train.gamma
    tgt = np.asarray(td._episode_targets(v[..., 0].reshape(7, 1), r, rec, bnd, g))
    # recorded rows bootstrap on the NEXT RECORDED value (passes skipped)
    assert np.isclose(tgt[0, 0], 0.0 + g * 0.2)
    assert np.isclose(tgt[1, 0], 0.0 + g * 0.3)  # skips the pass at t=2
    assert np.isclose(tgt[3, 0], 0.2 + g * 0.4)  # skips pass at t=4
    assert np.isclose(tgt[5, 0], 1.0)  # terminal: reward only


def test_td_targets_truncation():
    # truncated episode: boundary at last step without done (quirk Q9)
    v = jnp.asarray([[0.5], [0.6], [0.7]])
    r = jnp.asarray([[0.0], [0.0], [0.0]])
    rec = jnp.ones((3, 1), bool)
    bnd = jnp.asarray([[0], [0], [1]], dtype=bool)
    g = CFG.train.gamma
    tgt = np.asarray(td._episode_targets(v[..., 0].reshape(3, 1), r, rec, bnd, g))
    assert np.isclose(tgt[2, 0], 0.0)  # no bootstrap past truncation
    assert np.isclose(tgt[1, 0], g * 0.7)


def test_temperature_schedule():
    assert np.isclose(float(td.temperature(jnp.int32(0), CFG)), 1.5)
    assert np.isclose(float(td.temperature(jnp.int32(4000), CFG)), 0.5)
    assert np.isclose(float(td.temperature(jnp.int32(2000), CFG)), 1.0)
    assert np.isclose(float(td.temperature(jnp.int32(9999), CFG)), 0.5)


def _tiny_traj(key, T, B):
    """Synthetic trajectory stack with plausible flags."""
    from mlp_ppo_2ply_multi_tpu.actor.rollout import Transition
    from mlp_ppo_2ply_multi_tpu.engine.board import initial_board, pack_board

    ks = jax.random.split(key, 4)
    packed = jnp.broadcast_to(pack_board(initial_board((B,))), (T, B, 52))
    rec = jax.random.uniform(ks[0], (T, B)) < 0.8
    done = jnp.zeros((T, B), bool).at[T - 1].set(True) & rec[T - 1]
    return Transition(
        packed_board=packed,
        player=jax.random.randint(ks[1], (T, B), 0, 2),
        reward=jax.random.uniform(ks[2], (T, B)) * rec,
        recorded=rec,
        done=done,
        boundary=done,
        value=jnp.zeros((T, B)),
        win_type=jnp.zeros((T, B), jnp.int8),
        close_out=jnp.zeros((T, B), bool),
        prime=jnp.zeros((T, B), bool),
        num_moves=jnp.ones((T, B), jnp.int32),
    )


def test_parity_mode_equals_manual_sequential_updates():
    """per_episode_updates scan == manually looping optimizer steps."""
    import optax

    cfg = CFG.replace(train=TrainConfig(per_episode_updates=True, batch_games=3))
    T, B = 6, 3
    ts = td.init_train_state(jax.random.key(0), cfg)
    traj = _tiny_traj(jax.random.key(1), T, B)
    new_ts, metrics = td.update(ts, traj, cfg)

    # manual loop
    opt = td.make_optimizer(cfg)
    params, opt_state = ts.params, ts.opt_state
    obs = td.encode_traj(traj, cfg)
    for b in range(B):
        (loss, _), grads = jax.value_and_grad(td.episode_loss_and_metrics, has_aux=True)(
            params,
            obs[:, b],
            traj.reward[:, b],
            traj.recorded[:, b],
            traj.boundary[:, b],
            cfg,
        )
        upd, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
    for k in params:
        assert np.allclose(np.asarray(params[k]), np.asarray(new_ts.params[k]), atol=1e-6), k
    assert int(new_ts.version) == 1
    assert int(new_ts.episode_count) == B


def test_fast_mode_changes_params_once():
    cfg = CFG.replace(train=TrainConfig(per_episode_updates=False, batch_games=3))
    ts = td.init_train_state(jax.random.key(0), cfg)
    traj = _tiny_traj(jax.random.key(1), 6, 3)
    new_ts, metrics = td.update(ts, traj, cfg)
    assert float(metrics["loss"]) >= 0.0
    assert any(
        not np.allclose(np.asarray(ts.params[k]), np.asarray(new_ts.params[k]))
        for k in ts.params
    )


def test_td_sign_flip_targets():
    """Negamax targets: successor negated across players, NOT negated when
    the next recorded mover is the same player (opponent danced)."""
    import jax.numpy as jnp
    from mlp_ppo_2ply_multi_tpu.learner.td import _episode_targets

    # one column, T=4: players [0, 1, 1, 0]; step1->step2 same player (1)
    v = jnp.array([[0.1], [0.2], [0.3], [0.4]], jnp.float32)
    r = jnp.array([[0.0], [0.0], [0.0], [1.0]], jnp.float32)
    rec = jnp.ones((4, 1), bool)
    bnd = jnp.array([[False], [False], [False], [True]])
    pl = jnp.array([[0], [1], [1], [0]], jnp.int32)
    g = 0.9

    t_flip = _episode_targets(v, r, rec, bnd, g, td_mode="negamax", player=pl)
    # t3 = 1.0 (terminal); t2 = 0 - g*0.4 (player 1 -> 0 flips);
    # t1 = 0 + g*0.3 (player 1 -> 1, same, no flip); t0 = 0 - g*0.2
    want = [[-g * 0.2], [g * 0.3], [-g * 0.4], [1.0]]
    np.testing.assert_allclose(np.asarray(t_flip), want, rtol=1e-6)

    t_ref = _episode_targets(v, r, rec, bnd, g, td_mode="reference", player=pl)
    want_ref = [[g * 0.2], [g * 0.3], [g * 0.4], [1.0]]
    np.testing.assert_allclose(np.asarray(t_ref), want_ref, rtol=1e-6)

    # side0: rewards signed by mover (winner here is player 0 at t3), no
    # bootstrap flip
    t_s0 = _episode_targets(v, r, rec, bnd, g, td_mode="side0", player=pl)
    want_s0 = [[g * 0.2], [g * 0.3], [g * 0.4], [1.0]]
    np.testing.assert_allclose(np.asarray(t_s0), want_s0, rtol=1e-6)
    # and with a player-1 win the terminal reward is negated
    pl2 = jnp.array([[1], [0], [0], [1]], jnp.int32)
    t_s0b = _episode_targets(v, r, rec, bnd, g, td_mode="side0", player=pl2)
    np.testing.assert_allclose(
        np.asarray(t_s0b), [[g * 0.2], [g * 0.3], [g * 0.4], [-1.0]], rtol=1e-6
    )


def test_lr_decay_hook():
    """lr_decay < 1 shrinks later Adam steps (the reference's DEAD
    LR_DECAY/LR_DECAY_STEPS hooks, configuration.py:19-20, live here)."""
    import optax

    params = {"w": jnp.ones((4,))}
    g = {"w": jnp.full((4,), 0.5)}

    def total_motion(cfg):
        opt = td.make_optimizer(cfg)
        st = opt.init(params)
        p = params
        deltas = []
        for _ in range(3):
            up, st = opt.update(g, st, p)
            p = optax.apply_updates(p, up)
            deltas.append(float(jnp.abs(up["w"]).sum()))
        return deltas

    base = Config(train=TrainConfig())
    dec = Config(train=TrainConfig(lr_decay=0.5, lr_decay_steps=1))
    d_base = total_motion(base)
    d_dec = total_motion(dec)
    # first step identical (decay applies from step boundary), later steps
    # strictly smaller under decay
    np.testing.assert_allclose(d_base[0], d_dec[0], rtol=1e-6)
    assert d_dec[2] < d_base[2] * 0.6, (d_base, d_dec)
