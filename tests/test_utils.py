"""Ring buffer and profiling utilities; rollout_loop == rollout(scan)."""
import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.utils import profiling, ring_buffer


def test_ring_buffer_push_wrap_sample():
    ex = {"a": jnp.zeros((4, 3), jnp.float32), "b": jnp.zeros((4,), jnp.int8)}
    st = ring_buffer.init(ex, capacity=3)
    for i in range(5):  # wraps: slots hold pushes 3,4,2
        sl = {"a": jnp.full((4, 3), i, jnp.float32), "b": jnp.full((4,), i, jnp.int8)}
        st = ring_buffer.push(st, sl)
    assert int(st.filled) == 3
    assert int(st.cursor) == 5 % 3
    stored = sorted(int(x) for x in np.asarray(st.store["a"][:, 0, 0]))
    assert stored == [2, 3, 4]
    out = ring_buffer.sample(st, jax.random.PRNGKey(0), n=8)
    vals = set(int(x) for x in np.asarray(out["a"][:, 0, 0]))
    assert vals <= {2, 3, 4}


def test_profile_decorator_accumulates():
    profiling.profiling_data.clear()

    @profiling.profile
    def f(x):
        return x * 2

    for _ in range(3):
        f(jnp.ones((8,)))
    d = profiling.profiling_data["test_profile_decorator_accumulates.<locals>.f"]
    assert d["calls"] == 3 and d["total_s"] > 0


def test_rollout_loop_matches_scan():
    from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
    from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.learner import td

    cfg = Config(movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64))
    params = td.init_train_state(jax.random.PRNGKey(0), cfg).params
    state = vec_env.reset(jax.random.PRNGKey(1), 8)
    temp = jnp.float32(1.0)
    key = jax.random.PRNGKey(2)

    s1, t1 = actor.rollout(params, state, key, temp, cfg, 5, continuous=True)
    s2, t2 = actor.rollout_loop(params, state, key, temp, cfg, 5, continuous=True)
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_memory_stats_never_raises():
    from mlp_ppo_2ply_multi_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()
    assert isinstance(stats, dict)
    for v in stats.values():
        assert v >= 0.0
