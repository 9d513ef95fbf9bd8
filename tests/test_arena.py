"""Arena sanity: greedy-with-trained-ish values should not lose 100% of games;
random vs random should be roughly balanced; matches finish."""
import jax
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
from mlp_ppo_2ply_multi_tpu.eval import arena
from mlp_ppo_2ply_multi_tpu.learner import td
import pytest

CFG = Config(movegen=MoveGenConfig(w1=16, w2=48, w3=96, w4=128, a_max=128))


@pytest.mark.slow
def test_random_vs_random_finishes_and_is_balanced():
    params = td.init_train_state(jax.random.PRNGKey(0), CFG).params
    res = arena.play_match(
        params,
        params,
        arena.random_policy(CFG),
        arena.random_policy(CFG),
        jax.random.PRNGKey(1),
        CFG,
        batch=64,
        max_steps=400,
    )
    s = arena.summarize(res)
    # random-vs-random backgammon games essentially always finish in 400 plies
    assert s["finished"] >= 60
    assert 0.2 <= s["win_rate_a"] <= 0.8


@pytest.mark.slow
def test_greedy_policy_runs_and_beats_nothing_burger():
    # untrained net vs random: just verify the match runs and reports
    params = td.init_train_state(jax.random.PRNGKey(2), CFG).params
    res = arena.play_match(
        params,
        params,
        arena.greedy_policy(CFG),
        arena.random_policy(CFG),
        jax.random.PRNGKey(3),
        CFG,
        batch=32,
        max_steps=400,
    )
    s = arena.summarize(res)
    assert s["finished"] >= 28
    assert s["win_rate_a"] + s["win_rate_b"] == 1.0 or s["finished"] == 0
