"""Differential tests for the 2-ply expectimax scorer vs a pure-python oracle
implementing the reference algorithm (two_ply.py:44-150)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.engine.board import Board
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.oracle import rules
from mlp_ppo_2ply_multi_tpu.twoply import expectimax
from tests.helpers import boards_to_jax, sample_cases
import pytest

CFG = Config(
    movegen=MoveGenConfig(a_max=512),
    # reply_a_max=512 so the only truncation is the 50-cap on small doubles,
    # which the oracle below applies identically (first-50, the documented
    # deterministic divergence from the reference's random.sample).
    twoply=TwoPlyConfig(enabled=True, reply_a_max=512),
)


def _forward_np(params, x):
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    h = 1.0 / (1.0 + np.exp(-(x @ w1 + b1)))
    return (h @ w2 + b2)[..., 0]


def _oracle_wor(params, board, opp_player, cap=50, topn=5):
    """two_ply.py:93-150 with deterministic first-``cap`` small-doubles."""
    total = 0.0
    for roll, prob, small in zip(
        expectimax.ROLLS, expectimax.PROBS, expectimax.SMALL_DOUBLE
    ):
        mvs = rules.full_moves(board, opp_player, tuple(int(d) for d in roll))
        if small and len(mvs) > cap:
            mvs = mvs[:cap]
        if mvs:
            feats = np.array([rules.encode(b, opp_player) for _, b in mvs], np.float32)
            v = _forward_np(params, feats)
            top = np.sort(v)[::-1][:topn]
            total += float(top.mean()) * float(prob)
    return total


@pytest.mark.slow
def test_weighted_opponent_response_matches_oracle():
    params = td.init_train_state(jax.random.PRNGKey(0), CFG).params
    boards, players, _ = sample_cases(seed=42, n=6)

    jb = boards_to_jax(boards)  # [6]
    # candidate axis K=1: each board is its own candidate
    jb_k = Board(data=jb.data[:, None])
    opp = jnp.asarray(players, jnp.int32)
    got = np.asarray(
        jax.jit(
            lambda p, b, o: expectimax.weighted_opponent_response(p, b, o, CFG)
        )(params, jb_k, opp)
    )[:, 0]

    want = np.array(
        [_oracle_wor(params, b, pl) for b, pl in zip(boards, players)], np.float32
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_rollout_with_twoply_enabled_runs():
    from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
    from mlp_ppo_2ply_multi_tpu.env import vec_env

    cfg = Config(
        movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64),
        twoply=TwoPlyConfig(enabled=True, reply_a_max=32),
    )
    params = td.init_train_state(jax.random.PRNGKey(1), cfg).params
    state = vec_env.reset(jax.random.PRNGKey(2), 4)
    temp = jnp.float32(1.0)
    state2, traj = actor.rollout(
        params, state, jax.random.PRNGKey(3), temp, cfg, num_steps=3
    )
    assert np.asarray(traj.recorded).shape == (3, 4)
    assert np.isfinite(np.asarray(traj.value)).all()


def test_topk_small_matches_lax_topk():
    import numpy as np
    from mlp_ppo_2ply_multi_tpu.twoply.expectimax import topk_small

    rng = np.random.default_rng(11)
    for shape, k in [((7, 33), 4), ((3, 5, 20), 5), ((2, 6), 6)]:
        v = rng.normal(size=shape).astype(np.float32)
        # inject duplicates and -1e9 masks
        v.reshape(-1)[:: 7] = 0.5
        v.reshape(-1)[1:: 13] = -1e9
        got_v, got_i = topk_small(jnp.asarray(v), k)
        exp_v, exp_i = jax.lax.top_k(jnp.asarray(v), k)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(exp_v))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(exp_i))


def test_oriented_values_side0_sign():
    """side0: side 1's oriented value is the NEGATED side-0 estimate with the
    truthful (side-0-on-roll) flag; side 0's is the raw estimate with side 1
    on roll. Reference mode: mover's flag, no negation."""
    import numpy as np
    import dataclasses
    from mlp_ppo_2ply_multi_tpu.core.config import Config
    from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
    from mlp_ppo_2ply_multi_tpu.engine.board import Board
    from mlp_ppo_2ply_multi_tpu.model import value_net
    from mlp_ppo_2ply_multi_tpu.twoply.expectimax import oriented_values

    cfg0 = Config()
    cfg_s0 = dataclasses.replace(
        cfg0, train=dataclasses.replace(cfg0.train, td_mode="side0")
    )
    params = value_net.init_params(jax.random.PRNGKey(0), cfg0.model)
    rng = np.random.default_rng(2)
    b = Board(data=jnp.asarray(rng.integers(0, 5, size=(6, 52), dtype=np.int8)))
    for mover in (0, 1):
        mv = jnp.full((6,), mover)
        got = oriented_values(params, b, mv, cfg_s0)
        raw = value_net.forward(params, encode_board(b, 1 - mv), cfg0.model)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(raw) * (1.0 if mover == 0 else -1.0),
            rtol=1e-6)
        got_ref = oriented_values(params, b, mv, cfg0)
        raw_ref = value_net.forward(params, encode_board(b, mv), cfg0.model)
        np.testing.assert_allclose(np.asarray(got_ref), np.asarray(raw_ref), rtol=1e-6)


@pytest.mark.slow
def test_roll_chunked_scorer_matches_unchunked():
    """weighted_opponent_response with roll_chunk=3 must equal roll_chunk=1
    (the padded tail's probability is zeroed)."""
    import dataclasses
    import numpy as np
    from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig, TwoPlyConfig
    from mlp_ppo_2ply_multi_tpu.engine.board import Board
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.model import value_net
    from mlp_ppo_2ply_multi_tpu.twoply import expectimax

    base = Config(
        movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64),
        twoply=TwoPlyConfig(enabled=True, reply_a_max=64),
    )
    params = value_net.init_params(jax.random.PRNGKey(0), base.model)
    state = vec_env.reset(jax.random.PRNGKey(1), 6)
    boards = Board(data=state.board.data[:, None, :])  # [6, 1] candidates
    opp = 1 - state.player
    outs = []
    for c in (1, 3):
        cfg = dataclasses.replace(
            base, twoply=dataclasses.replace(base.twoply, roll_chunk=c)
        )
        outs.append(
            np.asarray(
                expectimax.weighted_opponent_response(params, boards, opp, cfg)
            )
        )
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_reply_tier_matches_untired():
    """The two-tier reply tail (TwoPlyConfig.reply_nd_tier) must be exact
    when the wide sub-batch covers every game (reply_wide_div=1): tier-1 is
    exact for counts <= tier and every wider (game, candidate) re-runs at
    full width, so the weighted opponent response is bit-identical to the
    single-pass scorer."""
    cfg0 = Config(
        movegen=MoveGenConfig(algo="canonical", dd_subbatch_div=0),
        # value_first_m=0: the tier branch lives in the reference-order
        # dedup path, which value-first dedup (its own exactness test in
        # test_twoply_valuefirst.py) would otherwise bypass entirely
        twoply=TwoPlyConfig(enabled=True, value_first_m=0),
    )
    cfg_t = dataclasses.replace(
        cfg0,
        twoply=dataclasses.replace(
            cfg0.twoply, reply_nd_tier=8, reply_wide_div=1
        ),
    )
    params = td.init_train_state(jax.random.PRNGKey(0), cfg0).params
    boards, players, _ = sample_cases(seed=77, n=6)
    jb = boards_to_jax(boards)
    jb_k = Board(data=jb.data[:, None])  # K=1 candidate axis
    opp = jnp.asarray(players, jnp.int32)

    f0 = jax.jit(
        lambda p, b, o: expectimax.weighted_opponent_response(p, b, o, cfg0)
    )
    ft = jax.jit(
        lambda p, b, o: expectimax.weighted_opponent_response(p, b, o, cfg_t)
    )
    np.testing.assert_allclose(
        np.asarray(ft(params, jb_k, opp)),
        np.asarray(f0(params, jb_k, opp)),
        rtol=0,
        atol=0,
    )
