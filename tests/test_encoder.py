"""198-feature encoding vs oracle (layout quirk Q11)."""
import numpy as np
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.oracle import rules
from tests.helpers import boards_to_jax, sample_cases


def test_features_match_oracle():
    boards, players, _ = sample_cases(42, 128)
    jb = boards_to_jax(boards)
    p = jnp.asarray(players, dtype=jnp.int32)
    feats = np.asarray(encode_board(jb, p))
    assert feats.shape == (128, 198)
    for g, ob in enumerate(boards):
        want = np.asarray(rules.encode(ob, players[g]), dtype=np.float32)
        assert np.allclose(feats[g], want), g


def test_feature_layout_spotcheck():
    # start position, P1 to move: P1 has 2 on point 0 -> features [1,1,0,0]
    jb = boards_to_jax([rules.start_board()])
    f = np.asarray(encode_board(jb, jnp.asarray([0])))[0]
    assert list(f[0:4]) == [1.0, 1.0, 0.0, 0.0]
    # P1 5 checkers on point 11 -> [1,1,1,1.0] ((5-3)/2)
    assert list(f[44:48]) == [1.0, 1.0, 1.0, 1.0]
    # side to move
    assert f[196] == 1.0 and f[197] == 0.0
