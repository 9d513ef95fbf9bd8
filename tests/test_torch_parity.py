"""Value parity against the reference's shipped torch checkpoints: the jax
forward over our encoder must match torch's forward over the same features
(the reference's net is fc1 -> sigmoid -> value_head; policy_network.py:53-70).
Skipped when the reference checkout is not mounted."""
import glob
import os

import numpy as np
import pytest

REF_GLOB = "/root/reference/src/play/*.pth"


@pytest.mark.skipif(not glob.glob(REF_GLOB), reason="reference .pth not mounted")
def test_reference_checkpoint_value_parity():
    import torch
    import jax
    import jax.numpy as jnp

    from mlp_ppo_2ply_multi_tpu.core.config import Config
    from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
    from mlp_ppo_2ply_multi_tpu.model import value_net
    from tests.helpers import boards_to_jax, sample_cases

    path = sorted(glob.glob(REF_GLOB))[0]
    params = value_net.load_torch_checkpoint(path)
    sd = torch.load(path, map_location="cpu", weights_only=True)

    boards, players, _ = sample_cases(7, 64)
    jb = boards_to_jax(boards)
    feats = np.asarray(encode_board(jb, jnp.asarray(players, jnp.int32)))

    # torch forward, reference architecture
    x = torch.from_numpy(feats)
    h = torch.sigmoid(x @ sd["fc1.weight"].T + sd["fc1.bias"])
    want = (h @ sd["value_head.weight"].T + sd["value_head.bias"]).squeeze(-1).numpy()

    cfg = Config()
    got = np.asarray(value_net.forward(params, jnp.asarray(feats), cfg.model))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got_np = value_net.forward_np(params, feats)
    np.testing.assert_allclose(got_np, want, rtol=1e-5, atol=1e-6)
