"""Value net vs the torch reference: forward parity given identical weights,
including loading the reference's shipped .pth checkpoints (Q1/Q11)."""
import glob

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mlp_ppo_2ply_multi_tpu.core.config import ModelConfig
from mlp_ppo_2ply_multi_tpu.model import value_net

REF_CKPTS = sorted(glob.glob("/root/reference/src/play/*.pth"))


def _torch_forward(sd, x):
    """Reference forward (policy_network.py:53-70) computed directly from the
    state dict: sigmoid(x @ W1^T + b1) @ W2^T + b2, squeezed."""
    with torch.no_grad():
        h = torch.sigmoid(torch.as_tensor(x) @ sd["fc1.weight"].T + sd["fc1.bias"])
        v = h @ sd["value_head.weight"].T + sd["value_head.bias"]
    return v.squeeze(-1).numpy()


def test_forward_matches_torch_random_weights():
    cfg = ModelConfig()
    params = value_net.init_params(jax.random.key(0), cfg)
    sd = value_net.to_torch_state_dict(params)
    x = np.random.default_rng(0).uniform(0, 1, size=(64, 198)).astype(np.float32)
    want = _torch_forward(sd, x)
    got = np.asarray(value_net.forward(params, jnp.asarray(x), cfg))
    assert np.allclose(got, want, atol=1e-5)


@pytest.mark.skipif(not REF_CKPTS, reason="reference checkpoints not present")
def test_reference_checkpoint_roundtrip():
    path = REF_CKPTS[0]
    params = value_net.load_torch_checkpoint(path)
    assert params["w1"].shape == (198, 128)  # Q1: every shipped ckpt is h=128
    sd = torch.load(path, map_location="cpu", weights_only=True)
    x = np.random.default_rng(1).uniform(0, 1, size=(32, 198)).astype(np.float32)
    want = _torch_forward(sd, x)
    got = np.asarray(value_net.forward(params, jnp.asarray(x), ModelConfig()))
    assert np.allclose(got, want, atol=1e-5)
    # export -> import roundtrip
    rt = value_net.from_torch_state_dict(value_net.to_torch_state_dict(params))
    for k in params:
        assert np.array_equal(np.asarray(rt[k]), np.asarray(params[k]))


def test_bfloat16_forward_close_to_fp32():
    cfg32 = ModelConfig(dtype="float32")
    cfg16 = ModelConfig(dtype="bfloat16")
    params = value_net.init_params(jax.random.key(3), cfg32)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (128, 198)), jnp.float32)
    v32 = np.asarray(value_net.forward(params, x, cfg32))
    v16 = np.asarray(value_net.forward(params, x, cfg16))
    assert np.allclose(v16, v32, atol=0.05)


def test_fused_value_kernel_matches_forward():
    """ops/fused_value (interpret mode on CPU) == the standard
    encode+forward within bfloat16 rounding, over random cell counts and
    both side-to-move flags."""
    import numpy as np
    from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
    from mlp_ppo_2ply_multi_tpu.engine.board import Board
    from mlp_ppo_2ply_multi_tpu.ops.fused_value import fused_value

    cfg = ModelConfig()
    params = value_net.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(5)
    boards = rng.integers(0, 16, size=(500, 52), dtype=np.int8)
    flags = rng.integers(0, 2, size=(500,)).astype(np.int8)
    b = Board(data=jnp.asarray(boards))
    v_ref = value_net.forward(params, encode_board(b, jnp.asarray(flags)), cfg)
    v_fused = fused_value(b.data, jnp.asarray(flags), params)
    assert float(jnp.max(jnp.abs(v_ref - v_fused))) < 2e-2
    # batch-shaped input [B, A, 52] with broadcast flag
    b2 = Board(data=jnp.asarray(boards).reshape(20, 25, 52))
    v2 = fused_value(b2.data, jnp.asarray(flags).reshape(20, 25), params)
    assert v2.shape == (20, 25)
    np.testing.assert_allclose(np.asarray(v2).ravel(), np.asarray(v_fused), atol=1e-6)
