"""Sigmoid MLP value network (198 -> hidden -> 1).

The reference's ``BackgammonPolicyNetwork``
(/root/reference/src/agents/policy_network.py:6-70) is — despite the name — a
pure afterstate value net: Linear, sigmoid, Linear, squeeze. Here it is a
params pytree + pure function so the same forward serves the actor (inference
over [B, A+1, 198] candidate stacks), the learner (grads via jax.grad), and
the 2-ply scorer, all under one jit.

Weight layout note: torch Linear stores (out, in); we store (in, out). The
torch import/export helpers transpose, so the reference's shipped .pth
checkpoints load bit-exactly (SURVEY.md §5.4).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import ModelConfig

Params = Dict[str, jax.Array]


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Xavier-uniform weights, zero... no: torch Linear default biases are
    uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)); the reference only re-inits the
    WEIGHTS with xavier_uniform_ (policy_network.py:50-51) and keeps default
    biases. We replicate both distributions."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    in_s, h = cfg.input_size, cfg.hidden_size

    def xavier(key, fan_in, fan_out):
        limit = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -limit, limit)

    def torch_bias(key, fan_in, n):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, (n,), jnp.float32, -bound, bound)

    return {
        "w1": xavier(k1, in_s, h),
        "b1": torch_bias(k2, in_s, h),
        "w2": xavier(k3, h, 1),
        "b2": torch_bias(k4, h, 1),
    }


def forward(params: Params, x: jax.Array, cfg: ModelConfig) -> jax.Array:
    """V(x) for feature batches of any leading shape [..., 198] -> [...].

    Matches reference policy_network.py:53-70: sigmoid hidden, linear head,
    squeeze(-1). Optionally computes in bfloat16 (MXU fast path) with float32
    accumulation.
    """
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    h = jnp.dot(x.astype(dt), params["w1"].astype(dt), preferred_element_type=jnp.float32)
    h = jax.nn.sigmoid(h + params["b1"])
    v = jnp.dot(h.astype(dt), params["w2"].astype(dt), preferred_element_type=jnp.float32)
    if cfg.model_axis is not None:
        # Tensor-parallel mode (inside shard_map): w1/b1 hold a column shard
        # and w2 a row shard, so v is a partial sum over the hidden axis.
        v = jax.lax.psum(v, cfg.model_axis)
    return (v + params["b2"]).squeeze(-1).astype(jnp.float32)


def forward_np(params: Params, x: np.ndarray) -> np.ndarray:
    """Pure-numpy forward for host-side single-game use (play CLI, oracle
    differential tests); bit-identical math to the float32 jax path."""
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    h = 1.0 / (1.0 + np.exp(-(x @ w1 + b1)))
    return (h @ w2 + b2)[..., 0]


# ---------------------------------------------------------------------------
# torch .pth interop (reference checkpoints in /root/reference/src/play/*.pth;
# state dict keys fc1.weight/fc1.bias/value_head.weight/value_head.bias)
# ---------------------------------------------------------------------------

def from_torch_state_dict(sd) -> Params:
    def arr(t):
        return jnp.asarray(np.asarray(t.detach().cpu() if hasattr(t, "detach") else t))

    return {
        "w1": arr(sd["fc1.weight"]).T,  # (h,198) -> (198,h)
        "b1": arr(sd["fc1.bias"]),
        "w2": arr(sd["value_head.weight"]).T,  # (1,h) -> (h,1)
        "b2": arr(sd["value_head.bias"]),
    }


def to_torch_state_dict(params: Params):
    import torch

    return {
        "fc1.weight": torch.from_numpy(np.asarray(params["w1"]).T.copy()),
        "fc1.bias": torch.from_numpy(np.asarray(params["b1"]).copy()),
        "value_head.weight": torch.from_numpy(np.asarray(params["w2"]).T.copy()),
        "value_head.bias": torch.from_numpy(np.asarray(params["b2"]).copy()),
    }


def load_torch_checkpoint(path: str) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_state_dict(sd)
