"""A/B the two dispatch-overhead levers on the production rollout step:

  donate : jit with donate_argnums on the env state — lets XLA update the
           board/PRNG buffers in place instead of copying (the round-3 trace
           shows ~0.5ms/step of copy.* ops at B=4096).
  chunkK : one dispatch runs a K-step lax.scan (K small, e.g. 4/8) — splits
           the ~1.4ms/step host/tunnel dispatch gap across K steps. The
           round-1 toolchain compiled matmul-bearing scan bodies
           pathologically (>30min); re-test per toolchain.

Usage: python scripts/probe_chunked.py [variant] [batch] [mode]
  mode: base | donate | chunk4 | chunk8 | donate_chunk4 ...
"""
import sys, time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
import jax
import jax.numpy as jnp
import numpy as np

from bench_r2_sweep import variant_cfg
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td

name = sys.argv[1] if len(sys.argv) > 1 else "prod"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
mode = sys.argv[3] if len(sys.argv) > 3 else "base"
STEPS = 48

if "rbg" in mode:
    # A/B the raw-bit-generator PRNG: categorical sampling + per-step splits
    # draw ~[B, a_max] bits/step; threefry generates them with many int
    # rounds, rbg uses the hardware RNG instruction.
    jax.config.update("jax_default_prng_impl", "rbg")

cfg = variant_cfg(name)
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

chunk = 0
for tok in mode.split("_"):
    if tok.startswith("chunk"):
        chunk = int(tok[5:])
donate = "donate" in mode

if chunk:

    def step(state, key):
        def body(carry, k):
            st, _ = actor.rollout_step(params, carry, k, temp, cfg, True)
            return st, None

        keys = jax.random.split(key, chunk)
        state, _ = jax.lax.scan(body, state, keys)
        return state

else:

    def step(state, key):
        new_state, _ = actor.rollout_step(params, state, key, temp, cfg, True)
        return new_state

step = jax.jit(step, donate_argnums=(0,) if donate else ())

n_dispatch = STEPS // max(chunk, 1)
keys = jax.random.split(jax.random.PRNGKey(1), n_dispatch + 8)
t0 = time.perf_counter()
for i in range(8):
    state = step(state, keys[i])
np.asarray(state.board.data)
print(f"{mode}: compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
for i in range(n_dispatch):
    state = step(state, keys[8 + i])
np.asarray(state.board.data)
dt = time.perf_counter() - t0
rate = B * max(chunk, 1) * n_dispatch / dt
print(
    f"{name} B={B} {mode}: {rate:,.0f} env-steps/s "
    f"({dt/ n_dispatch / max(chunk,1) * 1000:.2f} ms/env-step)"
)
