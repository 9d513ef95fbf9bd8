"""Phase-level wall timing of the 2-ply production step at B=1024.

The round-3 op trace (probe_twoply_trace.py) attributed ~86.5ms of the
175.5ms step to the two roll scans and ~77ms to an out-of-scan tail it could
not split further. This probe jits each phase of select_action_2ply as its
own program and times it with device-synced walls, so the tail decomposes
into (root movegen, rerank prep, die tables/ctxs, nd scan, dd scan, final
assembly).

The tunnel backend tolerates only ~2-3 distinct LARGE programs per process
(PERF.md round 3), so each phase runs in its own process:

    for p in root prep tables nd dd whole; do
        python scripts/probe_twoply_phases.py $p; done
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from bench import production_config
from mlp_ppo_2ply_multi_tpu.core.config import TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.actor import rollout as actor
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves, board_take
from mlp_ppo_2ply_multi_tpu.engine import movegen2
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.model import value_net
from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
from mlp_ppo_2ply_multi_tpu.twoply import expectimax as tp

PHASE = sys.argv[1] if len(sys.argv) > 1 else "whole"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

cfg = production_config().replace(twoply=TwoPlyConfig(enabled=True))
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)
temp = td.temperature(jnp.zeros((), jnp.int32), cfg)

# host-side inputs shared by all phases (computed once, NOT timed)
moves = jax.jit(lambda s: legal_moves(s.board, s.player, s.dice, cfg.movegen))(state)


def cand(state, moves):
    v_moves = tp.oriented_values(params, moves.boards, state.player[..., None], cfg)
    v_masked = jnp.where(moves.valid, v_moves, -1e9)
    topv, topi = tp.topk_small(v_masked, cfg.twoply.top_k_candidates)
    return board_take(moves.boards, topi), topv, topi


cand_boards, _, _ = jax.jit(cand)(state, moves)
opp = 1 - state.player
opp_k = opp[..., None]


def run(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


if PHASE == "root":
    f = jax.jit(lambda s: legal_moves(s.board, s.player, s.dice, cfg.movegen))
    print(f"root_movegen: {run(f, state):.2f} ms")
elif PHASE == "prep":
    f = jax.jit(cand)
    print(f"rerank_prep (v_moves+top4+take): {run(f, state, moves):.2f} ms")
elif PHASE == "tables":
    f = jax.jit(
        lambda b, p: (movegen2.die_tables(b, p), movegen2.die_ctxs(b, p))
    )
    print(f"die_tables+die_ctxs: {run(f, cand_boards, opp_k):.2f} ms")
elif PHASE in ("nd", "dd", "scans"):
    # weighted_opponent_response with one scan disabled via monkeypatched
    # chunks — cheaper: time full scans and each separately by zeroing rolls
    import numpy as np

    saved_nd = tp.ROLLS.copy()

    def wor(cb, o):
        return tp.weighted_opponent_response(params, cb, o, cfg)

    if PHASE == "nd":
        # doubles scan still runs (fixed shape) but on 0 iterations is not
        # possible; instead time scans vs nd-only by differencing later.
        pass
    f = jax.jit(wor)
    print(f"scans (weighted_opponent_response): {run(f, cand_boards, opp):.2f} ms")
elif PHASE == "whole":
    @jax.jit
    def step(state, key):
        ns, _ = actor.rollout_step(params, state, key, temp, cfg, continuous=True)
        return ns

    print(f"whole_step: {run(step, state, jax.random.PRNGKey(9), iters=10):.2f} ms")
elif PHASE == "tail":
    # everything in select_action_2ply EXCEPT weighted_opponent_response:
    def tail(state, moves, w_o):
        k = cfg.twoply.top_k_candidates
        v_obs = value_net.forward(
            params, encode_board(state.board, state.player), cfg.model
        )
        v_moves = tp.oriented_values(params, moves.boards, state.player[..., None], cfg)
        v_masked = jnp.where(moves.valid, v_moves, -1e9)
        topv, topi = tp.topk_small(v_masked, k)
        top_valid = jnp.take_along_axis(moves.valid, topi, axis=-1)
        scores = cfg.twoply.alpha * topv - cfg.twoply.beta * w_o
        key = jax.random.PRNGKey(3)
        k2, k1 = jax.random.split(key)
        logits2 = jnp.where(top_valid, scores / temp, -1e9)
        pick = jax.random.categorical(k2, logits2, axis=-1)
        a2 = jnp.take_along_axis(topi, pick[..., None], axis=-1)[..., 0]
        logits1 = jnp.where(moves.valid, v_masked / temp, -1e9)
        a1 = jax.random.categorical(k1, logits1, axis=-1)
        return jnp.where(moves.count >= k, a2, a1), v_obs

    w_o = jnp.zeros((B, cfg.twoply.top_k_candidates), jnp.float32)
    f = jax.jit(tail)
    print(f"select_tail (sans scans): {run(f, state, moves, w_o):.2f} ms")
else:
    raise SystemExit(f"unknown phase {PHASE}")
