"""Split the 2-ply scorer's 88ms scan cost between the 15-roll non-doubles
scan and the 6-roll doubles scan, and within each, between enumeration and
scoring. One phase per process (tunnel program budget):

    for p in nd dd nd_enum dd_enum nd_score; do
        python scripts/probe_twoply_scan_split.py $p; done
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import production_config
from mlp_ppo_2ply_multi_tpu.core.config import TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves, board_take
from mlp_ppo_2ply_multi_tpu.engine import movegen2
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.twoply import expectimax as tp

PHASE = sys.argv[1] if len(sys.argv) > 1 else "nd"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

cfg = production_config().replace(twoply=TwoPlyConfig(enabled=True))
key = jax.random.PRNGKey(0)
params = td.init_train_state(key, cfg).params
state = vec_env.reset(jax.random.fold_in(key, 1), B)

moves = jax.jit(lambda s: legal_moves(s.board, s.player, s.dice, cfg.movegen))(state)


def cand(state, moves):
    v_moves = tp.oriented_values(params, moves.boards, state.player[..., None], cfg)
    v_masked = jnp.where(moves.valid, v_moves, -1e9)
    topv, topi = tp.topk_small(v_masked, cfg.twoply.top_k_candidates)
    return board_take(moves.boards, topi)


cand_boards = jax.jit(cand)(state, moves)
opp = 1 - state.player
opp_k = opp[..., None]
mg = tp.reply_movegen_cfg(cfg)
c = 1
batch_shape = cand_boards.batch_shape


def scan_body(only, score):
    """wor with one scan type and optional scoring."""

    def wor(boards, opp):
        opp_k = opp[..., None]
        topn = cfg.twoply.top_n_responses
        cap = cfg.twoply.small_double_cap
        bc = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (c, *a.shape)), boards)
        s1_all, b1_all = movegen2.die_tables(boards, opp_k)
        ctx_all = movegen2.die_ctxs(boards, opp_k)
        take_die = lambda t, i: jax.tree.map(lambda a: jnp.take(a, i, axis=0), t)

        def score_moveset(ms, probs_c, cap_active):
            lead = (slice(None),) + (None,) * (ms.valid.ndim - 1)
            rank = jnp.cumsum(ms.valid.astype(jnp.int32), axis=-1)
            valid = ms.valid & ((rank <= cap) | ~cap_active[lead])
            if score == "boards":
                # keep board merges live, skip value+topk
                return jnp.sum(
                    ms.boards.data.astype(jnp.float32).sum(-1) * valid, axis=(0, -1)
                )
            if score == "value":
                v = tp.oriented_values(params, ms.boards, opp_k[..., None], cfg)
                return jnp.sum(jnp.where(valid, v, 0.0), axis=(0, -1))
            if not score:
                return jnp.sum(valid.astype(jnp.float32), axis=(0, -1))
            v = tp.oriented_values(params, ms.boards, opp_k[..., None], cfg)
            v = jnp.where(valid, v, -1e9)
            top, _ = tp.topk_small(v, topn)
            present = top > -5e8
            n = jnp.maximum(jnp.sum(present.astype(jnp.float32), axis=-1), 1.0)
            avg = jnp.sum(jnp.where(present, top, 0.0), axis=-1) / n
            has_reply = jnp.any(valid, axis=-1)
            return jnp.sum(jnp.where(has_reply, avg * probs_c[lead[:-1]], 0.0), axis=0)

        nd_mask = tp.ROLLS[:, 0] != tp.ROLLS[:, 1]

        def chunks(*arrs):
            n = len(arrs[0])
            out = []
            for i, a in enumerate(arrs):
                a = np.asarray(a)
                out.append(jnp.asarray(a.reshape(-1, c, *a.shape[1:])))
            return out

        nd_rolls, nd_probs = chunks(tp.ROLLS[nd_mask], tp.PROBS[nd_mask])
        dd_dies, dd_probs, dd_small = chunks(
            tp.ROLLS[~nd_mask][:, 0], tp.PROBS[~nd_mask], tp.SMALL_DOUBLE[~nd_mask]
        )
        init = jnp.zeros(batch_shape, jnp.float32)

        def per_nd(total, xs):
            rolls_c, probs_c = xs
            dice = jnp.broadcast_to(rolls_c[:, None, None, :], (c, *batch_shape, 2))
            hi = jnp.maximum(rolls_c[:, 0], rolls_c[:, 1]) - 1
            lo = jnp.minimum(rolls_c[:, 0], rolls_c[:, 1]) - 1
            lead = (slice(None),) + (None,) * len(batch_shape)
            d_hi = jnp.broadcast_to((hi + 1)[lead], (c, *batch_shape))
            d_lo = jnp.broadcast_to((lo + 1)[lead], (c, *batch_shape))
            pa = movegen2._run_pass_pre(
                take_die(s1_all, hi), take_die(b1_all, hi), opp_k[None], d_lo,
                ctx=take_die(ctx_all, lo),
            )
            pb = movegen2._run_pass_pre(
                take_die(s1_all, lo), take_die(b1_all, lo), opp_k[None], d_hi,
                ctx=take_die(ctx_all, hi),
            )
            ms = movegen2.enumerate_nondoubles_batched(
                bc, opp_k[None], dice, mg, passes=(pa, pb)
            )
            no_cap = jnp.zeros((c,), bool)
            return total + score_moveset(ms, probs_c, no_cap), None

        def per_dd(total, xs):
            dies_c, probs_c, small_c = xs
            die = jnp.broadcast_to(dies_c[:, None, None], (c, *batch_shape))
            ms = movegen2.enumerate_doubles_batched(
                bc, opp_k[None], die, mg, s1=take_die(s1_all, dies_c - 1)
            )
            return total + score_moveset(ms, probs_c, small_c), None

        total = init
        if only in ("nd", "both"):
            total, _ = jax.lax.scan(per_nd, total, (nd_rolls, nd_probs))
        if only in ("dd", "both"):
            total, _ = jax.lax.scan(per_dd, total, (dd_dies, dd_probs, dd_small))
        return total

    return wor


def run(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    print("result sample:", jax.numpy.ravel(out)[:3])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


table = {
    "nd": ("nd", True),
    "dd": ("dd", True),
    "nd_enum": ("nd", False),
    "dd_enum": ("dd", False),
    "dd_boards": ("dd", "boards"),
    "dd_value": ("dd", "value"),
    "nd_boards": ("nd", "boards"),
    "nd_value": ("nd", "value"),
    "both": ("both", True),
}
only, score = table[PHASE]
f = jax.jit(scan_body(only, score))
print(f"{PHASE}: {run(f, cand_boards, opp):.2f} ms")

if len(sys.argv) > 3 and sys.argv[3] == "trace":
    from mlp_ppo_2ply_multi_tpu.utils.profiling import device_op_times
    times = device_op_times(f, cand_boards, opp)
    tot = sum(times.values())
    print(f"trace device total {tot:.1f}ms")
    for kk, v in list(times.items())[:30]:
        print(f"{v:8.2f}ms  {kk[:140]}")
