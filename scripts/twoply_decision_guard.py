"""Direct tuned-vs-exact 2-ply quality guard at the DECISION level.

A lockstep arena between two DIFFERENT 2-ply scorers cannot run on the
round-5 toolchain: a program containing both scorers crashes the TPU worker
(7/7 attempts, scan-form and parity-alternated), and host-alternating two
single-scorer programs trips the repeated-call regression (the A-B-A third
call loses hoisted-constant buffers on CPU and dies INVALID_ARGUMENT on the
tunnel — scripts/probe_train_gap.py documents the same bug class). Both
failure modes are environment limits, not model limits.

This guard is the toolchain-shaped equivalent — and statistically TIGHTER
than a 4096-game arena (sigma ~1.6pp): the same decision positions go
through both scorers, and we report
  * agreement rate of the greedy 2-ply action,
  * where they disagree, the REGRET of the tuned choice measured by the
    EXACT scorer (exact_score[exact_pick] - exact_score[tuned_pick] on its
    alpha*V - beta*E[opp] scale),
so every tuned deviation is quantified, not just netted out over games.

Three phases, ONE process each (one compiled program, 1-2 executions —
within the tunnel budget):
  collect — production-config rollout, dump decision positions (count >= k)
  tuned   — tuned-scorer top-k scores for each position -> npz
  exact   — exact-scorer scores, join, report JSON

Usage:
  python scripts/twoply_decision_guard.py collect [n_positions]
  python scripts/twoply_decision_guard.py tuned
  python scripts/twoply_decision_guard.py exact
Artifacts in /tmp/twoply_guard_*.npz; final JSON to stdout.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MLP_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config, TrainConfig, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.engine import board as B
from mlp_ppo_2ply_multi_tpu.engine.movegen import board_take, legal_moves
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.model.value_net import load_torch_checkpoint

MODE = sys.argv[1] if len(sys.argv) > 1 else "collect"
N_POS = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
DIR = "/tmp"

cfg_tuned = Config(twoply=TwoPlyConfig.tuned(), train=TrainConfig())
cfg_exact = Config(twoply=TwoPlyConfig(enabled=True), train=TrainConfig())
SMALL = bool(os.environ.get("MLP_ARENA_SMALL"))
if SMALL:
    import dataclasses

    from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
    from mlp_ppo_2ply_multi_tpu.model import value_net

    _small = MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64)
    cfg_tuned = dataclasses.replace(cfg_tuned, movegen=_small)
    cfg_exact = dataclasses.replace(cfg_exact, movegen=_small)
    params = value_net.init_params(jax.random.PRNGKey(0), cfg_tuned.model)
else:
    params = load_torch_checkpoint("checkpoints/side0_20480000.pth")
K = cfg_tuned.twoply.top_k_candidates


def collect():
    """Play a 2-ply-relevant stream of positions with the exact-config
    movegen + 1-ply greedy self-play (the position DISTRIBUTION matters,
    not who generated it) and keep decisions where the 2-ply path engages
    (count >= top_k)."""
    from mlp_ppo_2ply_multi_tpu.eval import arena

    cfg = cfg_exact
    pol = arena.greedy_policy(cfg)
    batch = 512 if not SMALL else 16
    steps = 96 if not SMALL else 8

    @jax.jit
    def roll(key):
        k_reset, k_loop = jax.random.split(key)
        state = vec_env.reset(k_reset, batch)

        def body(carry, _):
            st, k = carry
            k, k_act, k_roll = jax.random.split(k, 3)
            moves = legal_moves(st.board, st.player, st.dice, cfg.movegen)
            rec = (
                B.pack_board(st.board),
                st.player,
                st.dice,
                moves.count,
                ~st.game_over,
            )
            action = pol(params, st, moves, k_act)
            next_dice = vec_env.roll_dice(k_roll, st.player.shape)
            res = vec_env.step(st, moves, action, next_dice, cfg.env)
            return (res.state, k), rec

        (_, _), recs = jax.lax.scan(body, (state, k_loop), None, length=steps)
        return recs

    packed, player, dice, count, live = jax.device_get(
        roll(jax.random.PRNGKey(17))
    )
    packed = packed.reshape(-1, packed.shape[-1])
    player = player.reshape(-1)
    dice = dice.reshape(-1, 2)
    count = count.reshape(-1)
    live = live.reshape(-1)
    keep = live & (count >= K)
    idx = np.nonzero(keep)[0]
    rng = np.random.default_rng(3)
    idx = rng.permutation(idx)[:N_POS]
    if len(idx) < N_POS:
        print(f"warning: only {len(idx)} qualifying positions", file=sys.stderr)
    np.savez(
        f"{DIR}/twoply_guard_pos.npz",
        packed=packed[idx], player=player[idx], dice=dice[idx],
    )
    print(json.dumps({"collected": int(len(idx)), "pool": int(keep.sum())}))


def _scores(cfg):
    """Top-k candidate slots (shared: both configs pick the same 1-ply
    top-k from the same full-width MoveSet) + this config's 2-ply scores."""
    from mlp_ppo_2ply_multi_tpu.twoply import expectimax

    d = np.load(f"{DIR}/twoply_guard_pos.npz")
    n = d["packed"].shape[0]
    board = B.unpack_board(jnp.asarray(d["packed"]))
    player = jnp.asarray(d["player"])
    dice = jnp.asarray(d["dice"])

    @jax.jit
    def run(board, player, dice):
        moves = legal_moves(board, player, dice, cfg.movegen)
        v = expectimax.oriented_values(
            params, moves.boards, player[..., None], cfg
        )
        v_masked = jnp.where(moves.valid, v, -1e9)
        topv, topi = expectimax.topk_small(v_masked, K)
        top_valid = jnp.take_along_axis(moves.valid, topi, axis=-1)
        w_o = expectimax.weighted_opponent_response(
            params, board_take(moves.boards, topi), 1 - player, cfg
        )
        scores = jnp.where(
            top_valid,
            cfg.twoply.alpha * topv - cfg.twoply.beta * w_o,
            -1e9,
        )
        return topi, scores

    topi, scores = jax.device_get(run(board, player, dice))
    return topi, scores, n


def main():
    if MODE == "collect":
        collect()
    elif MODE == "tuned":
        topi, scores, n = _scores(cfg_tuned)
        np.savez(f"{DIR}/twoply_guard_tuned.npz", topi=topi, scores=scores)
        print(json.dumps({"scored": n, "scorer": "tuned"}))
    elif MODE == "exact":
        topi, scores, n = _scores(cfg_exact)
        t = np.load(f"{DIR}/twoply_guard_tuned.npz")
        assert (t["topi"] == topi).all(), "candidate sets diverged"
        pick_e = scores.argmax(-1)
        pick_t = t["scores"].argmax(-1)
        agree = pick_e == pick_t
        # regret of tuned's choice on the EXACT score scale
        se = scores[np.arange(n), pick_e]
        st_ = scores[np.arange(n), pick_t]
        regret = se - st_
        # prove the scorers differ (guard against comparing one config
        # with itself): distribution of |score_tuned - score_exact| over
        # presented candidates
        pres = scores > -1e8
        delta = np.abs(t["scores"] - scores)[pres]
        out = {
            "positions": int(n),
            "score_delta_frac_nonzero": float((delta > 0).mean()),
            "score_delta_mean": float(delta.mean()),
            "score_delta_max": float(delta.max()),
            "agreement": float(agree.mean()),
            "disagreements": int((~agree).sum()),
            "mean_regret": float(regret.mean()),
            "mean_regret_when_disagree": float(
                regret[~agree].mean() if (~agree).any() else 0.0
            ),
            "max_regret": float(regret.max()),
            "score_scale_note": "alpha*V - beta*E[opp]; game equity in [0,1] V units",
        }
        print(json.dumps(out))
        with open("artifacts/twoply_decision_guard.json", "w") as f:
            json.dump(out, f, indent=1)
    else:
        raise SystemExit(f"unknown mode {MODE}")


if __name__ == "__main__":
    main()
