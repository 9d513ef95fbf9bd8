"""Direct tuned-vs-exact 2-ply arena via step-parity alternation.

The generic arena (eval/arena.play_match) evaluates BOTH sides' policies at
every scan step; with two different 2-ply scorers that compiles both 21-roll
reply expansions into each of 400 scan steps, and the tunneled TPU worker
reliably crashes on the resulting program (5/5 attempts on 2026-08-20 at
n=4096 and n=1024: "UNAVAILABLE: TPU worker process crashed").

Backgammon alternates movers strictly — a pass still advances the turn
(backgammon_env.py:130-140) — so if every game in a batch starts with the
SAME player, every scan step has a single on-roll side batch-wide. This
arena forces the starting player per half (side-balanced: half A-starts,
half B-starts), scans a 2-step body whose sub-steps each contain exactly
ONE scorer, and plays each half as its own process-safe program — the same
compiled size class as the round-4 quality-guard arena that ran fine.

Statistical note vs the opener rule: the reference decides the starter by
the opening roll (higher die starts, backgammon_env.py:101-109); forcing
the starter here only reweights WHO moves first, which the side-balanced
halves cancel in expectation.

Usage: python scripts/arena_twoply_parity.py [half_batch] [max_steps] [seed]
Prints one JSON line per half and a combined summary.
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
from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves
from mlp_ppo_2ply_multi_tpu.env import vec_env
from mlp_ppo_2ply_multi_tpu.eval import arena
from mlp_ppo_2ply_multi_tpu.model.value_net import load_torch_checkpoint

HALF = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
MAX_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0
START_P = int(sys.argv[4]) if len(sys.argv) > 4 else None  # run one half only

cfg_tuned = Config(twoply=TwoPlyConfig.tuned(), train=TrainConfig())
cfg_exact = Config(twoply=TwoPlyConfig(enabled=True), train=TrainConfig())
if os.environ.get("MLP_ARENA_SMALL"):
    # CPU smoke: tiny widths + untrained params, shape/flow check only
    import dataclasses

    from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
    from mlp_ppo_2ply_multi_tpu.model import value_net

    _small = MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64)
    cfg_tuned = dataclasses.replace(cfg_tuned, movegen=_small)
    cfg_exact = dataclasses.replace(cfg_exact, movegen=_small)
    params = value_net.init_params(jax.random.PRNGKey(0), cfg_tuned.model)
else:
    params = load_torch_checkpoint("checkpoints/side0_20480000.pth")

pol_tuned = arena.twoply_greedy_policy(cfg_tuned)
pol_exact = arena.twoply_greedy_policy(cfg_exact)
cfg = cfg_tuned  # movegen/env identical in both configs


def _mk_step(policy):
    """One lockstep env step under ONE policy — the bench_twoply program
    size class (a single 2-ply scorer), which the tunnel executes reliably
    (scripts/bench_twoply.py runs it 24x per process). The scan-form arena
    with both scorers in one program crashes the TPU worker even when the
    sub-steps alternate (7/7 attempts on 2026-08-20), so the alternation
    happens HERE, on the host, between two separately compiled programs."""

    @jax.jit
    def step(st, win, k):
        k, k_act, k_roll = jax.random.split(k, 3)
        moves = legal_moves(st.board, st.player, st.dice, cfg.movegen)
        action = policy(params, st, moves, k_act)
        next_dice = vec_env.roll_dice(k_roll, st.player.shape)
        res = vec_env.step(st, moves, action, next_dice, cfg.env)
        win = jnp.where(res.done & (win < 0), st.player, win)
        return res.state, win, k

    return step


def play_half(key, start_player: int, step_tuned, step_exact):
    """All games start with ``start_player``; tuned ALWAYS plays side 0.
    Mover parity is batch-uniform, so each dispatch needs one policy."""
    k_reset, k_loop = jax.random.split(key)
    state = vec_env.reset(k_reset, HALF)
    state = state._replace(
        player=jnp.full((HALF,), start_player, jnp.int32)
    )
    win = jnp.full((HALF,), -1, jnp.int32)
    k = k_loop
    for t in range(MAX_STEPS):
        mover = (start_player + t) % 2
        step = step_tuned if mover == 0 else step_exact
        state, win, k = step(state, win, k)
    return arena.MatchResult(
        winner=win, win_type=state.win_type, steps=state.step_count
    )


def main():
    halves = [START_P] if START_P is not None else [0, 1]
    tuned_w = exact_w = fin = 0
    step_tuned = _mk_step(pol_tuned)
    step_exact = _mk_step(pol_exact)
    for p0 in halves:
        res = play_half(
            jax.random.PRNGKey(SEED + 101 * p0), p0, step_tuned, step_exact
        )
        w = np.asarray(res.winner)
        f = int((w >= 0).sum())
        t = int((w == 0).sum())  # tuned always plays side 0
        e = int((w == 1).sum())
        fin += f
        tuned_w += t
        exact_w += e
        print(json.dumps({
            "half_start_player": p0, "games": HALF, "finished": f,
            "tuned_wins": t, "exact_wins": e,
        }), flush=True)
    print(json.dumps({
        "total_finished": fin,
        "tuned_win_rate": tuned_w / max(fin, 1),
        "exact_win_rate": exact_w / max(fin, 1),
        "sigma": (0.25 / max(fin, 1)) ** 0.5,
    }), flush=True)


if __name__ == "__main__":
    main()
