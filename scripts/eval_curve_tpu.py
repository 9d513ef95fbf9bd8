"""Learning-curve evaluation on the batched engine (VERDICT round-2 item 2's
games/point bottleneck): win rate vs RANDOM for every ep*.pth checkpoint in
one or more run directories, side-alternated, compiled once and swept.

Neutrality: both frameworks' checkpoints are the same 198->128->1 .pth
format, and the engine+env evaluated here are bit-identical to the executable
reference (PARITY.md: 20k positions order-exact, 64 games bit-identical), so
applying this evaluator to BOTH the reference run's and our run's
checkpoints gives a like-for-like curve at 5x the games of the pure-python
evaluator (scripts/eval_learning_curve.py) in ~1000x less wall time.

Usage:
  python scripts/eval_curve_tpu.py --games 1000 --out /tmp/curves.json \
      /tmp/refrun_s0 /tmp/ourrun_s0 ...
"""
import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MLP_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="dirs containing ep*.pth")
    ap.add_argument("--games", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-steps", type=int, default=400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mlp_ppo_2ply_multi_tpu.core.config import Config
    from mlp_ppo_2ply_multi_tpu.eval import arena
    from mlp_ppo_2ply_multi_tpu.model.value_net import load_torch_checkpoint

    cfg = Config()
    greedy = arena.greedy_policy(cfg)
    rand = arena.random_policy(cfg)
    half = args.games // 2

    def winrate(params, seed):
        # net as player 0 for half the games, as player 1 for the other half
        r0 = arena.play_match(
            params, params, greedy, rand, jax.random.PRNGKey(seed), cfg,
            batch=half, max_steps=args.max_steps,
        )
        r1 = arena.play_match(
            params, params, rand, greedy, jax.random.PRNGKey(seed + 1), cfg,
            batch=half, max_steps=args.max_steps,
        )
        w0, w1 = np.asarray(r0.winner), np.asarray(r1.winner)
        wins = int((w0 == 0).sum() + (w1 == 1).sum())
        finished = int((w0 >= 0).sum() + (w1 >= 0).sum())
        return wins / max(finished, 1), finished

    out = {}
    for run in args.runs:
        ckpts = sorted(
            glob.glob(os.path.join(run, "ep*.pth")),
            key=lambda p: int(re.search(r"ep(\d+)", os.path.basename(p)).group(1)),
        )
        curve = []
        for i, path in enumerate(ckpts):
            t0 = time.time()
            params = load_torch_checkpoint(path)
            eps = int(re.search(r"ep(\d+)", os.path.basename(path)).group(1))
            wr, fin = winrate(params, args.seed + 7919 * (i + 1))
            curve.append({"episodes": eps, "win_rate_vs_random": wr,
                          "finished": fin, "games": 2 * half})
            print(f"{run} ep{eps}: {wr:.3f} ({fin}/{2 * half} finished, "
                  f"{time.time()-t0:.0f}s)", flush=True)
        out[run] = curve
        if args.out:  # incremental: a crash on a later run keeps earlier curves
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)
            print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
