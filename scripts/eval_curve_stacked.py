"""Single-execution learning-curve evaluation: ALL checkpoints of all runs
stacked on a leading axis and vmapped through the arena, so the whole curve
costs ONE compiled program, ONE device execution, and ONE host fetch.

Motivation (beyond being the TPU-idiomatic shape): the tunneled axon backend
reliably dies with `INVALID_ARGUMENT: TPU backend error` on the third
execution of a large scan program in one process (PERF.md "tunnel quirk";
reproduced twice by scripts/eval_curve_tpu.py, which crashed on checkpoint 2
of 22 in both attempts on 2026-08-19). Stacking N checkpoints x 2 side
orderings into one vmapped program sidesteps the per-process execution
budget entirely — and evaluates the full table in the time the sequential
script spent on one point.

Evaluator numerics match scripts/eval_curve_tpu.py and apps/evaluate.py:
default Config (full movegen widths, f32 net, greedy argmax vs uniform
random over the legal-move mask), side-alternated halves.

Usage:
  python scripts/eval_curve_stacked.py --games 500 --out /tmp/curves.json \
      /tmp/ourrun_s0_tpu /tmp/ourrun_s1_tpu
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
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="dirs containing ep*.pth")
    ap.add_argument("--games", type=int, default=500)
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
    ms = args.max_steps

    entries = []  # (run, episodes, params)
    for run in args.runs:
        for path in sorted(
            glob.glob(os.path.join(run, "ep*.pth")),
            key=lambda p: int(re.search(r"ep(\d+)", os.path.basename(p)).group(1)),
        ):
            eps = int(re.search(r"ep(\d+)", os.path.basename(path)).group(1))
            entries.append((run, eps, load_torch_checkpoint(path)))
    n = len(entries)
    print(f"{n} checkpoints x {args.games} games ({half} per side order)", flush=True)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[e[2] for e in entries],
    )
    keys = jax.random.split(jax.random.PRNGKey(args.seed), (n, 2))

    @jax.jit
    def sweep(ps, ks):
        w0 = jax.vmap(
            lambda p, k: arena.play_match(
                p, p, greedy, rand, k, cfg=cfg, batch=half, max_steps=ms
            ).winner
        )(ps, ks[:, 0])
        w1 = jax.vmap(
            lambda p, k: arena.play_match(
                p, p, rand, greedy, k, cfg=cfg, batch=half, max_steps=ms
            ).winner
        )(ps, ks[:, 1])
        return w0, w1

    t0 = time.time()
    w0, w1 = sweep(stacked, keys)
    w0, w1 = np.asarray(w0), np.asarray(w1)  # [n, half] each; one fetch
    print(f"swept in {time.time() - t0:.0f}s", flush=True)

    out = {}
    for i, (run, eps, _) in enumerate(entries):
        wins = int((w0[i] == 0).sum() + (w1[i] == 1).sum())
        finished = int((w0[i] >= 0).sum() + (w1[i] >= 0).sum())
        rec = {
            "episodes": eps,
            "win_rate_vs_random": wins / max(finished, 1),
            "finished": finished,
            "games": 2 * half,  # actual games played (odd --games rounds down)
        }
        out.setdefault(run, []).append(rec)
        print(f"{run} ep{eps}: {rec['win_rate_vs_random']:.3f} "
              f"({finished}/{2 * half} finished)", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
