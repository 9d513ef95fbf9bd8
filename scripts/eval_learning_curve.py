"""Win-rate-vs-random curves over .pth checkpoints (VERDICT #5).

One NEUTRAL evaluator for both frameworks' checkpoints: the pure-python
oracle env (validated bit-identical to the executable reference, PARITY.md)
with a numpy forward of the 198->h->1 net. The net plays greedy argmax over
afterstate values (encoded with the mover's flag, matching worker.py:115-137
semantics at temperature -> 0); the opponent plays uniformly random.

Usage:
  python scripts/eval_learning_curve.py --games 200 /tmp/refrun_s0 /tmp/ourrun_s0 ...
"""
import argparse
import glob
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from mlp_ppo_2ply_multi_tpu.oracle import rules
from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv


def load_net(path):
    sd = torch.load(path, map_location="cpu", weights_only=True)
    w1 = sd["fc1.weight"].numpy().astype(np.float64)  # [h, 198]
    b1 = sd["fc1.bias"].numpy().astype(np.float64)
    w2 = sd["value_head.weight"].numpy().astype(np.float64)  # [1, h]
    b2 = sd["value_head.bias"].numpy().astype(np.float64)

    def value(feats):  # feats [n, 198]
        h = 1.0 / (1.0 + np.exp(-(feats @ w1.T + b1)))
        return (h @ w2.T + b2)[:, 0]

    return value


def greedy_action(env, value):
    feats = np.asarray(
        [rules.encode(b, env.player) for _, b in env.legal], dtype=np.float64
    )
    return int(np.argmax(value(feats)))


def winrate_vs_random(value, games, seed, max_plies=400):
    rng = random.Random(seed)
    wins = 0
    decided = 0
    for g in range(games):
        net_side = g % 2
        dice = ((rng.randint(1, 6), rng.randint(1, 6)) for _ in iter(int, 1))
        env = OracleEnv(dice)
        env.reset()
        plies = 0
        while not env.game_over and plies < max_plies:
            if env.num_moves == 0:
                env.step(None)
            elif env.player == net_side:
                env.step(greedy_action(env, value))
            else:
                env.step(rng.randrange(env.num_moves))
            plies += 1
        if env.game_over:
            decided += 1
            winner = 0 if env.board[3][0] >= 15 else 1
            if winner == net_side:
                wins += 1
    return wins / max(1, decided), decided


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--games", type=int, default=200)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for d in args.dirs:
        for path in sorted(glob.glob(os.path.join(d, "ep*.pth"))):
            eps = int(os.path.basename(path)[2:-4])
            value = load_net(path)
            wr, dec = winrate_vs_random(value, args.games, args.seed)
            rec = {"run": d, "episodes": eps, "win_rate_vs_random": round(wr, 4),
                   "decided": dec}
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
