"""Per-roll reply-width distributions for sizing the 2-ply scorer's
enumeration tiers: for positions drawn from randomized self-play, measure —
for each of the 21 distinct rolls — the non-doubles PRE-DEDUP candidate
count (bounds the scorer's select/dedup width) and the presented move count
(bounds the eval width). Pure oracle, CPU.

Usage: python scripts/probe_reply_widths.py [n_games] [out.json]
"""
import json
import random
import sys

sys.path.insert(0, ".")
from mlp_ppo_2ply_multi_tpu.oracle import rules
from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv
from scripts.audit_widths import pre_dedup_count


def main():
    n_games = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/reply_widths.json"
    rng = random.Random(77)
    rolls = [(a, b) for a in range(1, 7) for b in range(a, 7)]
    stats = {str(r): {"pre": [], "presented": []} for r in rolls}

    for g in range(n_games):
        dice = iter(lambda: (rng.randint(1, 6), rng.randint(1, 6)), None)
        env = OracleEnv(dice)
        env.reset()
        for step in range(300):
            if env.game_over:
                break
            moves = env.legal
            if not moves:
                env.step(None)
                continue
            # the scorer evaluates replies from the OPPONENT's perspective on
            # candidate afterstates; every position reached in play is such an
            # afterstate for the previous mover, so sampling (board, player)
            # pairs from play is the right distribution
            if step % 3 == 0:  # probe every 3rd decision to bound cost
                for r in rolls:
                    pre = pre_dedup_count(env.board, env.player, r)
                    n_pres = len(rules.full_moves(env.board, env.player, list(r)))
                    s = stats[str(r)]
                    if pre is not None:
                        s["pre"].append(pre)
                    s["presented"].append(n_pres)
            env.step(rng.randrange(len(moves)))

    def q(xs, p):
        if not xs:
            return 0
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(p * len(xs)))]

    summary = {}
    for r in rolls:
        s = stats[str(r)]
        summary[str(r)] = {
            "n": len(s["presented"]),
            "pre_p50": q(s["pre"], 0.5), "pre_p95": q(s["pre"], 0.95),
            "pre_p99": q(s["pre"], 0.99), "pre_max": max(s["pre"] or [0]),
            "pres_p50": q(s["presented"], 0.5),
            "pres_p95": q(s["presented"], 0.95),
            "pres_p99": q(s["presented"], 0.99),
            "pres_max": max(s["presented"] or [0]),
        }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    for r in rolls:
        print(r, summary[str(r)])


if __name__ == "__main__":
    main()
