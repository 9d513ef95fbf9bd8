"""Empirically audit move-enumeration width requirements over random play:
pre-dedup non-doubles candidate counts (bounds nd_dedup_k) and doubles
level frontier sizes (bounds w2/w3/w4). Pure oracle, CPU."""
import random
import sys

sys.path.insert(0, ".")
from mlp_ppo_2ply_multi_tpu.oracle import rules
from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv

def pre_dedup_count(board, player, roll):
    d0, d1 = roll
    if d0 == d1:
        return None
    hi, lo = max(d0, d1), min(d0, d1)
    pa, sa = rules._pass_pairs(board, player, hi, lo)
    pb, sb = rules._pass_pairs(board, player, lo, hi)
    return len(pa) + len(sa) + len(pb) + len(sb)

def doubles_levels(board, player, die):
    sizes = [0, 0, 0, 0]
    def rec(b, k, last_rank):
        if k == 4:
            return
        for mv in rules.one_die_moves(b, player, die):
            s, e, _ = mv
            adj = s if player == 0 else (23 - s) if s < 24 else -1
            rank = -1 if s == 24 else 2 * adj + (1 if e == 25 else 0)
            if rank < last_rank:
                continue
            sizes[k] += 1
            rec(rules.apply_submove(b, player, mv), k + 1, rank)
    rec(board, 0, -10)
    return sizes

def main():
    n_games = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rng = random.Random(1234)
    max_nd, max_lv = 0, [0, 0, 0, 0]
    arg_nd = None
    steps = 0
    for g in range(n_games):
        dice = iter(lambda: (rng.randint(1, 6), rng.randint(1, 6)), None)
        env = OracleEnv(dice)
        env.reset()
        for _ in range(300):
            if env.game_over:
                break
            c = pre_dedup_count(env.board, env.player, env.roll)
            if c is not None and c > max_nd:
                max_nd, arg_nd = c, (env.roll, env.player)
            if env.roll[0] == env.roll[1]:
                lv = doubles_levels(env.board, env.player, env.roll[0])
                max_lv = [max(a, b) for a, b in zip(max_lv, lv)]
            a = None if env.num_moves == 0 else rng.randrange(env.num_moves)
            env.step(a)
            steps += 1
    print(f"games={n_games} steps={steps}")
    print(f"max pre-dedup nondoubles candidates: {max_nd} (cfg nd_dedup_k default 576)")
    print(f"max canonical doubles level sizes (L1..L4): {max_lv} (cfg w=16/128/288/512)")

if __name__ == "__main__":
    main()
