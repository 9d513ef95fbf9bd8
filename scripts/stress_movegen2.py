"""Large-scale differential stress test of the canonical engine vs the
oracle: move-set equality (and order for non-doubles) over thousands of
random positions. Run on CPU:

    MLP_TPU_PLATFORM=cpu python scripts/stress_movegen2.py [n_batches]
"""
import os
import sys

sys.path.insert(0, ".")
if os.environ.get("MLP_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])

import numpy as np
import jax
import jax.numpy as jnp

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.engine import movegen2 as MG2
from mlp_ppo_2ply_multi_tpu.oracle import rules
from tests.helpers import boards_to_jax, jax_board_to_tuple, sample_cases


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n = 128
    # dd_subbatch_div=0: the sampled dice are deliberately doubles-heavy
    # (bias 0.35 >> 1/6), which would overflow the iid-dice sub-batch.
    cfg = MoveGenConfig(algo="canonical", dd_subbatch_div=0)
    jitted = jax.jit(lambda b, p, d: MG2.legal_moves(b, p, d, cfg))
    bad = 0
    max_pre = 0
    for bi in range(n_batches):
        boards, players, dice = sample_cases(50_000 + bi, n, doubles_bias=0.35)
        jb = boards_to_jax(boards)
        ms = jax.tree.map(
            np.asarray,
            jitted(jb, jnp.asarray(players, jnp.int32), jnp.asarray(dice, jnp.int32)),
        )
        for g in range(n):
            want_l = [b for _, b in rules.full_moves(boards[g], players[g], list(dice[g]))]
            ks = np.where(ms.valid[g])[0]
            got = [jax_board_to_tuple(ms.boards, g, int(k)) for k in ks]
            is_dbl = dice[g][0] == dice[g][1]
            ok = (set(got) == set(want_l) and len(got) == len(want_l)) if is_dbl else (got == want_l)
            if not ok:
                bad += 1
                print("MISMATCH", bi, g, dice[g], players[g], boards[g], flush=True)
                print("  want", len(want_l), "got", len(got))
        print(f"batch {bi}: ok ({n} positions)", flush=True)
    print(f"done: {n_batches * n} positions, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
