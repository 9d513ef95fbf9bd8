"""Large-N adversarial sweep over constructed no-4-move doubles positions
(VERDICT round-2 item 8): converts PARITY.md divergence 3's "never observed"
into an exhaustive count. Compares the oracle's forced-shorter doubles
enumeration (count + order + afterstates) and the canonical JAX engine's
afterstate sets against the EXECUTABLE reference.

Usage: python scripts/adversarial_doubles_sweep.py [n_decisions] (default 10000)
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# pure-CPU workload (oracle + reference + small canonical batches); never
# touch the tunnel backend unless explicitly overridden
jax.config.update("jax_platforms", os.environ.get("MLP_TPU_PLATFORM", "cpu"))

import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig
from mlp_ppo_2ply_multi_tpu.oracle import rules
from tests import refbridge
from tests.helpers import boards_to_jax, collect_no4move_doubles, jax_board_to_tuple


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    ref = refbridge.import_reference()
    t0 = time.time()
    cases = collect_no4move_doubles(seed=31337, n=n)
    print(f"collected {len(cases)} no-4-move doubles decisions "
          f"({time.time()-t0:.0f}s)", flush=True)

    hist = {1: 0, 2: 0, 3: 0}
    max_presented = 0
    for i, (board, player, die) in enumerate(cases):
        rb = refbridge.to_reference_board(ref, board)
        fms = ref.get_all_possible_moves(ref.Player(player), rb, [die, die])
        want = [
            (refbridge.fullmove_to_tuples(fm),
             refbridge.reference_afterstate(ref, rb, ref.Player(player), fm))
            for fm in fms
        ]
        got = rules.full_moves(board, player, [die, die])
        assert len(got) == len(want), (board, player, die, len(got), len(want))
        for k, ((gmv, gb), (wmv, wb)) in enumerate(zip(got, want)):
            assert gmv == wmv and gb == wb, (board, player, die, k)
        hist[max(len(mv[0]) for mv in got)] += 1
        max_presented = max(max_presented, len(got))
        if (i + 1) % 1000 == 0:
            print(f"  {i+1}/{len(cases)} oracle-vs-reference exact", flush=True)

    # canonical JAX engine sets, batched in chunks
    import jax
    import jax.numpy as jnp

    cfg = MoveGenConfig(algo="canonical", dd_subbatch_div=0)
    fn = jax.jit(lambda b, p, d: MG2_legal(b, p, d, cfg))
    chunk = 512
    for lo in range(0, len(cases), chunk):
        cs = cases[lo:lo + chunk]
        ms = jax.tree.map(
            np.asarray,
            fn(
                boards_to_jax([c[0] for c in cs]),
                jnp.asarray([c[1] for c in cs], jnp.int32),
                jnp.asarray([(c[2], c[2]) for c in cs], jnp.int32),
            ),
        )
        for g, (board, player, die) in enumerate(cs):
            rb = refbridge.to_reference_board(ref, board)
            fms = ref.get_all_possible_moves(ref.Player(player), rb, [die, die])
            want = {
                refbridge.reference_afterstate(ref, rb, ref.Player(player), fm)
                for fm in fms
            }
            ks = np.where(np.asarray(ms.valid[g]))[0]
            got = {jax_board_to_tuple(ms.boards, g, int(k)) for k in ks}
            assert got == want, (board, player, die)
        print(f"  {min(lo+chunk, len(cases))}/{len(cases)} canonical sets", flush=True)

    print(f"PASS: {len(cases)} constructed no-4-move doubles decisions, "
          f"max-seq-len histogram {hist}, max presented {max_presented}, "
          f"oracle order-exact + canonical sets identical to the executable "
          f"reference ({time.time()-t0:.0f}s)")


def MG2_legal(b, p, d, cfg):
    from mlp_ppo_2ply_multi_tpu.engine import movegen2

    return movegen2.legal_moves(b, p, d, cfg)


if __name__ == "__main__":
    main()
