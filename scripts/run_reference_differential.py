"""Full-scale differential run against the executable reference (VERDICT #2).

Runs the same comparisons as tests/test_reference_differential.py at >=10k
randomized positions plus playout-harvested positions plus full env
transcript games, and prints a summary line for PARITY.md.

Usage: python scripts/run_reference_differential.py [n_random] [n_playout] [games]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MLP_TPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

from tests import test_reference_differential as T  # noqa: E402


def main():
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n_playout = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    games = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    assert T.REF is not None, "/root/reference not importable"
    t0 = time.time()
    n1 = T.run_movegen_parity(T._cases(seed=9101, n=n_random))
    print(f"[{time.time()-t0:.0f}s] movegen parity, random positions: {n1}/{n1} OK")

    cases = T._playout_cases(seed=9202, games=10000, cap=n_playout)
    n2 = T.run_movegen_parity(cases)
    print(f"[{time.time()-t0:.0f}s] movegen parity, playout positions: {n2}/{n2} OK")

    g, s = T.run_env_transcript_parity(n_games=games, seed=9303)
    print(
        f"[{time.time()-t0:.0f}s] env transcript parity: {g} games, {s} steps, "
        "all rewards/boards/features/num_moves bit-identical (f32)"
    )
    print(
        f"SUMMARY: {n1 + n2} positions (move sets+order+afterstates) and "
        f"{g} full games ({s} env steps) match the executable reference exactly"
    )


if __name__ == "__main__":
    main()
