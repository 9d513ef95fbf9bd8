"""4096-game fixed-seed trajectory-parity artifact (VERDICT #3 / BASELINE
config 2).

Drives the SAME 4096 fixed-seed games through (a) the batched JAX env with
the sorted engine (exact reference enumeration order) and (b) the executable
reference env (/root/reference backgammon_env.py:92-221, dice monkeypatched),
with a shared deterministic policy: action[t, g] = raw[t, g] % min(count, 500)
where raw is a fixed pseudo-random int32 table. Index-level identity of the
resulting trajectories requires identical legal-move COUNTS and identical
enumeration ORDER at every decision of every game.

Each side reduces every game to one 32-bit rolling FNV-1a hash over the full
step stream (side to move, roll, count, action, reward, done, all 52 board
cells after the step) plus the final win type and step count — any one-step
divergence anywhere changes the hash. `compare` checks hashes game-for-game
and writes artifacts/trajectory_parity.json.

Usage:
  python scripts/trajectory_parity.py ref  [--games 4096] [--out F]
  python scripts/trajectory_parity.py jax  [--games 4096] [--out F] [--chunk 2048]
  python scripts/trajectory_parity.py compare REF_F JAX_F

BOTH sides must run with the SAME --games: fixed_streams(games) sizes its
rng draws by the game count, so transcripts captured at different scopes see
entirely different dice/action streams and share zero games. (--chunk only
tiles the jax side's execution and never changes the streams.)

The `ref` side is single-core Python+torch (hours at 4096 games; run it
nice'd in the background). The `jax` side is minutes on a TPU chip.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MASTER_SEED = 20260817
T_MAX = 300  # reference MAX_TIMESTEPS (configuration.py:4, worker.py:101)
Q7_CAP = 500  # reference max_legal_moves (backgammon_env.py:35)
FNV_OFFSET = np.uint32(2166136261)
FNV_PRIME = np.uint32(16777619)
PASS_MARK = 0xFFFF


def fixed_streams(games: int):
    """Opening rolls, per-step dice, and the raw action table — all derived
    from MASTER_SEED so both sides see identical inputs."""
    rng = np.random.default_rng(MASTER_SEED)
    nd_pairs = np.asarray(
        [(i, j) for i in range(1, 7) for j in range(1, 7) if i != j], np.int32
    )
    opener = nd_pairs[rng.integers(0, 30, size=games)]
    first = nd_pairs[rng.integers(0, 30, size=games)]
    dice = rng.integers(1, 7, size=(T_MAX, games, 2)).astype(np.int32)
    raw = rng.integers(0, 2**31 - 1, size=(T_MAX, games)).astype(np.int32)
    return opener, first, dice, raw


def fnv_py(h: int, v: int) -> int:
    return ((h ^ (v & 0xFFFFFFFF)) * 16777619) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Reference side
# ---------------------------------------------------------------------------


def run_ref(games: int, out: str) -> None:
    from tests import refbridge

    REF = refbridge.import_reference()
    opener, first, dice, raw = fixed_streams(games)
    t0 = time.time()
    with open(out, "w") as f:
        for g in range(games):
            stream = [tuple(opener[g]), tuple(first[g])] + [
                tuple(d) for d in dice[:, g]
            ]
            env = REF.BackgammonEnv()
            it = iter(stream)
            env.roll_dice = lambda it=it, env=env: env.__setattr__(
                "roll_result", list(next(it))
            )
            env.reset()
            h = 2166136261
            done = False
            steps = 0
            win_type = 0
            while not done and steps < T_MAX:
                player = int(env.current_player)
                d0, d1 = int(env.roll_result[0]), int(env.roll_result[1])
                count = min(int(env.action_mask.sum().item()), Q7_CAP)
                action = int(raw[steps, g]) % count if count else 0
                _, r, done_, info = env.step(action)
                done = bool(done_)
                for v in (
                    player,
                    d0,
                    d1,
                    count,
                    action if count else PASS_MARK,
                    int(round(float(r) * 100)),
                    int(done),
                ):
                    h = fnv_py(h, v)
                board = refbridge.from_reference_board(env.board)
                for cell in (
                    list(board[0]) + list(board[1]) + list(board[2]) + list(board[3])
                ):
                    h = fnv_py(h, cell & 0xFF)
                if done:
                    win_type = {"regular": 1, "gammon": 2, "backgammon": 3}[
                        info["win_type"]
                    ]
                steps += 1
            h = fnv_py(h, win_type)
            h = fnv_py(h, steps)
            f.write(json.dumps({"g": g, "hash": h, "steps": steps, "wt": win_type}) + "\n")
            if (g + 1) % 64 == 0:
                f.flush()
                el = time.time() - t0
                print(f"[ref] {g + 1}/{games} games, {el:.0f}s", flush=True)
    print(f"[ref] DONE {games} games in {time.time() - t0:.0f}s -> {out}")


# ---------------------------------------------------------------------------
# JAX side
# ---------------------------------------------------------------------------


def run_jax(games: int, out: str, chunk: int) -> None:
    import jax

    if os.environ.get("MLP_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])
    import jax.numpy as jnp

    from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig
    from mlp_ppo_2ply_multi_tpu.engine.movegen import legal_moves
    from mlp_ppo_2ply_multi_tpu.env import vec_env

    cfg = Config(movegen=MoveGenConfig(algo="sorted"))

    def fnv_mix(h, v):
        return (h ^ v.astype(jnp.uint32)) * FNV_PRIME

    @jax.jit
    def jit_step(state, h, raw_t, next_dice):
        live = ~state.game_over & (state.step_count < cfg.env.max_timesteps)
        moves = legal_moves(state.board, state.player, state.dice, cfg.movegen)
        count = jnp.minimum(moves.count, Q7_CAP)
        action = jnp.where(count > 0, raw_t % jnp.maximum(count, 1), 0)
        p, d = state.player, state.dice
        res = vec_env.step(state, moves, action, next_dice, cfg.env)
        centi = jnp.round(res.reward * 100).astype(jnp.int32)
        nh = h
        for v in (
            p,
            d[:, 0],
            d[:, 1],
            count,
            jnp.where(count > 0, action, PASS_MARK),
            centi,
            res.done.astype(jnp.int32),
        ):
            nh = fnv_mix(nh, v)
        cells = res.state.board.data.astype(jnp.uint8)
        for c in range(cells.shape[-1]):
            nh = fnv_mix(nh, cells[:, c])
        return res.state, jnp.where(live, nh, h)

    opener, first, dice, raw = fixed_streams(games)
    t0 = time.time()
    with open(out, "w") as f:
        for base in range(0, games, chunk):
            n = min(chunk, games - base)
            sl = slice(base, base + n)
            state = vec_env.reset_from_rolls(
                jnp.asarray(opener[sl]), jnp.asarray(first[sl])
            )
            h = jnp.full((n,), FNV_OFFSET, jnp.uint32)
            for t in range(T_MAX):
                state, h = jit_step(
                    state, h, jnp.asarray(raw[t, sl]), jnp.asarray(dice[t, sl])
                )
            h = fnv_mix(h, state.win_type.astype(jnp.int32))
            h = fnv_mix(h, state.step_count)
            hs = np.asarray(h)
            wt = np.asarray(state.win_type)
            sc = np.asarray(state.step_count)
            for i in range(n):
                f.write(
                    json.dumps(
                        {
                            "g": base + i,
                            "hash": int(hs[i]),
                            "steps": int(sc[i]),
                            "wt": int(wt[i]),
                        }
                    )
                    + "\n"
                )
            print(f"[jax] {base + n}/{games} games, {time.time() - t0:.0f}s", flush=True)
    print(f"[jax] DONE {games} games in {time.time() - t0:.0f}s -> {out}")


# ---------------------------------------------------------------------------
# Compare
# ---------------------------------------------------------------------------


def compare(ref_path: str, jax_path: str) -> None:
    load = lambda p: {r["g"]: r for r in map(json.loads, open(p))}
    ref, jx = load(ref_path), load(jax_path)
    games = sorted(set(ref) & set(jx))
    if not games:
        raise SystemExit(
            f"no overlapping games: {ref_path} has {len(ref)}, "
            f"{jax_path} has {len(jx)} — refusing to write a 0-game artifact"
        )
    match = [g for g in games if ref[g]["hash"] == jx[g]["hash"]]
    mismatch = [g for g in games if ref[g]["hash"] != jx[g]["hash"]]
    digest = hashlib.sha256(
        b"".join(jx[g]["hash"].to_bytes(4, "little") for g in games)
    ).hexdigest()
    result = {
        "games_compared": len(games),
        "bit_identical": len(match),
        "mismatched_games": mismatch[:32],
        "transcript_sha256": digest,
        "total_steps": sum(jx[g]["steps"] for g in games),
        "seed": MASTER_SEED,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/trajectory_parity.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if mismatch:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["ref", "jax", "compare"])
    ap.add_argument("paths", nargs="*")
    ap.add_argument("--games", type=int, default=4096)
    ap.add_argument("--out", default=None)
    ap.add_argument("--chunk", type=int, default=2048)
    args = ap.parse_args()
    if args.mode == "ref":
        run_ref(args.games, args.out or "/tmp/traj_ref.jsonl")
    elif args.mode == "jax":
        run_jax(args.games, args.out or "/tmp/traj_jax.jsonl", args.chunk)
    else:
        compare(*args.paths)


if __name__ == "__main__":
    main()
