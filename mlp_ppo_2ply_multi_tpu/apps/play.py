"""Interactive human-vs-AI play CLI.

Same capability as the reference's play app
(/root/reference/src/play/play_versus_ai.py): load a checkpoint, render the
board each turn, let the human pick from the enumerated legal moves, and have
the agent play argmax over afterstate values (:165-195) — optionally with the
value-annotated move list shown (the reference's debug variant :65-123) and
optional 2-ply expectimax scoring. The game loop runs on the pure-python
oracle engine (one interactive game needs no jit); with ``--engine jax`` the
agent's move enumeration + evaluation run through the real batched JAX
engine at batch 1 instead.

Usage:
    python -m mlp_ppo_2ply_multi_tpu.apps.play --checkpoint model.pth \
        [--human-player 0|1] [--show-values] [--two-ply] [--seed N]
"""
from __future__ import annotations

import argparse
import os
import random
import sys
from typing import Optional

# Honor the backend override BEFORE anything can initialize jax — the CLI
# must stay interactive even when the TPU tunnel is unreachable
# (MLP_TPU_PLATFORM=cpu; the JAX_PLATFORMS env var is preempted here).
if os.environ.get("MLP_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])

import numpy as np

from mlp_ppo_2ply_multi_tpu.apps.render import render, describe_move
from mlp_ppo_2ply_multi_tpu.model import value_net
from mlp_ppo_2ply_multi_tpu.oracle import rules
from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv

# Reference two_ply.py:10-35
_ROLLS = [(a, b) for a in range(1, 7) for b in range(a, 7)]
_PROBS = [(1 if a == b else 2) / 36.0 for a, b in _ROLLS]


def load_params(path: Optional[str]):
    """Params as HOST numpy arrays — the play CLI is pure-numpy, and leaving
    jax arrays in the pytree would refetch them from the (tunnel-slow) device
    on every forward_np call."""
    return {k: np.asarray(v) for k, v in _load_params_raw(path).items()}


def _load_params_raw(path: Optional[str]):
    if path is None:
        import jax

        from mlp_ppo_2ply_multi_tpu.core.config import Config
        from mlp_ppo_2ply_multi_tpu.learner import td

        print("no checkpoint given; playing against an untrained net")
        return td.init_train_state(jax.random.PRNGKey(0), Config()).params
    if path.endswith(".pth"):
        return value_net.load_torch_checkpoint(path)
    import jax

    from mlp_ppo_2ply_multi_tpu.core.config import Config
    from mlp_ppo_2ply_multi_tpu.io import checkpoint
    from mlp_ppo_2ply_multi_tpu.learner import td

    template = td.init_train_state(jax.random.PRNGKey(0), Config())
    state, _, _ = checkpoint.restore(path, template)
    return state.params


def move_values(params, env: OracleEnv) -> np.ndarray:
    feats = np.array(
        [rules.encode(b, env.player) for _, b in env.legal], dtype=np.float32
    )
    return value_net.forward_np(params, feats)


class JaxEngine:
    """``--engine jax``: the agent's move enumeration + candidate evaluation
    run through the real batched engine (movegen2.legal_moves -> encoder ->
    value_net.forward) at batch 1, instead of the pure-python oracle. The
    chosen afterstate is mapped back to the oracle env's move index by
    board-identity match (the canonical engine emits identical move SETS,
    possibly in a different order — PARITY.md). Replaces the reference's
    in-process agent evaluation loop (play_versus_ai.py:165-195) with the
    same program the trainer runs."""

    def __init__(self, params):
        import jax
        import jax.numpy as jnp

        from mlp_ppo_2ply_multi_tpu.core.config import ModelConfig, MoveGenConfig
        from mlp_ppo_2ply_multi_tpu.encoder.features import encode_board
        from mlp_ppo_2ply_multi_tpu.engine import movegen2
        from mlp_ppo_2ply_multi_tpu.engine.board import Board

        self._jnp = jnp
        self.params = jax.tree.map(jnp.asarray, params)
        cfg = MoveGenConfig()
        mcfg = ModelConfig()

        def fn(params, data, player, dice):
            ms = movegen2.legal_moves(Board(data=data), player, dice, cfg)
            feats = encode_board(ms.boards, player[..., None])
            v = value_net.forward(params, feats, mcfg)
            return ms.boards.data, ms.valid, v

        self._fn = jax.jit(fn)

    def move_values(self, env: OracleEnv):
        """Returns (afterstate board tuples, values) in engine order."""
        jnp = self._jnp
        b = env.board
        data = np.array(
            [list(b[0]) + list(b[1]) + list(b[2]) + list(b[3])], dtype=np.int8
        )
        boards, valid, v = self._fn(
            self.params,
            jnp.asarray(data),
            jnp.asarray([env.player], jnp.int32),
            jnp.asarray([list(env.roll)], jnp.int32),
        )
        boards, valid, v = np.asarray(boards), np.asarray(valid), np.asarray(v)
        out_boards, out_v = [], []
        for k in np.nonzero(valid[0])[0]:
            d = boards[0, k]
            out_boards.append((
                tuple(int(x) for x in d[0:24]),
                tuple(int(x) for x in d[24:48]),
                (int(d[48]), int(d[49])),
                (int(d[50]), int(d[51])),
            ))
            out_v.append(float(v[0, k]))
        return out_boards, np.asarray(out_v, np.float32)

    def agent_action(self, env: OracleEnv) -> int:
        boards, v = self.move_values(env)
        assert len(boards) == env.num_moves, (
            f"engine/oracle move-count mismatch: {len(boards)} vs "
            f"{env.num_moves} (board={env.board} roll={env.roll})"
        )
        best = boards[int(np.argmax(v))]
        for i, (_, ob) in enumerate(env.legal):
            if ob == best:
                return i
        raise AssertionError(f"engine afterstate not in oracle move set: {best}")


def twoply_scores(params, env: OracleEnv, v: np.ndarray, k=4, alpha=1.0, beta=0.9):
    """Rerank the top-k 1-ply candidates (reference two_ply.py:44-150; top-5
    opponent values, 50-cap on small doubles kept deterministic)."""
    top = np.argsort(-v)[:k]
    scores = np.full_like(v, -np.inf)
    opp_pl = 1 - env.player
    for i in top:
        _, board = env.legal[i]
        total = 0.0
        for roll, prob in zip(_ROLLS, _PROBS):
            mvs = rules.full_moves(board, opp_pl, list(roll))
            if roll[0] == roll[1] and roll[0] <= 3 and len(mvs) > 50:
                mvs = mvs[:50]
            if mvs:
                feats = np.array(
                    [rules.encode(b, opp_pl) for _, b in mvs], np.float32
                )
                vv = value_net.forward_np(params, feats)
                total += float(np.sort(vv)[::-1][:5].mean()) * prob
        scores[i] = alpha * v[i] - beta * total
    return scores


def agent_action(params, env: OracleEnv, two_ply: bool) -> int:
    v = move_values(params, env)
    if two_ply and env.num_moves >= 4:
        return int(np.argmax(twoply_scores(params, env, v)))
    return int(np.argmax(v))


def human_action(params, env: OracleEnv, show_values: bool) -> int:
    v = move_values(params, env) if show_values else None
    for i, (mv, _) in enumerate(env.legal):
        note = f"   V={v[i]:+.4f}" if v is not None else ""
        print(f"  [{i}] {describe_move(mv)}{note}")
    while True:
        try:
            s = input(f"your move [0-{env.num_moves - 1}]: ").strip()
        except EOFError:
            # stdin closed (piped input exhausted) — quit instead of
            # reprompting forever
            print("\nstdin closed — quitting")
            raise SystemExit(0)
        try:
            a = int(s)
            if 0 <= a < env.num_moves:
                return a
        except ValueError:
            pass
        print("invalid choice")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None, help=".pth file or orbax dir")
    ap.add_argument("--human-player", type=int, default=0, choices=(0, 1))
    ap.add_argument("--show-values", action="store_true")
    ap.add_argument("--two-ply", action="store_true")
    ap.add_argument("--select-agent-moves", action="store_true",
                    help="debug mode: on the agent's turn, show its "
                         "value-annotated move list and pick its move by hand "
                         "(reference play_versus_ai.py:65-123, "
                         "play_game_human_select_agent_moves)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--engine", default="oracle", choices=("oracle", "jax"),
                    help="agent move evaluation engine: 'oracle' (pure "
                         "python, default) or 'jax' (the real batched "
                         "movegen2 + value-net program at batch 1)")
    args = ap.parse_args(argv)

    params = load_params(args.checkpoint)
    jax_engine = JaxEngine(params) if args.engine == "jax" else None
    rng = random.Random(args.seed)
    dice = iter(lambda: (rng.randint(1, 6), rng.randint(1, 6)), None)
    env = OracleEnv(dice)
    env.reset()
    print(f"you are {'X' if args.human_player == 0 else 'O'}")

    steps = 0
    while not env.game_over and steps < 10_000:
        print(render(env.board, env.player, env.roll))
        if env.num_moves == 0:
            print(f"{'X' if env.player == 0 else 'O'} has no legal move — pass")
            env.step(None)
        elif env.player == args.human_player:
            a = human_action(params, env, args.show_values)
            env.step(a)
        elif args.select_agent_moves:
            best = agent_action(params, env, args.two_ply)
            print(f"agent's argmax would be [{best}] "
                  f"{describe_move(env.legal[best][0])}; pick its move:")
            a = human_action(params, env, show_values=True)
            env.step(a)
        else:
            if jax_engine is not None and not args.two_ply:
                a = jax_engine.agent_action(env)
            else:
                a = agent_action(params, env, args.two_ply)
            print(f"agent plays: {describe_move(env.legal[a][0])}")
            env.step(a)
        steps += 1

    print(render(env.board, env.player))
    if env.win_type:
        winner = 1 - env.player if env.game_over else None
        # game_over flips no turn; the winner is the player who just moved
        for pl in (0, 1):
            if env.board[3][pl] >= 15:
                winner = pl
        print(f"game over: {'X' if winner == 0 else 'O'} wins ({env.win_type})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
