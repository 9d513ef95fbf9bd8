"""Evaluation CLI: win rate vs random / 1-ply greedy / 2-ply / another
checkpoint (a capability the reference lacks; required by BASELINE.md).

Usage:
    python -m mlp_ppo_2ply_multi_tpu.apps.evaluate --checkpoint ckpt_or_pth \
        --opponent random|greedy|twoply|<path> --games 1024
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import jax

if os.environ.get("MLP_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MLP_TPU_PLATFORM"])

from mlp_ppo_2ply_multi_tpu.core.config import Config, MoveGenConfig, TwoPlyConfig
from mlp_ppo_2ply_multi_tpu.eval import arena
from mlp_ppo_2ply_multi_tpu.learner import td


def _load(path, cfg):
    if path is None:
        return td.init_train_state(jax.random.PRNGKey(0), cfg).params
    if path.endswith(".pth"):
        from mlp_ppo_2ply_multi_tpu.model.value_net import load_torch_checkpoint

        return load_torch_checkpoint(path)
    from mlp_ppo_2ply_multi_tpu.io import checkpoint

    template = td.init_train_state(jax.random.PRNGKey(0), cfg)
    state, _, _ = checkpoint.restore(path, template)
    return state.params


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None, help=".pth / orbax dir / empty=untrained")
    ap.add_argument("--opponent", default="random",
                    help="random | greedy | twoply | path to checkpoint")
    ap.add_argument("--games", type=int, default=1024)
    ap.add_argument("--max-steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--agent-policy", choices=("greedy", "twoply"), default="greedy")
    ap.add_argument("--twoply-tuned", action="store_true",
                    help="use the tuned production 2-ply scorer (unrolled "
                         "rolls, per-die doubles widths, width-96 nd "
                         "replies — bench.production_twoply_config) for "
                         "BOTH sides' twoply policies instead of the exact "
                         "default scorer")
    ap.add_argument("--opponent-scorer", choices=("same", "tuned", "exact"),
                    default="same",
                    help="2-ply scorer for the OPPONENT side only — enables "
                         "the direct tuned-vs-exact head-to-head quality "
                         "guard (RESULTS.md): --agent-policy twoply "
                         "--twoply-tuned --opponent twoply "
                         "--opponent-scorer exact")
    ap.add_argument("--small-movegen", action="store_true")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                    help="force a JAX backend (must be set before first use)")
    ap.add_argument("--td-mode", choices=("reference", "negamax", "side0"),
                    default="reference",
                    help="value-orientation semantics the checkpoint was "
                         "trained with (side0: side 1 minimizes)")
    ap.add_argument("--opponent-td-mode",
                    choices=("reference", "negamax", "side0"), default=None,
                    help="orientation for a CHECKPOINT opponent trained "
                         "under a different td_mode (default: same as "
                         "--td-mode); each policy carries its own "
                         "orientation, like scripts/eval_matchups.py")
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mlp_ppo_2ply_multi_tpu.core.config import TrainConfig

    def make_cfg(td_mode, scorer="same"):
        if scorer == "same":
            scorer = "tuned" if args.twoply_tuned else "exact"
        if scorer == "tuned":
            tw = TwoPlyConfig.tuned()  # single authority with bench.py
        else:
            tw = TwoPlyConfig(enabled=True)
        c = Config(
            twoply=tw,
            train=TrainConfig(td_mode=td_mode),
        )
        if args.small_movegen:
            c = dataclasses.replace(
                c, movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64)
            )
        return c

    cfg = make_cfg(args.td_mode)
    cfg_b = make_cfg(args.opponent_td_mode or args.td_mode, args.opponent_scorer)

    params_a = _load(args.checkpoint, cfg)
    policy_a = (
        arena.twoply_greedy_policy(cfg)
        if args.agent_policy == "twoply"
        else arena.greedy_policy(cfg)
    )

    if args.opponent == "random":
        params_b, policy_b = params_a, arena.random_policy(cfg)
    elif args.opponent == "greedy":
        params_b, policy_b = params_a, arena.greedy_policy(cfg_b)
    elif args.opponent == "twoply":
        params_b, policy_b = params_a, arena.twoply_greedy_policy(cfg_b)
    else:
        params_b, policy_b = _load(args.opponent, cfg_b), arena.greedy_policy(cfg_b)

    res = arena.play_match(
        params_a,
        params_b,
        policy_a,
        policy_b,
        jax.random.PRNGKey(args.seed),
        cfg,
        batch=args.games,
        max_steps=args.max_steps,
    )
    print(json.dumps(arena.summarize(res)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
