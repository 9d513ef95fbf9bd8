"""App-layer tests: renderer, play-CLI agent logic, train CLI end-to-end smoke
(both modes), evaluate CLI."""
import json
import os

import jax
import numpy as np
import pytest

from mlp_ppo_2ply_multi_tpu.apps import render, train
from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.oracle import rules
from mlp_ppo_2ply_multi_tpu.oracle.env import OracleEnv


def test_render_start_board():
    out = render.render(rules.start_board(), 0, (3, 1))
    assert "BAR" in out and "to move: X" in out and "dice: 3,1" in out
    # 5 checkers of X on point 12 (index 11, bottom row)
    assert out.count("X") >= 10 and out.count("O") >= 10


def test_describe_move():
    assert render.describe_move(((24, 19, False), (12, 9, True))) == "bar/20 13/10*"
    assert render.describe_move(((23, 25, False),)) == "24/off"


def test_play_agent_action_argmax():
    from mlp_ppo_2ply_multi_tpu.apps.play import agent_action, move_values

    params = td.init_train_state(jax.random.PRNGKey(0), Config()).params
    rolls = iter([(5, 2), (6, 1), (3, 4), (2, 2), (6, 6)] * 100)
    env = OracleEnv(rolls)
    env.reset()
    a = agent_action(params, env, two_ply=False)
    v = move_values(params, env)
    assert a == int(np.argmax(v))


def test_play_jax_engine_matches_oracle():
    """--engine jax: the real batched engine at batch 1 must present the same
    move set as the oracle env and pick a valid oracle index whose afterstate
    value is the argmax (VERDICT round-2 item 10)."""
    from mlp_ppo_2ply_multi_tpu.apps.play import JaxEngine, move_values

    params = td.init_train_state(jax.random.PRNGKey(0), Config()).params
    eng = JaxEngine(params)
    rolls = iter([(5, 2), (6, 1), (3, 4), (2, 2), (6, 6), (4, 4)] * 100)
    env = OracleEnv(rolls)
    env.reset()
    import random as _random

    rng = _random.Random(7)
    checked = 0
    for _ in range(30):
        if env.game_over:
            break
        if env.num_moves == 0:
            env.step(None)
            continue
        a = eng.agent_action(env)
        assert 0 <= a < env.num_moves
        # same afterstate set, and the picked oracle move's value equals the
        # engine's max (both sides evaluate the identical net)
        v_oracle = move_values(params, env)
        boards, v_eng = eng.move_values(env)
        assert sorted(boards) == sorted(b for _, b in env.legal)
        np.testing.assert_allclose(
            float(v_oracle[a]), float(np.max(v_eng)), rtol=1e-5
        )
        checked += 1
        env.step(rng.randrange(env.num_moves))
    assert checked >= 10


def test_train_cli_sync_smoke(tmp_path):
    rc = train.main(
        [
            "--mode", "sync",
            "--batch-games", "8",
            "--updates", "2",
            "--small-movegen",
            "--max-timesteps", "16",
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--metrics-dir", str(tmp_path / "runs"),
            "--log-every", "1",
        ]
    )
    assert rc == 0
    runs = os.listdir(tmp_path / "runs")
    assert len(runs) == 1
    lines = open(tmp_path / "runs" / runs[0] / "metrics.jsonl").read().splitlines()
    recs = [json.loads(l) for l in lines]
    scalars = [r for r in recs if "hist" not in r]
    hists = [r for r in recs if "hist" in r]
    assert len(scalars) == 2
    assert all(np.isfinite(r["loss"]) for r in scalars)
    assert all("width_overflow_count" in r for r in scalars)
    # per-update weight/bias histograms (reference trainer.py:222-226)
    assert len(hists) == 2 * 4 and all("mean" in r for r in hists)
    assert os.path.isdir(tmp_path / "ck")


def test_train_cli_continuous_smoke(tmp_path):
    rc = train.main(
        [
            "--mode", "continuous",
            "--batch-games", "16",
            "--updates", "2",
            "--steps-per-update", "8",
            "--data", "8",
            "--small-movegen",
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--metrics-dir", str(tmp_path / "runs"),
        ]
    )
    assert rc == 0


@pytest.mark.slow
def test_evaluate_cli_smoke(capsys):
    from mlp_ppo_2ply_multi_tpu.apps import evaluate

    rc = evaluate.main(
        ["--opponent", "random", "--games", "16", "--max-steps", "120",
         "--small-movegen"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["games"] == 16


@pytest.mark.slow
def test_train_cli_remote_mirror(tmp_path):
    """--remote-dir mirrors the metrics run and checkpoints to an fsspec URI
    (memory:// here; the reference's S3 streaming analog)."""
    import fsspec

    rc = train.main(
        [
            "--mode", "continuous",
            "--batch-games", "8",
            "--updates", "1",
            "--steps-per-update", "4",
            "--data", "1",
            "--small-movegen",
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--metrics-dir", str(tmp_path / "runs"),
            "--remote-dir", "memory://train_mirror",
        ]
    )
    assert rc == 0
    fs = fsspec.filesystem("memory")
    files = fs.find("/train_mirror")
    assert any("metrics.jsonl" in f for f in files), files
    assert any("/checkpoints/" in f for f in files), files


def test_build_config_production_flag():
    """--production selects the fast widths + bf16 fused actor config and
    leaves the default parity config untouched otherwise."""
    from mlp_ppo_2ply_multi_tpu.core.config import MoveGenConfig

    import argparse

    ns = argparse.Namespace(
        batch_games=8, per_episode_updates=False, td_mode="reference",
        mode="continuous", seed=0, checkpoint_every=50_000,
        checkpoint_dir="c", metrics_dir="m", small_movegen=False,
        production=True, max_timesteps=None, full_widths=False, tiered=False,
    )
    cfg = train.build_config(ns)
    assert cfg.model.dtype == "bfloat16" and cfg.model.fused_actor_kernel
    assert cfg.movegen.a_max == MoveGenConfig.fast().a_max
    ns.production = False
    cfg2 = train.build_config(ns)
    assert cfg2.model.dtype == "float32" and not cfg2.model.fused_actor_kernel
    # --full-widths: production model config over parity enumeration widths
    ns.production = True
    ns.full_widths = True
    cfg3 = train.build_config(ns)
    assert cfg3.model.dtype == "bfloat16"
    assert cfg3.movegen.a_max == MoveGenConfig().a_max
    # --tiered: two-plane pipeline with tier widths filled in
    ns.full_widths = False
    ns.tiered = True
    cfg4 = train.build_config(ns)
    assert cfg4.movegen.tiered and cfg4.movegen.nd_tier and cfg4.movegen.dd_tier
    # --tiered implies the fused actor kernel even without --production
    # (rollout_step asserts it; round-2 ADVICE item 1)
    ns.production = False
    cfg5 = train.build_config(ns)
    assert cfg5.model.fused_actor_kernel and cfg5.model.actor_tier_width


def test_train_cli_sigterm_checkpoints(tmp_path):
    """A stop request mid-run still produces a final checkpoint (the
    checkpoint-restart fault-tolerance contract, SURVEY.md §5.3)."""
    from mlp_ppo_2ply_multi_tpu.apps import train as train_mod

    train_mod._STOP = False
    orig = train_mod.train_continuous_single

    def stop_after_first(cfg, args, writer):
        train_mod._request_stop(15, None)
        return orig(cfg, args, writer)

    train_mod.train_continuous_single = stop_after_first
    try:
        rc = train_mod.main(
            [
                "--mode", "continuous", "--batch-games", "8", "--updates", "5",
                "--steps-per-update", "4", "--data", "1", "--small-movegen",
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--metrics-dir", str(tmp_path / "runs"),
            ]
        )
    finally:
        train_mod.train_continuous_single = orig
        train_mod._STOP = False
    assert rc == 0
    import os

    assert os.path.isdir(str(tmp_path / "ck"))
