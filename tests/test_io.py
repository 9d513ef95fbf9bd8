"""Checkpoint round-trip and metrics writer tests (SURVEY.md §5.4/§5.5)."""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mlp_ppo_2ply_multi_tpu.core.config import Config
from mlp_ppo_2ply_multi_tpu.io import checkpoint, metrics
from mlp_ppo_2ply_multi_tpu.learner import td

CFG = Config()


def test_checkpoint_roundtrip_bitwise(tmp_path):
    key = jax.random.PRNGKey(0)
    state = td.init_train_state(key, CFG)
    state = state._replace(
        version=jnp.int32(17), episode_count=jnp.int32(3400)
    )
    rkey = jax.random.PRNGKey(99)

    step = checkpoint.save(str(tmp_path / "ckpt"), state, rkey)
    assert step == 3400

    template = td.init_train_state(jax.random.PRNGKey(1), CFG)
    got, got_key, got_step = checkpoint.restore(str(tmp_path / "ckpt"), template)
    assert got_step == 3400
    assert int(got.version) == 17
    assert int(got.episode_count) == 3400
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        jax.random.key_data(rkey), jax.random.key_data(got_key)
    )


def test_torch_export_import_roundtrip(tmp_path):
    state = td.init_train_state(jax.random.PRNGKey(2), CFG)
    p = str(tmp_path / "model.pth")
    checkpoint.export_torch(state, p)
    params2 = checkpoint.import_torch(p)
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(state.params[k]), np.asarray(params2[k])
        )


def test_metrics_writer_jsonl(tmp_path):
    w = metrics.MetricsWriter(str(tmp_path), run_name="t")
    w.scalars(1, {"loss": 0.5, "grad_norm": 1.25})
    w.scalars(2, {"loss": 0.4})
    w.histogram(2, "w1", np.arange(10.0))
    w.close()
    lines = [
        json.loads(l)
        for l in open(os.path.join(str(tmp_path), "t", "metrics.jsonl"))
    ]
    assert lines[0]["loss"] == 0.5 and lines[0]["step"] == 1
    assert lines[1]["loss"] == 0.4
    assert lines[2]["hist"] == "w1" and lines[2]["max"] == 9.0


def test_throughput_counter():
    t = metrics.Throughput()
    t.add(episodes=10, env_steps=3000)
    r = t.rates()
    assert r["eps_per_sec"] > 0
    assert abs(r["env_steps_per_sec"] / r["eps_per_sec"] - 300.0) < 1e-6


def test_remote_mirror_memory_fs(tmp_path):
    """fsspec mirroring (the reference's S3 streaming analog) against the
    in-memory filesystem: files upload, re-sync skips unchanged, failures
    are swallowed."""
    import fsspec

    from mlp_ppo_2ply_multi_tpu.io import remote

    local = tmp_path / "run"
    local.mkdir()
    (local / "metrics.jsonl").write_text('{"step": 1}\n')
    (local / "sub").mkdir()
    (local / "sub" / "events.bin").write_bytes(b"\x00\x01")

    uri = "memory://mirror_test/run"
    assert remote.sync_dir(str(local), uri)
    fs = fsspec.filesystem("memory")
    assert fs.cat("/mirror_test/run/metrics.jsonl") == b'{"step": 1}\n'
    assert fs.cat("/mirror_test/run/sub/events.bin") == b"\x00\x01"
    # unchanged file is skipped; changed file re-uploads
    (local / "metrics.jsonl").write_text('{"step": 1}\n{"step": 2}\n')
    assert remote.sync_dir(str(local), uri)
    assert b'"step": 2' in fs.cat("/mirror_test/run/metrics.jsonl")
    # bogus protocol: swallowed, returns False
    assert not remote.sync_dir(str(local), "no-such-proto://x/y")


def test_metrics_writer_remote(tmp_path):
    import fsspec

    w = metrics.MetricsWriter(
        str(tmp_path), run_name="r", remote_uri="memory://mirror_test2"
    )
    w.scalars(1, {"loss": 0.5})
    w.close()
    fs = fsspec.filesystem("memory")
    assert b'"loss": 0.5' in fs.cat("/mirror_test2/metrics.jsonl")
