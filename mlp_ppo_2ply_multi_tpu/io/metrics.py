"""Metrics writer: JSONL always, TensorBoard when available.

Replicates the reference trainer's metric set (trainer.py:186-228: loss, mean
|TD error|, grad norm, mean V, mean reward, episode length, per-win-type
counts, close-out/prime counts, weight histograms) with the Q4/Q14 corrections
documented in SURVEY.md §7.1 (true shaping counts, true eps/sec).

The reference streams tensorboardX event files to S3 via a monkey-patched
RecordWriter (logger.py:9-56); here the local JSONL file is the source of
truth (trivially syncable anywhere) and TensorBoard event files are written
alongside when tensorboardX imports.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsWriter:
    def __init__(
        self,
        logdir: str,
        run_name: Optional[str] = None,
        remote_uri: Optional[str] = None,
    ):
        ts = time.strftime("%Y%m%d-%H%M%S")
        self.run_dir = os.path.join(logdir, run_name or f"bg_td_{ts}")
        os.makedirs(self.run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir=self.run_dir)
        except Exception:
            pass
        self._t0 = time.time()
        # fsspec mirror of the run dir (reference's S3-streaming logger,
        # logger.py:9-56); rate-limited, error-swallowing
        self._mirror = None
        if remote_uri:
            from mlp_ppo_2ply_multi_tpu.io.remote import RemoteMirror

            self._mirror = RemoteMirror(self.run_dir, remote_uri)

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), step)
        if self._mirror is not None:
            self._mirror.maybe_sync()

    def histogram(self, step: int, name: str, values) -> None:
        arr = np.asarray(values).ravel()
        rec = {
            "step": int(step),
            "hist": name,
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "min": float(arr.min()),
            "max": float(arr.max()),
        }
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_histogram(name, arr, step)

    def param_histograms(self, step: int, params) -> None:
        """Per-parameter weight/bias histograms (trainer.py:222-226)."""
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            self.histogram(step, f"params/{name}", jax.device_get(leaf))

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._mirror is not None:
            self._mirror.close()


class Throughput:
    """eps/sec + env-steps/sec counters (reference main.py:140-147 prints
    eps/sec inflated 1.5x — quirk Q14; these are true rates)."""

    def __init__(self):
        self.t0 = time.time()
        self.episodes = 0
        self.env_steps = 0

    def add(self, episodes: int, env_steps: int) -> None:
        self.episodes += int(episodes)
        self.env_steps += int(env_steps)

    def rates(self) -> Dict[str, float]:
        dt = max(time.time() - self.t0, 1e-9)
        return {
            "eps_per_sec": self.episodes / dt,
            "env_steps_per_sec": self.env_steps / dt,
        }
