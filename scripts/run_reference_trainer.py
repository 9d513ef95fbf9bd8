"""Run the reference's OWN trainer headless for learning-curve parity
(VERDICT #5).

Uses the reference's actual components — BackgammonEnv, Worker.play_episode,
Trainer.update, ParameterManager temperature schedule — imported from
/root/reference via tests/refbridge.py path setup. Only the
environment-specific shims are replaced (single process instead of 7; pynvml
/ tensorboardX / boto3 stubbed; S3Logger swapped for a JSONL logger), which
is the "patched for headless run" VERDICT asks for. Learning dynamics
(episode generation, softmax(V/T) action sampling with the parameter
manager's temperature, per-episode Adam steps with the same hyperparameters)
are the reference's own code paths:
  /root/reference/src/multi/worker.py:78-174
  /root/reference/src/agents/trainer.py:48-166
  /root/reference/src/multi/parameter_manager.py:93-111

Checkpoints are saved every --eval-every episodes so eval_learning_curve.py
can measure win-rate-vs-random at matched episode counts.

Usage:
  python scripts/run_reference_trainer.py --episodes 20000 --seed 0 \
      --out /tmp/refrun_s0
"""
import argparse
import json
import os
import sys
import threading
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _install_shims():
    """pynvml / tensorboardX / boto3 / botocore stubs so the reference's
    trainer+logger import headless (they are observability-only)."""

    class _Any:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return _Any()

        def __getattr__(self, name):
            return _Any()

        gpu = 0
        used = 0

    def module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return m

    module(
        "pynvml",
        nvmlInit=lambda: None,
        nvmlDeviceGetHandleByIndex=lambda i: _Any(),
        nvmlDeviceGetUtilizationRates=lambda h: _Any(),
        nvmlDeviceGetMemoryInfo=lambda h: _Any(),
    )
    module("boto3", client=lambda *a, **k: _Any())
    be = module("botocore")
    be.exceptions = module("botocore.exceptions", ClientError=Exception)

    class _Writer:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, *a, **k):
            pass

        def add_scalars(self, *a, **k):
            pass

        def add_histogram(self, *a, **k):
            pass

        def flush(self):
            pass

        def close(self):
            pass

    tbx = module("tensorboardX", SummaryWriter=_Writer)
    tbx.record_writer = module(
        "tensorboardX.record_writer",
        RecordWriter=_Writer,
        S3RecordWriter=_Writer,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/refrun")
    ap.add_argument("--ckpt-every", type=int, default=2000)
    args = ap.parse_args()

    _install_shims()
    from tests import refbridge

    refbridge._install_gym_shim()
    for p in (refbridge.REFERENCE_ROOT, refbridge.REFERENCE_ROOT + "/src"):
        if p not in sys.path:
            sys.path.insert(0, p)

    import numpy as np
    import torch

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    from multi.parameter_manager import ParameterManager
    from multi.worker import Worker
    from agents import trainer as trainer_mod
    from config import MIN_EPISODES_TO_TRAIN

    # single-process stand-ins for the multiprocessing.Manager shared objects
    lock = threading.Lock()
    version = types.SimpleNamespace(value=0)
    parameters = {}
    pm = ParameterManager(lock, version, parameters)

    trainer = trainer_mod.Trainer(parameter_manager=pm)

    class _Queue:  # Worker.run is not used; play_episode only
        def put(self, x):
            pass

    worker = Worker(0, pm, _Queue())
    from environments import BackgammonEnv

    env = BackgammonEnv(worker_id=0)

    os.makedirs(args.out, exist_ok=True)
    log = open(os.path.join(args.out, "train.jsonl"), "w")
    buf = []
    total = 0
    t0 = time.time()
    next_ckpt = 0
    while total < args.episodes:
        if total >= next_ckpt:
            sd = pm.get_parameters()
            torch.save(sd, os.path.join(args.out, f"ep{total:08d}.pth"))
            next_ckpt += args.ckpt_every
        episode = worker.play_episode(env)
        buf.append(episode)
        total += 1
        if len(buf) >= MIN_EPISODES_TO_TRAIN:
            for ep in buf:
                ep.to_tensor(device=trainer.device)
            trainer.update(buf)
            buf = []
            # worker refreshes params + temperature like worker.py:65-76
            worker.policy_network.load_state_dict(pm.get_parameters())
            worker.temperature = pm.get_temperature()
            rec = {
                "episodes": total,
                "version": pm.get_version(),
                "temperature": worker.temperature,
                "eps_per_sec": total / (time.time() - t0),
            }
            log.write(json.dumps(rec) + "\n")
            log.flush()
    sd = pm.get_parameters()
    torch.save(sd, os.path.join(args.out, f"ep{total:08d}.pth"))
    print(f"done: {total} episodes in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
