"""Exercise the REAL multi-process jax.distributed path (VERDICT round-2
item 5/7): two OS processes, each with 4 forced host CPU devices, form one
8-device global mesh via jax.distributed.initialize (localhost coordinator)
and drive sharding.make_train_step for 3 steps. A third single-process run
on an 8-device mesh is the control; final parameters must match across both
workers and the control (the collectives ride the cross-process backend
instead of intra-process XLA, so this validates the process-group path the
virtual-mesh tests cannot — parallel/distributed.py:24-39).

This replaces the reference's mp.Manager/Queue plumbing
(/root/reference/src/main.py:65-91) at the systems level.

Usage: python scripts/multiprocess_distributed.py           # launcher
       (spawns itself with --worker {0,1} --port P and --worker single)
"""
import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")


def worker(role: str, port: int, out: str):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count="
        + ("8" if role == "single" else "4")
    )
    import jax

    # JAX_PLATFORMS env is ignored here (sitecustomize forces the tunnel
    # backend); the config update before first backend touch is honored.
    jax.config.update("jax_platforms", "cpu")

    from mlp_ppo_2ply_multi_tpu.parallel import distributed

    if role != "single":
        distributed.init(
            coordinator_address=f"localhost:{port}",
            num_processes=2,
            process_id=int(role),
        )
        assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.devices()

    import numpy as np
    from mlp_ppo_2ply_multi_tpu.core.config import (
        Config, MoveGenConfig, TrainConfig,
    )
    from mlp_ppo_2ply_multi_tpu.env import vec_env
    from mlp_ppo_2ply_multi_tpu.learner import td
    from mlp_ppo_2ply_multi_tpu.parallel import sharding

    cfg = Config(
        movegen=MoveGenConfig(w1=16, w2=32, w3=48, w4=64, a_max=64),
        train=TrainConfig(batch_games=16, per_episode_updates=False),
    )
    mesh = distributed.global_mesh()
    key = jax.random.PRNGKey(0)
    state = jax.device_get(td.init_train_state(key, cfg))
    env_state = jax.device_get(vec_env.reset(jax.random.fold_in(key, 1), 16))

    from jax.sharding import NamedSharding, PartitionSpec as P

    def put_global(x, spec):
        """Place identical host data as a global array on the mesh —
        jax.make_array_from_callback works across processes where a plain
        device_put of host data may not."""
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    specs = sharding.train_state_specs(jax.eval_shape(lambda s: s, state), False)
    state = jax.tree.map(
        put_global, state, specs, is_leaf=lambda x: isinstance(x, P)
    )
    env_state = jax.tree.map(lambda x: put_global(x, P("data")), env_state)

    step = sharding.make_train_step(mesh, cfg, num_steps=8, tp=False)
    k = jax.random.PRNGKey(7)
    for i in range(3):
        state, env_state, metrics = step(state, env_state, jax.random.fold_in(k, i))
    jax.block_until_ready(state)

    params = {
        name: np.asarray(v.addressable_data(0))
        for name, v in state.params.items()
    }
    np.savez(
        out,
        loss=float(metrics["loss"].addressable_data(0)),
        version=int(state.version.addressable_data(0)),
        **params,
    )
    print(f"worker {role}: 3 SPMD steps on {jax.process_count()} process(es), "
          f"loss={float(metrics['loss'].addressable_data(0)):.6f}", flush=True)


def launcher():
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    tmp = tempfile.mkdtemp(prefix="mpdist_")
    outs = {r: os.path.join(tmp, f"{r}.npz") for r in ("0", "1", "single")}
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", r, "--port", str(port),
             "--out", outs[r]],
        )
        for r in ("0", "1")
    ]
    rcs = [p.wait(timeout=3000) for p in procs]
    assert rcs == [0, 0], rcs
    rc = subprocess.call(
        [sys.executable, __file__, "--worker", "single", "--port", "0",
         "--out", outs["single"]]
    )
    assert rc == 0

    import numpy as np

    d0, d1, ds = (np.load(outs[r]) for r in ("0", "1", "single"))
    for k in ("w1", "b1", "w2", "b2"):
        np.testing.assert_array_equal(d0[k], d1[k], err_msg=f"{k}: p0 vs p1")
        np.testing.assert_allclose(
            d0[k], ds[k], rtol=1e-5, atol=1e-6,
            err_msg=f"{k}: 2-process vs single-process",
        )
    assert int(d0["version"]) == int(ds["version"]) == 3
    print(f"PASS: 2-process jax.distributed train == single-process "
          f"(params identical across processes, allclose 1e-5 vs control; "
          f"{time.time()-t0:.0f}s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.worker is None:
        launcher()
    else:
        worker(a.worker, a.port, a.out)
