"""Multi-host initialization.

The reference's "distributed runtime" is single-machine multiprocessing with
pickle transport (SURVEY.md §2.2/§5.8); its TPU-native equivalent is one SPMD
program per host with XLA collectives over ICI/DCN. This module is the thin
multi-host entry: call ``init()`` once per process before building meshes;
``global_mesh`` then lays the data axis across all devices of all hosts.

No pod slice is reachable from this environment, so multi-host behavior is
validated on a virtual device mesh (tests/test_parallel.py,
__graft_entry__.dryrun_multichip); the code path below is the standard
jax.distributed recipe and is exercised trivially for num_processes == 1.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

# NOTE: no package imports at module level — init() must run before anything
# touches the XLA backend, and importing the compute modules (sharding ->
# actor/learner) builds jnp constants that initialize it. Verified by
# scripts/multiprocess_distributed.py.


def init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the cross-host process group. With no arguments, reads the
    standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    environment (or cloud auto-detection); no-op for single-process runs."""
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(model: int = 1):
    """A {data, model} mesh over every device of every host; the data axis
    spans hosts (gradient psum rides ICI within a slice and DCN across)."""
    from mlp_ppo_2ply_multi_tpu.parallel import sharding

    n = jax.device_count()
    return sharding.make_mesh(n // model, model)


def is_coordinator() -> bool:
    """True on the process that owns metrics/checkpoint writes (host 0)."""
    return jax.process_index() == 0
