"""Orbax checkpointing of the full training state.

The reference checkpoints weights ONLY — optimizer state, update version and
RNG are lost on resume, which silently restarts the temperature schedule
(/root/reference/src/multi/parameter_manager.py:115-179, SURVEY.md §5.4).
Here the whole train-state pytree (params + Adam state + version + episode
count) plus the rollout PRNG key round-trips bitwise.

Torch-format import/export is kept for interop with the reference's shipped
.pth checkpoints (value_net.from_torch_state_dict / to_torch_state_dict).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from mlp_ppo_2ply_multi_tpu.learner.td import TrainState


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save(
    directory: str,
    state: TrainState,
    key: jax.Array,
    step: Optional[int] = None,
    max_to_keep: int = 5,
) -> int:
    """Write one checkpoint; returns the step it was saved under (defaults to
    the cumulative episode count, mirroring the reference's episode-indexed
    filenames, main.py:150-153)."""
    if step is None:
        step = int(state.episode_count)
    mgr = _manager(directory, max_to_keep)
    payload = {"state": state, "key": jax.random.key_data(key)}
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()
    return step


def restore(
    directory: str, template_state: TrainState, step: Optional[int] = None
) -> Tuple[TrainState, jax.Array, int]:
    """Restore (state, key, step). ``template_state`` supplies the pytree
    structure/shapes (construct with init_train_state under the same cfg)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    template = {
        "state": template_state,
        "key": jax.random.key_data(jax.random.PRNGKey(0)),
    }
    out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    key = jax.random.wrap_key_data(out["key"])
    return out["state"], key, step


def export_torch(state: TrainState, path: str) -> None:
    """Write weights as a torch state_dict loadable by the reference's play
    CLI (play_versus_ai.py:20-29)."""
    import torch

    from mlp_ppo_2ply_multi_tpu.model.value_net import to_torch_state_dict

    torch.save(to_torch_state_dict(state.params), path)


def import_torch(path: str):
    """Load reference .pth weights as a params pytree."""
    from mlp_ppo_2ply_multi_tpu.model.value_net import load_torch_checkpoint

    return load_torch_checkpoint(path)
