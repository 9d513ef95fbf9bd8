"""TPU-native backgammon self-play framework.

A from-scratch JAX/XLA re-design of the capabilities of the reference
CPU/GPU trainer Nick-qsv/MLP-PPO-2PLY-MULTI (see SURVEY.md): a fully
vectorized jittable backgammon engine, batched Tesauro-198 encoding, a
sigmoid MLP value net evaluated over all candidate afterstates in one fused
pass, an on-device actor-learner with TD(0) updates, batched 2-ply
expectimax, and data-parallel scaling over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("MLP_NO_COMPILE_CACHE"):
    # XLA compiles of the production step take ~10 min through the tunneled
    # TPU backend; the persistent compilation cache makes every identical
    # re-run (benchmarks, training restarts, the driver's bench) skip it.
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.jax_cache")
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from mlp_ppo_2ply_multi_tpu.core.config import Config  # noqa: F401
