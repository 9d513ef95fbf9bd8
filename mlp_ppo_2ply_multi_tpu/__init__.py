"""TPU-native backgammon self-play framework.

A from-scratch JAX/XLA re-design of the capabilities of the reference
CPU/GPU trainer Nick-qsv/MLP-PPO-2PLY-MULTI (see SURVEY.md): a fully
vectorized jittable backgammon engine, batched Tesauro-198 encoding, a
sigmoid MLP value net evaluated over all candidate afterstates in one fused
pass, an on-device actor-learner with TD(0) updates, batched 2-ply
expectimax, and data-parallel scaling over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from mlp_ppo_2ply_multi_tpu.core.config import Config  # noqa: F401
