# TPU-native backgammon self-play framework.
# The reference ships a CUDA torch image (reference Dockerfile:2); the TPU
# equivalent builds on a jax[tpu] base and runs the training CLI.
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY mlp_ppo_2ply_multi_tpu ./mlp_ppo_2ply_multi_tpu
COPY bench.py ./

# libtpu wheel comes from the TPU VM's pip index; on a TPU VM:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir .[torch,tensorboard,remote] \
    && pip install --no-cache-dir 'jax[tpu]' \
       -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# multi-host pods: every host runs the same command; jax.distributed
# initializes from the TPU environment automatically
CMD ["python", "-m", "mlp_ppo_2ply_multi_tpu.apps.train", \
     "--mode", "continuous", "--batch-games", "4096", "--production"]
