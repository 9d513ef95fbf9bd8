"""Cross-evaluation table: side0-trained vs reference checkpoint vs
parity-trained vs random. Policies carry their own td_mode orientation."""
import json
import sys

sys.path.insert(0, ".")

import jax

from mlp_ppo_2ply_multi_tpu.core.config import Config, TrainConfig
from mlp_ppo_2ply_multi_tpu.eval import arena
from mlp_ppo_2ply_multi_tpu.io import checkpoint
from mlp_ppo_2ply_multi_tpu.learner import td
from mlp_ppo_2ply_multi_tpu.model import value_net

CFG_REF = Config(train=TrainConfig(td_mode="reference"))
CFG_S0 = Config(train=TrainConfig(td_mode="side0"))


def load(ckdir, cfg):
    tmpl = td.init_train_state(jax.random.PRNGKey(0), cfg)
    st, _, _ = checkpoint.restore(ckdir, tmpl)
    return st.params


agents = {
    "side0_1.6M": (load("/tmp/tpu_ck_s0", CFG_S0), arena.greedy_policy(CFG_S0)),
    "parity_1.6M": (load("/tmp/tpu_ck", CFG_REF), arena.greedy_policy(CFG_REF)),
    "reference_2.1M_pth": (
        value_net.load_torch_checkpoint(
            "/root/reference/src/play/backgammon_256_standard_episode_2100000.pth"
        ),
        arena.greedy_policy(CFG_REF),
    ),
    "random": (load("/tmp/tpu_ck", CFG_REF), arena.random_policy(CFG_REF)),
}

matchups = [
    ("side0_1.6M", "random"),
    ("side0_1.6M", "reference_2.1M_pth"),
    ("side0_1.6M", "parity_1.6M"),
    ("parity_1.6M", "reference_2.1M_pth"),
]
for a, b in matchups:
    pa, pol_a = agents[a]
    pb, pol_b = agents[b]
    res = arena.play_match(
        pa, pb, pol_a, pol_b, jax.random.PRNGKey(11), CFG_REF,
        batch=1024, max_steps=400,
    )
    s = arena.summarize(res)
    print(json.dumps({"A": a, "B": b, **s}), flush=True)
