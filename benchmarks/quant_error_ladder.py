"""Quantization-mode error ladder on the reward path at mid dims.

CPU fp32 base, random init: rewards/score rel-L2 for int8 / int8-wo /
int8-vit / int4-wo (the docs/PERF.md round-3 ladder).  Runs anywhere
(forces the CPU backend).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.models.reward import init_reward_params, reward_forward
from mjvideo_tpu.ops.quant import quantize_params_mode

cfg = tiny_test_config(hidden_size=512, num_layers=8, image_size=224,
                       patch_size=14)
c = cfg.chat
frames = 2
n_img = c.num_image_token * frames
T = n_img + 32
params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

rng = np.random.default_rng(0)
pix = jnp.asarray(rng.normal(size=(frames, 224, 224, 3)), jnp.float32)
ids = np.full((1, T), 11, np.int64); ids[:, 8:8+n_img] = c.img_context_token_id
ids = jnp.asarray(ids, jnp.int32); mask = jnp.ones((1, T), jnp.int32)
gpos = jnp.full((1,), T-6, jnp.int32)

@jax.jit
def run(p):
    o = reward_forward(p, cfg, pix, ids, mask, gpos, attn_impl="xla",
                       remat=False)
    return o.rewards, o.score

r0, s0 = [np.asarray(x, np.float32) for x in run(params)]
for mode in ("int8", "int8-wo", "int8-vit", "int4-wo",
             "int8-g128", "int8-g64", "int8-noattn", "int8-noattn-g128",
             "int8-noattn-g256", "int8-noattn-g512",
             "int8-ol16", "int8-ol32", "int8-noattn-ol16", "int8-noattn-ol32",
             "int8-wo-g128"):
    q = quantize_params_mode(params, mode, min_elements=1024)
    r1, s1 = [np.asarray(x, np.float32) for x in run(q)]
    rel = np.linalg.norm(r1 - r0) / np.linalg.norm(r0)
    print(f"{mode:10s} rewards_rel={rel:.4f} "
          f"score_delta={abs(float(s1[0]-s0[0])):.4f}", flush=True)
