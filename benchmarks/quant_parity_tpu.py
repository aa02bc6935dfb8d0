"""Full-dims on-chip quantization parity: rewards/score deltas vs the
bf16 tree at MJ-VIDEO-2B dims, random-init (the accuracy ladder in
docs/PERF.md).  QP_MODE names any registry mode ('int8', 'int8-vit',
'int8-noattn-g128', ...); legacy QP_SCOPE=vit maps to 'int8-vit'.
Run via tools/onchip_queue.sh step 3."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import os
os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from mjvideo_tpu.configs import mjvideo_2b_config
from mjvideo_tpu.models.reward import init_reward_params, reward_forward
from mjvideo_tpu.ops.quant import quantize_params_mode

cfg = mjvideo_2b_config()
c = cfg.chat
frames, text_len, batch = 8, 64, 1
n_img = c.num_image_token * frames
T = n_img + text_len
params = init_reward_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
import os as _os
_mode = _os.environ.get("QP_MODE")
if _mode is None:
    _mode = {"all": "int8", "vit": "int8-vit"}[
        _os.environ.get("QP_SCOPE", "all")]
print("mode:", _mode, flush=True)
pq = quantize_params_mode(params, _mode)

@jax.jit
def fwd(params, pix, ids, mask, gpos):
    o = reward_forward(params, cfg, pix, ids, mask, gpos, attn_impl="auto", remat=False)
    return o.rewards, o.aspect_scores, o.score

diffs = []
for seed in range(int(_os.environ.get("QP_SEEDS", 3))):
    rng = np.random.default_rng(seed)
    pix = jnp.asarray(rng.normal(size=(batch*frames, c.vision.image_size, c.vision.image_size, 3)), jnp.bfloat16)
    ids = np.full((batch, T), 11, np.int64); ids[:, 8:8+n_img] = c.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32); mask = jnp.ones((batch, T), jnp.int32)
    gpos = jnp.full((batch,), T-6, jnp.int32)
    r0 = [np.asarray(x, np.float32) for x in fwd(params, pix, ids, mask, gpos)]
    r1 = [np.asarray(x, np.float32) for x in fwd(pq, pix, ids, mask, gpos)]
    d = dict(rewards=float(np.max(np.abs(r0[0]-r1[0]))),
             aspects=float(np.max(np.abs(r0[1]-r1[1]))),
             score=float(np.max(np.abs(r0[2]-r1[2]))),
             rewards_rel=float(np.linalg.norm(r0[0]-r1[0])/np.linalg.norm(r0[0])),
             rewards_scale=float(np.abs(r0[0]).max()))
    print(seed, d, "score bf16:", r0[2].ravel(), "w8a8:", r1[2].ravel(), flush=True)
    diffs.append(d)
print("MAX over seeds:", {k: max(d[k] for d in diffs) for k in diffs[0]}, flush=True)
