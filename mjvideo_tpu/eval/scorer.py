"""RewardScorer: the user-facing scoring API over the jit'd reward forward.

Replaces the reference inference recipe (README quickstart ``README.md:
71-128``, ``eval_genai_mjvideo.py:125-165``): load_video -> prepare_chat_input
-> ``model.forward(...).score`` — with TPU-side improvements:

* bucketed padding: sequence lengths round up to a small set of buckets so
  XLA compiles a handful of programs instead of one per length;
* batched pair scoring (the reference scores one video at a time);
* no NCCL/world-size ceremony — a scorer on one chip is just a scorer;
* ``score_fn`` exposes a jit-differentiable (frames, ids) -> score closure,
  the VADER-style reward-feedback hook (BASELINE.json config #5): gradients
  flow to pixel_values, enabling reward-guided video-model finetuning
  entirely on-device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import RewardConfig
from ..data.prompts import GATING_TOKEN_PATTERN, build_video_question, prepare_chat_input
from ..data.video import load_video
from ..models.reward import RewardOutput, reward_forward


def round_to_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds the largest bucket {buckets[-1]}")


class RewardScorer:
    """Batched, bucketed, jit'd reward scoring."""

    def __init__(
        self,
        cfg: RewardConfig,
        params,
        tokenizer,
        attn_impl: Optional[str] = None,
        dtype=jnp.bfloat16,
        # 2,112 = 8 frames x 256 + prompt headroom; 3,072 = the reference
        # collator ceiling (dataset.py:408).
        length_buckets: Sequence[int] = (1024, 2304, 3072),
        gating_pattern: Sequence[int] = GATING_TOKEN_PATTERN,
        mesh=None,
        device_preprocess: bool = False,
        device_max_num: int = 1,
        device_batch: Optional[int] = None,
        quant: Optional[str] = None,
        sp: Optional[str] = None,
    ):
        """``mesh``: an optional ('data','model') Mesh — params are placed
        per the TP rules and scoring batches shard over ``data`` (the
        v5e-8 serving configuration; single chip needs no mesh).

        ``device_preprocess=True`` (serving fast path): the host ships raw
        DECODED uint8 frames at their original resolution; bicubic resize
        + ImageNet normalize run fused into the scoring jit on the MXU
        (``ops/preprocess.py``).  Cuts the H2D payload ~4-12x and removes
        the per-frame PIL resize from the host (the two costs that
        dominate end-to-end serving — docs/PERF.md).  One extra compile
        per distinct source resolution.

        ``device_max_num``: dynamic-tiling ceiling for the device path
        (the high-res serving configuration, BASELINE config #4).  The
        host picks the ``dynamic_preprocess`` grid from each clip's
        resolution (data-dependent control flow stays on the host,
        ``data/video.py: select_tile_grid``); the device graph resizes,
        crops the row-major tiles, appends the thumbnail, and normalizes
        (``ops/preprocess.py: tile_frames_device``).

        ``device_batch``: clips per device dispatch.  Larger client batches
        split into this micro-batch and the dispatches pipeline
        asynchronously.  Measured on v5e (benchmarks/microbatch_ab.py):
        batch-1 executables keep the ViT activations VMEM-resident and
        pipelined batch-1 dispatches beat every bigger single-dispatch
        batch (9.54 vs 8.25 clips/s at 8 clips), so the TPU default is 1
        per data shard; None = auto (1 on TPU, no split elsewhere).

        ``quant="int8"`` (opt-in serving mode): swap the large dense
        kernels for int8 weights + per-output-channel scales and run those
        matmuls int8 x int8 -> int32 on the MXU's double-rate path
        (``ops/quant.py``); activations quantize dynamically in-graph.
        Halves weight HBM, no calibration. Attention, norms, embeddings
        and the reward heads stay bf16/fp32.  ``quant="int8-vit"``
        quantizes only the vision tower — most of the throughput win at
        near-zero score perturbation (the decoder carries ~97% of the
        full-int8 error, docs/PERF.md round 3).  ``quant="int8-wo"`` is
        weight-only w8a16: int8 storage, bf16 compute — halves weight
        HBM with no activation error; the mode for decode-bound serving.
        ``quant="int4-wo"`` is weight-only int4 with group-128 scales
        (``ops/quant4.py``) — 4x smaller weights for capacity-bound
        judges, far outside the reward parity bar (docs/PERF.md).  The
        weight-only modes are the only quantized modes ``score_fn``
        accepts (activations stay differentiable).  int8 modes compose
        with ``-noattn`` (decoder attention stays bf16) and ``-gN``
        (group-N scales via the grouped Pallas matmul) suffixes —
        ``"int8-noattn-g128"`` is the measured parity-grade w8a8 mode
        (score delta <=1e-2 at full 2B dims, docs/PERF.md round 5).

        ``sp="ring"|"allgather"``: sequence-parallel decoding of the LLM
        attention over the mesh's ``data`` axis (``parallel/sequence.py``)
        — the end-to-end long-context mode for 16-32-frame x max_num=12
        configs whose >40k-token sequences outgrow one chip's attention
        time/memory.  Requires ``mesh``; the batch is NOT additionally
        sharded over ``data`` (the axis is spent on the sequence), so
        length buckets must divide by the data-axis size."""
        self.cfg = cfg
        self.mesh = mesh
        if sp is not None:
            if sp not in ("ring", "allgather"):
                raise ValueError(f"unknown sp kind {sp!r}")
            if mesh is None:
                raise ValueError("sp requires a mesh")
            n = mesh.shape.get("data", 1)
            bad = [b for b in length_buckets if b % n]
            if bad:
                raise ValueError(
                    f"sp shards the sequence over data={n}; length buckets "
                    f"{bad} are not divisible by it")
        self.sp = sp
        if quant is not None:
            from ..ops.quant import quantize_params_mode

            params = quantize_params_mode(params, quant)
        self.quant = quant
        if mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.buckets = tuple(length_buckets)
        self.gating_pattern = tuple(gating_pattern)
        if attn_impl is None:
            attn_impl = "auto"
        self.attn_impl = attn_impl
        self.pad_token_id = getattr(
            tokenizer, "pad_token_id", cfg.chat.llm.pad_token_id
        ) or cfg.chat.llm.pad_token_id
        self.device_preprocess = device_preprocess
        self.device_max_num = device_max_num
        self.device_batch = device_batch
        # The scatter id comes from the TOKENIZER, as the reference does at
        # load time (``model.img_context_token_id =
        # tokenizer.convert_tokens_to_ids(IMG_CONTEXT_TOKEN)``); a silent
        # config/tokenizer mismatch would drop the image embeds entirely.
        # Rebase the config on the tokenizer's id so every downstream
        # consumer (prompt builder, scatter, guards) shares one truth.
        from ..data.prompts import rebase_img_context_id

        self.cfg = rebase_img_context_id(cfg, tokenizer)
        self.img_context_token_id = self.cfg.chat.img_context_token_id

    def _device_grid(self, width: int, height: int):
        """Host-side grid choice for the device-preprocess path; (1, 1)
        means plain resize (no tiling, no thumbnail)."""
        from ..data.video import select_tile_grid

        if self.device_max_num == 1:
            return (1, 1)
        return select_tile_grid(width, height, 1, self.device_max_num,
                                self.cfg.chat.image_size)

    def _jitted(self, T: int, n_tiles: int, B: int, grid=None):
        # Per-instance cache (a class-level lru_cache would pin dropped
        # scorers' multi-GB param trees alive through `self`).  Bounded:
        # under device_preprocess every distinct source resolution is a new
        # entry, and each entry holds a compiled executable.
        cache = self.__dict__.setdefault("_jit_cache", {})
        key = (T, n_tiles, B, grid)
        if key in cache:
            return cache[key]
        if len(cache) >= 16:  # drop the oldest executable (insertion order)
            cache.pop(next(iter(cache)))
        cfg, attn_impl = self.cfg, self.attn_impl
        dev_pre, dtype = self.device_preprocess, self.dtype
        img_id = self.img_context_token_id
        sp_spec = ({"mesh": self.mesh, "axis": "data", "kind": self.sp}
                   if self.sp else None)

        @jax.jit
        def fwd(params, pix, ids, mask, gating_pos):
            if dev_pre:
                from ..ops.preprocess import (
                    preprocess_frames_device,
                    tile_frames_device,
                )

                if grid is None or grid == (1, 1):
                    pix = preprocess_frames_device(
                        pix, cfg.chat.image_size, dtype=dtype)
                else:
                    cols, rows = grid
                    pix = tile_frames_device(
                        pix, cols, rows, cfg.chat.image_size,
                        thumbnail=cfg.chat.use_thumbnail, dtype=dtype)
            return reward_forward(
                params, cfg, pix, ids, mask, gating_pos,
                attn_impl=attn_impl, remat=False,
                img_context_token_id=img_id, sp=sp_spec,
            )

        cache[key] = fwd
        return fwd

    def _pad(self, ids: np.ndarray, T: int, value: int) -> np.ndarray:
        out = np.full((T,), value, ids.dtype)
        out[: min(len(ids), T)] = ids[:T]
        return out

    def _micro_batch(self, B: int) -> int:
        """Clips per device dispatch (see ``device_batch`` in __init__)."""
        if self.device_batch is not None:
            micro = self.device_batch
        elif jax.default_backend() == "tpu":
            micro = 1
        else:
            return B
        if self.mesh is not None and self.sp is None:
            # under sp the data axis shards the SEQUENCE, not the batch
            micro *= self.mesh.shape.get("data", 1)
        return min(micro, B)

    def _clip_pixel_rows(self, pixel_values, input_ids_list):
        """Per-clip leading-axis row counts of ``pixel_values``, derived
        from each clip's <IMG_CONTEXT> token count (tiles may differ per
        clip under host-side dynamic tiling).  None = can't attribute rows
        to clips — caller must fall back to one dispatch."""
        nt = self.cfg.chat.num_image_token
        if self.device_preprocess:
            # rows are raw frames; each expands to per_frame tiles of the
            # (uniform, resolution-derived) grid
            h, w = pixel_values.shape[1:3]
            cols, rows_ = self._device_grid(w, h)
            per_frame = cols * rows_
            if per_frame > 1 and self.cfg.chat.use_thumbnail:
                per_frame += 1
            nt = nt * per_frame
        rows = [int((np.asarray(i) == self.img_context_token_id).sum()) // nt
                for i in input_ids_list]
        if sum(rows) != pixel_values.shape[0] or min(rows) <= 0:
            return None
        return rows

    def score_batch(
        self,
        pixel_values: np.ndarray,  # (B*P, H, W, 3) fp32 normalized
        input_ids_list: List[np.ndarray],
        gating_pos: Sequence[int],
    ) -> RewardOutput:
        """Score B clips whose tiles are concatenated in order.

        Batches larger than the device micro-batch split into pipelined
        async dispatches (per-clip outputs are batch-invariant; dp=8 was
        measured bit-identical) and concatenate on device."""
        B = len(input_ids_list)
        micro = self._micro_batch(B)
        if micro < B:
            rows = self._clip_pixel_rows(pixel_values, input_ids_list)
            if rows is not None:
                bounds = np.concatenate([[0], np.cumsum(rows)])
                outs = []
                for s in range(0, B, micro):
                    e = min(s + micro, B)
                    outs.append(self.score_batch(
                        pixel_values[bounds[s]:bounds[e]],
                        input_ids_list[s:e], list(gating_pos)[s:e]))
                return RewardOutput(*(jnp.concatenate(f, axis=0)
                                      for f in zip(*outs)))
        T = round_to_bucket(max(len(i) for i in input_ids_list), self.buckets)
        ids = np.stack([self._pad(i, T, self.pad_token_id)
                        for i in input_ids_list])
        mask = np.stack([
            self._pad(np.ones(len(i), np.int32), T, 0)
            for i in input_ids_list
        ])
        grid = None
        n_tiles = pixel_values.shape[0]
        if self.device_preprocess:
            # raw frames: grid is a pure function of the source resolution
            h, w = pixel_values.shape[1:3]
            grid = self._device_grid(w, h)
            per_frame = grid[0] * grid[1]
            if per_frame > 1 and self.cfg.chat.use_thumbnail:
                per_frame += 1
            n_tiles = pixel_values.shape[0] * per_frame
        # Guard against a tokenizer/config scatter-id mismatch: it would
        # silently drop the image embeds and score the text alone.
        n_img = int(sum(
            int((np.asarray(i) == self.img_context_token_id).sum())
            for i in input_ids_list
        ))
        expected = n_tiles * self.cfg.chat.num_image_token
        if n_img != expected:
            raise ValueError(
                f"input_ids contain {n_img} <IMG_CONTEXT> tokens (id "
                f"{self.img_context_token_id}) but the pixel tiles produce "
                f"{expected} image embeddings — tokenizer/config mismatch "
                "or wrong num_patches_list")
        fwd = self._jitted(T, pixel_values.shape[0], B, grid)
        pix_dtype = jnp.uint8 if self.device_preprocess else self.dtype
        args = (
            jnp.asarray(pixel_values, pix_dtype),
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.int32),
            jnp.asarray(np.asarray(gating_pos, np.int32)),
        )
        if self.mesh is not None and self.sp is None:
            from ..parallel.mesh import shard_batch

            # pixel tiles shard with their rows (tiles are row-major per
            # clip, so the leading axis aligns with the batch axis).
            args = tuple(shard_batch(list(args), self.mesh))
        elif self.sp is not None:
            # sequence parallelism: ids/mask shard on the TOKEN dim over
            # 'data'; pixel TILES shard on their leading axis over the same
            # axis (the ViT encodes tiles independently and the embeds
            # all-gather before the scatter — ``internvl.extract_feature``),
            # so the H2D payload splits n ways too.  A tile count the axis
            # doesn't divide lands replicated (the in-jit shard_map pads and
            # reshards either way); gating_pos is position-wise, replicate.
            from jax.sharding import NamedSharding, PartitionSpec as P

            pix, ids, mask, gpos = args
            n = self.mesh.shape.get("data", 1)
            seq = NamedSharding(self.mesh, P(None, "data"))
            rep = NamedSharding(self.mesh, P())
            tile = (NamedSharding(self.mesh, P("data"))
                    if pix.shape[0] % n == 0 else rep)
            args = (jax.device_put(pix, tile), jax.device_put(ids, seq),
                    jax.device_put(mask, seq), jax.device_put(gpos, rep))
        return fwd(self.params, *args)

    def prepare_clip(
        self, video_path: str, caption: str,
        num_segments: int = 8, max_num: int = 1,
    ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Host-side: decode (+ tile unless device_preprocess) + prompt."""
        if self.device_preprocess:
            if max_num != self.device_max_num:
                raise ValueError(
                    f"device_preprocess tiles at the scorer's device_max_num"
                    f"={self.device_max_num}; got max_num={max_num} — "
                    "construct the scorer with device_max_num=max_num")
            from ..data.video import (
                decode_frames,
                get_frame_indices,
                video_metadata,
            )

            n_frames, fps = video_metadata(video_path)
            idx = get_frame_indices(n_frames, num_segments, fps=fps)
            pixels = np.stack(decode_frames(video_path, idx))  # uint8
            cols, rows = self._device_grid(pixels.shape[2], pixels.shape[1])
            per_frame = cols * rows
            if per_frame > 1 and self.cfg.chat.use_thumbnail:
                per_frame += 1
            num_patches_list = [per_frame] * num_segments
        else:
            pixels, num_patches_list = load_video(
                video_path, num_segments=num_segments, max_num=max_num,
                input_size=self.cfg.chat.image_size,
            )
        question = build_video_question(caption, len(num_patches_list))
        chat = prepare_chat_input(
            self.cfg.chat, self.tokenizer, question,
            num_patches_list=num_patches_list,
            gating_pattern=self.gating_pattern,
        )
        return pixels, chat.input_ids[0], chat.gating_pos

    def score_video(
        self, video_path: str, caption: str,
        num_segments: int = 8, max_num: int = 1,
    ) -> Dict[str, np.ndarray]:
        """(video, caption) -> {score, aspect_scores, rewards} (numpy)."""
        pixels, ids, gpos = self.prepare_clip(
            video_path, caption, num_segments, max_num
        )
        out = self.score_batch(pixels, [ids], [gpos])
        return {
            "score": np.asarray(out.score)[0],
            "aspect_scores": np.asarray(out.aspect_scores)[0],
            "rewards": np.asarray(out.rewards)[0],
        }

    def score_pair(
        self, video0: str, video1: str, caption: str,
        num_segments: int = 8, max_num: int = 1,
    ) -> Tuple[Dict, Dict]:
        """Score both videos of a pair in ONE batched forward."""
        p0, i0, g0 = self.prepare_clip(video0, caption, num_segments, max_num)
        p1, i1, g1 = self.prepare_clip(video1, caption, num_segments, max_num)
        out = self.score_batch(
            np.concatenate([p0, p1], axis=0), [i0, i1], [g0, g1]
        )
        res = []
        for b in (0, 1):
            res.append({
                "score": np.asarray(out.score)[b],
                "aspect_scores": np.asarray(out.aspect_scores)[b],
                "rewards": np.asarray(out.rewards)[b],
            })
        return res[0], res[1]

    def score_fn_with_params(self, input_ids: np.ndarray, gating_pos: int):
        """Differentiable ``(params, pixel_values) -> scalar score``.

        Like ``score_fn`` but with the param tree as an explicit argument —
        REQUIRED inside a caller's own jit'd train step: a closure would
        capture the multi-GB tree as lowering constants (pathological on
        remote-compile backends and re-shipped per executable).  See
        ``examples/vader_loop.py``.
        """
        T = round_to_bucket(len(input_ids), self.buckets)
        ids = jnp.asarray(self._pad(np.asarray(input_ids), T,
                                    self.pad_token_id))[None]
        mask_np = self._pad(np.ones(len(input_ids), np.int32), T, 0)
        mask = jnp.asarray(mask_np)[None]
        gpos = jnp.asarray([gating_pos], jnp.int32)
        cfg, attn_impl = self.cfg, self.attn_impl
        img_id = self.img_context_token_id
        dtype = self.dtype

        def f(params, pixel_values):
            out = reward_forward(
                params, cfg, pixel_values.astype(dtype), ids, mask, gpos,
                attn_impl=attn_impl, remat=True,
                img_context_token_id=img_id,
            )
            return out.score[0]

        return f

    def score_fn(self, input_ids: np.ndarray, gating_pos: int):
        """Differentiable (pixel_values fp32 NHWC) -> scalar score closure.

        The VADER-style reward-feedback API (SURVEY.md §7.1 step 9): a video
        generator can backprop through the full reward stack via
        ``jax.grad(scorer.score_fn(ids, pos))(frames)``.  For use inside
        your own jit'd step, prefer ``score_fn_with_params``.
        """
        from ..ops.quant import QuantKernel

        if self.quant == "int8" or self.quant == "int8-vit" or any(
            isinstance(x, QuantKernel)
            for x in jax.tree.leaves(
                self.params, is_leaf=lambda n: isinstance(n, QuantKernel))
        ):
            # round() in w8a8's dynamic ACTIVATION quantization has zero
            # gradient — backprop to pixels would silently return zeros.
            # The weight-only modes ("int8-wo", "int4-wo") are fine: the
            # quantized weights are constants and activations stay
            # differentiable end-to-end.
            raise ValueError(
                "score_fn requires params without w8a8 kernels; use "
                "full-precision or a weight-only mode ('int8-wo', "
                "'int4-wo') for reward-feedback training")
        T = round_to_bucket(len(input_ids), self.buckets)
        ids = jnp.asarray(self._pad(np.asarray(input_ids), T,
                                    self.pad_token_id))[None]
        mask_np = self._pad(np.ones(len(input_ids), np.int32), T, 0)
        mask = jnp.asarray(mask_np)[None]
        gpos = jnp.asarray([gating_pos], jnp.int32)
        cfg, params, attn_impl = self.cfg, self.params, self.attn_impl

        img_id = self.img_context_token_id

        @jax.jit
        def f(pixel_values):
            out = reward_forward(
                params, cfg, pixel_values.astype(self.dtype), ids, mask, gpos,
                attn_impl=attn_impl, remat=True,
                img_context_token_id=img_id,
            )
            return out.score[0]

        return f
