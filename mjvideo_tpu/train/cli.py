"""Training CLI: ``python -m mjvideo_tpu.train.cli --stage {1,2,3} ...``

Replaces the per-stage argparse mains + slurm/accelerate launch scripts
(``scripts/train/{criteria,aspect,overall}_train.py`` ``:13-63`` flag blocks,
``*.sh:1-13``).  One entry point covers all three stages; there is no
launcher ceremony — JAX discovers the mesh, single-host needs nothing
(multi-host would call ``jax.distributed.initialize`` exactly once, driven
by TPU env vars).
"""

from __future__ import annotations

import argparse
import json
import os


# The reference stage scripts' training defaults
# (criteria/aspect/overall_train.py argparse blocks): lr 3e-5, cosine
# schedule, weight decay 0.1, 3 epochs for every stage; warmup and
# accumulation differ per stage.
REFERENCE_STAGE_DEFAULTS = {
    1: dict(learning_rate=3e-5, weight_decay=0.1, schedule="cosine",
            num_epochs=3, warmup_steps=25, gradient_accumulation_steps=8),
    2: dict(learning_rate=3e-5, weight_decay=0.1, schedule="cosine",
            num_epochs=3, warmup_steps=50, gradient_accumulation_steps=8),
    3: dict(learning_rate=3e-5, weight_decay=0.1, schedule="cosine",
            num_epochs=3, warmup_steps=5, gradient_accumulation_steps=4),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MJ-Video TPU trainer")
    p.add_argument("--stage", type=int, choices=(1, 2, 3), required=True,
                   help="1=criteria, 2=aspect, 3=overall")
    p.add_argument("--train-json", required=True)
    p.add_argument("--optimizer", default="adamw",
                   choices=("adamw", "adafactor"),
                   help="adamw matches the reference; adafactor's factored "
                        "second moment enables full-depth 2B finetuning on "
                        "one 16GB chip")
    p.add_argument("--remat-policy", default="full",
                   choices=("none", "full", "dots"),
                   help="gradient checkpointing: full block (max memory "
                        "saving), dots (save matmul outputs, faster step), "
                        "or none")
    p.add_argument("--eval-json", default=None)
    p.add_argument("--video-root", default="./datas/videos")
    p.add_argument("--model-path", default=None,
                   help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--warm-start", default=None,
                   help="orbax checkpoint from the previous stage")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer path (defaults to --model-path)")
    p.add_argument("--output-dir", default="./checkpoints")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-segments", type=int, default=2)
    p.add_argument("--decode-workers", type=int, default=0,
                   help="N-worker video decode pool (reference: 12-thread "
                        "prefetch, dataset.py:299-309); 0 = in-line decode")
    p.add_argument("--max-length", type=int, default=3072)
    # Hyperparameter defaults of None resolve per stage to the REFERENCE
    # training scripts' defaults (REFERENCE_STAGE_DEFAULTS below), so a
    # bare `--stage N` run trains with the reference recipe.
    p.add_argument("--learning-rate", type=float, default=None,
                   help="default: 3e-5, every reference stage script")
    p.add_argument("--weight-decay", type=float, default=None,
                   help="default: 0.1 (criteria_train.py:40)")
    p.add_argument("--schedule", choices=("linear", "cosine", "none"),
                   default=None,
                   help="LR schedule; default: cosine "
                        "(lr_scheduler_type, criteria_train.py:37)")
    p.add_argument("--num-epochs", type=int, default=None,
                   help="default: 3 (num_train_epochs)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--warmup-steps", type=int, default=None,
                   help="default: 25/50/5 for stage 1/2/3")
    p.add_argument("--gradient-accumulation-steps", type=int, default=None,
                   help="mean micro-batch grads, apply the optimizer "
                        "every k steps; default: 8/8/4 for stage 1/2/3")
    p.add_argument("--mse", action="store_true", default=None)
    p.add_argument("--no-mse", dest="mse", action="store_false")
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--attn", choices=("auto", "flash", "xla"), default=None)
    p.add_argument("--tp", type=int, default=1, help="model-axis mesh size")
    p.add_argument("--dp", type=int, default=-1,
                   help="data-axis mesh size (-1 = all remaining devices)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--save-total-limit", type=int, default=3)
    p.add_argument("--bf16-adam-mu", action="store_true",
                   help="store Adam first moments in bf16 (halves opt memory)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard optimizer moments over the data mesh "
                        "axis (optimizer memory / dp degree)")
    p.add_argument("--lora-rank", type=int, default=0,
                   help="rank > 0 trains low-rank LoRA adapters on the LLM "
                        "instead of full weights (ops/lora.py)")
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="LoRA scale numerator (default: rank, i.e. scale 1)")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="overlap checkpoint disk writes with training "
                        "(orbax async commit)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="hermetic smoke mode: tiny config + byte tokenizer")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from ..configs import mjvideo_2b_config
    from ..data.dataset import PairCollator, PreferencePairDataset, batched, prefetch
    from ..models.reward import init_reward_params
    from ..train.trainer import TrainConfig, Trainer, warm_start

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    attn = args.attn or "auto"

    if args.model_path:
        from ..utils.checkpoint import load_reward_model

        cfg, params = load_reward_model(args.model_path, dtype=dtype)
    else:
        if args.tiny:
            from ..configs import tiny_test_config

            cfg = tiny_test_config()
        else:
            cfg = mjvideo_2b_config()
        params = init_reward_params(
            jax.random.PRNGKey(args.seed), cfg, dtype=dtype
        )

    if args.warm_start:
        try:
            params = warm_start(params, args.warm_start)
        except Exception:
            if args.lora_rank <= 0:
                raise
            # The previous stage trained with LoRA: its checkpoint tree is
            # LoraKernel-wrapped, so wrap BEFORE restoring (the Trainer's
            # own apply_lora is idempotent and the restore overwrites the
            # freshly-initialized adapters).
            from ..ops.lora import apply_lora

            params = apply_lora(
                params, jax.random.PRNGKey(args.lora_rank),
                args.lora_rank, alpha=args.lora_alpha)
            params = warm_start(params, args.warm_start)

    tok_path = args.tokenizer or args.model_path
    if tok_path:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            tok_path, trust_remote_code=True, use_fast=False
        )
        gating_pattern = cfg.gating_token_pattern
    else:  # hermetic smoke mode
        from ..data.prompts import ByteTokenizer

        tokenizer = ByteTokenizer()
        gating_pattern = tokenizer.gating_pattern()

    # the tokenizer owns the <IMG_CONTEXT> scatter id (reference load-time
    # assignment); rebase so dataset prompts and the model forward agree
    from ..data.prompts import rebase_img_context_id

    cfg = rebase_img_context_id(cfg, tokenizer)

    dataset = PreferencePairDataset(
        args.train_json, tokenizer, cfg.chat, root=args.video_root,
        num_segments=args.num_segments, overall=(args.stage == 3),
        gating_pattern=gating_pattern, decode_workers=args.decode_workers,
    )
    collator = PairCollator(
        pad_token_id=getattr(tokenizer, "pad_token_id", None)
        or cfg.chat.llm.pad_token_id,
        max_length=args.max_length,
    )

    for k, v in REFERENCE_STAGE_DEFAULTS[args.stage].items():
        if getattr(args, k) is None:
            setattr(args, k, v)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    total = args.max_steps or steps_per_epoch * args.num_epochs
    accum = args.gradient_accumulation_steps
    tc = TrainConfig(
        stage=args.stage,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        schedule=args.schedule,
        warmup_steps=args.warmup_steps,
        # the LR schedule counts OPTIMIZER steps (HF semantics); the
        # training loop below counts micro steps
        total_steps=max(total // accum, 1),
        mse=args.mse,
        beta=args.beta,
        attn_impl=attn,
        log_every=args.log_every,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=args.output_dir,
        keep_checkpoints=args.save_total_limit,
        mesh_model_axis=args.tp,
        mesh_data_axis=args.dp,
        adam_mu_dtype="bfloat16" if args.bf16_adam_mu else None,
        remat={"none": False, "full": True,
               "dots": "dots"}[args.remat_policy],
        optimizer=args.optimizer,
        zero1=args.zero1,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        async_checkpoint=args.async_checkpoint,
        gradient_accumulation_steps=accum,
    )
    trainer = Trainer(cfg, params, tc)

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "train_args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    eval_dataset = None
    if args.eval_json:
        eval_dataset = PreferencePairDataset(
            args.eval_json, tokenizer, cfg.chat, root=args.video_root,
            num_segments=args.num_segments, overall=(args.stage == 3),
            gating_pattern=gating_pattern,
            decode_workers=args.decode_workers,
        )

    for epoch in range(args.num_epochs):
        stream = prefetch(batched(dataset, collator, args.batch_size))
        last = trainer.train(stream, max_steps=total)
        # save_strategy='epoch' is the reference default
        # (criteria_train.py:30) — checkpoint_every adds the 'steps' mode
        # on top; keep_checkpoints prunes both.
        path = trainer.save()
        print(f"epoch {epoch}: {last} -> {path}")
        if eval_dataset is not None:
            # eval_strategy='epoch' (criteria_train.py:32): preference
            # accuracy + per-dimension criteria/aspect metrics on the
            # held-out set, logged to the metrics JSONL.
            metrics = trainer.evaluate(
                batched(eval_dataset, collator, args.batch_size))
            trainer.log({"eval": metrics, "step": trainer.step,
                         "epoch": epoch})
            print(f"epoch {epoch} eval: {metrics}")
        if trainer.step >= total:
            break
    if args.async_checkpoint:
        from ..utils.checkpoint import wait_for_saves

        wait_for_saves()  # the epoch-end save may still be committing
    print(f"final checkpoint: {path}")


if __name__ == "__main__":
    main()
