"""Dataset iteration, collation, prefetch, and checkpoint-resume tests."""

import json

import numpy as np
import pytest

from mjvideo_tpu.configs import tiny_test_config
from mjvideo_tpu.data.dataset import (
    PairCollator,
    PreferencePairDataset,
    batched,
    prefetch,
)
from mjvideo_tpu.data.prompts import ByteTokenizer


def _write_video(path, size=32, n=6):
    import cv2

    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                        (size, size))
    rng = np.random.default_rng(0)
    for _ in range(n):
        w.write(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
    w.release()


def _record(caption="a cat", pref="Video 1 better"):
    criteria = {f"c{i}": (i % 3) for i in range(28)}
    aspects = {f"a{i}": 1 for i in range(5)}
    return {
        "caption": caption,
        "video_0_path": "v0.mp4",
        "video_1_path": "v1.mp4",
        "video_0_label": criteria,
        "video_1_label": criteria,
        "video_0_overall_score": aspects,
        "video_1_overall_score": aspects,
        "video_0_total_score": 1,
        "video_1_total_score": 2,
        "category_preference": {f"a{i}": "Video 2 better" for i in range(5)},
        "overall_preference": pref,
    }


@pytest.fixture()
def data_dir(tmp_path):
    _write_video(tmp_path / "v0.mp4")
    _write_video(tmp_path / "v1.mp4")
    records = [_record(), _record(pref="Same"),
               _record(caption="a dog", pref="Video 2 better")]
    jpath = tmp_path / "pairs.json"
    jpath.write_text(json.dumps(records))
    return tmp_path, str(jpath)


def test_dataset_iteration_and_fields(data_dir):
    root, jpath = data_dir
    cfg = tiny_test_config()
    tok = ByteTokenizer()
    ds = PreferencePairDataset(
        jpath, tok, cfg.chat, root=str(root), num_segments=2,
        gating_pattern=tok.gating_pattern(),
    )
    assert len(ds) == 3
    ex = next(iter(ds))
    assert ex["video_0_pixel_values"].shape == (2, 56, 56, 3)
    assert ex["video_0_criteria_score"].shape == (28,)
    assert ex["video_0_overall_score"].tolist() == [1.0]
    assert ex["video_1_overall_score"].tolist() == [-1.0]
    assert ex["overall_preference"].tolist() == [0]
    n_ctx = int((ex["video_0_input_ids"] == tok.img_context_token_id).sum())
    assert n_ctx == 2 * cfg.chat.num_image_token


def test_overall_mode_skips_undecided(data_dir):
    root, jpath = data_dir
    cfg = tiny_test_config()
    tok = ByteTokenizer()
    ds = PreferencePairDataset(
        jpath, tok, cfg.chat, root=str(root), num_segments=2, overall=True,
        gating_pattern=tok.gating_pattern(),
    )
    assert len(ds) == 2  # 'Same' filtered (dataset.py:311-320 semantics)
    assert sum(1 for _ in ds) == 2


def test_collator_pads_to_ceiling(data_dir):
    root, jpath = data_dir
    cfg = tiny_test_config()
    tok = ByteTokenizer()
    ds = PreferencePairDataset(
        jpath, tok, cfg.chat, root=str(root), num_segments=2,
        gating_pattern=tok.gating_pattern(),
    )
    coll = PairCollator(pad_token_id=0, max_length=512)
    batches = list(batched(prefetch(ds), coll, batch_size=2,
                           drop_remainder=False))
    assert len(batches) == 2
    b = batches[0]
    assert b["video_0_input_ids"].shape == (2, 512)
    assert b["video_0_attention_mask"].shape == (2, 512)
    assert b["video_0_pixel_values"].shape == (2, 2, 56, 56, 3)
    # padding region is pad_token / 0-mask
    lens = b["video_0_attention_mask"].sum(-1)
    assert (lens < 512).all()
    row = b["video_0_input_ids"][0]
    assert (row[int(lens[0]):] == 0).all()


def test_trainer_save_and_resume(tmp_path):
    import jax

    from mjvideo_tpu.models.reward import init_reward_params
    from mjvideo_tpu.train.trainer import TrainConfig, Trainer

    cfg = tiny_test_config()
    params = init_reward_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(stage=1, attn_impl="xla", total_steps=2,
                     checkpoint_dir=str(tmp_path))
    tr = Trainer(cfg, params, tc)
    tr.step = 7
    path = tr.save()
    assert "stage1_step7" in path

    tr2 = Trainer(cfg, init_reward_params(jax.random.PRNGKey(1), cfg), tc)
    restored_path = tr2.resume_latest()
    assert restored_path == path
    assert tr2.step == 7
    a = np.asarray(jax.device_get(
        tr.params["regression_layer"]["kernel"]))
    b = np.asarray(jax.device_get(
        tr2.params["regression_layer"]["kernel"]))
    np.testing.assert_array_equal(a, b)


def test_train_cli_end_to_end_hermetic(tmp_path, monkeypatch):
    """The full CLI path: sample data -> dataset -> trainer -> checkpoint."""
    import subprocess
    import sys

    sample = tmp_path / "data"
    r = subprocess.run(
        [sys.executable, "examples/make_sample_data.py", "--out",
         str(sample), "--pairs", "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr

    from mjvideo_tpu.train import cli

    out = tmp_path / "ckpt"
    cli.main([
        "--stage", "1", "--tiny", "--fp32", "--attn", "xla",
        "--train-json", str(sample / "pairs.json"),
        "--video-root", str(sample / "videos"),
        "--output-dir", str(out),
        "--batch-size", "2", "--max-steps", "1", "--num-segments", "2",
        "--max-length", "512", "--dp", "2",
    ])
    import os

    ckpts = [d for d in os.listdir(out) if d.startswith("stage1_step")]
    assert ckpts, os.listdir(out)
    assert (out / "train_args.json").exists()


def test_trainer_tensorboard_logging(tmp_path):
    import jax

    from mjvideo_tpu.configs import tiny_test_config
    from mjvideo_tpu.models.reward import init_reward_params
    from mjvideo_tpu.train.trainer import TrainConfig, Trainer

    cfg = tiny_test_config()
    tc = TrainConfig(stage=1, attn_impl="xla", total_steps=1,
                     checkpoint_dir=str(tmp_path), tensorboard=True)
    tr = Trainer(cfg, init_reward_params(jax.random.PRNGKey(0), cfg), tc)
    tr.log({"step": 1, "loss": 0.5})
    import os

    tb_dir = tmp_path / "tb"
    if tr._tb is not None:  # flax tensorboard available in this image
        assert tb_dir.exists() and len(os.listdir(tb_dir)) > 0


def test_pool_map_ordered_and_raises():
    from mjvideo_tpu.data.dataset import pool_map

    # order preserved regardless of completion order
    import time as _t

    def slow_sq(x):
        _t.sleep(0.02 if x % 2 == 0 else 0.0)
        return x * x

    assert list(pool_map(slow_sq, range(17), num_workers=4)) == [
        x * x for x in range(17)]

    # a worker exception surfaces at its item's position
    def boom(x):
        if x == 3:
            raise RuntimeError("decode failed")
        return x

    out = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for v in pool_map(boom, range(6), num_workers=2):
            out.append(v)
    assert out == [0, 1, 2]

    # early consumer exit doesn't hang
    gen = pool_map(slow_sq, range(100), num_workers=4)
    assert next(gen) == 0
    gen.close()


def test_dataset_decode_pool_matches_serial(data_dir):
    root, jpath = data_dir
    cfg = tiny_test_config()
    tok = ByteTokenizer()
    kw = dict(tokenizer=tok, cfg=cfg.chat, root=str(root), num_segments=2,
              gating_pattern=tok.gating_pattern())
    serial = list(PreferencePairDataset(jpath, **kw))
    pooled = list(PreferencePairDataset(jpath, decode_workers=3, **kw))
    assert len(serial) == len(pooled)
    for a, b in zip(serial, pooled):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_eval_cli_byte_tokenizer_end_to_end_hermetic(tmp_path, capsys):
    """The eval CLI scorer path offline: export a tiny checkpoint dir
    (save_reward_checkpoint_dir) -> `--benchmark overall --byte-tokenizer`
    over sample data -> preference metrics JSON on stdout."""
    import subprocess
    import sys

    import jax

    from mjvideo_tpu.models.reward import init_reward_params
    from mjvideo_tpu.utils.export import save_reward_checkpoint_dir

    sample = tmp_path / "data"
    r = subprocess.run(
        [sys.executable, "examples/make_sample_data.py", "--out",
         str(sample), "--pairs", "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr

    cfg = tiny_test_config()
    params = init_reward_params(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    save_reward_checkpoint_dir(str(ckpt), params, cfg)

    from mjvideo_tpu.eval import cli as ecli

    ecli.main([
        "--benchmark", "overall", "--byte-tokenizer", "--fp32",
        "--data-json", str(sample / "pairs.json"),
        "--video-root", str(sample / "videos"),
        "--model-path", str(ckpt),
        "--num-segments", "2",
        "--results", str(tmp_path / "res.jsonl"),
    ])
    import json as _json

    out = capsys.readouterr().out
    res = _json.loads(out[out.index("{"):])
    assert "accuracy" in res or "count" in res, res
    assert (tmp_path / "res.jsonl").exists()

    # the serving-quantization flag end-to-end through the same path
    # (weight-only mode: closest numerics, exercises the QuantKernel
    # plumbing through decode -> scorer -> metrics)
    ecli.main([
        "--benchmark", "overall", "--byte-tokenizer", "--fp32",
        "--quant", "int8-wo",
        "--data-json", str(sample / "pairs.json"),
        "--video-root", str(sample / "videos"),
        "--model-path", str(ckpt),
        "--num-segments", "2",
        "--results", str(tmp_path / "res_q.jsonl"),
    ])
    out_q = capsys.readouterr().out
    res_q = _json.loads(out_q[out_q.index("{"):])
    assert "accuracy" in res_q or "count" in res_q, res_q
    assert (tmp_path / "res_q.jsonl").exists()


def test_train_cli_stage_defaults_match_reference():
    """Unset hyperparameters resolve to the REFERENCE stage scripts'
    defaults (criteria/aspect/overall_train.py argparse blocks); explicit
    flags win."""
    from mjvideo_tpu.train.cli import REFERENCE_STAGE_DEFAULTS, build_parser

    assert REFERENCE_STAGE_DEFAULTS[1]["warmup_steps"] == 25
    assert REFERENCE_STAGE_DEFAULTS[2]["warmup_steps"] == 50
    assert REFERENCE_STAGE_DEFAULTS[3]["warmup_steps"] == 5
    assert REFERENCE_STAGE_DEFAULTS[1]["gradient_accumulation_steps"] == 8
    assert REFERENCE_STAGE_DEFAULTS[3]["gradient_accumulation_steps"] == 4
    for st in (1, 2, 3):
        d = REFERENCE_STAGE_DEFAULTS[st]
        assert d["learning_rate"] == 3e-5
        assert d["weight_decay"] == 0.1
        assert d["schedule"] == "cosine"
        assert d["num_epochs"] == 3

    a = build_parser().parse_args(["--stage", "1", "--train-json", "x"])
    for k in REFERENCE_STAGE_DEFAULTS[1]:
        assert getattr(a, k) is None  # unset -> resolved in main()
    a = build_parser().parse_args(["--stage", "1", "--train-json", "x",
                                   "--learning-rate", "1e-6"])
    assert a.learning_rate == 1e-6


def test_eval_cli_judge_end_to_end_hermetic(tmp_path, capsys):
    """The full judge CLI path offline: export a tiny chat checkpoint ->
    `--judge internvl-chat --byte-tokenizer --benchmark overall` over
    sample data -> metrics JSON.  Exercises prefix caching + kv-quant
    through the CLI (both exactness-guarded paths)."""
    import json
    import subprocess
    import sys

    import jax

    from mjvideo_tpu.configs import reward_config_to_hf
    from mjvideo_tpu.models.internvl import init_chat_params
    from mjvideo_tpu.utils.export import export_chat, save_safetensors

    sample = tmp_path / "data"
    r = subprocess.run(
        [sys.executable, "examples/make_sample_data.py", "--out",
         str(sample), "--pairs", "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr

    cfg = tiny_test_config()
    params = init_chat_params(jax.random.PRNGKey(0), cfg.chat,
                              with_lm_head=True)
    ckpt = tmp_path / "judge_ckpt"
    ckpt.mkdir()
    save_safetensors(export_chat(params, cfg.chat),
                     str(ckpt / "model.safetensors"))
    with open(ckpt / "config.json", "w") as f:
        json.dump(reward_config_to_hf(cfg), f)

    from mjvideo_tpu.eval import cli as ecli

    ecli.main([
        "--benchmark", "overall", "--byte-tokenizer",
        "--judge", "internvl-chat", "--judge-model", str(ckpt),
        "--kv-quant",
        "--data-json", str(sample / "pairs.json"),
        "--video-root", str(sample / "videos"),
        "--num-segments", "2",
        "--results", str(tmp_path / "res.jsonl"),
    ])
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    assert "accuracy" in res or "count" in res, res
    assert (tmp_path / "res.jsonl").exists()


def test_reproduce_script_hermetic_dry_run(tmp_path):
    """launch/reproduce.sh --hermetic: the README-leaderboard reproduction
    harness must run its full command plumbing end-to-end on synthetic
    data + tiny random checkpoints (VERDICT r3 next-7) — so the documented
    table mapping cannot rot."""
    import os
    import subprocess

    env = dict(os.environ)
    env["MJV_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        ["bash", "launch/reproduce.sh", "--hermetic"],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "HERMETIC_OK" in r.stdout
    # every table family produced a metrics JSON — including the
    # fine-grained rubric loop (34 prompts/pair through judge_pair with
    # the prefix cache on, VERDICT r4 item 7)
    for part in ("aspects_mjvideo", "overall_mjvideo", "safesora_mjvideo",
                 "overall_internvl", "fine_grained_internvl"):
        assert f"== {part}" in r.stdout, r.stdout[-3000:]
