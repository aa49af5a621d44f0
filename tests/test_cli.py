"""End-to-end CLI tests (mirror of reference ``tests/test_training.py``):
build a tiny synthetic dataset + manifest, run the train CLI for a few
steps, resume from its checkpoint, then run the eval CLI on the result."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

import gigaam_tpu
from gigaam_tpu.audio import save_wav
from gigaam_tpu.data import AudioDataset, write_manifest
from gigaam_tpu.models.model import GigaAMASR
from gigaam_tpu.train import eval as eval_cli
from gigaam_tpu.train import train as train_cli

from test_training import tiny_cfg  # reuse tiny model configs


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    rows = []
    texts = ["аб ва", "ба гд", "дг аб", "вг ба"]
    for i, text in enumerate(texts):
        n = 16000 + 1600 * i
        wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
        path = str(d / f"utt{i}.wav")
        save_wav(path, wav)
        rows.append((path, n / 16000.0, text))
    manifest = str(d / "manifest.tsv")
    write_manifest(manifest, rows)
    return d, manifest


@pytest.fixture(scope="module")
def tiny_model_artifact(tmp_path_factory, dataset_dir):
    d = tmp_path_factory.mktemp("model")
    model = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    path = str(d / "tiny_ctc")
    gigaam_tpu.save_model(model, path)
    return path


def test_audio_dataset(dataset_dir):
    d, manifest = dataset_dir
    model = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    ds = AudioDataset(manifest, tokenizer=model.tokenizer, return_tokens=True)
    assert len(ds) == 4
    batches = list(ds.batches(2, sort_by_duration=True))
    assert len(batches) == 2
    wavs, lens, toks, tlens = batches[0]
    assert wavs.shape[1] % 16000 == 0          # 1 s audio buckets
    assert toks.shape[1] % 16 == 0             # token buckets
    assert (lens > 0).all() and (tlens > 0).all()
    # duration filter
    ds2 = AudioDataset(manifest, tokenizer=model.tokenizer,
                       return_tokens=True, min_duration=1.05)
    assert len(ds2) == 3


def test_train_cli_and_resume(dataset_dir, tiny_model_artifact, tmp_path):
    _, manifest = dataset_dir
    save_dir = str(tmp_path / "exp")
    args = [
        "--model_name", tiny_model_artifact,
        "--train_manifest", manifest,
        "--val_manifest", manifest,
        "--batch_size", "2",
        "--max_steps", "4",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--save_dir", save_dir,
        "--log_every_n_steps", "1",
        "--train_wer_every_n_steps", "2",
        "--save_top_k", "2",
    ]
    train_cli.main(args)

    # metrics stream + final artifact + top-k checkpoint exist
    metrics = [json.loads(l) for l in
               open(os.path.join(save_dir, "metrics.jsonl"))]
    assert any(m["kind"] == "train" for m in metrics)
    assert any(m["kind"] == "val" for m in metrics)
    # sampled train WER (reference module.py:200-213)
    assert any(m["kind"] == "train_wer" and 0 <= m["wer"] for m in metrics)
    assert os.path.exists(os.path.join(save_dir, "final.npz"))
    ckpts = [f for f in os.listdir(save_dir) if f.endswith(".ckpt")]
    assert 1 <= len(ckpts) <= 2

    # resume continues from saved step
    args_resume = args[:-2] + [
        "--save_top_k", "1",
        "--max_steps", "6",
        "--resume_from_checkpoint", os.path.join(save_dir, ckpts[0]),
    ]
    train_cli.main(args_resume)


def test_eval_cli(dataset_dir, tiny_model_artifact, tmp_path, capsys):
    _, manifest = dataset_dir
    out = str(tmp_path / "preds.jsonl")
    eval_cli.main([
        "--model_name", tiny_model_artifact,
        "--manifest", manifest,
        "--batch_size", "2",
        "--out", out,
    ])
    captured = capsys.readouterr().out
    assert "WER (e2e)" in captured and "WER (raw)" in captured
    preds = [json.loads(l) for l in open(out)]
    assert len(preds) == 4
    assert all("prediction" in p and "reference" in p for p in preds)
    assert preds[0]["reference"] == "аб ва"


def test_eval_cli_with_lm(dataset_dir, tiny_model_artifact, tmp_path,
                          capsys):
    """--beam_size + --lm shallow fusion through the eval CLI."""
    from gigaam_tpu.decode.lm import train_lm_from_texts

    _, manifest = dataset_dir
    tok = gigaam_tpu.load_model(tiny_model_artifact).tokenizer
    lm = train_lm_from_texts(["аб ва", "ба гд"], tok, order=2)
    lm_path = str(tmp_path / "lm.npz")
    lm.save(lm_path)
    out = str(tmp_path / "preds_lm.jsonl")
    eval_cli.main([
        "--model_name", tiny_model_artifact,
        "--manifest", manifest,
        "--batch_size", "2",
        "--beam_size", "4",
        "--lm", lm_path,
        "--lm_weight", "0.3",
        "--out", out,
    ])
    assert "WER (e2e)" in capsys.readouterr().out
    assert len([json.loads(l) for l in open(out)]) == 4


def test_grad_accumulation_equivalence():
    """k micro-batches with accumulation ~= 1 full batch step."""
    import jax

    from gigaam_tpu.train.finetune import FineTuner, TrainConfig
    from test_training import synth_batch

    model_a = GigaAMASR(tiny_cfg("ctc"), seed=7, compute_dtype=jnp.float32)
    model_b = GigaAMASR(tiny_cfg("ctc"), seed=7, compute_dtype=jnp.float32)
    tc_full = TrainConfig(lr=1e-3, total_steps=4, precision="fp32",
                          grad_clip=1e9)
    tc_accum = TrainConfig(lr=1e-3, total_steps=4, precision="fp32",
                           grad_clip=1e9, accumulate_grad_batches=2)
    ft_full = FineTuner(model_a, tc_full)
    ft_accum = FineTuner(model_b, tc_accum)

    full = synth_batch(b=4, seed=9)
    half1 = tuple(x[:2] for x in full)
    half2 = tuple(x[2:] for x in full)

    ft_full.train_step(full, jax.random.PRNGKey(0))
    ft_accum.train_step(half1, jax.random.PRNGKey(0))
    ft_accum.train_step(half2, jax.random.PRNGKey(0))

    wa = np.asarray(ft_full.params["head"]["proj"]["w"])
    wb = np.asarray(ft_accum.params["head"]["proj"]["w"])
    np.testing.assert_allclose(wa, wb, atol=1e-5)


def test_convert_checkpoint_tool(tmp_path):
    """tools/convert_checkpoint.py converts a reference .ckpt into an
    artifact that load_model can use."""
    import runpy
    import sys

    import torch

    import gigaam_tpu
    from test_checkpoint import _ref_cfg_dict, _ref_state_dict

    ckpt = str(tmp_path / "v3_ctc.ckpt")
    torch.save({"cfg": _ref_cfg_dict("ctc"),
                "state_dict": _ref_state_dict("ctc")}, ckpt)
    out = str(tmp_path / "converted")
    argv = sys.argv
    try:
        sys.argv = ["convert_checkpoint.py", ckpt, "--out", out,
                    "--model-name", "v3_ctc"]
        runpy.run_path("tools/convert_checkpoint.py", run_name="__main__")
    finally:
        sys.argv = argv
    model = gigaam_tpu.load_model(out)
    wav = (0.1 * __import__("numpy").random.default_rng(0)
           .standard_normal(16000)).astype("float32")
    text, _ = model._decode_batch([wav], word_timestamps=False)[0]
    assert isinstance(text, str)


def test_experiment_name_derivation():
    """--exp_name auto derives a stable hyperparameter-encoded run name,
    skipping defaults (reference build_exp_name,
    train_utils/utils.py:168-218)."""
    from gigaam_tpu.train.train import experiment_name, parse_args

    base = ["--model_name", "/x/v3_ctc.npz", "--train_manifest", "t.tsv",
            "--val_manifest", "v.tsv"]
    args = parse_args(base)
    assert experiment_name(args) == "v3ctc_lr0.0001_wd0.01_b16_1ep"

    args = parse_args(base + [
        "--lr", "3e-4", "--batch_size", "8", "--max_steps", "100",
        "--accumulate_grad_batches", "4", "--freeze_encoder",
        "--activation_checkpointing", "--precision", "fp32",
        "--seed", "7", "--spec_augment", "--freq_masks", "3",
        "--model_parallel", "2"])
    name = experiment_name(args)
    assert name == ("v3ctc_lr0.0003_wd0.01_b8_agb4_100steps_frenc_acckpt_"
                    "pr-fp32_seed7_specaug_fm3_tp2")
    # weird model paths sanitize
    args = parse_args(["--model_name", "weird name!.ckpt",
                       "--train_manifest", "t", "--val_manifest", "v"])
    assert " " not in experiment_name(args)
    assert "!" not in experiment_name(args)


def test_manifest_roundtrip_escaping(tmp_path):
    """Fields with tabs/newlines/quotes must survive the TSV round-trip
    (write_manifest and the loader share one csv dialect)."""
    rows = [("/a/b.wav", 1.5, "text with\ttab"),
            ("/a/c.wav", 2.0, 'starts "quoted" and\nhas a newline'),
            ("/a/d.wav", 0.5, "plain")]
    path = str(tmp_path / "m.tsv")
    write_manifest(path, rows)
    ds = AudioDataset(path, raw_text=True)
    assert len(ds) == 3
    # normalize_text(raw) lowercases/strips; compare loosely on content
    texts = {s.text for s in ds.samples}
    assert any("tab" in t for t in texts)
    assert any("newline" in t for t in texts)
    durs = sorted(s.duration for s in ds.samples)
    assert durs == [0.5, 1.5, 2.0]


def test_sorted_drop_last_rotates_remainder(dataset_dir):
    """sort_by_duration + shuffle + drop_last must not deterministically
    exclude the longest samples: across seeds, every sample appears."""
    _, manifest = dataset_dir
    ds = AudioDataset(manifest)  # 4 samples; batch 3 -> remainder 1
    seen_lens = set()
    for seed in range(8):
        for wavs, lens in ds.batches(3, shuffle=True, seed=seed,
                                     sort_by_duration=True, drop_last=True):
            assert len(lens) == 3
            seen_lens.update(int(x) for x in lens)
    # all 4 distinct durations must show up across epochs
    assert len(seen_lens) == 4, seen_lens
