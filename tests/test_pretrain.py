"""BEST-RQ SSL pretraining tests (train/pretrain.py — the reference ships
SSL checkpoints but no pretraining code, ``gigaam/model.py:16-83``)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gigaam_tpu
from gigaam_tpu.audio import save_wav
from gigaam_tpu.config import EncoderConfig, FeaturesConfig, ModelConfig
from gigaam_tpu.data import write_manifest
from gigaam_tpu.models.model import GigaAM
from gigaam_tpu.train.pretrain import (PretrainConfig, SSLPretrainer,
                                       main as pretrain_main)


def tiny_ssl_cfg():
    enc = EncoderConfig(feat_in=64, n_layers=2, d_model=32, n_heads=4,
                        ff_expansion_factor=2, conv_kernel_size=7,
                        pos_emb_max_len=128)
    return ModelConfig(model_name="tiny_ssl", model_class="ssl",
                       preprocessor=FeaturesConfig(), encoder=enc,
                       head=None, decoding=None)


def tiny_pc(**kw):
    base = dict(lr=2e-3, total_steps=30, precision="fp32",
                codebook_size=32, codebook_dim=8, mask_prob=0.2,
                mask_span=3)
    base.update(kw)
    return PretrainConfig(**base)


def synth_batch(b=2, seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    # tonal content so there is structure to predict
    t = np.arange(n) / 16000.0
    wavs = np.stack([
        (0.3 * np.sin(2 * np.pi * (200 + 80 * i + 50 * np.sin(3 * t)) * t)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
        for i in range(b)
    ])
    lens = np.full((b,), n, np.int32)
    return wavs, lens


def test_targets_deterministic_and_in_range():
    model = GigaAM(tiny_ssl_cfg(), seed=0, compute_dtype=jnp.float32)
    pt = SSLPretrainer(model, tiny_pc())
    wavs, lens = synth_batch()
    feats, feat_lens = pt.frontend.forward(jnp.asarray(wavs),
                                           jnp.asarray(lens))
    feats = jnp.transpose(feats, (0, 2, 1)).astype(jnp.float32)
    t_sub = pt._static_t_sub(feats.shape[1])
    t1, n_codes = pt._targets(pt.params, feats, feat_lens, t_sub)
    t2, _ = pt._targets(pt.params, feats, feat_lens, t_sub)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert t1.shape == (2, t_sub)
    assert 0 < n_codes <= t_sub
    ids = np.asarray(t1)
    assert ids.min() >= 0 and ids.max() < pt.pc.codebook_size
    # structure check: the codes must not collapse to a single id
    assert len(np.unique(ids)) > 3


def test_mask_spans_and_validity():
    model = GigaAM(tiny_ssl_cfg(), seed=0, compute_dtype=jnp.float32)
    pt = SSLPretrainer(model, tiny_pc(mask_prob=0.1, mask_span=4))
    sub_lens = jnp.asarray([50, 20], jnp.int32)
    mask = np.asarray(pt._sample_mask(jax.random.PRNGKey(0), 2, 50,
                                      sub_lens))
    assert mask.shape == (2, 50)
    # no mask beyond each sample's valid length
    assert not mask[1, 20:].any()
    # coverage in a plausible band for p=0.1, span=4 (expected ~1-0.9^4)
    rate = mask[0].mean()
    assert 0.05 < rate < 0.75
    # spans: a masked region must contain a run >= 1 and runs of length
    # >= span exist with high probability at p=0.1 over 50 frames
    assert mask.any()


def test_quantizer_frozen_and_loss_improves():
    model = GigaAM(tiny_ssl_cfg(), seed=0, compute_dtype=jnp.float32)
    pt = SSLPretrainer(model, tiny_pc(lr=5e-3, total_steps=80))
    wavs, lens = synth_batch()
    batch = (wavs, lens)
    q0 = jax.tree.map(np.asarray, pt.params["quantizer"])
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(80):
        key, sub = jax.random.split(key)
        m = pt.train_step(batch, sub)
        losses.append(float(m["loss"]))
    q1 = jax.tree.map(np.asarray, pt.params["quantizer"])
    jax.tree.map(np.testing.assert_array_equal, q0, q1)
    # overfitting two fixed utterances: big early/late improvement
    assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5]), losses
    # eval reports loss + masked accuracy
    vl, va = pt.eval_step(batch)
    assert np.isfinite(vl) and 0.0 <= va <= 1.0


def test_eval_is_deterministic():
    model = GigaAM(tiny_ssl_cfg(), seed=0, compute_dtype=jnp.float32)
    pt = SSLPretrainer(model, tiny_pc())
    batch = synth_batch(seed=3)
    assert pt.eval_step(batch) == pt.eval_step(batch)


def test_sharded_matches_single_device():
    """DPxTP pretrain step == single-device step (same rng, same batch)."""
    from gigaam_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    model_a = GigaAM(tiny_ssl_cfg(), seed=0, compute_dtype=jnp.float32)
    model_b = GigaAM(tiny_ssl_cfg(), seed=0, compute_dtype=jnp.float32)
    pc = tiny_pc(total_steps=4)
    pt_a = SSLPretrainer(model_a, pc)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    pt_b = SSLPretrainer(model_b, pc, mesh=mesh)
    batch = synth_batch(b=4, seed=5)
    ma = pt_a.train_step(batch, jax.random.PRNGKey(7))
    mb = pt_b.train_step(batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-4)
    for picker in (
        lambda p: p["encoder"]["layers"]["feed_forward1"]["linear1"]["w"],
        lambda p: p["ssl_head"]["w"],
    ):
        np.testing.assert_allclose(np.asarray(picker(pt_a.params)),
                                   np.asarray(picker(pt_b.params)),
                                   atol=2e-5)
    # second step keeps running (collectives in the loop work repeatedly)
    mb2 = pt_b.train_step(batch, jax.random.PRNGKey(8))
    assert np.isfinite(float(mb2["loss"]))


def test_pretrain_cli_and_resume(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        n = 16000 + 1600 * i
        wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
        path = str(tmp_path / f"utt{i}.wav")
        save_wav(path, wav)
        rows.append((path, n / 16000.0, ""))  # no transcripts needed
    manifest = str(tmp_path / "manifest.tsv")
    write_manifest(manifest, rows)

    model = GigaAM(tiny_ssl_cfg(), seed=0, compute_dtype=jnp.float32)
    art = str(tmp_path / "tiny_ssl")
    gigaam_tpu.save_model(model, art)

    save_dir = str(tmp_path / "exp")
    args = [
        "--model_name", art, "--init", "weights",
        "--train_manifest", manifest, "--val_manifest", manifest,
        "--batch_size", "2", "--max_steps", "3", "--lr", "1e-3",
        "--precision", "fp32", "--save_dir", save_dir,
        "--log_every_n_steps", "1", "--save_top_k", "1",
        "--codebook_size", "32", "--codebook_dim", "8",
        "--mask_prob", "0.2", "--mask_span", "3",
    ]
    pretrain_main(args)

    assert os.path.exists(os.path.join(save_dir, "final.npz"))
    with open(os.path.join(save_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    kinds = {r["kind"] for r in recs}
    assert {"train", "val"} <= kinds
    ckpts = [f for f in os.listdir(save_dir) if f.endswith(".ckpt")]
    assert len(ckpts) == 1

    # resume continues the step counter
    args_resume = args + ["--resume_from_checkpoint",
                          os.path.join(save_dir, ckpts[0]),
                          "--max_steps", "5"]
    pretrain_main(args_resume)
    with open(os.path.join(save_dir, "metrics.jsonl")) as f:
        steps = [json.loads(line)["step"] for line in f
                 if json.loads(line)["kind"] == "train"]
    assert max(steps) >= 5

    # the pretrained encoder loads back as a normal SSL model
    m2 = gigaam_tpu.load_model(os.path.join(save_dir, "final"))
    emb, emb_len = m2.embed_audio(rows[0][0])
    assert np.isfinite(np.asarray(emb)).all()


# -- SSL -> ASR handoff ------------------------------------------------------


def _tonal_dataset(tmp_path, texts):
    """Synthetic tonal wavs (structure for BEST-RQ to learn) + manifest."""
    rng = np.random.default_rng(0)
    rows = []
    for i, text in enumerate(texts):
        n = 16000 + 1600 * i
        t = np.arange(n) / 16000.0
        wav = (0.3 * np.sin(2 * np.pi * (220 + 60 * i
                                         + 40 * np.sin(3 * t)) * t)
               + 0.02 * rng.standard_normal(n)).astype(np.float32)
        path = str(tmp_path / f"utt{i}.wav")
        save_wav(path, wav)
        rows.append((path, n / 16000.0, text))
    manifest = str(tmp_path / "manifest.tsv")
    write_manifest(manifest, rows)
    return manifest


def _final_val_loss(save_dir):
    with open(os.path.join(save_dir, "metrics.jsonl")) as f:
        vals = [json.loads(line) for line in f]
    vals = [r for r in vals if r["kind"] == "val"]
    assert vals, "no val records"
    return vals[-1]["loss"]


def test_ssl_to_asr_handoff(tmp_path):
    """The full BEST-RQ -> CTC pipeline in one test: pretrain an SSL
    encoder (CLI), fine-tune a CTC model from it via
    ``--init_encoder_from`` (CLI), and require a better final val loss
    than the identical fine-tune from random init.

    This is the reference's whole SSL story — ``v*_ssl`` checkpoints are
    fine-tuned into the ASR family (``gigaam/__init__.py:28-41``)."""
    from gigaam_tpu.train.train import main as train_main
    from test_training import tiny_cfg
    from gigaam_tpu.models.model import GigaAMASR

    texts = ["аб ва", "ба гд", "дг аб", "вг ба"]
    manifest = _tonal_dataset(tmp_path, texts)

    # 1) pretrain the SSL encoder on the same audio
    ssl_model = GigaAM(tiny_ssl_cfg(), seed=1, compute_dtype=jnp.float32)
    ssl_art = str(tmp_path / "tiny_ssl")
    gigaam_tpu.save_model(ssl_model, ssl_art)
    pre_dir = str(tmp_path / "pre")
    # batch 4 = the whole set per step: converges to mask_acc ~1.0 in 150
    # steps (~30 s CPU); an *under*-trained SSL encoder does not reliably
    # beat random init at this toy scale, a converged one does
    pretrain_main([
        "--model_name", ssl_art, "--init", "weights",
        "--train_manifest", manifest, "--val_manifest", manifest,
        "--batch_size", "4", "--max_steps", "150", "--lr", "5e-3",
        "--precision", "fp32", "--save_dir", pre_dir,
        "--log_every_n_steps", "50", "--codebook_size", "32",
        "--codebook_dim", "8", "--mask_prob", "0.3", "--mask_span", "3",
    ])
    pretrained = os.path.join(pre_dir, "final")
    assert os.path.exists(pretrained + ".npz")
    with open(os.path.join(pre_dir, "metrics.jsonl")) as f:
        accs = [json.loads(line) for line in f]
    final_acc = [r for r in accs if r["kind"] == "val"][-1]["mask_acc"]
    assert final_acc > 0.8, f"pretraining failed to converge ({final_acc})"

    # 2) fine-tune CTC: identical runs, one from the pretrained encoder
    ctc_model = GigaAMASR(tiny_cfg("ctc"), seed=0,
                          compute_dtype=jnp.float32)
    ctc_art = str(tmp_path / "tiny_ctc")
    gigaam_tpu.save_model(ctc_model, ctc_art)

    common = [
        "--model_name", ctc_art, "--train_manifest", manifest,
        "--val_manifest", manifest, "--batch_size", "2",
        "--max_steps", "30", "--lr", "3e-3", "--precision", "fp32",
        "--log_every_n_steps", "15", "--save_top_k", "1",
    ]
    dir_pre = str(tmp_path / "ft_pre")
    dir_rand = str(tmp_path / "ft_rand")
    train_main(common + ["--save_dir", dir_pre,
                         "--init_encoder_from", pretrained])
    train_main(common + ["--save_dir", dir_rand])

    loss_pre = _final_val_loss(dir_pre)
    loss_rand = _final_val_loss(dir_rand)
    assert np.isfinite(loss_pre) and np.isfinite(loss_rand)
    assert loss_pre < loss_rand, (
        f"pretrained-init fine-tune ({loss_pre:.4f}) should beat "
        f"random-init ({loss_rand:.4f}) on the overfit task")


def test_init_encoder_from_rejects_mismatched_architecture(tmp_path):
    from gigaam_tpu.config import EncoderConfig, FeaturesConfig, ModelConfig
    from gigaam_tpu.models.model import init_encoder_from_artifact
    from test_training import tiny_cfg
    from gigaam_tpu.models.model import GigaAMASR

    wide = ModelConfig(
        model_name="wide_ssl", model_class="ssl",
        preprocessor=FeaturesConfig(),
        encoder=EncoderConfig(feat_in=64, n_layers=2, d_model=64,
                              n_heads=4, ff_expansion_factor=2,
                              conv_kernel_size=7, pos_emb_max_len=128),
        head=None, decoding=None)
    src = GigaAM(wide, seed=0, compute_dtype=jnp.float32)
    art = str(tmp_path / "wide")
    gigaam_tpu.save_model(src, art)

    asr = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="architecture mismatch"):
        init_encoder_from_artifact(asr, art)


def test_init_encoder_from_ignores_runtime_only_config_deltas(tmp_path):
    """Runtime/training knobs (remat, pos table floor, kernel choice) do not
    shape the parameter tree — an SSL artifact differing only in those must
    graft, not raise 'architecture mismatch'."""
    import dataclasses

    from gigaam_tpu.models.model import GigaAMASR, init_encoder_from_artifact
    from test_training import tiny_cfg

    cfg = tiny_ssl_cfg()
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(
            cfg.encoder, flash_attn=not cfg.encoder.flash_attn,
            activation_checkpointing=not cfg.encoder.activation_checkpointing,
            remat_policy="dots", pos_emb_max_len=999))
    src = GigaAM(cfg, seed=5, compute_dtype=jnp.float32)
    art = str(tmp_path / "src_rt")
    gigaam_tpu.save_model(src, art)

    asr = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    init_encoder_from_artifact(asr, art)   # must not raise
    got = asr.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"]
    want = src.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_init_encoder_from_grafts_exact_weights(tmp_path):
    """The grafted encoder must be bitwise the artifact's encoder (fp32)."""
    from gigaam_tpu.models.model import GigaAMASR, init_encoder_from_artifact
    from test_training import tiny_cfg

    src = GigaAM(tiny_ssl_cfg(), seed=5, compute_dtype=jnp.float32)
    art = str(tmp_path / "src")
    gigaam_tpu.save_model(src, art)

    asr = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    before = np.asarray(
        asr.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"])
    init_encoder_from_artifact(asr, art)
    after = asr.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"]
    want = src.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"]
    assert not np.array_equal(before, np.asarray(after))
    np.testing.assert_array_equal(np.asarray(after), np.asarray(want))
