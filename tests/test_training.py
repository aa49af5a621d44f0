"""Training loop tests: loss decreases (CTC & RNNT overfit), BN buffers
update, encoder freeze, and a sharded DPxTP step on the 8-device CPU mesh
matching single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigaam_tpu.config import (
    CTCHeadConfig,
    DecodingConfig,
    EncoderConfig,
    FeaturesConfig,
    ModelConfig,
    RNNTDecoderConfig,
    RNNTHeadConfig,
    RNNTJointConfig,
)
from gigaam_tpu.models.model import GigaAMASR
from gigaam_tpu.parallel.mesh import make_mesh
from gigaam_tpu.train.finetune import FineTuner, TrainConfig

VOCAB = [" ", "а", "б", "в", "г", "д"]


def tiny_cfg(kind="ctc"):
    enc = EncoderConfig(feat_in=64, n_layers=2, d_model=32, n_heads=4,
                        ff_expansion_factor=2, conv_kernel_size=7,
                        pos_emb_max_len=128)
    v = len(VOCAB) + 1
    if kind == "ctc":
        head = CTCHeadConfig(feat_in=32, num_classes=v)
        dec = DecodingConfig(kind="ctc_greedy", vocabulary=list(VOCAB))
    else:
        head = RNNTHeadConfig(
            decoder=RNNTDecoderConfig(pred_hidden=16, pred_rnn_layers=1,
                                      num_classes=v),
            joint=RNNTJointConfig(enc_hidden=32, pred_hidden=16,
                                  joint_hidden=16, num_classes=v))
        dec = DecodingConfig(kind="rnnt_greedy", vocabulary=list(VOCAB))
    return ModelConfig(model_name=f"tiny_{kind}", model_class="asr",
                       preprocessor=FeaturesConfig(), encoder=enc,
                       head=head, decoding=dec)


def synth_batch(b=2, seconds=1.0, u=4, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    wavs = (0.1 * rng.standard_normal((b, n))).astype(np.float32)
    wav_lens = np.full((b,), n, dtype=np.int32)
    tokens = rng.integers(1, len(VOCAB), (b, u)).astype(np.int32)
    tok_lens = np.full((b,), u, dtype=np.int32)
    return wavs, wav_lens, tokens, tok_lens


@pytest.mark.parametrize("kind", ["ctc", "rnnt"])
def test_overfit_tiny_batch(kind):
    model = GigaAMASR(tiny_cfg(kind), seed=0, compute_dtype=jnp.float32)
    tc = TrainConfig(lr=3e-3, total_steps=30, precision="fp32",
                     spec_augment=False)
    ft = FineTuner(model, tc)
    batch = synth_batch()
    losses = []
    for i in range(30):
        m = ft.train_step(batch, jax.random.PRNGKey(i))
        losses.append(m["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no overfit: {losses[0]} -> {losses[-1]}"


def test_bn_buffers_update_and_freeze():
    model = GigaAMASR(tiny_cfg("ctc"), seed=1, compute_dtype=jnp.float32)
    tc = TrainConfig(lr=1e-3, total_steps=10, precision="fp32")
    ft = FineTuner(model, tc)
    bn0 = np.asarray(
        ft.params["encoder"]["layers"]["conv"]["batch_norm"]["mean"]).copy()
    ft.train_step(synth_batch(), jax.random.PRNGKey(0))
    bn1 = np.asarray(
        ft.params["encoder"]["layers"]["conv"]["batch_norm"]["mean"])
    assert not np.allclose(bn0, bn1), "BN running mean did not update"

    # frozen encoder: weights unchanged, head changes
    model2 = GigaAMASR(tiny_cfg("ctc"), seed=1, compute_dtype=jnp.float32)
    ft2 = FineTuner(model2, TrainConfig(lr=1e-3, total_steps=10,
                                        precision="fp32",
                                        freeze_encoder=True))
    enc0 = np.asarray(
        ft2.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"]).copy()
    head0 = np.asarray(ft2.params["head"]["proj"]["w"]).copy()
    bn_frozen0 = np.asarray(
        ft2.params["encoder"]["layers"]["conv"]["batch_norm"]["mean"]).copy()
    # two steps: step 0 sits at lr=0 on the warmup ramp
    ft2.train_step(synth_batch(), jax.random.PRNGKey(0))
    ft2.train_step(synth_batch(), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        enc0,
        np.asarray(
            ft2.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"]))
    np.testing.assert_array_equal(
        bn_frozen0,
        np.asarray(
            ft2.params["encoder"]["layers"]["conv"]["batch_norm"]["mean"]))
    assert not np.allclose(
        head0, np.asarray(ft2.params["head"]["proj"]["w"]))


def test_spec_augment_changes_loss_not_eval():
    model = GigaAMASR(tiny_cfg("ctc"), seed=2, compute_dtype=jnp.float32)
    tc = TrainConfig(lr=0.0, total_steps=10, precision="fp32",
                     spec_augment=True, freq_masks=2, freq_width=20,
                     time_masks=2, time_width=20)
    ft = FineTuner(model, tc)
    batch = synth_batch(seed=3)
    m1 = ft.train_step(batch, jax.random.PRNGKey(1))
    m2 = ft.train_step(batch, jax.random.PRNGKey(2))
    # different masks -> different losses (lr=0 so params static)
    assert m1["loss"] != m2["loss"]
    # eval path has no augmentation: deterministic
    l1, _ = ft.eval_step(batch)
    l2, _ = ft.eval_step(batch)
    assert l1 == l2


def test_sharded_train_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=4, model=2)

    model_a = GigaAMASR(tiny_cfg("ctc"), seed=4, compute_dtype=jnp.float32)
    model_b = GigaAMASR(tiny_cfg("ctc"), seed=4, compute_dtype=jnp.float32)
    tc = TrainConfig(lr=1e-3, total_steps=10, precision="fp32")

    ft_single = FineTuner(model_a, tc)
    ft_sharded = FineTuner(model_b, tc, mesh=mesh)

    batch = synth_batch(b=4, seed=5)
    m_s = ft_single.train_step(batch, jax.random.PRNGKey(0))
    m_m = ft_sharded.train_step(batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(m_s["loss"], m_m["loss"], rtol=1e-4)

    w_s = np.asarray(
        ft_single.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"])
    w_m = np.asarray(
        ft_sharded.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"])
    np.testing.assert_allclose(w_s, w_m, atol=2e-5)

    # second step keeps running (collectives in the loop work repeatedly)
    m_m2 = ft_sharded.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(m_m2["loss"])


def test_eval_wer_helpers():
    model = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    ft = FineTuner(model, TrainConfig(total_steps=10, precision="fp32"))
    batch = synth_batch()
    loss, hyps = ft.eval_step(batch)
    assert len(hyps) == 2 and all(isinstance(h, str) for h in hyps)
    errs, words = ft.batch_wer(hyps, batch[2], batch[3])
    assert errs >= 0 and words >= 2


def test_prefetch_batches_order_and_errors():
    """prefetch_batches preserves order and re-raises producer errors."""
    from gigaam_tpu.data import prefetch_batches

    assert list(prefetch_batches(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch_batches(boom())
    assert next(it) == 1
    try:
        next(it)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "producer failed" in str(e)


def test_sharded_train_step_relpos_matches_single_device():
    """DPxTP train step for the rel_pos (v1/v2) attention generation —
    exercises the linear_pos / pos_bias TP shardings the rotary test
    cannot reach."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=4, model=2)

    cfg_a = tiny_cfg("ctc")
    cfg_a.encoder.self_attention_model = "rel_pos"
    cfg_b = tiny_cfg("ctc")
    cfg_b.encoder.self_attention_model = "rel_pos"
    model_a = GigaAMASR(cfg_a, seed=6, compute_dtype=jnp.float32)
    model_b = GigaAMASR(cfg_b, seed=6, compute_dtype=jnp.float32)
    tc = TrainConfig(lr=1e-3, total_steps=10, precision="fp32")

    ft_single = FineTuner(model_a, tc)
    ft_sharded = FineTuner(model_b, tc, mesh=mesh)

    batch = synth_batch(b=4, seed=7)
    m_s = ft_single.train_step(batch, jax.random.PRNGKey(0))
    m_m = ft_sharded.train_step(batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(m_s["loss"], m_m["loss"], rtol=1e-4)

    w_s = np.asarray(
        ft_single.params["encoder"]["layers"]["self_attn"]["linear_pos"]["w"])
    w_m = np.asarray(
        ft_sharded.params["encoder"]["layers"]["self_attn"]["linear_pos"]["w"])
    np.testing.assert_allclose(w_s, w_m, atol=2e-5)


def test_rnnt_empty_transcript_trains_blank():
    """A sample with an empty transcript (tok_lens=0) must be trained
    toward pure blank emission — not clamped up to target length 1, which
    would teach the model to hallucinate token 0 on empty-label audio."""
    model = GigaAMASR(tiny_cfg("rnnt"), seed=1, compute_dtype=jnp.float32)
    ft = FineTuner(model, TrainConfig(total_steps=10, precision="fp32"))

    wavs, lens, toks, tlens = synth_batch(b=2, seed=9)
    tlens = np.asarray(tlens).copy()
    tlens[1] = 0
    batch = (wavs, lens, jnp.asarray(toks), jnp.asarray(tlens))

    loss, (_, encoded, enc_lens) = ft._forward_loss(
        ft.params, batch, jax.random.PRNGKey(0), train=False)
    assert np.isfinite(float(loss))

    # the per-sample loss for the empty row must equal the direct
    # zero-length loss, not the length-1 clamped one
    from gigaam_tpu.ops.rnnt_loss import rnnt_loss

    enc = encoded.astype(jnp.float32)
    l0 = rnnt_loss(ft.params["head"], enc[1:2], jnp.asarray(toks)[1:2],
                   enc_lens[1:2], jnp.asarray([0], jnp.int32),
                   blank_id=ft.blank_id)
    l1 = rnnt_loss(ft.params["head"], enc[1:2], jnp.asarray(toks)[1:2],
                   enc_lens[1:2], jnp.asarray([1], jnp.int32),
                   blank_id=ft.blank_id)
    assert not np.isclose(float(l0), float(l1))
    both = rnnt_loss(ft.params["head"], enc, jnp.asarray(toks), enc_lens,
                     jnp.asarray(tlens, jnp.int32), blank_id=ft.blank_id)
    solo = rnnt_loss(ft.params["head"], enc[0:1], jnp.asarray(toks)[0:1],
                     enc_lens[0:1], jnp.asarray(tlens, jnp.int32)[0:1],
                     blank_id=ft.blank_id)
    np.testing.assert_allclose(float(both) * 2 - float(solo), float(l0),
                               rtol=1e-4)


def test_checkpoint_npz_roundtrip_fresh_process(tmp_path):
    """Train-state checkpoints are a single pickle-free npz: a FRESH
    FineTuner (fresh optimizer tree, different init) restores params,
    optimizer state, and step exactly, and continues deterministically
    (VERDICT r1 #7; reference resume contract train_utils/train.py:62,204)."""
    tc = TrainConfig(lr=1e-3, total_steps=10, precision="fp32",
                     accumulate_grad_batches=2)
    ft = FineTuner(GigaAMASR(tiny_cfg("ctc"), seed=1,
                             compute_dtype=jnp.float32), tc)
    ft.train_step(synth_batch(seed=0), jax.random.PRNGKey(0))
    ft.train_step(synth_batch(seed=1), jax.random.PRNGKey(1))
    path = str(tmp_path / "state.ckpt")
    ft.save_checkpoint(path)

    # the file must be loadable WITHOUT pickle
    with np.load(path, allow_pickle=False) as z:
        assert "__meta__" in z.files

    ft2 = FineTuner(GigaAMASR(tiny_cfg("ctc"), seed=99,
                              compute_dtype=jnp.float32), tc)
    ft2.restore_checkpoint(path)
    assert ft2.step == ft.step
    for a, b in zip(jax.tree.leaves(ft.params), jax.tree.leaves(ft2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ft.opt_state),
                    jax.tree.leaves(ft2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # identical continuation from the restored state
    m1 = ft.train_step(synth_batch(seed=2), jax.random.PRNGKey(2))
    m2 = ft2.train_step(synth_batch(seed=2), jax.random.PRNGKey(2))
    assert float(m1["loss"]) == float(m2["loss"])

    # structural mismatch (different accumulation -> different opt tree)
    ft3 = FineTuner(GigaAMASR(tiny_cfg("ctc"), seed=0,
                              compute_dtype=jnp.float32),
                    TrainConfig(lr=1e-3, total_steps=10, precision="fp32"))
    with pytest.raises(ValueError, match="leaves"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ft3.restore_checkpoint(path)


def test_host_lr_schedule_matches_optax():
    """The host-side LR twin (used so train_step's metrics never touch the
    device) must track the optax schedule it mirrors."""
    from gigaam_tpu.train.finetune import host_lr_schedule, make_optimizer

    for tc in (TrainConfig(lr=3e-4, total_steps=100, warmup_ratio=0.1),
               TrainConfig(lr=1e-3, total_steps=1, warmup_ratio=0.1),
               TrainConfig(lr=5e-5, total_steps=7, warmup_ratio=0.4)):
        _, sched = make_optimizer(tc)
        host = host_lr_schedule(tc)
        for step in range(0, tc.total_steps + 2):
            # optax evaluates the cosine in float32: 0.5*(1+cos) cancels
            # catastrophically near the end of decay, so bound the error
            # relative to the PEAK lr, not the near-zero point value
            np.testing.assert_allclose(host(step), float(sched(step)),
                                       rtol=1e-4, atol=tc.lr * 1e-6)


def test_topk_keeper_disable_and_keep_all(tmp_path):
    """Lightning save_top_k semantics: 0 = never save, -1 = keep all."""
    import os

    from gigaam_tpu.train.train import TopKKeeper

    def save(path):
        with open(path, "w") as f:
            f.write("x")

    k0 = TopKKeeper(str(tmp_path), 0)
    assert k0.submit(0.5, 1, save) is None
    assert not list(tmp_path.iterdir())

    ka = TopKKeeper(str(tmp_path), -1)
    paths = [ka.submit(w, i, save) for i, w in enumerate([0.5, 0.9, 0.7])]
    assert all(p is not None and os.path.exists(p) for p in paths)


def test_reported_lr_is_applied_lr():
    """train_step must log the lr the optimizer update just applied —
    optax evaluates the schedule BEFORE incrementing its count, so update
    N applies schedule(N-1)."""
    from gigaam_tpu.train.finetune import host_lr_schedule

    model = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    tc = TrainConfig(lr=1e-3, total_steps=10, warmup_ratio=0.5,
                     precision="fp32")
    ft = FineTuner(model, tc)
    host = host_lr_schedule(tc)
    m1 = ft.train_step(synth_batch(), jax.random.PRNGKey(0))
    assert m1["lr"] == host(0) == 0.0  # warmup ramp starts at 0
    m2 = ft.train_step(synth_batch(), jax.random.PRNGKey(1))
    assert m2["lr"] == host(1)


def test_sharded_restore_preserves_opt_shardings(tmp_path):
    """Resuming under a mesh must put optimizer moments back with the same
    shardings optimizer.init gave them (TP-sharded mu/nu, not
    single-device copies)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=4, model=2)
    tc = TrainConfig(lr=1e-3, total_steps=10, precision="fp32")

    model_a = GigaAMASR(tiny_cfg("ctc"), seed=7, compute_dtype=jnp.float32)
    ft = FineTuner(model_a, tc, mesh=mesh)
    ft.train_step(synth_batch(b=4, seed=8), jax.random.PRNGKey(0))
    path = str(tmp_path / "mesh.ckpt")
    ft.save_checkpoint(path)

    model_b = GigaAMASR(tiny_cfg("ctc"), seed=9, compute_dtype=jnp.float32)
    ft2 = FineTuner(model_b, tc, mesh=mesh)
    init_sh = [l.sharding for l in jax.tree_util.tree_leaves(ft2.opt_state)]
    ft2.restore_checkpoint(path)
    rest_sh = [l.sharding for l in jax.tree_util.tree_leaves(ft2.opt_state)]
    assert rest_sh == init_sh
    # restored params/opt_state feed straight into the sharded step
    m = ft2.train_step(synth_batch(b=4, seed=8), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # eval under the mesh uses the sharded jit too
    loss, hyps = ft2.eval_step(synth_batch(b=4, seed=8))
    assert np.isfinite(loss) and len(hyps) == 4


def test_tp_encoder_has_no_glu_exchange():
    """Under DPxTP the conv module's GLU must not reshard activations:
    value/gate leaves shard Megatron-style, so the compiled encoder
    contains no collective-permute / all-to-all (only the row-parallel
    all-reduces)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import re

    from jax.sharding import NamedSharding

    from gigaam_tpu.parallel.mesh import (batch_pspec, params_pspecs,
                                          shard_params, to_named)

    mesh = make_mesh(data=4, model=2)
    model = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    specs = params_pspecs(model.params,
                          model.cfg.encoder.self_attention_model,
                          model.cfg.encoder.conv_norm_type)
    params = shard_params(model.params, mesh, specs)
    wavs = jnp.zeros((4, 16000), jnp.float32)
    lens = jnp.full((4,), 16000, jnp.int32)
    pos = model._pos_for(16000)
    f = jax.jit(model._encode_impl,
                in_shardings=(to_named(mesh, specs),
                              NamedSharding(mesh, batch_pspec()),
                              NamedSharding(mesh, batch_pspec()), None))
    hlo = f.lower(params, wavs, lens, pos).compile().as_text()
    assert not re.findall(r"collective-permute", hlo)
    assert not re.findall(r"all-to-all", hlo)


def test_remat_policy_dots_matches_full():
    """remat_policy='dots' changes only what backward recomputes, never
    the math: one train step must produce the same loss and params as
    the 'full' policy (and as no checkpointing at all)."""
    batch = synth_batch(seed=5)
    results = []
    for ac, policy in ((True, "full"), (True, "dots"), (False, "full")):
        model = GigaAMASR(tiny_cfg("ctc"), seed=4, compute_dtype=jnp.float32)
        tc = TrainConfig(lr=1e-3, total_steps=5, precision="fp32",
                         activation_checkpointing=ac, remat_policy=policy)
        ft = FineTuner(model, tc)
        m = ft.train_step(batch, jax.random.PRNGKey(0))
        w = np.asarray(
            ft.params["encoder"]["layers"]["feed_forward1"]["linear1"]["w"])
        results.append((m["loss"], w))
    (l_full, w_full), (l_dots, w_dots), (l_none, w_none) = results
    assert l_full == l_dots
    np.testing.assert_allclose(w_full, w_dots, rtol=0, atol=1e-7)
    np.testing.assert_allclose(w_full, w_none, rtol=0, atol=1e-6)
