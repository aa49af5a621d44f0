"""Checkpoint converter tests: a synthetic reference-shaped torch .ckpt is
built (correct state-dict names + tensor layouts), converted, and the
resulting model runs.  Layout-transpose correctness is pinned by
test_op_parity.py; these tests pin the *name mapping* and cfg translation."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gigaam_tpu.checkpoint import (  # noqa: E402
    config_from_reference,
    convert_reference_checkpoint,
)
from gigaam_tpu.models.model import GigaAMASR, model_class_for  # noqa: E402


def _ref_cfg_dict(kind="ctc", n_layers=2, d_model=32, n_heads=4, v=34):
    cfg = {
        "model_name": f"synth_{kind}",
        "preprocessor": {
            "_target_": "gigaam.preprocess.FeatureExtractor",
            "sample_rate": 16000, "features": 64,
        },
        "encoder": {
            "_target_": "gigaam.encoder.ConformerEncoder",
            "feat_in": 64, "n_layers": n_layers, "d_model": d_model,
            "subsampling": "conv2d", "subs_kernel_size": 3,
            "subsampling_factor": 4, "ff_expansion_factor": 2,
            "self_attention_model": "rotary", "n_heads": n_heads,
            "pos_emb_max_len": 256, "conv_norm_type": "batch_norm",
            "conv_kernel_size": 7,
        },
        "decoding": {
            "_target_": "gigaam.decoding.CTCGreedyDecoding",
            "vocabulary": [" "] + [chr(c) for c in range(1072, 1072 + v - 2)],
        },
    }
    if kind == "ctc":
        cfg["head"] = {"_target_": "gigaam.decoder.CTCHead",
                       "feat_in": d_model, "num_classes": v}
    else:
        cfg["head"] = {
            "_target_": "gigaam.decoder.RNNTHead",
            "decoder": {"pred_hidden": 16, "pred_rnn_layers": 1,
                        "num_classes": v},
            "joint": {"enc_hidden": d_model, "pred_hidden": 16,
                      "joint_hidden": 16, "num_classes": v},
        }
        cfg["decoding"]["_target_"] = "gigaam.decoding.RNNTGreedyDecoding"
    return cfg


def _ref_state_dict(kind="ctc", n_layers=2, d_model=32, n_heads=4, v=34):
    """Reference-named state dict with torch tensor layouts."""
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {}
    # subsampling: Sequential [Conv2d, ReLU, Conv2d, ReLU]
    sd["encoder.pre_encode.conv.0.weight"] = t(d_model, 1, 3, 3)
    sd["encoder.pre_encode.conv.0.bias"] = t(d_model)
    sd["encoder.pre_encode.conv.2.weight"] = t(d_model, d_model, 3, 3)
    sd["encoder.pre_encode.conv.2.bias"] = t(d_model)
    f_out = 64
    for _ in range(2):
        f_out = (f_out - 1) // 2 + 1
    sd["encoder.pre_encode.out.weight"] = t(d_model, d_model * f_out)
    sd["encoder.pre_encode.out.bias"] = t(d_model)

    for i in range(n_layers):
        p = f"encoder.layers.{i}."
        for nm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                   "norm_feed_forward2", "norm_out"):
            sd[p + nm + ".weight"] = t(d_model)
            sd[p + nm + ".bias"] = t(d_model)
        ff = d_model * 2
        for nm in ("feed_forward1", "feed_forward2"):
            sd[p + nm + ".linear1.weight"] = t(ff, d_model)
            sd[p + nm + ".linear1.bias"] = t(ff)
            sd[p + nm + ".linear2.weight"] = t(d_model, ff)
            sd[p + nm + ".linear2.bias"] = t(d_model)
        for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd[p + f"self_attn.{nm}.weight"] = t(d_model, d_model)
            sd[p + f"self_attn.{nm}.bias"] = t(d_model)
        sd[p + "conv.pointwise_conv1.weight"] = t(2 * d_model, d_model, 1)
        sd[p + "conv.pointwise_conv1.bias"] = t(2 * d_model)
        sd[p + "conv.depthwise_conv.weight"] = t(d_model, 1, 7)
        sd[p + "conv.depthwise_conv.bias"] = t(d_model)
        sd[p + "conv.batch_norm.weight"] = t(d_model)
        sd[p + "conv.batch_norm.bias"] = t(d_model)
        sd[p + "conv.batch_norm.running_mean"] = t(d_model)
        sd[p + "conv.batch_norm.running_var"] = torch.abs(t(d_model)) + 0.5
        sd[p + "conv.pointwise_conv2.weight"] = t(d_model, d_model, 1)
        sd[p + "conv.pointwise_conv2.bias"] = t(d_model)

    if kind == "ctc":
        sd["head.decoder_layers.0.weight"] = t(v, d_model, 1)
        sd["head.decoder_layers.0.bias"] = t(v)
    else:
        h = 16
        sd["head.decoder.embed.weight"] = t(v, h)
        sd["head.decoder.lstm.weight_ih_l0"] = t(4 * h, h)
        sd["head.decoder.lstm.weight_hh_l0"] = t(4 * h, h)
        sd["head.decoder.lstm.bias_ih_l0"] = t(4 * h)
        sd["head.decoder.lstm.bias_hh_l0"] = t(4 * h)
        sd["head.joint.enc.weight"] = t(h, d_model)
        sd["head.joint.enc.bias"] = t(h)
        sd["head.joint.pred.weight"] = t(h, h)
        sd["head.joint.pred.bias"] = t(h)
        sd["head.joint.joint_net.1.weight"] = t(v, h)
        sd["head.joint.joint_net.1.bias"] = t(v)
    return sd


@pytest.mark.parametrize("kind", ["ctc", "rnnt"])
def test_convert_and_run(tmp_path, kind):
    path = str(tmp_path / f"synth_{kind}.ckpt")
    torch.save({"cfg": _ref_cfg_dict(kind), "state_dict": _ref_state_dict(kind)},
               path)
    cfg, params = convert_reference_checkpoint(path)

    assert cfg.model_class == "asr"
    assert cfg.encoder.n_layers == 2 and cfg.encoder.d_model == 32
    # stacked layer axis
    assert params["encoder"]["layers"]["norm_out"]["scale"].shape == (2, 32)

    model = model_class_for(cfg)(cfg, params=params,
                                 compute_dtype=jnp.float32)
    assert isinstance(model, GigaAMASR)
    enc, enc_len = model.encode_batch(
        [np.random.default_rng(0).standard_normal(16000).astype(np.float32)])
    assert np.isfinite(np.asarray(enc)).all()

    # spot-check a transposed weight round-trip
    w_torch = _ref_state_dict(kind)["encoder.pre_encode.out.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["pre_encode"]["out"]["w"]), w_torch.T)


def test_config_translation_relpos_layernorm():
    cfg_d = _ref_cfg_dict("ctc")
    cfg_d["encoder"]["self_attention_model"] = "rel_pos"
    cfg_d["encoder"]["conv_norm_type"] = "layer_norm"
    cfg_d["preprocessor"]["center"] = False
    cfg = config_from_reference(cfg_d, "x")
    assert cfg.encoder.self_attention_model == "rel_pos"
    assert cfg.encoder.conv_norm_type == "layer_norm"
    assert cfg.preprocessor.center is False
    assert cfg.decoding is not None and len(cfg.decoding.vocabulary) == 33


def test_lstm_bias_summed():
    sd_t = _ref_state_dict("rnnt")
    path_bias = (sd_t["head.decoder.lstm.bias_ih_l0"]
                 + sd_t["head.decoder.lstm.bias_hh_l0"]).numpy()
    cfg = config_from_reference(_ref_cfg_dict("rnnt"), "x")
    from gigaam_tpu.checkpoint import convert_state_dict, state_dict_to_numpy

    params = convert_state_dict(state_dict_to_numpy(sd_t), cfg)
    np.testing.assert_allclose(
        np.asarray(params["head"]["decoder"]["lstm"][0]["b"]), path_bias,
        atol=1e-6)


def test_load_model_downloads_verifies_and_caches(tmp_path, monkeypatch):
    """load_model("v3_ctc") with no cache: fetch the reference .ckpt from the
    registry URL, md5-verify, convert, cache the native artifact, and load it
    from cache on the second call (reference ``gigaam/__init__.py:110-192``).
    Served from a file:// URL so the test needs no network."""
    import gigaam_tpu

    cdn = tmp_path / "cdn"
    cdn.mkdir()
    ckpt = str(cdn / "v3_ctc.ckpt")
    torch.save({"cfg": _ref_cfg_dict("ctc"), "state_dict": _ref_state_dict("ctc")},
               ckpt)
    monkeypatch.setattr(gigaam_tpu, "_URL_DIR", f"file://{cdn}")
    monkeypatch.setattr(
        gigaam_tpu, "_MODEL_HASHES",
        {**gigaam_tpu._MODEL_HASHES, "v3_ctc": gigaam_tpu.hash_path(ckpt)})

    root = str(tmp_path / "cache")
    model = gigaam_tpu.load_model("ctc", download_root=root,
                                  compute_dtype=jnp.float32)
    assert isinstance(model, GigaAMASR)
    # converted artifact cached under the resolved (long) name
    assert (tmp_path / "cache" / "v3_ctc.npz").exists()
    assert (tmp_path / "cache" / "v3_ctc.json").exists()

    # second load must come from the converted cache, not the CDN
    monkeypatch.setattr(gigaam_tpu, "_URL_DIR", "file:///nonexistent")
    again = gigaam_tpu.load_model("v3_ctc", download_root=root,
                                  compute_dtype=jnp.float32)
    assert isinstance(again, GigaAMASR)


def test_load_model_checksum_mismatch(tmp_path, monkeypatch):
    import gigaam_tpu

    cdn = tmp_path / "cdn"
    cdn.mkdir()
    torch.save({"cfg": _ref_cfg_dict("ctc"), "state_dict": _ref_state_dict("ctc")},
               str(cdn / "v3_ctc.ckpt"))
    monkeypatch.setattr(gigaam_tpu, "_URL_DIR", f"file://{cdn}")
    with pytest.raises(RuntimeError, match="Checksum mismatch"):
        gigaam_tpu.load_model("ctc", download_root=str(tmp_path / "cache2"))


def test_load_model_finetuned_lightning_ckpt(tmp_path, monkeypatch):
    """A fine-tuned Lightning .ckpt loads by recursing on
    hyper_parameters.model_name and overlaying the prefix-filtered
    state_dict (reference ``gigaam/__init__.py:139-156``)."""
    import gigaam_tpu

    cdn = tmp_path / "cdn"
    cdn.mkdir()
    base_ckpt = str(cdn / "v3_ctc.ckpt")
    torch.save({"cfg": _ref_cfg_dict("ctc"),
                "state_dict": _ref_state_dict("ctc")}, base_ckpt)
    monkeypatch.setattr(gigaam_tpu, "_URL_DIR", f"file://{cdn}")
    monkeypatch.setattr(
        gigaam_tpu, "_MODEL_HASHES",
        {**gigaam_tpu._MODEL_HASHES,
         "v3_ctc": gigaam_tpu.hash_path(base_ckpt)})

    # fine-tuned ckpt: perturb one weight, add Lightning-style extras
    sd = _ref_state_dict("ctc")
    sd["head.decoder_layers.0.weight"] = (
        sd["head.decoder_layers.0.weight"] + 1.0)
    sd["optimizer.some_buffer"] = torch.zeros(3)  # must be filtered out
    ft_path = str(tmp_path / "finetuned.ckpt")
    torch.save({"hyper_parameters": {"model_name": "v3_ctc"},
                "state_dict": sd}, ft_path)

    root = str(tmp_path / "cache")
    model = gigaam_tpu.load_model(ft_path, download_root=root,
                                  compute_dtype=jnp.float32)
    assert isinstance(model, GigaAMASR)
    base = gigaam_tpu.load_model("v3_ctc", download_root=root,
                                 compute_dtype=jnp.float32)
    diff = (np.asarray(model.params["head"]["proj"]["w"])
            - np.asarray(base.params["head"]["proj"]["w"]))
    np.testing.assert_allclose(diff, 1.0, atol=1e-6)


def test_load_model_device_placement(tmp_path, monkeypatch):
    """device= places params on the requested device (reference .to())."""
    import jax

    import gigaam_tpu

    cdn = tmp_path / "cdn"
    cdn.mkdir()
    ckpt = str(cdn / "v3_ctc.ckpt")
    torch.save({"cfg": _ref_cfg_dict("ctc"), "state_dict": _ref_state_dict("ctc")},
               ckpt)
    monkeypatch.setattr(gigaam_tpu, "_URL_DIR", f"file://{cdn}")
    monkeypatch.setattr(
        gigaam_tpu, "_MODEL_HASHES",
        {**gigaam_tpu._MODEL_HASHES, "v3_ctc": gigaam_tpu.hash_path(ckpt)})
    model = gigaam_tpu.load_model("ctc", download_root=str(tmp_path / "c"),
                                  device="cpu:0", compute_dtype=jnp.float32)
    leaf = jax.tree.leaves(model.params)[0]
    assert jax.devices("cpu")[0] in leaf.devices()


def _sp_pieces():
    return ([("<unk>", 0.0, 2)]
            + [(c, -1.0, 1) for c in "абвгд"]
            + [("▁пр", -0.5, 1)])


def _sp_cfg_and_sd(v):
    """Synthetic e2e (SP-tokenizer) reference ckpt: empty vocabulary."""
    cfg = _ref_cfg_dict("ctc", v=v)
    cfg["decoding"]["vocabulary"] = []
    return cfg, _ref_state_dict("ctc", v=v)


def test_load_model_finetuned_sp_base_uses_real_tokenizer(tmp_path, monkeypatch):
    """Fine-tuned ckpts whose base needs a sentencepiece tokenizer must
    resolve the *real* tokenizer (cached or downloaded) — never the
    placeholder '<i>' vocabulary that init="random" synthesizes, which
    would make transcribe() silently emit garbage (ADVICE r1, medium;
    reference loads the full base incl. tokenizer,
    ``gigaam/__init__.py:139-156``)."""
    import gigaam_tpu
    from test_export_serve import _write_tiny_sp_model

    pieces = _sp_pieces()
    v = len(pieces) + 1  # + blank
    root = tmp_path / "cache"
    root.mkdir()
    _write_tiny_sp_model(str(root / "v3_e2e_ctc_tokenizer.model"), pieces)

    cdn = tmp_path / "cdn"
    cdn.mkdir()
    cfg, sd = _sp_cfg_and_sd(v)
    base_ckpt = str(cdn / "v3_e2e_ctc.ckpt")
    torch.save({"cfg": cfg, "state_dict": sd}, base_ckpt)
    # tokenizer also on the "CDN" for the full-base fallback path
    import shutil
    shutil.copy(str(root / "v3_e2e_ctc_tokenizer.model"),
                str(cdn / "v3_e2e_ctc_tokenizer.model"))
    monkeypatch.setattr(gigaam_tpu, "_URL_DIR", f"file://{cdn}")
    monkeypatch.setattr(
        gigaam_tpu, "_MODEL_HASHES",
        {**gigaam_tpu._MODEL_HASHES,
         "v3_e2e_ctc": gigaam_tpu.hash_path(base_ckpt)})

    ft_sd = dict(sd)
    ft_sd["head.decoder_layers.0.bias"] = sd["head.decoder_layers.0.bias"] + 2.0
    ft_path = str(tmp_path / "ft_e2e.ckpt")
    torch.save({"hyper_parameters": {"model_name": "e2e_ctc"},
                "state_dict": ft_sd}, ft_path)

    model = gigaam_tpu.load_model(ft_path, download_root=str(root),
                                  compute_dtype=jnp.float32)
    # real SP pieces, not placeholders
    assert not model.tokenizer.charwise
    assert model.tokenizer.decode([1, 2]) == "аб"
    assert model.blank_id == len(pieces)
    np.testing.assert_allclose(
        np.asarray(model.params["head"]["proj"]["b"])
        - np.asarray(sd["head.decoder_layers.0.bias"].numpy()),
        2.0, atol=1e-6)


def test_load_model_finetuned_sp_base_offline_fails_loudly(tmp_path, monkeypatch):
    """With no tokenizer cached and no network, an SP-base fine-tuned load
    must raise (not silently decode placeholder pieces)."""
    import gigaam_tpu

    monkeypatch.setattr(gigaam_tpu, "_URL_DIR",
                        f"file://{tmp_path}/no_such_cdn")
    cfg, sd = _sp_cfg_and_sd(8)
    ft_path = str(tmp_path / "ft_e2e.ckpt")
    torch.save({"hyper_parameters": {"model_name": "v3_e2e_ctc"},
                "state_dict": sd}, ft_path)
    with pytest.raises(FileNotFoundError, match="tokenizer"):
        gigaam_tpu.load_model(ft_path,
                              download_root=str(tmp_path / "empty_cache"),
                              compute_dtype=jnp.float32)


def test_load_model_random_init_picks_up_cached_sp_tokenizer(tmp_path):
    """init="random" on an SP preset uses a cached real tokenizer when one
    exists under download_root, sizing the head to the piece count."""
    import gigaam_tpu
    from test_export_serve import _write_tiny_sp_model

    pieces = _sp_pieces()
    root = tmp_path / "cache"
    root.mkdir()
    _write_tiny_sp_model(str(root / "v3_e2e_rnnt_tokenizer.model"), pieces)

    model = gigaam_tpu.load_model("v3_e2e_rnnt", init="random",
                                  download_root=str(root),
                                  compute_dtype=jnp.float32)
    assert not model.tokenizer.charwise
    assert len(model.tokenizer) == len(pieces)
    assert model.cfg.head.joint.num_classes == len(pieces) + 1


def test_real_omegaconf_pickle_fixture():
    """Ingest a checkpoint whose cfg pickles with REAL omegaconf layout
    (committed binary fixture, tools/make_omegaconf_fixture.py): GLOBALs
    into omegaconf.{dictconfig,listconfig,nodes,base}, dataclass metadata
    with typing/defaultdict payloads, parent back-reference cycles, typed
    ValueNodes, and unresolved ${...} interpolations — not the stub's own
    output (VERDICT r1 #3; reference gigaam/__init__.py:167-185)."""
    import os

    from gigaam_tpu.checkpoint import (_resolve_interpolations, _unwrap,
                                       load_torch_checkpoint)

    path = os.path.join(os.path.dirname(__file__), "data",
                        "ref_cfg_omegaconf.ckpt")
    ckpt = load_torch_checkpoint(path)
    tree = _unwrap(ckpt["cfg"])
    # containers unwrap to plain dict/list; value nodes to scalars
    assert tree["model_name"] == "v3_ctc"
    assert tree["encoder"]["n_layers"] == 2           # IntegerNode
    assert tree["encoder"]["flash_attn"] is False     # BooleanNode
    assert tree["preprocessor"]["dither"] == 0.0      # FloatNode
    assert tree["preprocessor"]["center"] is False    # AnyNode(bool)
    assert tree["decoding"]["model_path"] is None     # AnyNode(None)
    assert tree["head"]["_target_"] == "gigaam.decoder.CTCHead"
    voc = tree["decoding"]["vocabulary"]              # ListConfig
    assert isinstance(voc, list) and len(voc) == 33 and voc[0] == " "
    # interpolations arrive unresolved, then resolve by dotted path
    assert tree["encoder"]["feat_in"] == "${preprocessor.features}"
    assert tree["head"]["feat_in"] == "${encoder.d_model}"
    tree = _resolve_interpolations(tree)
    assert tree["encoder"]["feat_in"] == 64
    assert tree["head"]["feat_in"] == 32

    # full conversion: cfg translation + state-dict mapping + forward
    cfg, params = convert_reference_checkpoint(path)
    assert cfg.model_name == "v3_ctc"
    assert cfg.encoder.feat_in == 64
    assert cfg.encoder.n_layers == 2
    assert cfg.head.feat_in == 32
    assert cfg.preprocessor.center is False
    model = model_class_for(cfg)(cfg, params=params, compute_dtype=jnp.float32)
    wav = (0.1 * np.random.default_rng(0)
           .standard_normal(16000)).astype(np.float32)
    text, _ = model._decode_batch([wav], word_timestamps=False)[0]
    assert isinstance(text, str)


def test_omegaconf_fixture_with_real_classes_importable(monkeypatch):
    """When omegaconf IS importable (a user migrating from the reference),
    torch.load materializes real node objects instead of stubs — _unwrap
    must duck-type on _val/_content (code-review r2 finding)."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "make_omegaconf_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "make_omegaconf_fixture.py"))
    gen = importlib.util.module_from_spec(spec)
    # dataclass creation inspects sys.modules[cls.__module__]
    sys.modules["make_omegaconf_fixture"] = gen
    spec.loader.exec_module(gen)

    created = gen._register_replica()   # acts as an installed omegaconf
    try:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "ref_cfg_omegaconf.ckpt")
        cfg, params = convert_reference_checkpoint(path)
        assert cfg.model_name == "v3_ctc"
        assert cfg.encoder.feat_in == 64     # interpolation resolved
        assert cfg.head.feat_in == 32
    finally:
        for name in created:
            sys.modules.pop(name, None)
        sys.modules.pop("make_omegaconf_fixture", None)


def test_legacy_fused_glu_artifact_migrates(tmp_path):
    """Artifacts saved with the old fused pointwise_conv1 {w, b} layout must
    load into the split value/gate schema with identical outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gigaam_tpu
    from gigaam_tpu.models.model import GigaAMASR, _flatten

    from test_training import tiny_cfg

    model = GigaAMASR(tiny_cfg("ctc"), seed=0, compute_dtype=jnp.float32)
    flat = _flatten(jax.tree.map(np.asarray, model.params))
    # re-fuse the GLU leaves the way v1 artifacts stored them
    legacy = {}
    for k, v in flat.items():
        if k.endswith("pointwise_conv1/w_value"):
            base = k[: -len("w_value")]
            legacy[base + "w"] = np.concatenate(
                [v, flat[base + "w_gate"]], axis=-1)
            legacy[base + "b"] = np.concatenate(
                [flat[base + "b_value"], flat[base + "b_gate"]], axis=-1)
        elif "pointwise_conv1" not in k:
            legacy[k] = v
    path = str(tmp_path / "legacy")
    np.savez(path + ".npz", **legacy)
    with open(path + ".json", "w") as f:
        f.write(model.cfg.to_json())

    loaded = gigaam_tpu.load_model(path + ".npz")
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(8000)).astype(np.float32)
    import tempfile

    from gigaam_tpu.audio import save_wav

    wav_path = str(tmp_path / "w.wav")
    save_wav(wav_path, wav)
    assert loaded.transcribe(wav_path).text == model.transcribe(wav_path).text
    a = loaded.params["encoder"]["layers"]["conv"]["pointwise_conv1"]
    assert set(a) == {"w_value", "w_gate", "b_value", "b_gate"}
