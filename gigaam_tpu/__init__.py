"""GigaAM-TPU: a TPU-native (JAX/XLA/Pallas) speech framework with the
capabilities of the GigaAM reference stack.

Public API mirrors the reference package (``gigaam/__init__.py``):
``load_model``, model classes, ``load_audio``, ``format_time``.
"""

from __future__ import annotations

import os
from typing import Optional

# Persistent XLA compilation cache: full-size encoder graphs cost minutes to
# compile per padded-shape bucket; caching makes warm starts near-instant.
# Opt out with GIGAAM_TPU_NO_COMPILE_CACHE=1.
if os.environ.get("GIGAAM_TPU_NO_COMPILE_CACHE",
                  "0").lower() in ("", "0", "false", "no"):
    _cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/gigaam_tpu/jax_cache"))
    try:  # jax may already be imported: env var alone would be ignored
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    except Exception:
        pass

from .audio import format_time, load_audio
from .config import RU_VOCAB, SAMPLE_RATE, ModelConfig, make_preset
from .decode.lm import NGramLM, train_lm_from_texts
from .models.model import (
    GigaAM,
    GigaAMASR,
    GigaAMEmo,
    load_native,
    model_class_for,
    save_model,
)
from .models.vad_net import load_vad_regions_fn
from .streaming import StreamingTranscriber, stream_file
from .types import (
    LongformTranscriptionResult,
    Segment,
    TranscriptionResult,
    Word,
)

__all__ = [
    "GigaAM",
    "GigaAMASR",
    "GigaAMEmo",
    "load_audio",
    "format_time",
    "load_model",
    "save_model",
    "make_preset",
    "ModelConfig",
    "TranscriptionResult",
    "LongformTranscriptionResult",
    "Segment",
    "Word",
    "SAMPLE_RATE",
    "RU_VOCAB",
    "load_vad_regions_fn",
    "StreamingTranscriber",
    "stream_file",
    "NGramLM",
    "train_lm_from_texts",
]

_CACHE_DIR = os.path.expanduser("~/.cache/gigaam_tpu")

# Upstream checkpoint CDN and md5 pins (interop data; reference
# ``gigaam/__init__.py:26-41``).  The .ckpt files downloaded from here are
# the *reference torch* checkpoints: they are converted to native artifacts
# on first load and the converted .npz/.json pair is what gets cached.
_URL_DIR = "https://cdn.chatwm.opensmodel.sberdevices.ru/GigaAM"
_MODEL_HASHES = {
    "emo": "7ce76f9535cb254488985057c0d33006",
    "v1_ctc": "f027f199e590a391d015aeede2e66174",
    "v1_rnnt": "02c758999bcdc6afcb2087ef256d47ef",
    "v1_ssl": "dc7f7b231f7f91c4968dc21910e7b396",
    "v2_ctc": "e00f59cb5d39624fb30d1786044795bf",
    "v2_rnnt": "547460139acfebd842323f59ed54ab54",
    "v2_ssl": "cd4cf819c8191a07b9d7edcad111668e",
    "v3_ctc": "73413e7be9c6a5935827bfab5c0dd678",
    "v3_rnnt": "0fd2c9a1ff66abd8d32a3a07f7592815",
    "v3_e2e_ctc": "367074d6498f426d960b25f49531cf68",
    "v3_e2e_rnnt": "2730de7545ac43ad256485a462b0a27a",
    "v3_ssl": "70cbf5ed7303a0ed242ddb257e9dc6a6",
}

_SHORT_NAMES = ["ctc", "rnnt", "e2e_ctc", "e2e_rnnt", "ssl"]

_KNOWN_MODELS = list(_MODEL_HASHES) + _SHORT_NAMES


def hash_path(path: str) -> str:
    """md5 of a file (reference ``gigaam/__init__.py:95-97``)."""
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _download_file(file_url: str, file_path: str) -> str:
    """Stream a URL to ``file_path`` unless already present
    (reference ``gigaam/__init__.py:44-66``).  Atomic: downloads to a
    ``.part`` file and renames, so an interrupted fetch never poisons the
    cache."""
    import sys
    import urllib.request

    import tempfile

    if os.path.exists(file_path):
        return file_path
    os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
    # per-process unique temp name: concurrent downloaders (multi-host pods,
    # parallel test workers) must not interleave writes into one .part file
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(file_path) or ".",
        prefix=os.path.basename(file_path) + ".", suffix=".part")
    os.close(fd)
    try:
        with urllib.request.urlopen(file_url) as src, open(tmp, "wb") as out:
            total = int(src.info().get("Content-Length", 0) or 0)
            done = 0
            while True:
                buf = src.read(1 << 20)
                if not buf:
                    break
                out.write(buf)
                done += len(buf)
                if total and sys.stderr.isatty():
                    sys.stderr.write(
                        f"\r{os.path.basename(file_path)}: "
                        f"{done / 1e6:.1f}/{total / 1e6:.1f} MB")
            if total and sys.stderr.isatty():
                sys.stderr.write("\n")
        os.replace(tmp, file_path)
    finally:
        # a mid-stream failure must not strand a multi-GB .part file
        if os.path.exists(tmp):
            os.remove(tmp)
    return file_path


def _download_model(model_name: str, download_root: str):
    """Fetch the reference .ckpt by name; returns (resolved_name, path)
    (reference ``gigaam/__init__.py:69-82``)."""
    if model_name in _SHORT_NAMES:
        model_name = f"v3_{model_name}"
    path = _download_file(f"{_URL_DIR}/{model_name}.ckpt",
                          os.path.join(download_root, model_name + ".ckpt"))
    return model_name, path


def _download_tokenizer(model_name: str, download_root: str) -> Optional[str]:
    """Fetch the sentencepiece tokenizer for models that need one
    (reference ``gigaam/__init__.py:85-92``)."""
    if model_name != "v1_rnnt" and "e2e" not in model_name:
        return None
    return _download_file(
        f"{_URL_DIR}/{model_name}_tokenizer.model",
        os.path.join(download_root, model_name + "_tokenizer.model"))


def load_model(
    model_name: str,
    device: Optional[str] = None,
    download_root: Optional[str] = None,
    init: str = "weights",
    seed: int = 0,
    bf16_encoder: bool = False,
    **kw,
) -> GigaAM:
    """Load a model by name or from a local artifact.

    Accepts (mirroring reference ``gigaam/__init__.py:110-192``):
    * a native artifact path (``model.npz`` / ``model`` with .npz+.json pair),
    * a reference torch ``.ckpt`` path (converted on the fly, needs torch),
    * a known model name — resolved against ``download_root`` /
      ``~/.cache/gigaam_tpu`` for a converted artifact; with
      ``init="random"`` builds a randomly-initialized model instead (for
      testing / benchmarking without weights).
    """
    root = download_root or _CACHE_DIR

    def _finalize(model: GigaAM) -> GigaAM:
        # Optional bf16 encoder weights (reference ``fp16_encoder`` analogue,
        # ``gigaam/__init__.py:188-189``).  Off by default: on TPU v5e the
        # measured forward is ~25% slower with pre-cast bf16 weights than
        # with fp32 storage + in-graph casts (XLA fuses the cast into the
        # matmul pipeline), so this is a memory-footprint knob, not a speed
        # knob.
        import jax

        if bf16_encoder and jax.default_backend() != "cpu":
            model.cast_encoder()
        if device is not None:
            # reference ``model.to(device)`` analogue
            # (``gigaam/__init__.py:192``): "tpu", "cpu", or "tpu:1"
            plat, _, idx = device.partition(":")
            target = jax.devices(plat)[int(idx) if idx else 0]
            model.params = jax.device_put(model.params, target)
        return model

    local = os.path.expanduser(model_name)
    if os.path.isfile(local) or os.path.isfile(local + ".npz"):
        if local.endswith(".ckpt"):
            from .checkpoint import (
                apply_finetuned_state_dict,
                convert_reference_checkpoint,
                load_torch_checkpoint,
            )

            ckpt = load_torch_checkpoint(local)
            if "hyper_parameters" in ckpt and "cfg" not in ckpt:
                # fine-tuned Lightning checkpoint: resolve the base model's
                # *config* by name, then rebuild params from the filtered
                # fine-tuned state_dict (it carries the full wrapped model,
                # so the base weights are never needed — init="random"
                # avoids downloading a multi-GB base ckpt just for its cfg;
                # a cached converted base still supplies the exact cfg).
                # Reference flow: ``gigaam/__init__.py:139-156``.
                base_name = ckpt["hyper_parameters"]["model_name"]
                resolved_base = (f"v3_{base_name}"
                                 if base_name in _SHORT_NAMES else base_name)
                if resolved_base == "v1_rnnt" or "e2e" in resolved_base:
                    # SP-tokenizer base: fetch the real tokenizer so the
                    # init="random" recursion below picks it up instead of
                    # synthesizing placeholder '<i>' pieces (which would make
                    # transcribe() silently emit garbage; reference loads the
                    # full base incl. tokenizer, gigaam/__init__.py:139-156)
                    try:
                        _download_tokenizer(resolved_base, root)
                    except Exception:
                        pass  # offline: the cached-tokenizer check below
                        # may still hit; otherwise the shape-mismatch
                        # fallback loads the full base (which fails loudly
                        # offline rather than decoding garbage)
                base = load_model(base_name, device=device,
                                  download_root=download_root,
                                  init="random", seed=seed, **kw)
                if (base.cfg.decoding is not None
                        and base.cfg.decoding.model_path is None
                        and (resolved_base == "v1_rnnt"
                             or "e2e" in resolved_base)):
                    raise FileNotFoundError(
                        f"Fine-tuned checkpoint '{local}' is based on "
                        f"'{resolved_base}', which needs a sentencepiece "
                        f"tokenizer, and none is cached under {root} nor "
                        f"downloadable. Place "
                        f"{resolved_base}_tokenizer.model there first.")
                try:
                    base.params = apply_finetuned_state_dict(
                        base.cfg, local, ckpt=ckpt)
                except Exception:
                    # preset cfg didn't fit this state_dict (non-standard
                    # base): fall back to the authoritative cfg embedded in
                    # the downloaded base checkpoint
                    base = load_model(base_name, device=device,
                                      download_root=download_root,
                                      seed=seed, **kw)
                    base.params = apply_finetuned_state_dict(
                        base.cfg, local, ckpt=ckpt)
                return _finalize(base)
            cfg, params = convert_reference_checkpoint(local, ckpt=ckpt)
            return _finalize(model_class_for(cfg)(cfg, params=params, **kw))
        return _finalize(load_native(local, **kw))

    if model_name not in _KNOWN_MODELS:
        raise ValueError(
            f"Model '{model_name}' not found. Available: {_KNOWN_MODELS}")

    resolved = f"v3_{model_name}" if model_name in _SHORT_NAMES else model_name
    # init="random" takes precedence over any cached trained artifact —
    # a weight-free run must never silently return pretrained params just
    # because an earlier normal load populated the cache
    if init == "random":
        cfg = make_preset(model_name)
        if (cfg.decoding is not None and not cfg.decoding.vocabulary
                and cfg.decoding.model_path is None):
            import dataclasses

            from .config import CTCHeadConfig as _Ctc

            tok_file = os.path.join(root, f"{resolved}_tokenizer.model")
            if os.path.isfile(tok_file):
                # a real sentencepiece tokenizer is cached: use it, sizing
                # the head to the actual piece count (the preset guesses 512)
                from .decode.tokenizer import Tokenizer as _Tok

                n = len(_Tok([], tok_file))
                if isinstance(cfg.head, _Ctc):
                    head = dataclasses.replace(cfg.head, num_classes=n + 1)
                else:
                    head = dataclasses.replace(
                        cfg.head,
                        decoder=dataclasses.replace(
                            cfg.head.decoder, num_classes=n + 1),
                        joint=dataclasses.replace(
                            cfg.head.joint, num_classes=n + 1))
                cfg = dataclasses.replace(
                    cfg, head=head,
                    decoding=dataclasses.replace(
                        cfg.decoding, model_path=tok_file))
            else:
                # sentencepiece models (v1_rnnt, e2e variants) resolve their
                # vocabulary from the downloaded tokenizer; a weight-free run
                # has none, so synthesize placeholder pieces sized to the head
                n = (cfg.head.num_classes if isinstance(cfg.head, _Ctc)
                     else cfg.head.joint.num_classes) - 1
                cfg = dataclasses.replace(
                    cfg, decoding=dataclasses.replace(
                        cfg.decoding,
                        vocabulary=[f"<{i}>" for i in range(n)]))
        return _finalize(model_class_for(cfg)(cfg, seed=seed, **kw))

    cached = os.path.join(root, f"{resolved}.npz")
    if os.path.isfile(cached):
        return _finalize(load_native(cached, **kw))

    # Download the reference torch checkpoint, verify, convert once, and
    # cache the native artifact (reference ``gigaam/__init__.py:158-192``;
    # conversion replaces its in-process hydra instantiation).
    try:
        resolved, ckpt_path = _download_model(model_name, root)
        tok_path = _download_tokenizer(resolved, root)
    except Exception as e:  # no network, bad proxy, CDN down …
        raise FileNotFoundError(
            f"No converted weights for '{model_name}' under {root} and the "
            f"checkpoint download failed ({e}). Convert a reference "
            f"checkpoint offline with tools/convert_checkpoint.py, or pass "
            f"init='random' for an untrained model.") from e

    expected = _MODEL_HASHES.get(resolved)
    if expected is not None and hash_path(ckpt_path) != expected:
        # remove the bad file so a retry re-downloads instead of failing
        # forever on the cached corrupt copy
        os.remove(ckpt_path)
        raise RuntimeError(
            f"Checksum mismatch for {ckpt_path}; the corrupted download was "
            f"removed — retry load_model "
            f"(reference contract: gigaam/__init__.py:161-163).")

    from .checkpoint import convert_reference_checkpoint

    cfg, params = convert_reference_checkpoint(ckpt_path, resolved)
    if tok_path and cfg.decoding is not None:
        cfg.decoding.model_path = tok_path
    model = model_class_for(cfg)(cfg, params=params, **kw)
    save_model(model, os.path.join(root, resolved))
    return _finalize(model)
