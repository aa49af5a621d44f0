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
if not os.environ.get("GIGAAM_TPU_NO_COMPILE_CACHE"):
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
from .models.model import (
    GigaAM,
    GigaAMASR,
    GigaAMEmo,
    load_native,
    model_class_for,
    save_model,
)
from .models.vad_net import load_vad_regions_fn
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
]

_CACHE_DIR = os.path.expanduser("~/.cache/gigaam_tpu")

_KNOWN_MODELS = [
    "v1_ssl", "v1_ctc", "v1_rnnt",
    "v2_ssl", "v2_ctc", "v2_rnnt",
    "v3_ssl", "v3_ctc", "v3_rnnt",
    "v3_e2e_ctc", "v3_e2e_rnnt", "emo",
    "ctc", "rnnt", "ssl", "e2e_ctc", "e2e_rnnt",
]


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
        return model

    local = os.path.expanduser(model_name)
    if os.path.isfile(local) or os.path.isfile(local + ".npz"):
        if local.endswith(".ckpt"):
            from .checkpoint import convert_reference_checkpoint

            cfg, params = convert_reference_checkpoint(local)
            return _finalize(model_class_for(cfg)(cfg, params=params, **kw))
        return _finalize(load_native(local, **kw))

    if model_name not in _KNOWN_MODELS:
        raise ValueError(
            f"Model '{model_name}' not found. Available: {_KNOWN_MODELS}")

    cached = os.path.join(root, f"{model_name}.npz")
    if os.path.isfile(cached):
        return _finalize(load_native(cached, **kw))

    if init == "random":
        cfg = make_preset(model_name)
        return _finalize(model_class_for(cfg)(cfg, seed=seed, **kw))

    raise FileNotFoundError(
        f"No converted weights for '{model_name}' under {root}. Convert a "
        f"reference checkpoint with tools/convert_checkpoint.py, or pass "
        f"init='random' for an untrained model."
    )
