"""Load the reference's own torch modules from /root/reference/gigaam.

The parity suite (``test_reference_torch_parity.py``) needs to run the
*actual* reference implementation — ``encoder.py::ConformerEncoder``,
``decoder.py::CTCHead/RNNTHead``, ``decoding.py`` greedy decoders — against
this repo's converter + JAX model.  The reference package imports a few
native deps we neither have nor need for that (torchaudio, soundfile,
sentencepiece; flash-attn already soft-fails at
``/root/reference/gigaam/encoder.py:11-16``), so modules are loaded
individually under a synthetic ``refgigaam`` package with throwaway stub
modules installed only for the duration of the import.

Nothing from the reference is copied; the reference code itself runs as the
oracle, exactly as installed.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from typing import Dict

REF_DIR = "/root/reference/gigaam"
_MODULES = ["types", "preprocess", "utils", "encoder", "decoder", "decoding"]
_cache: Dict[str, types.ModuleType] = {}


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_reference() -> Dict[str, types.ModuleType]:
    """Import the reference modules once; returns {name: module}.

    Stub modules are removed from sys.modules afterwards so other tests
    that probe for the real torchaudio/sentencepiece see the true
    environment.
    """
    if _cache:
        return _cache

    added = []

    def ensure(name: str, mod: types.ModuleType) -> None:
        if name not in sys.modules:
            sys.modules[name] = mod
            added.append(name)

    ta = _stub("torchaudio")
    ta.transforms = _stub("torchaudio.transforms", MelSpectrogram=None)
    ensure("torchaudio", ta)
    ensure("torchaudio.transforms", ta.transforms)
    ensure("soundfile", _stub("soundfile"))
    ensure("sentencepiece",
           _stub("sentencepiece", SentencePieceProcessor=object))

    pkg = types.ModuleType("refgigaam")
    pkg.__path__ = [REF_DIR]
    sys.modules["refgigaam"] = pkg
    try:
        for name in _MODULES:
            spec = importlib.util.spec_from_file_location(
                f"refgigaam.{name}", f"{REF_DIR}/{name}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refgigaam.{name}"] = mod
            spec.loader.exec_module(mod)
            setattr(pkg, name, mod)
            _cache[name] = mod
    finally:
        for name in added:
            del sys.modules[name]
    return _cache
