#!/usr/bin/env python
"""Generate a reference-shaped checkpoint whose ``cfg`` pickles exactly like
a real OmegaConf tree (``tests/data/ref_cfg_omegaconf.ckpt``).

The reference embeds a Hydra/OmegaConf ``DictConfig`` in every ``.ckpt``
(``gigaam/__init__.py:167``, ``gigaam/model.py:24-25``).  Our loader
(``gigaam_tpu/checkpoint.py``) unpickles those without omegaconf installed
via stub modules — which is only proven if the fixture bytes match what the
*real* library emits.  omegaconf cannot be installed here (no network), so
this script carries a clean-room structural replica of omegaconf 2.3's
pickle-relevant class layout (module paths, class names, ``__dict__``
shapes, dataclass metadata fields, parent back-references) and registers it
as ``omegaconf.*`` while ``torch.save`` runs.  The resulting pickle stream
contains ``GLOBAL omegaconf.dictconfig DictConfig`` etc. with realistic
per-node state — byte-level indistinguishable from a real tree for the
loader's purposes.

Replicated layout (from omegaconf 2.3 sources):
- ``omegaconf.base.Metadata``: dataclass(ref_type, object_type, optional,
  key, flags=None, flags_root=False, resolver_cache=defaultdict(dict))
- ``omegaconf.base.ContainerMetadata(Metadata)``: + key_type, element_type
- every Node ``__dict__``: {_metadata, _parent, _flags_cache}
- ``ValueNode`` subclasses add ``_val`` (Any/String/Integer/Float/Boolean
  node classes in ``omegaconf.nodes``)
- ``DictConfig._content``: dict[str, Node]; ``ListConfig._content``:
  list[Node]; children's ``_parent`` points back at the container (pickle
  memo cycle — the loader must tolerate it)
- interpolations stay *unresolved*: ``_val`` is the raw "${...}" string

If a future round gets network access, regenerate with the real library:
    pip install omegaconf==2.3.0 && python tools/make_omegaconf_fixture.py --real
and the test must still pass unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import types
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "ref_cfg_omegaconf.ckpt")


# --------------------------------------------------------------------------
# clean-room replica of omegaconf 2.3's pickle-relevant classes
# --------------------------------------------------------------------------

@dataclass
class Metadata:
    ref_type: Any
    object_type: Any
    optional: bool
    key: Any
    flags: Optional[Dict[str, bool]] = None
    flags_root: bool = False
    resolver_cache: Dict[str, Any] = field(
        default_factory=lambda: defaultdict(dict))


@dataclass
class ContainerMetadata(Metadata):
    key_type: Any = None
    element_type: Any = None


class Node:
    def __init__(self, metadata, parent=None):
        self.__dict__["_metadata"] = metadata
        self.__dict__["_parent"] = parent
        self.__dict__["_flags_cache"] = None


class Box(Node):
    pass


class Container(Box):
    pass


class ValueNode(Node):
    def __init__(self, value, key=None, parent=None, ref_type=Any):
        super().__init__(Metadata(ref_type=ref_type, object_type=None,
                                  optional=True, key=key), parent)
        self.__dict__["_val"] = value


class AnyNode(ValueNode):
    pass


class StringNode(ValueNode):
    pass


class IntegerNode(ValueNode):
    pass


class FloatNode(ValueNode):
    pass


class BooleanNode(ValueNode):
    pass


class InterpolationResultNode(ValueNode):
    pass


class DictConfig(Container):
    def __init__(self, key=None, parent=None):
        super().__init__(
            ContainerMetadata(ref_type=Any, object_type=dict, optional=True,
                              key=key, flags={}, key_type=Any,
                              element_type=Any), parent)
        self.__dict__["_content"] = {}


class ListConfig(Container):
    def __init__(self, key=None, parent=None):
        super().__init__(
            ContainerMetadata(ref_type=Any, object_type=list, optional=True,
                              key=key, flags={}, key_type=int,
                              element_type=Any), parent)
        self.__dict__["_content"] = []


_MODULE_MAP = {
    "omegaconf": {},
    "omegaconf.base": {"Metadata": Metadata,
                       "ContainerMetadata": ContainerMetadata,
                       "Node": Node, "Box": Box, "Container": Container},
    "omegaconf.nodes": {"ValueNode": ValueNode, "AnyNode": AnyNode,
                        "StringNode": StringNode, "IntegerNode": IntegerNode,
                        "FloatNode": FloatNode, "BooleanNode": BooleanNode,
                        "InterpolationResultNode": InterpolationResultNode},
    "omegaconf.dictconfig": {"DictConfig": DictConfig},
    "omegaconf.listconfig": {"ListConfig": ListConfig},
}


def _register_replica():
    created = []
    for name, attrs in _MODULE_MAP.items():
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            v.__module__ = name
            setattr(mod, k, v)
        sys.modules[name] = mod
        created.append(name)
    return created


# --------------------------------------------------------------------------
# cfg tree construction (value types chosen per-key like OmegaConf.create)
# --------------------------------------------------------------------------

def _node_for(value, key, parent):
    if isinstance(value, dict):
        return _dict_cfg(value, key, parent)
    if isinstance(value, list):
        lst = ListConfig(key=key, parent=parent)
        lst.__dict__["_content"] = [
            _node_for(v, i, lst) for i, v in enumerate(value)]
        return lst
    # omegaconf stores untyped yaml scalars as AnyNode; interpolations stay
    # unresolved strings
    return AnyNode(value, key=key, parent=parent)


def _dict_cfg(d, key=None, parent=None):
    cfg = DictConfig(key=key, parent=parent)
    cfg.__dict__["_content"] = {
        k: _node_for(v, k, cfg) for k, v in d.items()}
    return cfg


def build_cfg_tree(make_dict=None):
    """The v3-shaped cfg embedded in reference checkpoints: preprocessor /
    encoder / head / decoding nodes with hydra ``_target_``s (reference
    ``gigaam/encoder.py:510-525``, ``gigaam/model.py:21-25,91-94``)."""
    tree = {
        "model_name": "v3_ctc",
        "preprocessor": {
            "_target_": "gigaam.preprocess.FeatureExtractor",
            "sample_rate": 16000,
            "features": 64,
            "win_length": 400,
            "hop_length": 160,
            "n_fft": 400,
            "center": False,
            "dither": 0.0,
        },
        # hyperparameters sized to the tiny committed state dict (2 layers,
        # d=32 — tests/test_checkpoint.py::_ref_state_dict); the FIELD SET
        # mirrors the real encoder cfg (gigaam/encoder.py:510-525)
        "encoder": {
            "_target_": "gigaam.encoder.ConformerEncoder",
            "feat_in": "${preprocessor.features}",   # unresolved interpolation
            "n_layers": 2,
            "d_model": 32,
            "subsampling": "conv2d",
            "subs_kernel_size": 3,
            "subsampling_factor": 4,
            "ff_expansion_factor": 2,
            "self_attention_model": "rotary",
            "n_heads": 4,
            "pos_emb_max_len": 256,
            "conv_norm_type": "batch_norm",
            "conv_kernel_size": 7,
            "flash_attn": False,
        },
        "head": {
            "_target_": "gigaam.decoder.CTCHead",
            "feat_in": "${encoder.d_model}",
            "num_classes": 34,
        },
        "decoding": {
            "_target_": "gigaam.decoding.CTCGreedyDecoding",
            "vocabulary": [" "] + [chr(c) for c in range(1072, 1104)],
            "model_path": None,
        },
    }
    if make_dict:  # --real path: omegaconf builds its own node types
        return make_dict(tree)
    cfg = _dict_cfg(tree)
    # sprinkle explicitly-typed nodes the way structured configs produce
    # them (the loader must not depend on every leaf being AnyNode)
    enc = cfg.__dict__["_content"]["encoder"]
    enc.__dict__["_content"]["n_layers"] = IntegerNode(
        2, key="n_layers", parent=enc, ref_type=int)
    enc.__dict__["_content"]["flash_attn"] = BooleanNode(
        False, key="flash_attn", parent=enc, ref_type=bool)
    pre = cfg.__dict__["_content"]["preprocessor"]
    pre.__dict__["_content"]["dither"] = FloatNode(
        0.0, key="dither", parent=pre, ref_type=float)
    pre.__dict__["_content"]["_target_"] = StringNode(
        "gigaam.preprocess.FeatureExtractor", key="_target_", parent=pre,
        ref_type=str)
    return cfg


def tiny_state_dict():
    """Reference-named tiny state dict (2 layers, d=32) so the fixture also
    exercises convert_state_dict end to end; shapes follow
    tests/test_checkpoint.py::_ref_state_dict conventions."""
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_checkpoint import _ref_state_dict

    return _ref_state_dict("ctc")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--real", action="store_true",
                    help="use an installed real omegaconf instead of the "
                         "replica (for fixture re-validation)")
    ap.add_argument("--out", default=os.path.abspath(OUT))
    args = ap.parse_args()

    import torch

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if args.real:
        from omegaconf import OmegaConf

        cfg = build_cfg_tree(make_dict=OmegaConf.create)
        torch.save({"cfg": cfg, "state_dict": tiny_state_dict()}, args.out)
    else:
        created = _register_replica()
        try:
            cfg = build_cfg_tree()
            torch.save({"cfg": cfg, "state_dict": tiny_state_dict()},
                       args.out)
        finally:
            for name in created:
                sys.modules.pop(name, None)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
          f"{'real omegaconf' if args.real else 'replica'})")


if __name__ == "__main__":
    main()
