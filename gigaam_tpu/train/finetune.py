"""CTC / RNNT fine-tuning: functional train state + pjit train step.

Re-architecture of the reference Lightning module
(``train_utils/module.py:16-271``) as a pure-JAX training loop:

* one jitted ``train_step`` over an optional ("data", "model") mesh —
  gradient reduction is XLA's psum over ICI, replacing Lightning DDP/NCCL;
* AdamW + linear-warmup/cosine schedule per optimizer step
  (``module.py:252-271``) via optax;
* SpecAugment on features (``module.py:48-55,123-127``);
* BatchNorm running stats are buffers: excluded from AdamW (masked optax)
  and overwritten from the forward pass's batch statistics each step;
* the frontend is parameter-free and always fp32 — the reference freezes
  its preprocessor and disables autocast around it (``module.py:74-75,
  119-122``); here that invariant holds by construction;
* encoder freeze (``module.py:76-78``) masks encoder updates and runs BN
  in eval mode;
* no RNNT sub-batching machinery needed: the chunked wavefront RNNT loss
  (``ops/rnnt_loss.py``) already bounds memory, replacing the reference's
  int32-overflow-guarded host loop (``module.py:146-176``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CTCHeadConfig, ModelConfig, RNNTHeadConfig
from ..decode.ctc_greedy import ctc_extract, ctc_greedy_mask
from ..decode.rnnt_greedy import rnnt_extract, rnnt_greedy_decode
from ..ops.conformer_ops import static_subsampled_length
from ..metrics import wer_counts
from ..models import heads as heads_lib
from ..models.encoder import PosTables, conformer_forward
from ..models.model import GigaAMASR
# shared with save_model: per-leaf gather that handles replicated vs
# mesh-sharded leaves correctly on multi-host (see models/model.py)
from ..models.model import tree_to_host as _tree_to_host
from ..ops.ctc_loss import ctc_loss
from ..ops.rnnt_loss import rnnt_loss
from ..ops.spec_augment import spec_augment
from ..parallel.mesh import batch_pspec, params_pspecs, shard_params, to_named


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    warmup_ratio: float = 0.1
    total_steps: int = 1000
    grad_clip: float = 1.0
    freeze_encoder: bool = False
    spec_augment: bool = False
    freq_masks: int = 2
    freq_width: int = 27
    time_masks: int = 2
    time_width: int = 20
    precision: str = "bf16"          # "bf16" | "fp32"
    rnnt_time_chunk: int = 64
    activation_checkpointing: bool = False
    # "full" (reference semantics: recompute whole layers) or "dots"
    # (save matmul outputs; faster backward, more memory) — see
    # EncoderConfig.remat_policy
    remat_policy: str = "full"
    accumulate_grad_batches: int = 1




def _is_bn_buffer(path: Tuple[Any, ...]) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return "batch_norm" in keys and keys[-1] in ("mean", "var")


def _label_params(params: Dict[str, Any], freeze_encoder: bool,
                  extra_frozen=None):
    """'train' vs 'frozen' labels for optax.multi_transform."""
    def label(path, _):
        if _is_bn_buffer(path):
            return "frozen"
        if extra_frozen is not None and extra_frozen(path):
            return "frozen"
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if freeze_encoder and keys and keys[0] == "encoder":
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(tc: TrainConfig):
    warmup = max(1, int(tc.warmup_ratio * tc.total_steps))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=tc.lr, warmup_steps=warmup,
        # optax requires decay_steps > warmup_steps (guards total_steps=1)
        decay_steps=max(tc.total_steps, warmup + 1), end_value=0.0)
    adamw = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(schedule, weight_decay=tc.weight_decay),
    )
    return adamw, schedule


def host_lr_schedule(tc: TrainConfig):
    """Pure-Python twin of ``make_optimizer``'s warmup-cosine schedule.

    The optax schedule computes with jnp ops, so evaluating it for logging
    would dispatch to the device and block (~25 ms/step on a tunneled TPU)
    — the exact per-step sync ``train_step`` is designed to avoid.  Pinned
    equal to the optax schedule in tests/test_training.py.
    """
    import math

    warmup = max(1, int(tc.warmup_ratio * tc.total_steps))
    decay = max(tc.total_steps, warmup + 1)

    def lr(step: int) -> float:
        if step < warmup:
            return tc.lr * step / warmup
        t = min(step - warmup, decay - warmup) / (decay - warmup)
        return tc.lr * 0.5 * (1.0 + math.cos(math.pi * t))

    return lr




class TrainerBase:
    """Shared training machinery: optimizer build, mesh sharding, jitted
    train step, npz checkpointing.  Subclasses define the objective
    (``_forward_loss``), the batch arity, and any extra trainable params
    (``FineTuner`` for CTC/RNNT, ``train.pretrain.SSLPretrainer`` for
    BEST-RQ self-supervised pretraining)."""

    #: number of arrays in one batch tuple (shardings are built per slot)
    batch_arity: int = 4

    def __init__(
        self,
        model,
        tc: TrainConfig,
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.cfg: ModelConfig = model.cfg
        self.tc = tc
        self.mesh = mesh
        # reuse the model's frontend / positional tables (same configs;
        # a second PosTables would double the host table memory)
        self.frontend = model.frontend
        self.pos_tables = model.pos_tables

        enc_cfg = dataclasses.replace(
            self.cfg.encoder,
            activation_checkpointing=tc.activation_checkpointing,
            remat_policy=tc.remat_policy)
        self.enc_cfg = enc_cfg

        params = self._init_params(model.params)
        self.optimizer, self.schedule = self._build_optimizer(params, tc)
        self._host_lr = host_lr_schedule(tc)
        if mesh is not None:
            self.pspecs = params_pspecs(
                params, enc_cfg.self_attention_model, enc_cfg.conv_norm_type)
            params = shard_params(params, mesh, self.pspecs)
        self.params = params
        self.opt_state = self.optimizer.init(params)
        self.step = 0
        self._train_step_jit = self._build_train_step()
        self._eval_loss_jit = self._build_eval_step()

    # hooks ------------------------------------------------------------

    def _init_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Subclasses may extend the trainable tree (extra heads etc.)."""
        return params

    def _frozen_label(self, path: Tuple[Any, ...]) -> bool:
        """Extra frozen-param predicate beyond BN buffers/freeze_encoder."""
        return False

    def _forward_loss(self, params, batch, rng, train: bool):
        raise NotImplementedError

    # ------------------------------------------------------------------

    def _build_optimizer(self, params, tc: TrainConfig):
        adamw, schedule = make_optimizer(tc)
        labels = _label_params(params, tc.freeze_encoder, self._frozen_label)
        opt = optax.multi_transform(
            {"train": adamw, "frozen": optax.set_to_zero()}, labels)
        if tc.accumulate_grad_batches > 1:
            # gradient accumulation (reference ``train.py:38,170``): the
            # schedule advances per optimizer step, not per micro-batch
            opt = optax.MultiSteps(opt, tc.accumulate_grad_batches)
        return opt, schedule

    # ------------------------------------------------------------------
    # shared forward helpers
    # ------------------------------------------------------------------

    def _loss_eval(self, params, batch):
        loss, (_, encoded, enc_lens) = self._forward_loss(
            params, batch, jax.random.PRNGKey(0), train=False)
        return loss, encoded, enc_lens

    def _static_t_sub(self, t_feat: int) -> int:
        return static_subsampled_length(t_feat,
                                        self.enc_cfg.num_subsampling_stages,
                                        self.enc_cfg.subs_kernel_size)

    def _pos(self, t_sub: int):
        if self.enc_cfg.self_attention_model == "rotary":
            return self.pos_tables.rotary(t_sub)
        return self.pos_tables.relpos(t_sub)

    # ------------------------------------------------------------------
    # train step
    # ------------------------------------------------------------------

    def _train_step_impl(self, params, opt_state, batch, rng):
        def loss_fn(p):
            loss, aux = self._forward_loss(p, batch, rng, train=True)
            return loss, aux

        (loss, (bn_stats, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if bn_stats is not None:
            bn = params["encoder"]["layers"]["conv"]["batch_norm"]
            bn = dict(bn, mean=bn_stats["mean"], var=bn_stats["var"])
            params["encoder"]["layers"]["conv"]["batch_norm"] = bn
        grad_norm = optax.global_norm(grads)
        return params, opt_state, loss, grad_norm

    def _build_train_step(self):
        if self.mesh is None:
            return jax.jit(self._train_step_impl)
        param_sh = to_named(self.mesh, self.pspecs)
        batch_sh = NamedSharding(self.mesh, batch_pspec())
        repl = NamedSharding(self.mesh, P())
        return jax.jit(
            self._train_step_impl,
            in_shardings=(param_sh, None, (batch_sh,) * self.batch_arity,
                          repl),
            out_shardings=(param_sh, None, repl, repl),
        )

    def _build_eval_step(self):
        if self.mesh is None:
            return jax.jit(self._loss_eval)
        # same input shardings as the train step: without them, validation
        # under a mesh feeds single-device batches against mesh-sharded
        # params (a crash on multi-host, a layout reshuffle on one host)
        param_sh = to_named(self.mesh, self.pspecs)
        batch_sh = NamedSharding(self.mesh, batch_pspec())
        return jax.jit(self._loss_eval,
                       in_shardings=(param_sh,
                                     (batch_sh,) * self.batch_arity))

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def train_step(self, batch, rng) -> Dict[str, Any]:
        """One optimizer step.  Returns ``loss``/``grad_norm`` as *device*
        scalars — converting them here would force a blocking device->host
        round trip (~25 ms on a tunneled TPU) on EVERY step regardless of
        log cadence; callers ``float()`` them only when they actually log
        (the reference's Lightning logging likewise avoids a per-step sync,
        ``train_utils/module.py:198``)."""
        batch = tuple(jnp.asarray(x) for x in batch)
        self.params, self.opt_state, loss, grad_norm = self._train_step_jit(
            self.params, self.opt_state, batch, rng)
        self.step += 1
        opt_steps = self.step // max(1, self.tc.accumulate_grad_batches)
        return {
            "loss": loss,
            "grad_norm": grad_norm,
            # host-computed twin of the optax schedule: float(schedule(...))
            # would itself be a device round trip every step.  The N-th
            # optimizer update applies schedule(N-1) (optax evaluates the
            # schedule BEFORE incrementing its count), so report the lr the
            # step just applied, not the next one
            "lr": self._host_lr(max(0, opt_steps - 1)),
        }

    # ------------------------------------------------------------------
    # checkpoint / resume (reference: Lightning ckpt + --resume_from,
    # ``train_utils/train.py:62,157-163,204``)
    # ------------------------------------------------------------------

    _CKPT_FORMAT = "gigaam_tpu_train_ckpt_v1"

    def save_checkpoint(self, path: str) -> None:
        """Write one self-describing npz file: flattened params, positional
        optimizer-state leaves, and a JSON metadata entry.

        No pickle anywhere (the repo's npz+json artifact convention):
        the optimizer tree *structure* is reconstructed from this
        FineTuner's own TrainConfig at restore time and validated by leaf
        count, so a silently-wrong optax version/config fails loudly
        instead of unpickling into garbage.
        """
        import json
        import os

        params_host = _tree_to_host(self.params)
        opt_host = _tree_to_host(self.opt_state)
        if jax.process_index() != 0:
            return  # every process joined the gather; only rank 0 writes
        from ..models.model import _flatten

        opt_leaves = jax.tree_util.tree_leaves(opt_host)
        meta = {
            "format": self._CKPT_FORMAT,
            "step": self.step,
            "model_config": self.cfg.to_dict(),
            "train_config": dataclasses.asdict(self.tc),
            "n_opt_leaves": len(opt_leaves),
        }
        arrays = {f"params/{k}": v for k, v in _flatten(params_host).items()}
        arrays.update({f"opt/{i}": leaf for i, leaf in enumerate(opt_leaves)})
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:  # file handle: savez must not append .npz
            np.savez(f, __meta__=np.asarray(json.dumps(meta)), **arrays)
        os.replace(tmp, path)

    def restore_checkpoint(self, path: str) -> None:
        import json
        import warnings

        from ..models.model import _unflatten

        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            if meta.get("format") != self._CKPT_FORMAT:
                raise ValueError(
                    f"{path}: unknown train-checkpoint format "
                    f"{meta.get('format')!r} (expected {self._CKPT_FORMAT})")
            params = _unflatten(
                {k[len("params/"):]: z[k] for k in z.files
                 if k.startswith("params/")})
            from ..models.model import migrate_params

            params = migrate_params(params)
            opt_leaves = [z[f"opt/{i}"]
                          for i in range(int(meta["n_opt_leaves"]))]

        if meta["train_config"] != dataclasses.asdict(self.tc):
            diff = {k: (meta["train_config"].get(k), v) for k, v in
                    dataclasses.asdict(self.tc).items()
                    if meta["train_config"].get(k) != v}
            warnings.warn(f"restoring {path} under a different TrainConfig "
                          f"(ckpt vs current): {diff}")
        treedef = jax.tree_util.tree_structure(self.opt_state)
        if treedef.num_leaves != len(opt_leaves):
            raise ValueError(
                f"{path}: optimizer state has {len(opt_leaves)} leaves but "
                f"this FineTuner's optimizer expects {treedef.num_leaves} — "
                f"TrainConfig (accumulation/freeze) or optax version "
                f"mismatch")
        if self.mesh is not None:
            params = shard_params(jax.tree.map(jnp.asarray, params),
                                  self.mesh, self.pspecs)
            # optimizer leaves (mu/nu mirror the param tree) must come back
            # with the mesh shardings optimizer.init gave them — plain
            # asarray would leave them single-device against mesh-sharded
            # params, losing TP sharding of the moments and breaking
            # multi-host.  Scalar counts stay uncommitted (device_put would
            # pin them to one device and conflict inside the jitted step).
            live = jax.tree_util.tree_leaves(self.opt_state)
            opt_leaves = [
                jax.device_put(np.asarray(leaf), l.sharding)
                if isinstance(l.sharding, NamedSharding)
                else jnp.asarray(leaf)
                for leaf, l in zip(opt_leaves, live)
            ]
        else:
            params = jax.tree.map(jnp.asarray, params)
            opt_leaves = [jnp.asarray(leaf) for leaf in opt_leaves]
        self.params = params
        self.opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
        self.step = int(meta["step"])
        self.sync_model()

    def sync_model(self) -> None:
        """Write trained params back into the wrapped model."""
        self.model.params = self.params


class FineTuner(TrainerBase):
    """CTC / RNNT fine-tuning driver around a GigaAMASR model
    (reference ``train_utils/module.py:16-271``)."""

    def __init__(
        self,
        model: GigaAMASR,
        tc: TrainConfig,
        mesh: Optional[Mesh] = None,
    ):
        self.blank_id = model.blank_id
        self.mode = ("ctc" if isinstance(model.cfg.head, CTCHeadConfig)
                     else "rnnt")
        if self.mode == "rnnt":
            assert isinstance(model.cfg.head, RNNTHeadConfig)
        super().__init__(model, tc, mesh)

    # ------------------------------------------------------------------
    # forward / loss
    # ------------------------------------------------------------------

    def _forward_loss(self, params, batch, rng, train: bool):
        wavs, wav_lens, tokens, tok_lens = batch
        compute_dtype = (jnp.bfloat16 if self.tc.precision == "bf16"
                         else jnp.float32)
        feats, feat_lens = self.frontend.forward(wavs, wav_lens)  # [B, F, T]
        if train and self.tc.spec_augment:
            feats = spec_augment(
                rng, feats,
                self.tc.freq_masks, self.tc.freq_width,
                self.tc.time_masks, self.tc.time_width)
        feats = jnp.transpose(feats, (0, 2, 1))
        t_feat = feats.shape[1]
        t_sub = self._static_t_sub(t_feat)
        pos = self._pos(t_sub)
        bn_train = train and not self.tc.freeze_encoder
        encoded, enc_lens, bn_stats = conformer_forward(
            params["encoder"], feats, feat_lens, self.enc_cfg, pos,
            compute_dtype=compute_dtype, train=bn_train)

        if self.mode == "ctc":
            # raw logits: optax.ctc_loss log-softmaxes internally, so
            # feeding pre-normalized log-probs would normalize twice
            logits = heads_lib.ctc_logits(params["head"], encoded)
            loss = ctc_loss(logits, enc_lens, tokens, tok_lens,
                            self.blank_id)
        else:
            u1 = tokens.shape[1] + 1
            # tok_lens=0 (empty transcript) is valid — the loss trains pure
            # blank emission; clamping it up to 1 would instead train the
            # model to hallucinate token 0 on empty-label audio
            loss = rnnt_loss(
                params["head"], encoded.astype(jnp.float32), tokens,
                # no min-clip: zero-length (pad) rows must reach the loss
                # as 0 so it masks them out of the batch mean
                jnp.minimum(enc_lens, encoded.shape[1]),
                jnp.clip(tok_lens, 0, u1 - 1),
                blank_id=self.blank_id,
                time_chunk=self.tc.rnnt_time_chunk)
        return loss, (bn_stats, encoded, enc_lens)

    # ------------------------------------------------------------------
    # eval / decode
    # ------------------------------------------------------------------

    def eval_step(self, batch) -> Tuple[float, List[str]]:
        """Returns (loss, hypotheses) for a batch."""
        batch = tuple(jnp.asarray(x) for x in batch)
        loss, encoded, enc_lens = self._eval_loss_jit(self.params, batch)
        hyps = self.decode(encoded, enc_lens)
        return float(loss), hyps

    def decode(self, encoded, enc_lens) -> List[str]:
        tok = self.model.tokenizer
        if self.mode == "ctc":
            log_probs = heads_lib.ctc_log_probs(self.params["head"], encoded)
            labels, keep = ctc_greedy_mask(log_probs, enc_lens)
            decoded = ctc_extract(np.asarray(labels), np.asarray(keep))
        else:
            tokens, frames, counts = rnnt_greedy_decode(
                self.params["head"], encoded, enc_lens)
            decoded = rnnt_extract(np.asarray(tokens), np.asarray(frames),
                                   np.asarray(counts))
        return [tok.decode(ids) for ids, _ in decoded]

    def batch_wer(self, hyps: List[str], tokens, tok_lens) -> Tuple[int, int]:
        tok = self.model.tokenizer
        refs = [
            tok.decode(np.asarray(tokens[i, : int(tok_lens[i])]).tolist())
            for i in range(len(hyps))
        ]
        return wer_counts(hyps, refs)
