"""BEST-RQ self-supervised pretraining for the SSL model family.

The reference ships ``v{1,2,3}_ssl`` checkpoints but no pretraining code —
its SSL models are inference-only (``gigaam/model.py:16-83``).  This module
makes the family *trainable*, using BEST-RQ (Chiu et al., 2022: "Self-
supervised Learning with Random-projection Quantizer for Speech
Recognition"), the objective behind Google USM — chosen over wav2vec2
because it is the TPU-idiomatic SSL recipe: no learned codebook, no
contrastive negatives, no gumbel-softmax — just a frozen random projection
+ frozen random codebook producing discrete targets, and a cross-entropy
on masked frames.  Everything jits into one static-shape train step.

Objective:
  1. log-mel features [B, T, F] (fp32 frontend, reference-parity);
  2. per-utterance, per-bin feature normalization over valid frames (the
     random-projection quantizer needs standardized inputs or codes
     collapse — BEST-RQ paper §2.1);
  3. stack ``2**num_subsampling_stages`` consecutive frames to the
     encoder's output frame rate, project with a frozen random matrix,
     L2-normalize, nearest codebook row by cosine distance -> target ids;
  4. sample mask spans on the subsampled grid (start prob ``mask_prob``,
     span ``mask_span`` sub-frames), upsample x4 to input frames, replace
     masked input frames with N(0, noise_std^2) noise;
  5. encoder forward on the masked features; a linear softmax head over
     the codebook vocabulary; cross-entropy at masked positions only.

The trainer reuses the fine-tuner's machinery (``TrainerBase``): AdamW +
warmup-cosine, pjit DP x TP over a ("data","model") mesh, remat,
gradient accumulation, npz checkpoints with resume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..ops.conformer_ops import subsampled_length
from ..models.encoder import conformer_forward
from .finetune import TrainConfig, TrainerBase


@dataclasses.dataclass
class PretrainConfig(TrainConfig):
    # masking (BEST-RQ masks ~400 ms spans; on the 40 ms subsampled grid
    # that is 10 frames; start prob 0.04 gives ~1-0.96^10 ~ 33% coverage,
    # matching the paper's effective mask rate)
    mask_prob: float = 0.04
    mask_span: int = 10
    noise_std: float = 0.1
    # random-projection quantizer
    codebook_size: int = 8192
    codebook_dim: int = 16
    quantizer_seed: int = 0


class SSLPretrainer(TrainerBase):
    """BEST-RQ pretraining driver around a GigaAM (SSL) model."""

    batch_arity = 2  # (wavs, wav_lens) — no transcripts

    def __init__(self, model, pc: PretrainConfig,
                 mesh: Optional[Mesh] = None):
        self.pc = pc
        super().__init__(model, pc, mesh)

    # ------------------------------------------------------------------
    # params: frozen quantizer + trainable linear head
    # ------------------------------------------------------------------

    def _init_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        pc = self.pc
        enc = self.enc_cfg
        stack = 2 ** enc.num_subsampling_stages
        f_stack = enc.feat_in * stack
        kp, kc, kw = jax.random.split(
            jax.random.PRNGKey(pc.quantizer_seed), 3)
        # Xavier-uniform projection (paper §2.1); unit-norm codebook rows
        limit = float(np.sqrt(6.0 / (f_stack + pc.codebook_dim)))
        proj = jax.random.uniform(
            kp, (f_stack, pc.codebook_dim), jnp.float32, -limit, limit)
        codebook = jax.random.normal(
            kc, (pc.codebook_size, pc.codebook_dim), jnp.float32)
        codebook = codebook / jnp.linalg.norm(
            codebook, axis=-1, keepdims=True)
        head = {
            "w": (jax.random.normal(
                kw, (enc.d_model, pc.codebook_size), jnp.float32) * 0.02),
            "b": jnp.zeros((pc.codebook_size,), jnp.float32),
        }
        out = dict(params)
        out["quantizer"] = {"proj": proj, "codebook": codebook}
        out["ssl_head"] = head
        return out

    def _frozen_label(self, path: Tuple[Any, ...]) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        return bool(keys) and keys[0] == "quantizer"

    # ------------------------------------------------------------------
    # objective
    # ------------------------------------------------------------------

    def _targets(self, params, feats, feat_lens, t_sub):
        """Quantize unmasked features -> code ids [B, t_sub] (fp32)."""
        b, t_feat, f = feats.shape
        stack = 2 ** self.enc_cfg.num_subsampling_stages
        # per-utterance, per-bin standardization over valid frames
        valid = (jnp.arange(t_feat)[None, :] < feat_lens[:, None])
        vf = valid[:, :, None].astype(jnp.float32)
        n = jnp.maximum(vf.sum(axis=1, keepdims=True), 1.0)
        mean = (feats * vf).sum(axis=1, keepdims=True) / n
        var = (jnp.square(feats - mean) * vf).sum(axis=1, keepdims=True) / n
        normed = (feats - mean) * jax.lax.rsqrt(var + 1e-5)
        normed = jnp.where(valid[:, :, None], normed, 0.0)

        t_use = min(t_feat - t_feat % stack, t_sub * stack)
        stacked = normed[:, :t_use].reshape(b, t_use // stack, stack * f)
        z = stacked @ params["quantizer"]["proj"]
        z = z * jax.lax.rsqrt(
            jnp.sum(jnp.square(z), axis=-1, keepdims=True) + 1e-12)
        sims = z @ params["quantizer"]["codebook"].T     # cosine similarity
        ids = jnp.argmax(sims, axis=-1).astype(jnp.int32)
        n_codes = ids.shape[1]
        # pad to t_sub (conv padding can make t_sub > floor(t_feat/stack));
        # padded positions carry no real target — the loss masks them out
        # via the returned coverage bound
        pad = t_sub - n_codes
        if pad > 0:
            ids = jnp.pad(ids, ((0, 0), (0, pad)))
        return ids[:, :t_sub], min(n_codes, t_sub)

    def _sample_mask(self, rng, b, t_sub, sub_lens):
        """Span mask on the subsampled grid: [B, t_sub] bool."""
        starts = jax.random.bernoulli(
            rng, self.pc.mask_prob, (b, t_sub)).astype(jnp.int32)
        # mask[i] = any start in (i-span, i]: rolling-sum via cumsum diff
        cs = jnp.cumsum(starts, axis=1)
        shifted = jnp.pad(cs, ((0, 0), (self.pc.mask_span, 0)))[
            :, :t_sub]
        mask = (cs - shifted) > 0
        valid = jnp.arange(t_sub)[None, :] < sub_lens[:, None]
        return mask & valid

    def _forward_loss(self, params, batch, rng, train: bool):
        wavs, wav_lens = batch
        pc = self.pc
        enc = self.enc_cfg
        compute_dtype = (jnp.bfloat16 if pc.precision == "bf16"
                         else jnp.float32)
        feats, feat_lens = self.frontend.forward(wavs, wav_lens)  # [B, F, T]
        feats = jnp.transpose(feats, (0, 2, 1))                   # [B, T, F]
        b, t_feat, _ = feats.shape
        t_sub = self._static_t_sub(t_feat)
        sub_lens = subsampled_length(feat_lens, enc.num_subsampling_stages,
                                     enc.subs_kernel_size)
        pos = self._pos(t_sub)

        targets, n_codes = self._targets(params, feats.astype(jnp.float32),
                                         feat_lens, t_sub)
        targets = jax.lax.stop_gradient(targets)

        rng_mask, rng_noise = jax.random.split(rng)
        mask_sub = self._sample_mask(rng_mask, b, t_sub, sub_lens)
        stack = 2 ** enc.num_subsampling_stages
        mask_feat = jnp.repeat(mask_sub, stack, axis=1)
        mask_feat = mask_feat[:, :t_feat]
        pad = t_feat - mask_feat.shape[1]
        if pad > 0:
            mask_feat = jnp.pad(mask_feat, ((0, 0), (0, pad)))
        # masking applies in eval too — the objective is meaningless on
        # unmasked features (eval uses a fixed key for comparable numbers)
        noise = pc.noise_std * jax.random.normal(
            rng_noise, feats.shape, feats.dtype)
        feats_in = jnp.where(mask_feat[:, :, None], noise, feats)

        bn_train = train and not pc.freeze_encoder
        encoded, enc_lens, bn_stats = conformer_forward(
            params["encoder"], feats_in, feat_lens, enc, pos,
            compute_dtype=compute_dtype, train=bn_train)

        h = params["ssl_head"]
        logits = (encoded.astype(jnp.float32) @ h["w"] + h["b"])
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, targets[:, :, None],
                                  axis=-1)[:, :, 0]
        active = mask_sub & (jnp.arange(t_sub)[None, :]
                             < jnp.minimum(enc_lens, n_codes)[:, None])
        denom = jnp.maximum(active.sum(), 1)
        loss = jnp.where(active, ce, 0.0).sum() / denom
        correct = (jnp.argmax(logits, axis=-1) == targets) & active
        acc = correct.sum() / denom
        # aux tuple matches TrainerBase._train_step_impl's
        # (bn_stats, encoded, enc_lens) contract; acc rides alongside
        return loss, (bn_stats, acc, enc_lens)

    def _loss_eval(self, params, batch):
        loss, (_, acc, _) = self._forward_loss(
            params, batch, jax.random.PRNGKey(0), train=False)
        return loss, acc

    def eval_step(self, batch) -> Tuple[float, float]:
        """Returns (masked-prediction loss, masked accuracy).

        Eval runs the same mask pattern each call (fixed key inside
        ``_loss_eval``) so validation numbers are comparable across steps.
        Note ``train=False`` still masks inputs — the objective is
        meaningless on unmasked features."""
        batch = tuple(jnp.asarray(x) for x in batch)
        loss, acc = self._eval_loss_jit(self.params, batch)
        return float(loss), float(acc)

    def sync_model(self) -> None:
        """Write the pretrained encoder back into the wrapped model
        (quantizer + ssl head are training artifacts, not model params)."""
        self.model.params = dict(self.model.params,
                                 encoder=self.params["encoder"])


# ----------------------------------------------------------------------
# CLI
# ----------------------------------------------------------------------


def parse_args(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="GigaAM-TPU BEST-RQ SSL pretraining")
    p.add_argument("--model_name", default="ssl",
                   help="SSL preset/artifact to (continue) pretrain[ing]; "
                        "'ssl' + --init random starts from scratch")
    p.add_argument("--init", default="random", choices=["random", "weights"],
                   help="random = from-scratch pretraining; weights = "
                        "continue from the named checkpoint")
    p.add_argument("--train_manifest", required=True,
                   help="TSV manifest; transcription column may be empty")
    p.add_argument("--val_manifest", required=True)
    p.add_argument("--min_duration", type=float, default=0.0)
    p.add_argument("--max_duration", type=float, default=None)
    # optimization
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_ratio", type=float, default=0.08)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--activation_checkpointing", action="store_true")
    p.add_argument("--remat_policy", choices=["full", "dots"],
                   default="full")
    # BEST-RQ
    p.add_argument("--mask_prob", type=float, default=0.04)
    p.add_argument("--mask_span", type=int, default=10)
    p.add_argument("--noise_std", type=float, default=0.1)
    p.add_argument("--codebook_size", type=int, default=8192)
    p.add_argument("--codebook_dim", type=int, default=16)
    p.add_argument("--quantizer_seed", type=int, default=0)
    # loop control
    p.add_argument("--val_every_n_steps", type=int, default=0)
    p.add_argument("--log_every_n_steps", type=int, default=10)
    p.add_argument("--save_dir", default="exp/pretrain")
    p.add_argument("--save_top_k", type=int, default=1)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--seed", type=int, default=0)
    # parallelism
    p.add_argument("--data_parallel", type=int, default=0)
    p.add_argument("--model_parallel", type=int, default=1)
    return p.parse_args(argv)


def main(argv=None) -> None:
    import json
    import os
    import time

    args = parse_args(argv)

    import gigaam_tpu
    from gigaam_tpu.data import AudioDataset, prefetch_batches
    from gigaam_tpu.parallel.mesh import make_mesh
    from gigaam_tpu.train.train import TopKKeeper

    model = gigaam_tpu.load_model(args.model_name, bf16_encoder=False,
                                  init=args.init)

    train_ds = AudioDataset(args.train_manifest,
                            min_duration=args.min_duration,
                            max_duration=args.max_duration)
    val_ds = AudioDataset(args.val_manifest)

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    total_opt_steps = (args.max_steps if args.max_steps > 0
                       else args.epochs * steps_per_epoch
                       ) // max(1, args.accumulate_grad_batches)

    pc = PretrainConfig(
        lr=args.lr, weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        total_steps=max(1, total_opt_steps), grad_clip=args.grad_clip,
        precision=args.precision,
        activation_checkpointing=args.activation_checkpointing,
        remat_policy=args.remat_policy,
        accumulate_grad_batches=args.accumulate_grad_batches,
        mask_prob=args.mask_prob, mask_span=args.mask_span,
        noise_std=args.noise_std, codebook_size=args.codebook_size,
        codebook_dim=args.codebook_dim,
        quantizer_seed=args.quantizer_seed)

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 or args.model_parallel > 1:
        dp = args.data_parallel
        if dp == 0:
            dp = 1
            for cand in range(n_dev // args.model_parallel, 0, -1):
                if args.batch_size % cand == 0:
                    dp = cand
                    break
        if args.batch_size % dp != 0:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by "
                f"data-parallel size {dp}")
        mesh = make_mesh(data=dp, model=args.model_parallel,
                         devices=jax.devices()[: dp * args.model_parallel])
        print(f"mesh: data={dp} model={args.model_parallel} "
              f"({dp * args.model_parallel}/{n_dev} devices)")

    pt = SSLPretrainer(model, pc, mesh=mesh)
    if args.resume_from_checkpoint:
        pt.restore_checkpoint(args.resume_from_checkpoint)
        print(f"resumed from {args.resume_from_checkpoint} @ step {pt.step}")

    os.makedirs(args.save_dir, exist_ok=True)
    is_main = jax.process_index() == 0
    metrics_f = open(os.path.join(args.save_dir, "metrics.jsonl"), "a")

    def log(rec):
        if not is_main:
            return
        rec["time"] = round(time.time(), 3)
        metrics_f.write(json.dumps(rec) + "\n")
        metrics_f.flush()

    keeper = TopKKeeper(args.save_dir, args.save_top_k)

    def validate(step):
        tot_loss = tot_acc = rows = 0.0
        for batch in val_ds.batches(args.batch_size, sort_by_duration=True):
            loss, acc = pt.eval_step(batch)
            r = len(batch[1])
            tot_loss += loss * r
            tot_acc += acc * r
            rows += r
        vl = tot_loss / max(rows, 1)
        va = tot_acc / max(rows, 1)
        print(f"  [val] step={step} val/loss={vl:.4f} val/mask_acc={va:.4f}")
        log({"kind": "val", "step": step, "loss": vl, "mask_acc": va})
        # top-k keeps lowest metric values: masked loss is the criterion
        keeper.submit(vl, step, pt.save_checkpoint)

    key = jax.random.PRNGKey(args.seed)
    max_steps = args.max_steps if args.max_steps > 0 else (
        args.epochs * steps_per_epoch)
    epoch = 0
    t_epoch = time.time()
    done = False
    while not done:
        steps_this_epoch = 0
        for batch in prefetch_batches(
                train_ds.batches(args.batch_size, shuffle=True,
                                 seed=args.seed + epoch,
                                 sort_by_duration=True, drop_last=True)):
            steps_this_epoch += 1
            key, sub = jax.random.split(key)
            m = pt.train_step(batch, sub)
            if (args.log_every_n_steps
                    and pt.step % args.log_every_n_steps == 0):
                m = {k: float(v) for k, v in m.items()}
                print(f"step {pt.step}/{max_steps} loss={m['loss']:.4f} "
                      f"lr={m['lr']:.2e} gnorm={m['grad_norm']:.2f}")
                log({"kind": "train", "step": pt.step, **m})
            if (args.val_every_n_steps
                    and pt.step % args.val_every_n_steps == 0):
                validate(pt.step)
            if pt.step >= max_steps:
                done = True
                break
        else:
            if steps_this_epoch == 0:
                raise RuntimeError(
                    f"train set yields no batches at batch_size="
                    f"{args.batch_size} with drop_last "
                    f"({len(train_ds)} samples) — lower --batch_size")
            epoch += 1
            print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s")
            t_epoch = time.time()
            if not args.val_every_n_steps:
                validate(pt.step)

    if not (args.val_every_n_steps and pt.step % args.val_every_n_steps == 0):
        validate(pt.step)
    pt.sync_model()
    gigaam_tpu.save_model(model, os.path.join(args.save_dir, "final"))
    print(f"saved pretrained encoder to {args.save_dir}/final.npz")
    metrics_f.close()


if __name__ == "__main__":
    main()
