"""CTC prefix beam search (sum over alignments) — host-side, eval/decode
quality option.

The reference decodes CTC by per-frame argmax only
(``gigaam/decoding.py:47-96``); prefix beam search instead scores label
*strings* by the sum of all alignments (Hannun et al., 2014), which can
recover tokens the best path misses.  This is an extension over the
reference — ``transcribe(..., beam_size=N)`` uses it for CTC models.

Runs on host numpy over the [T, V] log-probs the fused forward already
produces: label-string bookkeeping is dict-of-prefixes work that has no
dense TPU formulation, matches how CTC beam decoders deploy in practice
(CPU post-processing of acoustic posteriors), and only runs when the user
asks for beam decoding — the hot serving path stays the fused on-device
greedy graph.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

NEG_INF = -np.inf




def ctc_prefix_beam(
    log_probs: np.ndarray,
    length: Optional[int] = None,
    beam_size: int = 8,
    prune_vocab: int = 16,
    blank: Optional[int] = None,
    lm=None,
    lm_weight: float = 0.5,
    token_bonus: float = 0.0,
) -> Tuple[List[int], List[int]]:
    """Prefix beam search over ``log_probs`` [T, V] (blank = V-1 by the
    framework's convention).  Returns (token_ids, emit_frames) of the best
    prefix by total (blank + non-blank) log probability.

    ``prune_vocab`` caps per-frame expansion to the top-P symbols (the
    standard emission-pruning heuristic); the blank is always considered.

    ``lm`` (a ``decode.lm.NGramLM`` or anything with
    ``logp(token, context)``) enables shallow fusion: prefixes are ranked
    and pruned by ``log p_acoustic + lm_weight * log p_LM(prefix)
    + token_bonus * len(prefix)``.  The acoustic probabilities themselves
    stay unfused (the forward recursion must sum true posteriors); only
    selection is biased — standard shallow fusion.
    """
    if blank is None:
        blank = log_probs.shape[-1] - 1
    t_max = log_probs.shape[0] if length is None else min(
        int(length), log_probs.shape[0])
    use_lm = lm is not None and lm_weight != 0.0

    def bias(prefix: Tuple[int, ...], lm_score: float) -> float:
        return lm_weight * lm_score + token_bonus * len(prefix)

    # prefix -> [p_blank, p_nonblank, emit_frames, lm_score]
    beams: Dict[Tuple[int, ...], List] = {(): [0.0, NEG_INF, [], 0.0]}

    for t in range(t_max):
        lp = log_probs[t]
        if prune_vocab < len(lp):
            cand = np.argpartition(lp, -prune_vocab)[-prune_vocab:]
        else:
            cand = np.arange(len(lp))

        nxt: Dict[Tuple[int, ...], List] = {}

        def slot(prefix: Tuple[int, ...]) -> List:
            s = nxt.get(prefix)
            if s is None:
                s = [NEG_INF, NEG_INF, None, NEG_INF, 0.0]
                # [p_b, p_nb, frames, best_source_score, lm_score] — frames
                # follow the highest-scoring way of *creating* this prefix
                # this step; lm_score is a pure function of the prefix
                nxt[prefix] = s
            return s

        for prefix, (p_b, p_nb, frames, lm_sc) in beams.items():
            total = np.logaddexp(p_b, p_nb)
            last = prefix[-1] if prefix else -1

            # stay on this prefix via blank
            s = slot(prefix)
            s[0] = np.logaddexp(s[0], total + lp[blank])
            s[4] = lm_sc
            if s[3] < total:
                s[2], s[3] = frames, total

            for c in cand:
                c = int(c)
                if c == blank:
                    continue
                if c == last:
                    # repeated symbol with no separating blank collapses:
                    # stays on this prefix (non-blank path)
                    s = slot(prefix)
                    s[1] = np.logaddexp(s[1], p_nb + lp[c])
                    s[4] = lm_sc
                    if s[3] < total:
                        s[2], s[3] = frames, total
                    src = p_b  # extension needs a blank in between
                else:
                    src = total
                if src == NEG_INF:
                    continue
                e = slot(prefix + (c,))
                e[1] = np.logaddexp(e[1], src + lp[c])
                if e[2] is None and use_lm:
                    e[4] = lm_sc + lm.logp(c, prefix)
                elif e[2] is None:
                    e[4] = 0.0
                if e[3] < src:
                    e[2], e[3] = frames + [t], src

        ranked = sorted(
            nxt.items(),
            key=lambda kv: (np.logaddexp(kv[1][0], kv[1][1])
                            + bias(kv[0], kv[1][4])),
            reverse=True)[:beam_size]
        beams = {k: [v[0], v[1], v[2], v[4]] for k, v in ranked}

    best = max(beams.items(),
               key=lambda kv: (np.logaddexp(kv[1][0], kv[1][1])
                               + bias(kv[0], kv[1][3])))
    if best[1][2] is None:  # every path had -inf score (degenerate input)
        return [], []
    return list(best[0]), list(best[1][2])


def ctc_beam_batch(
    log_probs: np.ndarray,
    lengths: np.ndarray,
    beam_size: int = 8,
    lm=None,
    lm_weight: float = 0.5,
    token_bonus: float = 0.0,
) -> List[Tuple[List[int], List[int]]]:
    """Batch wrapper: [B, T, V] + [B] -> per-sample (tokens, frames)."""
    return [
        ctc_prefix_beam(log_probs[b], int(lengths[b]), beam_size=beam_size,
                        lm=lm, lm_weight=lm_weight, token_bonus=token_bonus)
        for b in range(log_probs.shape[0])
    ]
