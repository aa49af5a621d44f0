"""Profiling / timing utilities.

The reference has no in-repo tracing (SURVEY.md §5) — only hand-written
timing tables in evaluation.md.  Here profiling is first-class:

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard/XProf trace of everything inside.
* ``device_timeit(fn, *args)`` — robust kernel timing that amortizes host
  dispatch overhead by looping K iterations on device with a data
  dependency between the loop counter and the inputs (prevents CSE).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _perturb_delta(i, dtype):
    """Per-iteration input perturbation that survives the dtype.

    For floats 1e-7*i is numerically negligible but defeats loop-invariant
    motion; for integer args (token ids, lengths) that value would truncate
    to 0 and silently disable the defense — alternate +0/+1 instead."""
    if jnp.issubdtype(dtype, jnp.inexact):
        return jnp.asarray(1e-7, dtype) * i.astype(dtype)
    return (i % 2).astype(dtype)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timeit(
    fn: Callable,
    args: Sequence,
    perturb_arg: int = 0,
    k: int = 10,
    windows: int = 3,
    reps: int = 5,
    chain: bool = False,
) -> float:
    """Median-of-best-window per-iteration seconds for ``fn(*args)``.

    Wraps ``fn`` in a device-side ``fori_loop`` of ``k`` iterations, adding
    ``1e-7 * i`` to ``args[perturb_arg]`` each iteration so XLA cannot
    collapse the loop. Returns seconds per single ``fn`` evaluation.

    ``chain=True`` (requires ``fn``'s first output leaf to have the shape
    and dtype of ``args[perturb_arg]``) feeds each iteration's output back
    as the next iteration's input — a sequential data dependency that no
    result-reuse or loop-invariant-motion shortcut can break.  Prefer it
    for pure-tensor ops; it is the only mode observed to be robust against
    the remote-TPU plugin's degenerate fast path.
    """

    @jax.jit
    def run_k(*a):
        if chain:
            def body(i, carry):
                x, acc = carry
                aa = list(a)
                aa[perturb_arg] = x
                out = fn(*aa)
                leaves = jax.tree.leaves(out)
                # anchor the non-carried leaves too: feeding back only
                # leaves[0] would let XLA dead-code-eliminate every op that
                # feeds the rest (same trap as the non-chain branch below)
                for leaf in leaves[1:]:
                    acc = acc + jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                return leaves[0].astype(x.dtype), acc

            final, acc = jax.lax.fori_loop(
                0, k, body, (a[perturb_arg], jnp.float32(0)))
            return jnp.sum(jnp.abs(final)).astype(jnp.float32) + acc

        def body(i, acc):
            aa = list(a)
            aa[perturb_arg] = aa[perturb_arg] + _perturb_delta(
                i, aa[perturb_arg].dtype)
            out = fn(*aa)
            # anchor EVERY output leaf: reducing only leaves[0] lets XLA
            # dead-code-eliminate all compute feeding the other outputs
            # (e.g. timing an encoder via (lengths, encoded) would DCE the
            # whole encoder and report fantasy numbers).  abs before the
            # reduction: a plain sum would let XLA rewrite sum(A@B) into
            # dot(colsum(A), rowsum(B)) and skip the matmul.
            total = jnp.float32(0)
            for leaf in jax.tree.leaves(out):
                total = total + jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
            return acc + total

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    # Alternate between two physically distinct input buffers across timed
    # dispatches: repeated *identical* dispatches have been observed to hit
    # a degenerate fast path on the remote-TPU plugin (results returned in
    # ~0.1 ms, far below the compute's FLOP bound), which silently produces
    # fantasy numbers.
    a0 = list(args)
    a1 = list(args)
    _dt = jnp.asarray(a1[perturb_arg]).dtype
    _eps = 1e-6 if jnp.issubdtype(_dt, jnp.inexact) else 1
    a1[perturb_arg] = a1[perturb_arg] + jnp.asarray(_eps, _dt)
    variants = [tuple(a0), tuple(a1)]
    jax.block_until_ready([v[perturb_arg] for v in variants])

    float(run_k(*variants[0]))  # compile
    float(run_k(*variants[1]))
    medians = []
    n = 0
    for _ in range(windows):
        times = []
        for _ in range(reps):
            va = variants[n % 2]
            n += 1
            t0 = time.perf_counter()
            # consume the scalar via D2H: on the remote-TPU plugin,
            # block_until_ready has been observed to return early on its
            # degenerate fast path; a value read cannot
            float(run_k(*va))
            times.append((time.perf_counter() - t0) / k)
        medians.append(float(np.median(times)))
    return min(medians)
