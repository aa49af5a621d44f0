"""Smoke tests for the profiling utilities (CPU).

The reference has no in-repo tracing/timing (SURVEY.md §5); ours is a
first-class deliverable, so pin its contract: device_timeit returns a
sane positive per-iteration time in both accumulate and chain modes, and
trace() produces a profiler artifact directory.
"""

import os

import numpy as np

import jax.numpy as jnp

from gigaam_tpu.profiling import device_timeit, trace


def _mm(a, b):
    return jnp.tanh(a @ b)


def test_device_timeit_accumulate_mode():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((64, 64)),
                    jnp.float32)
    dt = device_timeit(_mm, (a, b), k=3, windows=1, reps=2)
    assert 0.0 < dt < 1.0


def test_device_timeit_chain_mode():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((32, 32)),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((32, 32)),
                    jnp.float32)
    dt = device_timeit(_mm, (a, b), k=3, windows=1, reps=2, chain=True)
    assert 0.0 < dt < 1.0


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "prof")
    with trace(log_dir):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        x.block_until_ready()
    # jax writes plugins/profile/<ts>/ under the log dir
    found = []
    for root, _dirs, files in os.walk(log_dir):
        found.extend(files)
    assert found, "trace() produced no profiler artifacts"


def test_device_timeit_chain_multi_leaf_and_int_args():
    """chain mode must anchor every output leaf (not just the carry), and
    integer perturb args must not truncate the anti-CSE deltas to zero."""
    import jax.numpy as jnp

    from gigaam_tpu.profiling import device_timeit

    def fn(x, y):
        return x * 1.0001, (x @ x.T).sum(axis=1)  # carry leaf + extra leaf

    x = jnp.ones((8, 8), jnp.float32)
    t = device_timeit(fn, (x, jnp.zeros(())), k=3, windows=1, reps=2,
                      chain=True)
    assert t > 0.0

    def int_fn(ids):
        return (ids * 2).sum()

    t2 = device_timeit(int_fn, (jnp.arange(16, dtype=jnp.int32),),
                       k=3, windows=1, reps=2)
    assert t2 > 0.0


def test_train_step_flops_model():
    """Analytic train-FLOPs accounting (bench.py): invariants that keep the
    MFU/HFU numbers in docs/PERF.md honest."""
    from bench import pipeline_flops, train_step_flops

    b, n = 8, 16000 * 20
    fwd = pipeline_flops(b, n)
    ctc_full = train_step_flops(b, n, remat="full", head="ctc")
    ctc_dots = train_step_flops(b, n, remat="dots", head="ctc")
    rnnt = train_step_flops(b, n, remat="full", head="rnnt")
    bestrq = train_step_flops(b, n, remat="full", head="bestrq")

    # model FLOPs = 3x forward (+ head extras); hardware adds remat only
    assert ctc_full["model"] == 3.0 * fwd
    assert ctc_dots["hardware"] == ctc_dots["model"] == ctc_full["model"]
    assert ctc_full["hardware"] > ctc_full["model"]
    # the remat surcharge is exactly the layer stack's forward
    layers_fwd = fwd - pipeline_flops(b, n, layers=0)
    assert ctc_full["hardware"] - ctc_full["model"] == layers_fwd
    # heads add work on top of the shared encoder
    assert rnnt["model"] > ctc_full["model"]
    assert bestrq["model"] > ctc_full["model"]
    # scaling: FLOPs are linear in batch
    double = train_step_flops(2 * b, n, remat="full", head="ctc")
    assert abs(double["model"] / ctc_full["model"] - 2.0) < 1e-6
