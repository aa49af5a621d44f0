"""Data-parallel inference over the virtual mesh: sharded longform decode
equals single-device results (BASELINE config: batched multi-host DP
decode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigaam_tpu.audio import save_wav
from gigaam_tpu.models.model import GigaAMASR
from gigaam_tpu.parallel.mesh import make_mesh
from gigaam_tpu.parallel import distributed as dist

from test_training import tiny_cfg


@pytest.fixture(scope="module")
def long_wav(tmp_path_factory):
    rng = np.random.default_rng(0)
    sr = 16000
    pieces = []
    for i in range(5):
        t = np.arange(sr * 7) / sr
        pieces.append((0.3 * np.sin(2 * np.pi * (300 + 30 * i) * t)
                       + 0.02 * rng.standard_normal(sr * 7)).astype(np.float32))
        pieces.append(np.zeros(sr, dtype=np.float32))
    path = str(tmp_path_factory.mktemp("a") / "long.wav")
    save_wav(path, np.concatenate(pieces))
    return path


@pytest.mark.parametrize("kind", ["ctc", "rnnt"])
def test_sharded_longform_matches_single(long_wav, kind):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    single = GigaAMASR(tiny_cfg(kind), seed=0, compute_dtype=jnp.float32)
    sharded = GigaAMASR(tiny_cfg(kind), seed=0, compute_dtype=jnp.float32)
    sharded.set_mesh(make_mesh(data=8, model=1))

    res_s = single.transcribe_longform(long_wav, word_timestamps=True)
    res_m = sharded.transcribe_longform(long_wav, word_timestamps=True)

    assert len(res_s) == len(res_m) >= 1
    for a, b in zip(res_s, res_m):
        assert a.text == b.text
        assert a.start == b.start and a.end == b.end
    # params physically replicated on all devices
    w = sharded.params["encoder"]["layers"]["norm_out"]["scale"]
    assert len(w.sharding.device_set) == 8


def test_sharded_odd_batch(long_wav):
    """Row padding: batch sizes not divisible by DP size still decode."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = GigaAMASR(tiny_cfg("ctc"), seed=1, compute_dtype=jnp.float32)
    model.set_mesh(make_mesh(data=4, model=2))
    rng = np.random.default_rng(1)
    wavs = [(0.1 * rng.standard_normal(16000 * (1 + i % 2))).astype(np.float32)
            for i in range(3)]  # 3 rows on a 4-way DP axis
    out = model._decode_batch(wavs, word_timestamps=False)
    assert len(out) == 3


def test_process_shard_single_host():
    items = list(range(10))
    assert dist.process_shard(items) == items
    assert dist.process_shard_indices(4) == [0, 1, 2, 3]
    dist.initialize()  # no-op on single host


def test_sharded_beam_matches_single(long_wav):
    """RNNT beam search under a data-parallel mesh must match single-device
    beam output (beam state is per-sample, so DP sharding is transparent)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = GigaAMASR(tiny_cfg("rnnt"), seed=0, compute_dtype=jnp.float32)
    sharded = GigaAMASR(tiny_cfg("rnnt"), seed=0, compute_dtype=jnp.float32)
    sharded.set_mesh(make_mesh(data=8, model=1))
    res_s = single.transcribe_longform(long_wav, beam_size=4)
    res_m = sharded.transcribe_longform(long_wav, beam_size=4)
    assert [s.text for s in res_s] == [s.text for s in res_m]


def test_process_shard_padding():
    """pad=True gives every host ceil(n/p) items (single-host: no-op)."""
    from gigaam_tpu.parallel import distributed as dist

    items = ["a", "b", "c"]
    assert dist.process_shard(items, pad=True) == items
    assert dist.process_shard_indices(3, pad=True) == [0, 1, 2]
    assert dist.process_shard([], pad=True) == []


def test_initialize_refuses_silent_single_process(monkeypatch):
    """Explicit num_processes>1 without a discoverable coordinator must
    raise, not silently run every host single-process."""
    import pytest as _pytest

    from gigaam_tpu.parallel import distributed as dist

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
              "OMPI_COMM_WORLD_SIZE", "SLURM_NTASKS", "PMI_SIZE"):
        monkeypatch.delenv(k, raising=False)
    with _pytest.raises(ValueError, match="coordinator"):
        dist.initialize(num_processes=2, process_id=0)
    dist.initialize()  # argless stays a safe no-op
