"""Multi-host runtime helpers.

The reference's only distribution is single-node Lightning DDP
(``train_utils/train.py:168``).  TPU pods are multi-host by construction:
every host runs the same program and sees the global mesh; XLA collectives
ride ICI within a slice and DCN across slices.  This module wraps the
bootstrap and the host-local data split.

Typical pod-slice usage::

    from gigaam_tpu.parallel import distributed as dist
    dist.initialize()                       # no-op on single host
    mesh = make_mesh(data=jax.device_count())
    model.set_mesh(mesh)                    # DP inference
    # or FineTuner(model, tc, mesh=mesh)    # DP(+TP) training
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host runs.

    On TPU pods the arguments are discovered from the environment; passing
    nothing is correct there.  Safe no-op when already initialized or when
    running single-process.

    Must run before any other JAX call (backend-initializing probes like
    ``jax.devices()`` or ``jax.process_count()`` included — an earlier
    version guarded on process_count and thereby *always* failed on
    explicitly-addressed clusters, silently running every host
    single-process).
    """
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and not _env_configured():
        return  # single-host: nothing to bootstrap
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def _env_configured() -> bool:
    """True when the environment advertises a *multi-process* setup that
    jax.distributed.initialize() can auto-discover (single-host markers
    like TPU_WORKER_HOSTNAMES=localhost must not trigger a bootstrap)."""
    import os

    env = os.environ
    if any(env.get(k) for k in ("JAX_COORDINATOR_ADDRESS",
                                "COORDINATOR_ADDRESS",
                                "MEGASCALE_COORDINATOR_ADDRESS")):
        return True
    if "," in env.get("TPU_WORKER_HOSTNAMES", ""):
        return True  # multiple pod workers
    for k in ("OMPI_COMM_WORLD_SIZE", "SLURM_NTASKS", "PMI_SIZE"):
        try:
            if int(env.get(k, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def process_shard(items: Sequence[T]) -> List[T]:
    """Host-local slice of a global work list (round-robin by process).

    For data-parallel longform inference across hosts: each host loads and
    decodes only its share of VAD segments; results are reassembled by
    index (``process_shard_indices``)."""
    return [x for i, x in enumerate(items)
            if i % jax.process_count() == jax.process_index()]


def process_shard_indices(n: int) -> List[int]:
    return [i for i in range(n)
            if i % jax.process_count() == jax.process_index()]
