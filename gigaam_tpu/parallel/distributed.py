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
        if (num_processes or 0) > 1 or process_id is not None:
            # the caller explicitly asked for a multi-process run; silently
            # proceeding single-process would duplicate work on every host
            # with a wrong global batch and no error anywhere
            raise ValueError(
                "initialize(num_processes=..., process_id=...) needs a "
                "coordinator: pass coordinator_address or set "
                "JAX_COORDINATOR_ADDRESS (no multi-process setup is "
                "discoverable in this environment)")
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


def process_shard(items: Sequence[T], pad: bool = False) -> List[T]:
    """Host-local slice of a global work list (round-robin by process).

    For data-parallel inference across hosts with a HOST-LOCAL mesh
    (``make_mesh(..., devices=jax.local_devices())``): each host loads and
    decodes only its share; results are reassembled by index
    (``process_shard_indices``).

    With a GLOBAL mesh, every dispatch is a collective program all hosts
    must join, so unequal per-host item counts deadlock the host with more
    items.  Pass ``pad=True`` there: the final item is repeated until every
    host holds exactly ceil(n/p) items (all hosts then issue the same
    number of dispatches); drop the duplicate results via
    ``process_shard_indices(n, pad=True)``."""
    p, r = jax.process_count(), jax.process_index()
    mine = [x for i, x in enumerate(items) if i % p == r]
    if pad and items:
        target = -(-len(items) // p)
        while len(mine) < target:
            mine.append(mine[-1] if mine else items[-1])
    return mine


def process_shard_indices(n: int, pad: bool = False) -> List[int]:
    """Global indices of this host's ``process_shard`` items (padded
    duplicates repeat the final index, marking results to drop)."""
    p, r = jax.process_count(), jax.process_index()
    mine = [i for i in range(n) if i % p == r]
    if pad and n:
        target = -(-n // p)
        while len(mine) < target:
            mine.append(mine[-1] if mine else n - 1)
    return mine
