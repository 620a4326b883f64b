"""Multi-process (multi-host) initialization and host-level reductions.

The reference does DDP process-group setup inline in each runner
(train.py:33-53: MASTER_ADDR/PORT env vars, NCCL init, rank-0 print
suppression) and all-reduces metric counters with torch.distributed
(misc/metric_util.py:69-73). The TPU-native equivalent is one
``jax.distributed.initialize`` per process — afterwards ``jax.devices()``
is global, a single jitted step over a global Mesh handles gradient
reduction implicitly, and host-level scalars go through a tiny allgather.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger("gaussianformer_tpu")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> tuple:
    """Initialize JAX's distributed runtime when running multi-process.

    Args default from the env (COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID — also understands the reference's MASTER_ADDR/MASTER_PORT/
    WORLD_SIZE/RANK, train.py:33-46). On TPU pods with no explicit config,
    ``jax.distributed.initialize()`` auto-detects. Single-process runs are
    a no-op. Returns (process_index, process_count).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None and "MASTER_ADDR" in os.environ:
        coordinator_address = (f"{os.environ['MASTER_ADDR']}:"
                               f"{os.environ.get('MASTER_PORT', '12345')}")
    if num_processes is None:
        num_processes = int(os.environ.get(
            "NUM_PROCESSES", os.environ.get("WORLD_SIZE", "1")))
    if process_id is None:
        process_id = int(os.environ.get(
            "PROCESS_ID", os.environ.get("RANK", "0")))

    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        logger.info("distributed: process %d/%d, %d global devices",
                    jax.process_index(), jax.process_count(),
                    len(jax.devices()))
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_reduce_sum_host(x: np.ndarray) -> np.ndarray:
    """Sum a host-side numpy array across all processes (reference
    dist.all_reduce of MeanIoU counters, metric_util.py:69-73).
    Single-process: identity."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.asarray(gathered).sum(axis=0)
