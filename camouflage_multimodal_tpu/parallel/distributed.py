"""Multi-host initialization.

For multi-host TPU pods: call :func:`initialize` once per process before any
device work; batch-parallel eval/training then shards over the global mesh
(ICI within a slice, DCN across hosts — GSPMD picks the collectives). The
reference had no distributed path at all (SURVEY.md §2.3); this is the
idiomatic replacement.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). A no-op
    for single-process runs."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch_indices(n: int, shuffle_seed: Optional[int] = None):
    """Per-process shard of [0, n) for host-sharded data loading."""
    import numpy as np

    pid = jax.process_index()
    nproc = jax.process_count()
    idx = np.arange(n)
    if shuffle_seed is not None:
        idx = np.random.default_rng(shuffle_seed).permutation(n)
    return idx[pid::nproc]
