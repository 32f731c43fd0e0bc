"""Multi-host (multi-process) data parallelism plumbing.

The reference has no distributed backend at all (SURVEY.md §2.7); the
rebuild's scale-out story is JAX-native: ``jax.distributed.initialize``
connects processes, the mesh spans *global* devices, each process feeds
only its addressable shard of every global batch
(``jax.make_array_from_process_local_data``), and gradient psum rides ICI
within a slice / DCN across hosts via XLA collectives (SURVEY.md §5
distributed row).

Process topology is taken from env vars (set by the launcher) or explicit
CLI flags:

    DEEPLIO_COORDINATOR=host:port  DEEPLIO_NUM_PROCESSES=2  DEEPLIO_PROCESS_ID=0

On TPU pods, ``jax.distributed.initialize()`` with no args autodetects the
topology; ``maybe_initialize`` therefore also fires when
``JAX_COORDINATOR_ADDRESS`` is present (the standard launcher contract).
Single-process runs are a no-op — every helper degrades to identity.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from deeplio_tpu.utils import get_app_logger

_INITIALIZED = False


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Connect this process to the jax.distributed cluster if configured.

    Returns True when running multi-process (after initialize), False for
    plain single-process. Safe to call more than once.
    """
    global _INITIALIZED
    coordinator = coordinator or os.environ.get("DEEPLIO_COORDINATOR")
    if num_processes is None and "DEEPLIO_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DEEPLIO_NUM_PROCESSES"])
    if process_id is None and "DEEPLIO_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DEEPLIO_PROCESS_ID"])

    autodetect = "JAX_COORDINATOR_ADDRESS" in os.environ
    if not coordinator and not autodetect:
        return jax.process_count() > 1
    if _INITIALIZED:
        return jax.process_count() > 1
    kwargs = {}
    if coordinator:
        if num_processes is None or process_id is None:
            raise ValueError(
                "DEEPLIO_COORDINATOR requires DEEPLIO_NUM_PROCESSES and "
                "DEEPLIO_PROCESS_ID (or pass num_processes/process_id)")
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    get_app_logger().info(
        "jax.distributed initialized: process %d/%d, %d global / %d local devices",
        jax.process_index(), jax.process_count(),
        len(jax.devices()), len(jax.local_devices()))
    return True


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint side effects."""
    return jax.process_index() == 0


def make_global_batch(sharding, local_batch: Dict[str, np.ndarray],
                      global_batch_size: int):
    """Assemble global device arrays from this process's local rows.

    Keys need not share a leading dim: window-level keys carry
    ``global_batch_size / process_count`` local rows while the flat SoA
    plane keys (``points_*``, dataset.py::_FLAT_KEYS) carry
    ``local_windows * S`` rows — each key's global shape is therefore
    derived from its OWN local leading dim scaled by the process count
    (processes contribute equal, process-major row blocks).
    """
    nproc = jax.process_count()
    local_bs = global_batch_size // nproc

    def put(k, v):
        if v.shape[0] % local_bs:
            raise ValueError(
                f"batch key {k!r}: local leading dim {v.shape[0]} is not a "
                f"multiple of the per-process batch {local_bs} "
                f"(global {global_batch_size} / {nproc} processes)")
        shape = (v.shape[0] * nproc,) + tuple(v.shape[1:])
        return jax.make_array_from_process_local_data(sharding, v, shape)
    return {k: put(k, v) for k, v in local_batch.items()}
