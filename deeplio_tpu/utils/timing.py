"""Reliable device timing + throughput harness.

Two hard-won rules for this TPU stack (see bench.py and the projection
work):
  1. ``jax.block_until_ready`` may return before the computation finishes
     on the axon backend — the reliable sync is ``jax.device_get`` of a
     value that DEPENDS on the computation.
  2. Repeating identical input buffers in a timing loop can produce bogus
     (wildly optimistic) numbers — cycle several distinct inputs.

This module is the framework's equivalent of the reference's
``AverageMeter``-based batch timing (SURVEY.md §5 tracing row), done right
for asynchronous dispatch.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import numpy as np


def sync(tree) -> float:
    """Force completion of everything `tree` depends on; returns a scalar
    fetched from the first leaf.

    Only ONE element crosses the device->host link (a whole-array
    device_get of a large output can cost more than the computation being
    timed on a relayed backend). For accurate timing, prefer measured
    functions that reduce their outputs to scalars in-graph.
    """
    leaf = jax.tree_util.tree_leaves(tree)[0]
    if hasattr(leaf, "ravel") and getattr(leaf, "size", 1) > 1:
        leaf = leaf.ravel()[0]
    return float(np.asarray(jax.device_get(leaf)))


def time_fn(fn: Callable, inputs: Sequence, iters: int = 10,
            warmup: int = 2) -> float:
    """Average seconds per call of ``fn`` over distinct ``inputs`` cycled.

    ``fn`` must return device arrays whose values depend on the full
    computation being measured.
    """
    assert len(inputs) >= 1
    out = None
    for i in range(warmup):
        out = fn(inputs[i % len(inputs)])
    sync(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    sync(out)
    return (time.time() - t0) / iters


def throughput(fn: Callable, inputs: Sequence, items_per_call: int,
               iters: int = 10, warmup: int = 2) -> float:
    """Items/second of ``fn`` (e.g. frame-pairs/s of a train step)."""
    dt = time_fn(fn, inputs, iters=iters, warmup=warmup)
    return items_per_call / dt
