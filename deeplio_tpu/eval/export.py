"""Serving export: serialize the streaming-odometry step to a deploy
artifact.

The reference has no deployment story beyond "run test.py" (SURVEY.md
§2.5); a TPU-native framework intended for serving needs one. This module
exports ``StreamingOdometry``'s compiled chunk step — projection + model
forward + pose composition, with the trained weights baked in as
constants — via ``jax.export`` to a self-contained artifact:

    artifact/
      streaming_step.bin   serialized StableHLO program (weights embedded)
      carry_init.npz       the initial carry values (pose starts at I, etc.)
      manifest.json        shapes, dtypes, platforms, config provenance

A serving process needs only ``load_streaming_artifact`` (or raw
``jax.export.deserialize``) and the manifest — no model zoo, no config
parsing, no checkpoint plumbing. Multi-platform export (tpu + cpu by
default) lets the same artifact serve on TPU and be smoke-tested on CPU.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from deeplio_tpu.config.schema import Config
from deeplio_tpu.eval.streaming import StreamingOdometry

_BIN = "streaming_step.bin"
_CARRY = "carry_init.npz"
_MANIFEST = "manifest.json"


def _example_chunk(cfg: Config, chunk: int):
    ds = cfg.datasets
    n = ds.projection.max_points
    t = ds.max_imu_per_pair
    ex = {
        "points": jnp.zeros((chunk, n, 4), jnp.float32),
        "valid": jnp.zeros((chunk, n), bool),
    }
    if cfg.model.arch == "deeplio":
        ex["imu"] = jnp.zeros((chunk, t, 6), jnp.float32)
        ex["imu_mask"] = jnp.zeros((chunk, t), jnp.float32)
    return ex


def export_streaming(cfg: Config, model, variables, out_dir: str,
                     chunk: int = 16,
                     platforms: Sequence[str] = ("tpu", "cpu")) -> str:
    """Export the streaming chunk step; returns the artifact dir.

    The exported call is ``(carry, chunk_inputs) -> (carry, (poses [c,4,4],
    dx [c,3], dq [c,4]))`` with ``carry = (prev_img, pose, started)`` —
    exactly ``StreamingOdometry._chunk_fn``, weights embedded.
    """
    so = StreamingOdometry(cfg, model, variables, chunk=chunk)
    carry = so.init_carry()
    ex = _example_chunk(cfg, chunk)
    exp = jexport.export(so._chunk_fn, platforms=list(platforms))(carry, ex)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BIN), "wb") as f:
        f.write(exp.serialize())
    np.savez(os.path.join(out_dir, _CARRY),
             **{f"c{i}": np.asarray(c) for i, c in enumerate(carry)})
    manifest = {
        "kind": "deeplio_tpu.streaming_step",
        "version": 1,
        "platforms": list(exp.platforms),
        "chunk": chunk,
        "arch": cfg.model.arch,
        "inputs": {k: [list(v.shape), str(v.dtype)] for k, v in ex.items()},
        "carry": [[list(np.shape(c)), str(jnp.asarray(c).dtype)]
                  for c in carry],
        "image": {"height": cfg.datasets.projection.height,
                  "width": cfg.datasets.projection.width,
                  "channels": list(cfg.datasets.channels)},
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


def load_streaming_artifact(art_dir: str) -> Tuple[Callable, Callable, dict]:
    """Load an artifact; returns (step, init_carry, manifest).

    ``step(carry, chunk_inputs)`` is the jitted deserialized program;
    ``init_carry()`` loads the artifact's initial carry values."""
    with open(os.path.join(art_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("kind") != "deeplio_tpu.streaming_step":
        raise ValueError(f"not a streaming artifact: {art_dir}")
    with open(os.path.join(art_dir, _BIN), "rb") as f:
        exp = jexport.deserialize(f.read())
    step = jax.jit(exp.call)

    def init_carry():
        with np.load(os.path.join(art_dir, _CARRY)) as z:
            return tuple(jnp.asarray(z[f"c{i}"]) for i in range(len(z.files)))

    return step, init_carry, manifest
