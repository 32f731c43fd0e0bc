"""Shared config builder for the 2-process multihost test and its worker.

The worker script parses sys.argv at import time, so the test cannot import
it — this module holds the one piece both sides must agree on byte-for-byte:
the config under test. "deeplo" shrinks the projection so the CPU cluster
step (projection + conv tower) stays fast while still exercising the flat
SoA plane keys ([B*S, N], dataset.py::_FLAT_KEYS) through
make_global_batch — the multi-process path the deepio config never touches.
"""

import dataclasses
import os

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..")


def make_cfg(name: str):
    from deeplio_tpu.config import load_config

    cfg = load_config(os.path.join(_ROOT, "configs", f"{name}_synth.yaml"))
    if name == "deeplo":
        proj = dataclasses.replace(cfg.datasets.projection,
                                   height=16, width=128, max_points=2048)
        # f32 compute: the test asserts 2-process == 1-process to 1e-5;
        # bf16 amplifies cross-process psum reduction-order rounding to
        # ~1e-4 and would force a tolerance loose enough to hide bugs.
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype="float32"),
            datasets=dataclasses.replace(cfg.datasets, projection=proj,
                                         synthetic_frames=12))
    return cfg
