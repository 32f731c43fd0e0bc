"""A/B flagship tower knobs through the FULL bench.py protocol.

Each variant is a set of overrides of the flagship's `lidar-feat-pointseg`
block; the full train step (projection+fwd+loss+bwd+update) is timed with
the bench.py measurement rules. Decision records feed docs/performance.md.

    python benchmarks/bench_stem_ab.py stem=factorized fire=mixed -- \
        stem=classic            # "--" separates variants
    python benchmarks/bench_stem_ab.py --iters 20 stem=factorized
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import yaml

from __graft_entry__ import _FLAGSHIP, _raw_batch
from common import setup_state, stage_batches
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.parallel import make_mesh
from deeplio_tpu.train import build_train_step

BATCH = 16


def _parse_val(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def run_variant(overrides: dict, iters: int, raw) -> float:
    d = yaml.safe_load(_FLAGSHIP)
    d["lidar-feat-pointseg"].update(overrides)
    # The flagship pins pool=stride-fold, which requires stem=classic; a
    # stem-varying A/B would otherwise crash at config validation. Fall
    # back to the plain stride pool unless the variant pins its own.
    blk = d["lidar-feat-pointseg"]
    if (blk.get("stem", "classic") != "classic"
            and "pool" not in overrides
            and blk.get("pool") == "stride-fold"):
        blk["pool"] = "stride"
    cfg = load_config_dict(d)
    mesh = make_mesh(data=-1)
    n_chips = len(jax.devices())
    model, state, tx = setup_state(cfg, mesh)
    train_step, _ = build_train_step(cfg, model, tx, mesh)
    batches = stage_batches(mesh, raw, 3)

    for i in range(3):
        state, m = train_step(state, batches[i % len(batches)])
    assert np.isfinite(float(jax.device_get(m["loss"])))

    t0 = time.time()
    for i in range(iters):
        state, m = train_step(state, batches[i % len(batches)])
    loss = float(jax.device_get(m["loss"]))
    dt = (time.time() - t0) / iters
    assert np.isfinite(loss)
    pairs = BATCH * n_chips * cfg.datasets.num_pairs
    rate = pairs / dt / n_chips
    tag = " ".join(f"{k}={v}" for k, v in overrides.items()) or "flagship"
    print(f"{tag:40s}: {dt*1e3:7.1f} ms/step  {rate:7.1f} pairs/s/chip",
          flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)

    # Split flags from variant specs BEFORE argparse: a bare "--" is
    # argparse's positional separator and the first one would be silently
    # swallowed, merging two variants into one wrong config.
    flags, spec = [], []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--iters":
            flags.extend(argv[i:i + 2])
            i += 2
        elif argv[i].startswith("--iters="):
            flags.append(argv[i])
            i += 1
        else:
            spec.append(argv[i])
            i += 1
    args = ap.parse_args(flags)

    variants, cur = [], {}
    for tok in spec:
        if tok in ("--", "/"):
            variants.append(cur)
            cur = {}
        else:
            k, v = tok.split("=", 1)
            cur[k] = _parse_val(v)
    variants.append(cur)

    cfg = load_config_dict(yaml.safe_load(_FLAGSHIP))
    n_chips = len(jax.devices())
    raw = _raw_batch(cfg, BATCH * n_chips, seed=0)

    for over in variants:
        run_variant(over, args.iters, raw)


if __name__ == "__main__":
    main()
