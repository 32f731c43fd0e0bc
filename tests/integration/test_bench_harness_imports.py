"""Import smoke for the benchmarks/ harnesses.

benchmarks/common.py was factored out of the harnesses during a TPU-relay
outage — the harnesses themselves can only EXECUTE on the real chip, so
this at least guarantees module-level integrity (imports, names, arg
plumbing) before a measurement-blitz stage spends a remote compile on
them. bench.py stays self-contained and has its own full contract smoke
(test_bench_contract.py)."""

import importlib
import pathlib
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = str(pathlib.Path(__file__).resolve().parents[2])

HARNESSES = ["common", "bench_batch_sweep", "bench_stem_ab", "profile_step",
             "bench_projection", "bench_stream", "bench_overlap", "r3_adopt",
             "xplane"]


@pytest.mark.parametrize("mod", HARNESSES)
def test_harness_imports(mod):
    sys.path.insert(0, str(pathlib.Path(REPO) / "benchmarks"))
    sys.path.insert(0, REPO)
    try:
        importlib.import_module(mod)
    finally:
        sys.path.pop(0)
        sys.path.pop(0)


