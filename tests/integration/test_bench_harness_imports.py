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


def test_xplane_bucketing_is_opcode_level():
    """Regression for the round-3 '9 ms custom-call residual' artifact:
    classification must key on the parsed opcode, never on operand text —
    a fusion CONSUMING a %custom-call operand is not a kernel op."""
    sys.path.insert(0, str(pathlib.Path(REPO) / "benchmarks"))
    try:
        from xplane import bucket_ops, opcode_of
    finally:
        sys.path.pop(0)
    kernel = ('%jvp__.1 = (s32[144,32,2048]{2,1,0:T(8,128)S(1)}) '
              'custom-call(s32[144,64,2048]{2,1,0:T(8,128)} %x), '
              'custom_call_target="tpu_custom_call"')
    consumer = ('%fusion.1650 = (bf16[512]{0:T(512)(128)(2,1)}) '
                'fusion(f32[3,3,512,256]{3,2,1,0:T(8,128)S(1)} '
                '%custom-call.66, bf16[128,16,16,256]{3,0,2,1} %y)')
    convert = ('%convert_reduce_fusion.7 = (f32[256]{0:T(256)S(1)}) '
               'fusion(bf16[128,16,16,256]{3,0,2,1:T(8,128)(2,1)} %a)')
    conv = ('%convolution_add_fusion.7 = bf16[128,32,32,256]'
            '{3,0,2,1:T(8,128)(2,1)} fusion(bf16[3,3,64,256]{3,2,1,0} %w)')
    sharding = ('%custom-call.9 = f32[8]{0:T(256)} custom-call(f32[8] %z), '
                'custom_call_target="Sharding"')
    assert opcode_of(kernel) == "custom-call"
    assert opcode_of(consumer) == "fusion"
    b = bucket_ops({kernel: 9.0, consumer: 1.0, convert: 1.0, conv: 1.0,
                    sharding: 0.5})
    assert b["pallas-kernel"] == 9.0
    assert b["fusion/layout"] == 2.0          # consumer + convert_reduce
    assert b["conv"] == 1.0
    assert b["custom-call:Sharding"] == 0.5


