"""PointSeg encoder fwd+bwd variant sweep: where do the 31 ms go?

Isolates candidate costs (BN batch-stat passes, SE global reductions,
batch size, bf16 vs f32 images) so the next optimization is measured, not
guessed. Run: python benchmarks/bench_tower.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.models.pointseg import PointSegNet
from deeplio_tpu.utils.timing import time_fn

H, W, C2 = 64, 1024, 10


def run_variant(name: str, pairs: int = 128, iters: int = 8,
                in_dtype=np.float32, **kw):
    kw.setdefault("h_stride", 2)
    kw.setdefault("w_stride", 4)
    kw.setdefault("el_squeeze", 128)
    net = PointSegNet(part="encoder", dtype=jnp.bfloat16, **kw)
    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.normal(size=(pairs, H, W, C2)).astype(in_dtype)))
        for _ in range(3)]
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((2, H, W, C2), in_dtype), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats")

    def loss(p, x):
        v = {"params": p, **({"batch_stats": stats} if stats else {})}
        out = net.apply(v, x, train=True,
                        mutable=["batch_stats"] if stats else [])
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(jax.value_and_grad(loss))

    def step(x):
        val, _ = g(params, x)
        return val

    t = time_fn(step, xs, iters=iters)
    print(f"{name:32s} {pairs/t:7.0f} pairs/s  ({t*1e3:6.1f} ms @ {pairs})",
          flush=True)


def main():
    run_variant("baseline B=128")
    run_variant("stride pool", pool="stride")
    run_variant("s2d stem", stem="s2d")
    run_variant("fused fire", fire="fused")
    run_variant("s2d + fused", stem="s2d", fire="fused")
    run_variant("s2d + fused + bf16 imgs", stem="s2d", fire="fused",
                in_dtype=np.dtype(jnp.bfloat16))
    run_variant("B=256", pairs=256)
    run_variant("no BN", use_bn=False)
    run_variant("no SE", with_se=False)
    run_variant("bf16 images", in_dtype=np.dtype(jnp.bfloat16))
    run_variant("el full-width (squeeze=0)", el_squeeze=0)


if __name__ == "__main__":
    main()
