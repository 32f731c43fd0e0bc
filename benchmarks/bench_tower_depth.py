"""Per-stage cost breakdown of the PointSeg encoder fwd+bwd.

Times the encoder truncated after each stage; successive differences
isolate stage costs (stem, fire2-3, fire4-5, fire6-9, EL). Run:
python benchmarks/bench_tower_depth.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.models.blocks import ASPP, ConvBN, Fire, SELayer
from deeplio_tpu.utils.timing import time_fn

H, W, C2 = 64, 1024, 10
PAIRS = 128


class Truncated(nn.Module):
    depth: int  # 1=stem, 2=+f2f3, 3=+f4f5, 4=+f6-9, 5=+EL
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        c1 = ConvBN(64, (3, 3), (2, 4), dtype=dt)(x, train)
        p1 = nn.max_pool(c1, (3, 3), strides=(1, 2), padding="SAME")
        if self.depth == 1:
            return p1
        f2 = Fire(16, 64, 64, True, dt)(p1, train)
        f3 = Fire(16, 64, 64, True, dt)(f2, train)
        f3 = SELayer(dtype=dt)(f3) + f2
        p3 = nn.max_pool(f3, (3, 3), strides=(1, 2), padding="SAME")
        if self.depth == 2:
            return p3
        f4 = Fire(32, 128, 128, True, dt)(p3, train)
        f5 = Fire(32, 128, 128, True, dt)(f4, train)
        f5 = SELayer(dtype=dt)(f5) + f4
        p5 = nn.max_pool(f5, (3, 3), strides=(1, 2), padding="SAME")
        if self.depth == 3:
            return p5
        f6 = Fire(48, 192, 192, True, dt)(p5, train)
        f7 = Fire(48, 192, 192, True, dt)(f6, train)
        f8 = Fire(64, 256, 256, True, dt)(f7, train)
        f9 = Fire(64, 256, 256, True, dt)(f8, train)
        if self.depth == 4:
            return f9
        return ASPP(512, squeeze=128, dtype=dt)(f9)


def run(depth: int, prev_ms: float) -> float:
    net = Truncated(depth)
    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.normal(size=(PAIRS, H, W, C2)).astype(np.float32)))
        for _ in range(3)]
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((2, H, W, C2), np.float32), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def loss(p, x):
        out, _ = net.apply({"params": p, "batch_stats": stats}, x, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(jax.value_and_grad(loss))
    t = time_fn(lambda x: g(params, x)[0], xs, iters=8) * 1e3
    name = ["stem+pool", "+fire2-3+SE", "+fire4-5+SE", "+fire6-9", "+EL(sq128)"][depth - 1]
    print(f"depth {depth} {name:14s} {t:6.1f} ms  (stage +{t - prev_ms:5.1f} ms)",
          flush=True)
    return t


def main():
    prev = 0.0
    for d in range(1, 6):
        prev = run(d, prev)


if __name__ == "__main__":
    main()
