"""Why does the stem conv (3x3, C=10 -> 64, stride (2,4)) cost 8.3 ms
fwd+bwd at B=128 when its FLOPs are ~0.06 ms?

Isolates the candidate causes: input channel count / padding, dtype,
stride handling, the max_pool, and the conv backward. Run:
python benchmarks/bench_stem.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.utils.timing import time_fn

B, H, W = 128, 64, 1024


def run(name, cin=10, in_dtype=np.float32, stride=(2, 4), kernel=(3, 3),
        pool=False, bwd=True, iters=8):
    conv = nn.Conv(64, kernel, stride, padding="SAME", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.normal(size=(B, H, W, cin)).astype(in_dtype)))
        for _ in range(3)]
    params = conv.init(jax.random.PRNGKey(0), jnp.zeros((2, H, W, cin), in_dtype))

    def loss(p, x):
        y = conv.apply(p, x)
        if pool:
            y = nn.max_pool(y, (3, 3), strides=(1, 2), padding="SAME")
        return jnp.sum(y.astype(jnp.float32))

    if bwd:
        g = jax.jit(jax.value_and_grad(loss))
        def step(x):
            v, gr = g(params, x)
            return v, gr
    else:
        f = jax.jit(loss)
        def step(x):
            return f(params, x)

    t = time_fn(step, xs, iters=iters) * 1e3
    print(f"{name:34s} {t:6.2f} ms", flush=True)
    return t


def run_s2d_input(name, block=(2, 4), cin=10, in_dtype=np.float32,
                  bwd=True, pool=False, iters=8):
    """Upper bound for a projection-epilogue-emits-s2d stem: the input is
    ALREADY in space-to-depth layout [B, H/bh, W/bw, bh*bw*C] (the
    transpose is assumed fused into the projection gather for free), and
    the stem is the equivalent dense 2x2 conv (receptive field covers the
    classic 3x3-stride-(2,4) window)."""
    bh, bw = block
    ci = bh * bw * cin
    conv = nn.Conv(64, (2, 2), (1, 1), padding="SAME", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.normal(size=(B, H // bh, W // bw, ci)).astype(in_dtype)))
        for _ in range(3)]
    params = conv.init(jax.random.PRNGKey(0),
                       jnp.zeros((2, H // bh, W // bw, ci), in_dtype))

    def loss(p, x):
        y = conv.apply(p, x)
        if pool:
            y = nn.max_pool(y, (3, 3), strides=(1, 2), padding="SAME")
        return jnp.sum(y.astype(jnp.float32))

    step = (jax.jit(jax.value_and_grad(loss)) if bwd
            else jax.jit(loss))
    t = time_fn(lambda x: step(params, x), xs, iters=iters) * 1e3
    print(f"{name:34s} {t:6.2f} ms", flush=True)
    return t


def main():
    run("stem fwd+bwd (baseline)", pool=True)
    run("conv only fwd+bwd (no pool)")
    run("conv only fwd (no bwd)", bwd=False)
    run("bf16 input", in_dtype=np.dtype(jnp.bfloat16))
    run("C_in=8", cin=8)
    run("C_in=128", cin=128)
    run("stride (1,1) 1x1 kernel C=64", cin=64, kernel=(1, 1), stride=(1, 1))


def main_s2d():
    run_s2d_input("s2d-in conv2x2 fwd+bwd")
    run_s2d_input("s2d-in conv2x2 fwd", bwd=False)
    run_s2d_input("s2d-in conv2x2 bf16 in",
                  in_dtype=np.dtype(jnp.bfloat16))
    run("classic stem fwd+bwd (control)")


if __name__ == "__main__" and "--wfold" not in sys.argv and \
        "--s2d" not in sys.argv:
    main()

if __name__ == "__main__" and "--s2d" in sys.argv:
    main_s2d()


def run_wfold(name, cin=10, in_dtype=np.float32, iters=8):
    """Stem re-expressed: w-stride-4 windows don't overlap (kernel 3), so
    slice each 4-column group to its first 3 columns, fold them into
    channels, and run a (3,1)-kernel (2,1)-stride conv — identical math,
    different XLA mapping."""
    conv = nn.Conv(64, (3, 1), (2, 1), padding=((0, 1), (0, 0)),
                   dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.normal(size=(B, H, W, cin)).astype(in_dtype)))
        for _ in range(3)]

    def fold(x):
        b, h, w, c = x.shape
        xw = x.reshape(b, h, w // 4, 4, c)[:, :, :, :3, :]
        return xw.reshape(b, h, w // 4, 3 * c)

    params = conv.init(jax.random.PRNGKey(0),
                       fold(jnp.zeros((2, H, W, cin), in_dtype)))

    def loss(p, x):
        y = conv.apply(p, fold(x))
        y = nn.max_pool(y, (3, 3), strides=(1, 2), padding="SAME")
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.value_and_grad(loss))
    t = time_fn(lambda x: g(params, x), xs, iters=iters) * 1e3
    print(f"{name:34s} {t:6.2f} ms", flush=True)
    return t


if __name__ == "__main__" and "--wfold" in sys.argv:
    run_wfold("wfold stem fwd+bwd")
    run_wfold("wfold stem bf16 in", in_dtype=np.dtype(jnp.bfloat16))
