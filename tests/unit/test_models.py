"""Model zoo tests: all three archs build from config, emit correct shapes,
take gradients, and respect variant switches (SURVEY.md §2.3/§3.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.config import load_config_dict
from deeplio_tpu.models import build_model, example_batch, init_model

SMALL_DS = {
    "sequence-size": 3,
    "combinations": [[0, 1], [1, 2]],
    "channels": ["x", "y", "z", "remission", "depth"],
    "image-height": 16,
    "image-width": 128,
    "max-imu-per-pair": 8,
}


def _cfg(arch, **over):
    d = {
        "arch": arch,
        "datasets": dict(SMALL_DS),
        "compute-dtype": "float32",
        arch: {
            "lidar-feat-net": {"name": over.pop("lidar", "lidar-feat-simple-0")},
            "imu-feat-net": {"name": over.pop("imu", "imu-feat-rnn")},
            "fusion-net": {"type": over.pop("fusion", "soft")},
            "odom-feat-net": {"name": over.pop("odom", "odom-feat-rnn")},
            "dropout": 0.1,
        },
        "lidar-feat-simple-0": {"feature-size": 64, "base-channels": 8},
        "lidar-feat-simple-1": {"feature-size": 64, "base-channels": 8},
        "lidar-feat-pointseg": {"feature-size": 64},
        "imu-feat-rnn": {"hidden-size": 16, "num-layers": 2},
        "imu-feat-fc": {"hidden-size": 16},
        "odom-feat-rnn": {"hidden-size": 32, "num-layers": 1},
        "odom-feat-fc": {"hidden-size": 32},
    }
    d.update(over)
    return load_config_dict(d)


def _random_batch(cfg, B=2, seed=0):
    rng = np.random.default_rng(seed)
    b = example_batch(cfg, B)
    return {k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
            for k, v in b.items()}


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["deepio", "deeplo", "deeplio"])
def test_arch_forward_shapes(arch):
    cfg = _cfg(arch)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    batch = _random_batch(cfg)
    x, q = model.apply(variables, batch, train=False)
    assert x.shape == (2, 2, 3)
    assert q.shape == (2, 2, 4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
@pytest.mark.parametrize("lidar", ["lidar-feat-simple-0", "lidar-feat-simple-1",
                                   "lidar-feat-pointseg"])
def test_lidar_variants(lidar):
    cfg = _cfg("deeplo", lidar=lidar)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    x, q = model.apply(variables, _random_batch(cfg), train=False)
    assert x.shape == (2, 2, 3)


@pytest.mark.slow
@pytest.mark.parametrize("imu", ["imu-feat-rnn", "imu-feat-fc"])
@pytest.mark.parametrize("odom", ["odom-feat-rnn", "odom-feat-fc"])
def test_imu_odom_variants(imu, odom):
    cfg = _cfg("deepio", imu=imu, odom=odom)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    x, q = model.apply(variables, _random_batch(cfg), train=False)
    assert x.shape == (2, 2, 3)


@pytest.mark.parametrize("fusion", ["soft", "hard"])
def test_fusion_kinds(fusion):
    cfg = _cfg("deeplio", fusion=fusion)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    x, q = model.apply(variables, _random_batch(cfg), train=False)
    assert x.shape == (2, 2, 3)
    has_gate = "fusion" in variables["params"]
    assert has_gate == (fusion == "soft")


@pytest.mark.slow
def test_gradients_flow_and_finite():
    cfg = _cfg("deeplio")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    batch = _random_batch(cfg)

    def loss_fn(params):
        x, q = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])[0]
        return (x ** 2).sum() + (q ** 2).sum()

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.5


@pytest.mark.slow
def test_dropout_active_in_train_mode():
    cfg = _cfg("deepio")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    batch = _random_batch(cfg)
    y1 = model.apply(variables, batch, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})[0]
    y2 = model.apply(variables, batch, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    e1 = model.apply(variables, batch, train=False)[0]
    e2 = model.apply(variables, batch, train=False)[0]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_pointseg_standalone_segmentation():
    from deeplio_tpu.models.pointseg import PointSegNet
    net = PointSegNet(part="encoder+decoder", num_classes=4)
    x = jnp.zeros((1, 16, 128, 5))
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    logits = net.apply(v, x, train=False)
    assert logits.shape == (1, 16, 128, 4)


@pytest.mark.slow
def test_jit_forward():
    cfg = _cfg("deeplio")
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    batch = _random_batch(cfg)
    f = jax.jit(lambda v, b: model.apply(v, b, train=False))
    x, q = f(variables, batch)
    assert x.shape == (2, 2, 3)


@pytest.mark.slow
@pytest.mark.parametrize("stem,fire,pool", [
    ("s2d", "classic", "classic"), ("classic", "fused", "classic"),
    ("s2d", "fused", "classic"), ("classic", "classic", "stride"),
    ("classic", "classic", "cheap")])
def test_pointseg_tpu_variants(stem, fire, pool):
    """TPU bandwidth knobs (s2d stem / fused Fire / stride pool) keep the
    encoder's output grid and stay finite under grad (models/pointseg.py)."""
    from deeplio_tpu.models.pointseg import PointSegNet
    ref = PointSegNet(part="encoder", h_stride=2, w_stride=4, el_squeeze=32)
    var_net = PointSegNet(part="encoder", h_stride=2, w_stride=4,
                          el_squeeze=32, stem=stem, fire=fire, pool=pool)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 128, 10)).astype(np.float32))
    vr = ref.init(jax.random.PRNGKey(0), x, train=False)
    vv = var_net.init(jax.random.PRNGKey(0), x, train=False)
    out_ref = ref.apply(vr, x, train=False)
    out_var = var_net.apply(vv, x, train=False)
    assert out_var.shape == out_ref.shape

    def loss(p):
        out, _ = var_net.apply({"params": p, "batch_stats": vv["batch_stats"]},
                               x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(vv["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_config_stem_fire_keys():
    from deeplio_tpu.config.schema import ConfigError, LidarFeatConfig
    lc = LidarFeatConfig.from_dict("lidar-feat-pointseg",
                                   {"stem": "s2d", "fire": "fused"})
    assert lc.stem == "s2d" and lc.fire == "fused"
    with pytest.raises(ConfigError):
        LidarFeatConfig.from_dict("lidar-feat-pointseg", {"stem": "bogus"})
    with pytest.raises(ConfigError):
        LidarFeatConfig.from_dict("lidar-feat-pointseg", {"fire": "bogus"})


@pytest.mark.parametrize("arch", ["deepio", "deeplio"])
def test_init_model_fast_bit_identical(arch):
    """init_model_fast's reduced-width probe must yield the exact params of
    the full-size init (initializers depend only on rng + shape)."""
    from deeplio_tpu.models import init_model_fast

    cfg = _cfg(arch, lidar="lidar-feat-pointseg")
    _, ref = init_model(cfg, jax.random.PRNGKey(7))
    _, fast = init_model_fast(cfg, jax.random.PRNGKey(7), probe_width=32)
    ref_flat = jax.tree_util.tree_leaves_with_path(ref)
    fast_flat = jax.tree_util.tree_leaves_with_path(fast)
    assert [p for p, _ in ref_flat] == [p for p, _ in fast_flat]
    for (path, a), (_, b) in zip(ref_flat, fast_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_factorized_stem_parity_with_classic():
    """conv(concat(a_i, a_j)) == convA(a_i) + convB(a_j): a classic-stem
    model's weights transplanted via factorize_stem_variables must produce
    the same outputs on per-frame inputs as the classic model on the pair
    stack (same math, different layout)."""
    from deeplio_tpu.models import factorize_stem_variables

    cfg_c = _cfg("deeplo", lidar="lidar-feat-pointseg")
    over = {"lidar-feat-pointseg": {"feature-size": 64, "stem": "factorized"}}
    cfg_f = _cfg("deeplo", lidar="lidar-feat-pointseg", **over)

    model_c, var_c = init_model(cfg_c, jax.random.PRNGKey(3))
    from deeplio_tpu.models import build_model as _build
    model_f = _build(cfg_f)
    var_f = factorize_stem_variables(var_c, cfg_c.datasets.num_image_channels)

    rng = np.random.default_rng(0)
    ds = cfg_c.datasets
    S, H, W, C = ds.sequence_size, ds.projection.height, \
        ds.projection.width, ds.num_image_channels
    frames = jnp.asarray(rng.normal(size=(2, S, H, W, C)).astype(np.float32))
    pairs = jnp.stack([jnp.concatenate([frames[:, i], frames[:, j]], -1)
                       for (i, j) in ds.effective_combinations], axis=1)

    xc, qc = model_c.apply(var_c, {"images": pairs}, train=False)
    xf, qf = model_f.apply(var_f, {"frames": frames}, train=False)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xc),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qc),
                               rtol=1e-4, atol=1e-5)


def test_factorized_stem_train_step_runs():
    """Factorized-stem deeplio trains end-to-end through the shard_map step
    (projection -> frames -> model -> loss -> grads) with a finite loss."""
    from deeplio_tpu.losses import init_loss_params
    from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
    from deeplio_tpu.train import (build_train_step, create_train_state,
                                   make_optimizer)
    from deeplio_tpu.config import load_config_dict
    import yaml
    from __graft_entry__ import _TINY, _raw_batch

    d = yaml.safe_load(_TINY)
    d["deeplio"]["lidar-feat-net"] = {"name": "lidar-feat-pointseg"}
    d["lidar-feat-pointseg"] = {"feature-size": 64, "stem": "factorized",
                                "h-stride": 2, "w-stride": 4,
                                "el-squeeze": 32, "pool": "stride"}
    cfg = load_config_dict(d)
    mesh = make_mesh(data=2, devices=jax.devices()[:2])
    tx = make_optimizer(cfg.optim, 100)
    from deeplio_tpu.models import init_model
    model, variables = init_model(cfg, jax.random.PRNGKey(0), axis_name="data")
    state = create_train_state(variables, init_loss_params(cfg.loss), tx,
                               jax.random.PRNGKey(1))
    state = replicate(mesh, state)
    train_step, eval_step = build_train_step(cfg, model, tx, mesh)
    batch = shard_batch(mesh, _raw_batch(cfg, 4))
    state, m = train_step(state, batch)
    assert np.isfinite(float(jax.device_get(m["loss"])))
    x, q, m2 = eval_step(state, batch)
    assert x.shape == (4, 2, 3)


def test_stride_fold_parity_with_stride():
    """pool=stride-fold is an EXACT rewrite of pool=stride for encoder-only
    use: composing fire2's (1,2) entry stride into the stem (with explicit
    (1,1) pads) reads the same taps and computes the same function, with
    an identical param tree — so transplanted variables must reproduce the
    unfolded encoder's outputs."""
    from deeplio_tpu.models.pointseg import PointSegNet

    kw = dict(part="encoder", h_stride=2, w_stride=2, el_squeeze=8,
              dtype=jnp.float32)
    net_s = PointSegNet(pool="stride", **kw)
    net_f = PointSegNet(pool="stride-fold", **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 128, 10)).astype(np.float32))
    var_s = net_s.init(jax.random.PRNGKey(1), x, train=False)
    ys = net_s.apply(var_s, x, train=False)
    yf = net_f.apply(var_s, x, train=False)
    assert yf.shape == ys.shape
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=1e-5, atol=1e-5)


def test_stride_fold_config_validation():
    from deeplio_tpu.config.schema import ConfigError

    over = {"lidar-feat-pointseg": {"feature-size": 64,
                                    "pool": "stride-fold"}}
    cfg = _cfg("deeplo", lidar="lidar-feat-pointseg", **over)
    assert cfg.model.lidar.pool == "stride-fold"
    with pytest.raises(ConfigError):
        _cfg("deeplo", lidar="lidar-feat-pointseg",
             **{"lidar-feat-pointseg": {"pool": "stride-fold",
                                        "part": "encoder+decoder"}})
    with pytest.raises(ConfigError):
        _cfg("deeplo", lidar="lidar-feat-pointseg",
             **{"lidar-feat-pointseg": {"pool": "stride-fold",
                                        "stem": "s2d"}})


def test_s2d_pre_parity_with_s2d():
    """stem=s2d-pre consumes data-side space_to_depth_pairs layout with the
    SAME param tree as stem=s2d (in-model transform): transplanted
    variables on the pre-transformed input must reproduce the s2d
    encoder's outputs bit-for-bit (identical conv on an identical tensor,
    by space_to_depth_pairs' channel-order guarantee)."""
    from deeplio_tpu.models.blocks import space_to_depth, space_to_depth_pairs
    from deeplio_tpu.models.pointseg import PointSegNet

    kw = dict(part="encoder", h_stride=2, w_stride=4, el_squeeze=8,
              dtype=jnp.float32)
    net_s = PointSegNet(stem="s2d", **kw)
    net_p = PointSegNet(stem="s2d-pre", **kw)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, 16, 128, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 16, 128, 5)).astype(np.float32))
    pair = jnp.concatenate([a, b], -1)
    pre = space_to_depth_pairs(jnp.stack([a, b], 1), ((0, 1),), 2, 4)[:, 0]
    np.testing.assert_array_equal(np.asarray(pre),
                                  np.asarray(space_to_depth(pair, 2, 4)))
    var = net_s.init(jax.random.PRNGKey(1), pair, train=False)
    ys = net_s.apply(var, pair, train=False)
    yp = net_p.apply(var, pre, train=False)
    np.testing.assert_array_equal(np.asarray(yp), np.asarray(ys))


def test_s2d_pre_train_step_runs():
    """s2d-pre deeplio trains end-to-end through the shard_map step: the
    data side emits the s2d pair stack (train/step.py), the model consumes
    it, loss is finite."""
    import yaml

    from __graft_entry__ import _TINY, _raw_batch
    from deeplio_tpu.config import load_config_dict
    from deeplio_tpu.losses import init_loss_params
    from deeplio_tpu.models import init_model
    from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
    from deeplio_tpu.train import (build_train_step, create_train_state,
                                   make_optimizer)

    d = yaml.safe_load(_TINY)
    d["deeplio"]["lidar-feat-net"] = {"name": "lidar-feat-pointseg"}
    d["lidar-feat-pointseg"] = {"feature-size": 64, "stem": "s2d-pre",
                                "h-stride": 2, "w-stride": 4,
                                "el-squeeze": 32, "pool": "stride"}
    cfg = load_config_dict(d)
    mesh = make_mesh(data=2, devices=jax.devices()[:2])
    tx = make_optimizer(cfg.optim, 100)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), axis_name="data")
    state = create_train_state(variables, init_loss_params(cfg.loss), tx,
                               jax.random.PRNGKey(1))
    state = replicate(mesh, state)
    train_step, eval_step = build_train_step(cfg, model, tx, mesh)
    batch = shard_batch(mesh, _raw_batch(cfg, 4))
    state, m = train_step(state, batch)
    assert np.isfinite(float(jax.device_get(m["loss"])))
    x, q, m2 = eval_step(state, batch)
    assert x.shape == (4, 2, 3)
