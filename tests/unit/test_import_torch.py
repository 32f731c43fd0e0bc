"""Torch state_dict importer: numerical parity of every layout converter
against live torch modules, plus the structural matcher end-to-end.

These tests pin down the part of reference-weight porting that can't be
reconstructed later (memory layouts, kernel flips, bias fusion); the name
table for the real reference checkpoint is a lookup away once the mount
holds one (SURVEY.md §7 hard-part 4).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.models import import_torch as it
from deeplio_tpu.ops.rnn import MaskedRNN

torch = pytest.importorskip("torch")


def _nchw(x):
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


class TestConverters:
    def test_conv2d_stride1_same(self, rng):
        # stride 1: flax SAME == torch padding=1 for a 3x3 kernel.
        x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
        tm = torch.nn.Conv2d(3, 6, 3, padding=1)
        fm = nn.Conv(6, (3, 3), padding="SAME")
        params = it.convert_conv(tm.weight, tm.bias)
        out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       jnp.asarray(x))
        with torch.no_grad():
            t_out = tm(_nchw(x)).numpy()
        np.testing.assert_allclose(np.asarray(out),
                                   np.transpose(t_out, (0, 2, 3, 1)), atol=1e-5)

    def test_conv2d_strided_explicit_padding(self, rng):
        # stride 2: torch's symmetric padding=1 != SAME's asymmetric pads —
        # porting a strided reference conv needs explicit ((1,1),(1,1)).
        x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
        tm = torch.nn.Conv2d(3, 6, 3, stride=2, padding=1)
        fm = nn.Conv(6, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        params = it.convert_conv(tm.weight, tm.bias)
        out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       jnp.asarray(x))
        with torch.no_grad():
            t_out = tm(_nchw(x)).numpy()
        np.testing.assert_allclose(np.asarray(out),
                                   np.transpose(t_out, (0, 2, 3, 1)), atol=1e-5)

    def test_conv_transpose2d(self, rng):
        # The decoder's width-doubling deconv: kernel (1,4), stride (1,2).
        x = rng.normal(size=(2, 4, 8, 5)).astype(np.float32)
        tm = torch.nn.ConvTranspose2d(5, 7, (1, 4), stride=(1, 2),
                                      padding=(0, 1))
        fm = nn.ConvTranspose(7, (1, 4), strides=(1, 2), padding="SAME")
        params = it.convert_conv_transpose(tm.weight, tm.bias)
        out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       jnp.asarray(x))
        with torch.no_grad():
            t_out = tm(_nchw(x)).numpy()
        t_out = np.transpose(t_out, (0, 2, 3, 1))
        assert np.asarray(out).shape == t_out.shape
        np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-5)

    def test_linear(self, rng):
        x = rng.normal(size=(4, 9)).astype(np.float32)
        tm = torch.nn.Linear(9, 5)
        params = it.convert_dense(tm.weight, tm.bias)
        out = nn.Dense(5).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x))
        with torch.no_grad():
            t_out = tm(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-5)

    def test_batchnorm2d_eval(self, rng):
        x = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
        tm = torch.nn.BatchNorm2d(4)
        with torch.no_grad():
            tm.weight.uniform_(0.5, 1.5)
            tm.bias.uniform_(-0.5, 0.5)
            tm.running_mean.uniform_(-1, 1)
            tm.running_var.uniform_(0.5, 2.0)
        tm.eval()
        p, s = it.convert_batchnorm(tm.weight, tm.bias, tm.running_mean,
                                    tm.running_var)
        fm = nn.BatchNorm(use_running_average=True)
        out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, p),
                        "batch_stats": jax.tree_util.tree_map(jnp.asarray, s)},
                       jnp.asarray(x))
        with torch.no_grad():
            t_out = tm(_nchw(x)).numpy()
        np.testing.assert_allclose(np.asarray(out),
                                   np.transpose(t_out, (0, 2, 3, 1)), atol=1e-5)

    @pytest.mark.parametrize("cell,bidi", [("lstm", False), ("gru", False),
                                           ("lstm", True)])
    def test_rnn_multilayer(self, cell, bidi, rng):
        B, T, D, H, L = 2, 7, 5, 8, 2
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        Tm = {"lstm": torch.nn.LSTM, "gru": torch.nn.GRU}[cell]
        tm = Tm(D, H, num_layers=L, batch_first=True, bidirectional=bidi)
        params = it.convert_rnn(tm.state_dict(), "", L, cell, bidi)
        m = MaskedRNN(hidden_size=H, num_layers=L, cell=cell,
                      bidirectional=bidi)
        ys, _ = m.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x), jnp.ones((B, T)))
        with torch.no_grad():
            t_ys, _ = tm(torch.tensor(x))
        np.testing.assert_allclose(np.asarray(ys), t_ys.numpy(), atol=3e-5)


class _TorchBlock(torch.nn.Module):
    """conv -> bn -> linear head + an LSTM branch, identity names."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 8, 3, padding=1)
        self.bn = torch.nn.BatchNorm2d(8)
        self.head = torch.nn.Linear(8, 4)
        self.rnn = torch.nn.LSTM(6, 8, num_layers=2, batch_first=True)


class _FlaxBlock(nn.Module):
    @nn.compact
    def __call__(self, img, seq, train=False):
        y = nn.Conv(8, (3, 3), padding="SAME", name="conv")(img)
        y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(4, name="head")(y)
        _, h = MaskedRNN(hidden_size=8, num_layers=2, name="rnn")(
            seq, jnp.ones(seq.shape[:2]))
        return y, h


class TestStructuralImport:
    def _trees(self, rng):
        img = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
        seq = rng.normal(size=(2, 5, 6)).astype(np.float32)
        fm = _FlaxBlock()
        v = fm.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(seq))
        return fm, v, img, seq

    def test_end_to_end(self, rng):
        fm, v, img, seq = self._trees(rng)
        tm = _TorchBlock()
        with torch.no_grad():
            tm.bn.running_mean.uniform_(-1, 1)
            tm.bn.running_var.uniform_(0.5, 2.0)
        tm.eval()
        params, stats = it.import_state_dict(
            tm.state_dict(), v["params"], v["batch_stats"])
        out_y, out_h = fm.apply(
            {"params": it.as_jax(params), "batch_stats": it.as_jax(stats)},
            jnp.asarray(img), jnp.asarray(seq))
        with torch.no_grad():
            ty = tm.head(tm.bn(tm.conv(_nchw(img))).mean(dim=(2, 3)))
            t_ys, (t_h, _) = tm.rnn(torch.tensor(seq))
        np.testing.assert_allclose(np.asarray(out_y), ty.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_h), t_h[-1].numpy(),
                                   atol=3e-5)

    def test_strict_flags_leftover_torch_keys(self, rng):
        fm, v, *_ = self._trees(rng)
        tm = _TorchBlock()
        sd = dict(tm.state_dict())
        sd["ghost.weight"] = torch.zeros(3, 3)
        with pytest.raises(ValueError, match="unconsumed torch key: ghost"):
            it.import_state_dict(sd, v["params"], v["batch_stats"])

    def test_strict_flags_missing_module(self, rng):
        fm, v, *_ = self._trees(rng)
        tm = _TorchBlock()
        sd = {k: t for k, t in tm.state_dict().items()
              if not k.startswith("head")}
        with pytest.raises(ValueError, match="head"):
            it.import_state_dict(sd, v["params"], v["batch_stats"])

    def test_name_map_and_skip(self, rng):
        fm, v, *_ = self._trees(rng)
        tm = _TorchBlock()
        tm.eval()

        def name_map(path):
            if path[-1] == "head":
                return None  # keep flax init
            return ".".join(path)

        sd = {k: t for k, t in tm.state_dict().items()
              if not k.startswith("head")}
        params, _ = it.import_state_dict(sd, v["params"], v["batch_stats"],
                                         name_map=name_map)
        np.testing.assert_allclose(params["head"]["kernel"],
                                   np.asarray(v["params"]["head"]["kernel"]))


class TestSquareDeconv:
    """in==out ConvTranspose is shape-ambiguous with Conv — the flax path
    must disambiguate (every deconv in this family is auto-named
    ConvTranspose_k). Regression for the silent wrong-layout import."""

    def test_square_deconv_numerics(self, rng):
        import flax.linen as nn

        class FlaxUp(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.ConvTranspose(8, (1, 4), strides=(1, 2),
                                        padding="SAME")(x)

        class TorchUp(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.up = torch.nn.ConvTranspose2d(
                    8, 8, (1, 4), stride=(1, 2), padding=(0, 1))

            def forward(self, x):
                return self.up(x)

        img = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
        fm = FlaxUp()
        v = fm.init(jax.random.PRNGKey(0), jnp.asarray(img))
        tm = TorchUp()
        params, _ = it.import_state_dict(
            tm.state_dict(), v["params"],
            name_map=lambda path: "up")
        out = fm.apply({"params": it.as_jax(params)}, jnp.asarray(img))
        with torch.no_grad():
            ty = tm(_nchw(img)).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out), ty, atol=1e-5)
