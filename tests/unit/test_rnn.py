"""Masked RNN tests: mask pass-through semantics, torch-parity gate math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.ops.rnn import MaskedRNN


def _run(cell, x, mask, bidirectional=False, num_layers=1, hidden=8, seed=0):
    m = MaskedRNN(hidden_size=hidden, num_layers=num_layers, cell=cell,
                  bidirectional=bidirectional)
    v = m.init(jax.random.PRNGKey(seed), jnp.asarray(x), jnp.asarray(mask))
    return m, v, m.apply(v, jnp.asarray(x), jnp.asarray(mask))


@pytest.mark.parametrize("cell", ["lstm", "gru"])
class TestMasking:
    def test_padding_does_not_change_final_state(self, cell, rng):
        B, T, D, H = 3, 10, 6, 8
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        # Valid lengths 4..6; poison the padded tail.
        lens = np.array([4, 5, 6])
        mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)
        x_poison = x.copy()
        x_poison[mask == 0] = 1e6

        m = MaskedRNN(hidden_size=H, cell=cell)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
        _, f1 = m.apply(v, jnp.asarray(x), jnp.asarray(mask))
        _, f2 = m.apply(v, jnp.asarray(x_poison), jnp.asarray(mask))
        np.testing.assert_allclose(f1, f2, atol=1e-6)

    def test_final_equals_truncated_run(self, cell, rng):
        B, T, D, H = 2, 8, 4, 8
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        L = 5
        mask = np.zeros((B, T), np.float32)
        mask[:, :L] = 1.0
        m = MaskedRNN(hidden_size=H, cell=cell)
        v = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(mask))
        _, f_masked = m.apply(v, jnp.asarray(x), jnp.asarray(mask))
        _, f_trunc = m.apply(v, jnp.asarray(x[:, :L]), jnp.ones((B, L)))
        np.testing.assert_allclose(f_masked, f_trunc, atol=1e-6)

    @pytest.mark.slow
    def test_bidirectional_shapes(self, cell, rng):
        B, T, D, H = 2, 6, 4, 8
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        mask = np.ones((B, T), np.float32)
        _, _, (ys, fin) = _run(cell, x, mask, bidirectional=True, num_layers=2, hidden=H)
        assert ys.shape == (B, T, 2 * H)
        assert fin.shape == (B, 2 * H)

    def test_grad_flows(self, cell, rng):
        B, T, D, H = 2, 5, 4, 8
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        mask = np.ones((B, T), np.float32)
        m = MaskedRNN(hidden_size=H, cell=cell)
        v = m.init(jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(mask))
        g = jax.grad(lambda p: m.apply({"params": p}, jnp.asarray(x),
                                       jnp.asarray(mask))[1].sum())(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


class TestTorchParity:
    """Gate math matches torch.nn.LSTM/GRU given ported weights."""

    @pytest.mark.parametrize("cell", ["lstm", "gru"])
    def test_matches_torch(self, cell, rng):
        torch = pytest.importorskip("torch")
        B, T, D, H = 2, 7, 5, 8
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        mask = np.ones((B, T), np.float32)

        m = MaskedRNN(hidden_size=H, cell=cell)
        v = m.init(jax.random.PRNGKey(3), jnp.asarray(x), jnp.asarray(mask))

        if cell == "lstm":
            tm = torch.nn.LSTM(D, H, batch_first=True)
            p = v["params"]["l0_fwd"]
            with torch.no_grad():
                tm.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"]).T))
                tm.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"]).T))
                tm.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b"])))
                tm.bias_hh_l0.zero_()
        else:
            tm = torch.nn.GRU(D, H, batch_first=True)
            p = v["params"]["l0_fwd"]
            with torch.no_grad():
                tm.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"]).T))
                tm.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"]).T))
                tm.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b_ih"])))
                tm.bias_hh_l0.copy_(torch.tensor(np.asarray(p["b_hh"])))

        ys, fin = m.apply(v, jnp.asarray(x), jnp.asarray(mask))
        with torch.no_grad():
            t_ys, _ = tm(torch.tensor(x))
        np.testing.assert_allclose(np.asarray(ys), t_ys.numpy(), atol=2e-5)
