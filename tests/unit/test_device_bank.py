"""Device-resident dataset (data/device_bank.py): the gathered batches
must be BIT-EQUAL to the host-fed ``iter_batches`` path — same plane
rows, same window meta, same epoch shuffle order — so
``train: device-dataset: true`` can never change training results."""

import dataclasses

import jax
import numpy as np
import pytest

from deeplio_tpu.config import load_config
from deeplio_tpu.data import device_bank as dbank
from deeplio_tpu.data.dataset import build_dataset
from deeplio_tpu.losses import init_loss_params
from deeplio_tpu.models import init_model
from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
from deeplio_tpu.train import build_train_step, create_train_state, make_optimizer


@pytest.fixture(scope="module")
def cfg():
    c = load_config("configs/deeplo_synth.yaml")
    return c.replace(datasets=dataclasses.replace(
        c.datasets, synthetic_frames=12))


@pytest.fixture(scope="module")
def ds(cfg):
    return build_dataset(cfg, "train")


def test_gathered_batch_bit_equal_to_host_path(ds):
    bank = dbank.build_host_bank(ds)
    bs, seed = 4, 7
    host = next(ds.iter_batches(bs, shuffle=True, seed=seed, workers=1))
    widx = dbank.epoch_indices(len(ds), bs, shuffle=True, seed=seed)[0]
    got = {k: np.asarray(v) for k, v in dbank.gather_batch(bank, widx).items()}
    assert set(got) == set(host)
    for k in host:
        assert got[k].dtype == host[k].dtype, k
        assert np.array_equal(got[k], host[k]), k


def test_epoch_indices_match_iter_batches_order(ds):
    bs, seed = 4, 3
    idx = dbank.epoch_indices(len(ds), bs, shuffle=True, seed=seed)
    metas = [b["meta"] for b in ds.iter_batches(bs, shuffle=True, seed=seed,
                                                workers=1)]
    assert len(metas) == idx.shape[0]
    for w_row, meta in zip(idx, metas):
        expect = np.asarray([ds.index[i] for i in w_row], np.int32)
        assert np.array_equal(meta, expect)


def test_bank_nbytes_counts_planes(ds):
    n_scans = sum(len(d) for d in ds.drives)
    assert dbank.bank_nbytes(ds) == n_scans * ds.cfg.projection.max_points * 17


@pytest.mark.slow
def test_bank_train_step_bit_equal(cfg, ds):
    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    tx = make_optimizer(cfg.optim, 100)
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  axis_name="data")
    # Host-numpy snapshot: on a 1-device mesh replicate() is a no-op view,
    # so the donating train_step would delete the shared init arrays out
    # from under the second fresh_state().
    variables = jax.tree.map(np.array, variables)
    loss_p = jax.tree.map(np.array, init_loss_params(cfg.loss))

    def fresh_state():
        return replicate(mesh, create_train_state(
            variables, loss_p, tx, jax.random.PRNGKey(1)))

    train_step, eval_step = build_train_step(cfg, model, tx, mesh)
    bank_train, bank_eval = dbank.make_bank_steps(train_step, eval_step)
    bank = dbank.put_bank(dbank.build_host_bank(ds), mesh)

    bs = 2
    idx = dbank.epoch_indices(len(ds), bs, shuffle=True, seed=5)[:2]

    def host_batch(w_row):
        from deeplio_tpu.data.dataset import collate
        return collate([ds.get(int(i)) for i in w_row])

    s_host = fresh_state()
    for w_row in idx:
        s_host, _ = train_step(s_host, shard_batch(mesh, host_batch(w_row)))

    s_bank = fresh_state()
    for w_row in idx:
        s_bank, _ = bank_train(s_bank, bank, w_row)

    flat_h = jax.tree_util.tree_leaves(s_host.params)
    flat_b = jax.tree_util.tree_leaves(s_bank.params)
    for a, b in zip(flat_h, flat_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    xh, qh, _ = eval_step(s_host, shard_batch(mesh, host_batch(idx[0])))
    xb, qb, _ = bank_eval(s_bank, bank, idx[0])
    assert np.array_equal(np.asarray(xh), np.asarray(xb))
    assert np.array_equal(np.asarray(qh), np.asarray(qb))
