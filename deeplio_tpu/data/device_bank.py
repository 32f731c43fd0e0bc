"""Device-resident dataset: stage every scan + window meta to HBM once,
gather batches device-side inside the compiled step.

The host-fed path (``WindowDataset.iter_batches`` → ``DevicePrefetcher``)
re-ships every batch over the host↔device link; on a relay-attached or
host-bound machine that link, not the chip, caps training throughput
(docs/performance.md round-5 input-pipeline section: ~10 MB/s here →
~0.7 s/step at gen2 scale, ~50× the device step time). When the whole
split fits in HBM — true for every synthetic fixture and for small real
subsets — the TPU-native answer is to pay the transfer ONCE: scans live
on device as plane banks, and each step gathers its windows by index
(``jnp.take`` fuses into the projection prologue), so steady-state
training moves only a [batch] int32 vector per step.

Exactness: the gathered raw batch is BIT-EQUAL to the host-fed one (same
plane rows, same window meta, same epoch shuffle order —
tests/unit/test_device_bank.py), so ``train: device-dataset: true``
changes time-to-epoch, never training results.

The reference has no equivalent (its DataLoader re-reads and re-projects
every epoch, SURVEY.md §3.1); this is a capability beyond parity, in the
same family as common JAX practice of donating small datasets to HBM.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from deeplio_tpu.data.dataset import WindowDataset

# Window-level meta carried per window; shapes [n_windows, ...].
_META_KEYS = ("imu", "imu_mask", "x_gt", "q_gt", "valid", "meta")
# Per-scan plane banks; shapes [n_scans, max_points].
_PLANE_KEYS = ("points_x", "points_y", "points_z", "points_rem",
               "points_valid")


def build_host_bank(ds: WindowDataset) -> Dict[str, np.ndarray]:
    """All scans + per-window meta of ``ds`` as host arrays.

    Returns plane banks ``points_*`` [n_scans, N] (scan row =
    drive_offset + frame), window scan-row indices ``win_rows``
    [n_windows, S] int32, and the _META_KEYS stacked over windows in
    ``ds.index`` order.
    """
    if not ds.with_points:
        raise ValueError("device bank needs raw-point datasets "
                         "(arch deeplo/deeplio without projection cache)")
    S = ds.cfg.sequence_size

    offsets = []
    total = 0
    for d in ds.drives:
        offsets.append(total)
        total += len(d)
    p0, _ = ds.drives[0].points_planes(0)
    N = p0.shape[1]
    bank: Dict[str, np.ndarray] = {
        "points_x": np.empty((total, N), np.float32),
        "points_y": np.empty((total, N), np.float32),
        "points_z": np.empty((total, N), np.float32),
        "points_rem": np.empty((total, N), np.float32),
        "points_valid": np.empty((total, N), bool),
    }
    for di, d in enumerate(ds.drives):
        for k in range(len(d)):
            planes, vld = d.points_planes(k)
            r = offsets[di] + k
            bank["points_x"][r] = planes[0]
            bank["points_y"][r] = planes[1]
            bank["points_z"][r] = planes[2]
            bank["points_rem"][r] = planes[3]
            bank["points_valid"][r] = vld

    n_win = len(ds.index)
    bank["win_rows"] = np.asarray(
        [[offsets[di] + s + k for k in range(S)] for di, s in ds.index],
        np.int32)
    metas = [None] * n_win
    for w, (di, s) in enumerate(ds.index):
        imu, imu_mask, x_gt, q_gt, valid = ds._pair_meta(ds.drives[di], s)
        metas[w] = (imu, imu_mask, x_gt, q_gt, valid,
                    np.asarray([di, s], np.int32))
    for j, key in enumerate(_META_KEYS):
        bank[key] = np.stack([m[j] for m in metas])
    return bank


def bank_nbytes(ds: WindowDataset) -> int:
    """Estimated device bytes of the bank (planes dominate)."""
    n_scans = sum(len(d) for d in ds.drives)
    N = ds.cfg.projection.max_points
    return n_scans * N * (4 * 4 + 1)


def put_bank(bank: Dict[str, np.ndarray], mesh) -> Dict:
    """Stage a host bank to device, replicated over the mesh."""
    import jax

    from deeplio_tpu.parallel.mesh import replicated_sharding

    sh = replicated_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in bank.items()}


def gather_batch(bank: Dict, widx) -> Dict:
    """Device-side batch assembly: the raw-batch dict for windows ``widx``
    ([B] int32), bit-equal to ``collate([ds.get(i) for i in widx])``
    (plane keys flat [B*S, N], meta keys [B, ...])."""
    import jax.numpy as jnp

    rows = jnp.reshape(jnp.take(bank["win_rows"], widx, axis=0), (-1,))
    raw = {k: jnp.take(bank[k], widx, axis=0) for k in _META_KEYS}
    for k in _PLANE_KEYS:
        raw[k] = jnp.take(bank[k], rows, axis=0)
    return raw


def epoch_indices(n_windows: int, batch_size: int, shuffle: bool,
                  seed: int = 0) -> np.ndarray:
    """[steps, batch_size] window indices — the EXACT order
    ``WindowDataset.iter_batches`` feeds (same rng, same drop-last)."""
    order = np.arange(n_windows)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = (n_windows // batch_size) * batch_size
    return order[:end].reshape(-1, batch_size).astype(np.int32)


def make_bank_steps(train_step, eval_step) -> Tuple:
    """Wrap (train_step, eval_step) from ``build_train_step`` with a
    device-side gather prologue.

    bank_train(state, bank, w_0[, ...w_{k-1}]) -> (state, metrics)
    bank_eval(state, bank, widx) -> (x_pred, q_pred, metrics)

    ``w_j`` are [local_batch] int32 window-index vectors (sharded over the
    data axis like host-fed batches); the inner shard_map programs are
    inlined, so the gathers fuse with the projection prologue.
    """
    import jax

    def _train(state, bank, *widxs):
        raws = [gather_batch(bank, w) for w in widxs]
        return train_step(state, *raws)

    def _eval(state, bank, widx):
        return eval_step(state, gather_batch(bank, widx))

    return (jax.jit(_train, donate_argnums=0), jax.jit(_eval))
