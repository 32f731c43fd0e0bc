"""Drive evaluator: run a trained model sequentially over a drive, collect
per-pair relative pose predictions, chain the global trajectory, and score
it against the OXTS ground truth (reference: ``test.py``'s Tester —
SURVEY.md §2.5/§3.2).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from deeplio_tpu.config.schema import Config
from deeplio_tpu.data.dataset import WindowDataset, collate
from deeplio_tpu.data.drives import Drive
from deeplio_tpu.data.pipeline import DevicePrefetcher
from deeplio_tpu.eval import metrics as em
from deeplio_tpu.eval.trajectory import chain_relative_np, gt_trajectory, write_kitti_poses


def predict_drive(cfg: Config, eval_step, state, mesh, drive: Drive,
                  batch_size: Optional[int] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Predict (dx, dq) for every consecutive frame pair of a drive.

    Windows slide with stride 1; each global pair (k, k+1) takes the
    prediction from the first window covering it. Requires the config's
    combinations to include consecutive pairs (the standard setup).

    Returns (dx [n-1, 3], dq [n-1, 4]).
    """
    import dataclasses

    bs = batch_size or cfg.train.batch_size
    n_data = mesh.shape["data"]
    bs = max((bs // n_data) * n_data, n_data)
    # Evaluation must cover every consecutive pair: always slide windows
    # with stride 1 regardless of the training window-stride (a stride-8
    # training config would otherwise skip tail pairs of each drive).
    ds_cfg = dataclasses.replace(cfg.datasets, window_stride=1)
    ds = WindowDataset(ds_cfg, [drive],
                       with_points=cfg.model.arch in ("deeplo", "deeplio"))
    n = len(drive)
    S = cfg.datasets.sequence_size
    combos = cfg.datasets.effective_combinations
    n_pairs = n - 1
    dx_out = np.full((n_pairs, 3), np.nan, np.float32)
    dq_out = np.full((n_pairs, 4), np.nan, np.float32)

    # Multi-process: every process derives the same padded global batch
    # index list, assembles only its contiguous row block (matching the
    # mesh's jax.devices() row layout — WindowDataset.iter_batches), and
    # the prefetcher stitches blocks into one global array. Predictions
    # come back replicated (eval_step all_gathers them), so the global
    # indexing below is identical on every host.
    proc_count = jax.process_count()
    proc_index = jax.process_index()
    # bs is a multiple of the data-axis size, which every process divides.
    assert bs % proc_count == 0, (bs, proc_count)
    local_bs = bs // proc_count
    lo = proc_index * local_bs

    def batches():
        # Thread-parallel item assembly: stride-1 eval windows make this the
        # heaviest host path (a 4,500-frame drive = 4,500 window builds);
        # same pool strategy as WindowDataset.iter_batches.
        from concurrent.futures import ThreadPoolExecutor

        idxs = list(range(len(ds)))
        with ThreadPoolExecutor(max_workers=8) as pool:
            for b0 in range(0, len(idxs), bs):
                gsel = idxs[b0:b0 + bs]
                gsel.extend(gsel[-1:] * (bs - len(gsel)))  # pad tail batch
                sel = gsel[lo:lo + local_bs]
                items = list(pool.map(ds.get, sel))
                yield collate(items)

    starts_done = 0
    for batch in DevicePrefetcher(batches(), mesh, depth=2,
                                  global_batch_size=bs):
        x, q, _ = eval_step(state, batch)
        x = np.asarray(jax.device_get(x))
        q = np.asarray(jax.device_get(q))
        for bi in range(x.shape[0]):
            s = starts_done + bi
            if s >= len(ds):
                break
            for pi, (i, j) in enumerate(combos):
                if j - i != 1:
                    continue
                g = s + i
                if 0 <= g < n_pairs and np.isnan(dx_out[g, 0]):
                    dx_out[g] = x[bi, pi]
                    dq_out[g] = q[bi, pi]
        starts_done += x.shape[0]

    if np.isnan(dx_out).any():
        missing = np.flatnonzero(np.isnan(dx_out[:, 0]))
        raise RuntimeError(
            f"trajectory coverage incomplete: pairs {missing[:10]}... "
            "(config combinations must include consecutive pairs)")
    return dx_out, dq_out


def evaluate_drive(cfg: Config, eval_step, state, mesh, drive: Drive,
                   out_dir: Optional[str] = None) -> Dict[str, float]:
    """Full per-drive evaluation: trajectory + ATE/RPE/KITTI errors."""
    dx, dq = predict_drive(cfg, eval_step, state, mesh, drive)
    pred = chain_relative_np(dx, dq)
    gt = gt_trajectory(drive)
    # GT is drive-local already; express both from the first evaluated frame.
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    scores: Dict[str, float] = {}
    scores["ate_m"] = em.ate(pred, gt)
    t_rpe, r_rpe = em.rpe(pred, gt, delta=1)
    scores["rpe_trans_m"] = t_rpe
    scores["rpe_rot_rad"] = r_rpe
    scores.update(em.kitti_odometry_errors(pred, gt))

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        write_kitti_poses(os.path.join(out_dir, f"{drive.name}_pred.txt"), pred)
        write_kitti_poses(os.path.join(out_dir, f"{drive.name}_gt.txt"), gt)
        try:
            from deeplio_tpu.eval.plot import plot_trajectories
            plot_trajectories(
                {"prediction": pred, "ground truth": gt},
                os.path.join(out_dir, f"{drive.name}_traj.png"),
                title=drive.name)
        except ImportError:
            pass
    return scores
