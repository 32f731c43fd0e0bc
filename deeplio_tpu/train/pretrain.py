"""PointSeg segmentation pretraining (reference: the separate PointSeg
training path whose weights ``LidarPointSegFeat`` loads — SURVEY.md §2.5
"PointSeg pretraining" row).

Trains the standalone ``PointSegNet`` (encoder+decoder+classifier) on
per-pixel labels with masked cross-entropy, then snapshots ONLY the encoder
subtree in the exact layout ``load_pointseg_backbone`` grafts into a
DeepLO/DeepLIO model.

Labels, in priority order:
  1. real SemanticKITTI-format label files when ``datasets.labels-path``
     is set (``KittiRawDrive.labels``), optionally remapped through
     ``datasets.label-map``. The label image is produced by a SECOND
     projection pass with per-point labels riding the remission payload
     slot — winner selection depends only on xyz+valid, so the label at
     each pixel belongs to exactly the point whose channels fill it;
  2. geometric pseudo-labels from the projection itself (ground /
     structure / empty by height) — the hermetic path needing no data.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplio_tpu.config.schema import Config
from deeplio_tpu.models.pointseg import PointSegNet
from deeplio_tpu.ops.projection import make_projector, project_batch
from deeplio_tpu.train.checkpoint import save_params
from deeplio_tpu.utils import get_app_logger

NUM_CLASSES = 3  # 0=empty, 1=ground, 2=structure
GROUND_Z = -1.2


def geometric_labels(img5: jax.Array, mask: jax.Array) -> jax.Array:
    """Pseudo-labels from the RAW 5-channel projection (x,y,z,rem,range) —
    NOT the assembled/normalized model input, whose channel order and
    scaling are config-dependent. [B,H,W] int32."""
    z = img5[..., 2]
    ground = (z < GROUND_Z).astype(jnp.int32)
    lab = jnp.where(mask > 0.5, 2 - ground, 0)
    return lab


def masked_xent(logits: jax.Array, labels: jax.Array,
                num_classes: int = NUM_CLASSES) -> jax.Array:
    """Per-pixel cross-entropy; 'empty'/unlabeled pixels (label 0)
    weighted down."""
    onehot = jax.nn.one_hot(labels, num_classes)
    ce = optax.softmax_cross_entropy(logits, onehot)
    w = jnp.where(labels == 0, 0.05, 1.0)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def pretrain_pointseg(cfg: Config, out_dir: str, steps: int = 200,
                      batch_size: int = 4, lr: float = 1e-3,
                      seed: int = 0) -> Dict[str, float]:
    """Train PointSegNet on (synthetic-)projected images; save encoder."""
    from deeplio_tpu.data.dataset import build_drives

    log = get_app_logger()
    ds = cfg.datasets
    use_real = bool(ds.labels_path)
    num_classes = ds.labels_num_classes if use_real else NUM_CLASSES
    label_lut = None
    if use_real and ds.label_map:
        label_lut = np.zeros(1 << 16, np.int32)
        for k, v in ds.label_map.items():
            label_lut[k] = v
    projector = make_projector(ds.projection, ds.channels, ds.mean, ds.std)
    # The odometry encoder consumes PAIR-stacked images (2C channels); the
    # segmentation pretrainer must feed the same width so conv kernels
    # transfer. We duplicate the single frame (a standing-still pair).
    # Mirror the odometry encoder's tower knobs exactly — otherwise the
    # pretrained encoder subtree cannot be grafted (param-shape mismatch
    # with e.g. el-squeeze / se / stem / fire / pool settings).
    lc = cfg.model.lidar
    # Factorized stems pretrain on a standing-still "pair" of the SAME
    # frame: frames [B, 1, H, W, C] with the single combo (0, 0) — the
    # conv params (C -> 2F) graft unchanged onto any odometry combos.
    factorized = bool(lc) and lc.stem == "factorized"
    net = PointSegNet(part="encoder+decoder", num_classes=num_classes,
                      dtype=jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
                      else jnp.float32,
                      with_se=lc.se if lc else True,
                      h_stride=lc.h_stride if lc else 1,
                      w_stride=lc.w_stride if lc else 2,
                      el_squeeze=lc.el_squeeze if lc else 0,
                      # s2d-pre is a data-side layout twin of s2d with an
                      # identical param tree — pretrain with the in-model
                      # s2d transform and graft onto the pre-s2d encoder.
                      stem={"s2d-pre": "s2d"}.get(
                          lc.stem, lc.stem) if lc else "classic",
                      combos=((0, 0),) if factorized else (),
                      fire=lc.fire if lc else "classic",
                      # stride-fold is encoder-only (folded stem breaks
                      # the skip resolutions the decoder needs); its
                      # params are IDENTICAL to plain stride, so pretrain
                      # with stride and graft onto the folded encoder.
                      pool={"stride-fold": "stride"}.get(
                          lc.pool, lc.pool) if lc else "classic")

    drives = build_drives(cfg, "train")
    rng = np.random.default_rng(seed)

    def sample_batch() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(points, valid, point_labels); labels all-zero when pseudo."""
        pts, vld, labs = [], [], []
        for _ in range(batch_size):
            d = drives[rng.integers(len(drives))]
            fi = int(rng.integers(len(d)))
            p, v = d.points(fi)
            lab = (d.labels(fi, ds.labels_path)
                   if use_real and hasattr(d, "labels") else None)
            if use_real and lab is None:
                raise FileNotFoundError(
                    f"labels-path set but no label file for {d.name} "
                    f"frame {fi} under {ds.labels_path}")
            if lab is not None and label_lut is not None:
                lab = label_lut[np.clip(lab, 0, (1 << 16) - 1)]
            labs.append(np.zeros(p.shape[0], np.int32) if lab is None else lab)
            pts.append(p)
            vld.append(v)
        return np.stack(pts), np.stack(vld), np.stack(labs)

    proj_cfg = ds.projection

    @jax.jit
    def project(pts, vld, point_labels):
        img, mask = projector(pts, vld)
        if factorized:
            x = img[:, None]                      # [B, 1, H, W, C] frames
        else:
            x = jnp.concatenate([img, img], axis=-1)  # pair-width input
        # Raw (unnormalized, fixed-order) projection for label derivation.
        img5, mask5 = project_batch(pts, vld, proj_cfg.height, proj_cfg.width,
                                    proj_cfg.fov_up_deg, proj_cfg.fov_down_deg,
                                    packed=proj_cfg.packed)
        if use_real:
            # Second pass with the label riding the remission payload slot:
            # winners depend only on xyz+valid, so pixel labels belong to
            # exactly the points that filled the image.
            pts_lab = pts.at[..., 3].set(point_labels.astype(pts.dtype))
            imgl, _ = project_batch(pts_lab, vld, proj_cfg.height,
                                    proj_cfg.width, proj_cfg.fov_up_deg,
                                    proj_cfg.fov_down_deg, packed=False)
            lab = jnp.round(imgl[..., 3]).astype(jnp.int32)
            lab = jnp.where(mask5 > 0.5, lab, 0)
            if label_lut is None:
                # No label-map: raw SemanticKITTI ids (10..259) must become
                # 0/unlabeled, NOT be clipped onto the top train id.
                lab = jnp.where((lab >= 0) & (lab < num_classes), lab, 0)
            else:
                lab = jnp.clip(lab, 0, num_classes - 1)
            return x, lab
        return x, geometric_labels(img5, mask5)

    p0, v0, l0 = sample_batch()
    x0, _ = project(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(l0))
    variables = net.init(jax.random.PRNGKey(seed), x0, train=False)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, pts, vld, labs):
        x, labels = project(pts, vld, labs)

        def loss_fn(p):
            logits, mut = net.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            return (masked_xent(logits, labels, num_classes),
                    (mut["batch_stats"], logits))

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return params, new_stats, opt_state, loss, acc

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    loss = acc = None
    for k in range(steps):
        pts, vld, labs = sample_batch()
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, jnp.asarray(pts),
            jnp.asarray(vld), jnp.asarray(labs))
        if k % 20 == 0:
            log.info("pointseg pretrain step %d loss %.4f acc %.3f",
                     k, float(jax.device_get(loss)), float(jax.device_get(acc)))

    # Snapshot ONLY the encoder subtree, in LidarPointSegFeat's layout:
    # lidar_feat/pointseg/encoder/... (see load_pointseg_backbone).
    os.makedirs(out_dir, exist_ok=True)
    save_params(out_dir, {"encoder": jax.device_get(params["encoder"])})
    return {"loss": float(jax.device_get(loss)), "acc": float(jax.device_get(acc))}
