"""Streaming odometry inference (BASELINE.json config 5): real-time
sequential pose integration over a drive with device-side projection.

The reference's ``test.py`` loops frame-by-frame in Python (SURVEY.md
§3.2). Here the whole streaming loop is a ``jax.lax.scan`` compiled once:
each tick projects the incoming scan on device, pairs it with the carried
previous range image, runs the model (P=1 window), and composes the
predicted relative pose onto the carried global pose. Frames stream
through in fixed-size chunks so host->device transfer of the next chunk
overlaps with compute on the current one (double buffering at the chunk
level, SURVEY.md §5 long-context row: scan with carried state — not
sequence parallelism).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.config.schema import Config
from deeplio_tpu.data.drives import Drive
from deeplio_tpu.ops.projection import make_projector
from deeplio_tpu.utils import spatial as sp


class StreamingOdometry:
    """Compiled streaming odometry over one drive."""

    def __init__(self, cfg: Config, model, variables, chunk: int = 16):
        if cfg.model.arch not in ("deeplo", "deeplio"):
            raise ValueError("streaming odometry needs a lidar arch")
        self.cfg = cfg
        self.chunk = chunk
        ds = cfg.datasets
        self.projector = make_projector(ds.projection, ds.channels,
                                        ds.mean, ds.std)
        H, W = ds.projection.height, ds.projection.width
        C = ds.num_image_channels
        self._img_shape = (H, W, C)
        self._uses_imu = cfg.model.arch == "deeplio"
        model_ = model
        lc = cfg.model.lidar
        factorized = lc is not None and lc.stem == "factorized"
        if factorized:
            # The factorized stem gathers pairs by the model's STATIC
            # combos; streaming is a 2-frame window with the single pair
            # (0, 1). Rebuild the module with streaming combos — the param
            # tree is combo-independent, so the trained variables apply.
            import dataclasses

            from deeplio_tpu.models.zoo import build_model
            scfg = dataclasses.replace(
                cfg, datasets=dataclasses.replace(
                    cfg.datasets, sequence_size=2, combinations=((0, 1),)))
            model_ = build_model(scfg, axis_name=None)
        variables_ = variables
        projector = self.projector
        uses_imu = self._uses_imu

        def tick(carry, inp):
            prev_img, pose, started = carry
            img, mask = projector(inp["points"][None], inp["valid"][None])
            img = img[0]
            if factorized:
                mb = {"frames": jnp.stack([prev_img, img])[None]}
            elif lc is not None and lc.stem == "s2d-pre":
                from deeplio_tpu.models.blocks import space_to_depth_pairs
                mb = {"images": space_to_depth_pairs(
                    jnp.stack([prev_img, img])[None], ((0, 1),),
                    lc.h_stride, lc.w_stride)}
            elif lc is not None and lc.stem == "pair-split":
                # The input-split stem takes the frame-i / frame-j stacks
                # separately (zoo._lidar_features) — no pair concat.
                mb = {"images": prev_img[None, None],
                      "images2": img[None, None]}
            else:
                mb = {"images":
                      jnp.concatenate([prev_img, img], -1)[None, None]}
            if uses_imu:
                mb["imu"] = inp["imu"][None, None]
                mb["imu_mask"] = inp["imu_mask"][None, None]
            x, q = model_.apply(variables_, mb, train=False)
            dx = x[0, 0] * started           # first frame: identity motion
            dq = jnp.where(started > 0, q[0, 0],
                           jnp.asarray([1.0, 0, 0, 0], q.dtype))
            pose = sp.apply_relative(pose, dx, dq)
            return (img, pose, jnp.ones_like(started)), (pose, dx, dq)

        def chunk_fn(carry, chunk_inp):
            return jax.lax.scan(tick, carry, chunk_inp)

        self._chunk_fn = jax.jit(chunk_fn)

    def init_carry(self):
        return (
            jnp.zeros(self._img_shape, jnp.float32),
            jnp.eye(4, dtype=jnp.float32),
            jnp.zeros((), jnp.float32),
        )

    def run(self, drive: Drive) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Stream a whole drive. Returns (poses [n,4,4], dx [n,3], dq [n,4]).

        poses[k] is the integrated pose AFTER consuming frame k (pose[0]=I).
        """
        cfg = self.cfg
        n = len(drive)
        T = cfg.datasets.max_imu_per_pair
        carry = self.init_carry()
        all_poses, all_dx, all_dq = [], [], []

        def host_chunks():
            for c0 in range(0, n, self.chunk):
                ks = list(range(c0, min(c0 + self.chunk, n)))
                pad = self.chunk - len(ks)
                pts, vld, imu, im = [], [], [], []
                for k in ks:
                    p, v = drive.points(k)
                    pts.append(p)
                    vld.append(v)
                    w = (drive.imu_between(drive.frame_time(k - 1),
                                           drive.frame_time(k))
                         if k > 0 else np.zeros((0, 6), np.float32))
                    buf = np.zeros((T, 6), np.float32)
                    msk = np.zeros((T,), np.float32)
                    m = min(len(w), T)
                    buf[:m] = w[:m]
                    msk[:m] = 1.0
                    imu.append(buf)
                    im.append(msk)
                for _ in range(pad):
                    pts.append(pts[-1]); vld.append(vld[-1])
                    imu.append(imu[-1]); im.append(im[-1])
                out = {"points": np.stack(pts), "valid": np.stack(vld)}
                if self._uses_imu:
                    out["imu"] = np.stack(imu)
                    out["imu_mask"] = np.stack(im)
                yield len(ks), out

        # Chunk-level double buffering: stage next chunk while computing.
        pending = None
        for n_real, chunk in host_chunks():
            dev = {k: jnp.asarray(v) for k, v in chunk.items()}
            if pending is not None:
                carry, (poses, dxs, dqs) = pending
                # materialise previous chunk results
                all_poses.append(np.asarray(jax.device_get(poses))[:pending_real])
                all_dx.append(np.asarray(jax.device_get(dxs))[:pending_real])
                all_dq.append(np.asarray(jax.device_get(dqs))[:pending_real])
            carry, outs = self._chunk_fn(carry, dev)
            pending = (carry, outs)
            pending_real = n_real
        if pending is not None:
            carry, (poses, dxs, dqs) = pending
            all_poses.append(np.asarray(jax.device_get(poses))[:pending_real])
            all_dx.append(np.asarray(jax.device_get(dxs))[:pending_real])
            all_dq.append(np.asarray(jax.device_get(dqs))[:pending_real])

        return (np.concatenate(all_poses), np.concatenate(all_dx),
                np.concatenate(all_dq))
