"""Typed configuration schema (reference: root ``config.yaml`` + per-module
sub-dicts loaded with PyYAML — SURVEY.md §2.2/§5 "Config/flag system").

The YAML surface keeps the reference's hyphenated key style and overall
shape: a ``datasets`` block, an ``arch`` selector choosing one of
``deepio | deeplo | deeplio``, per-arch blocks naming their feature nets,
per-net blocks, a ``losses`` block and an ``optimizer``/``train`` block.
Everything is parsed into frozen dataclasses with validation so a typo'd key
fails loudly instead of silently training the wrong model.

NOTE: the reference mount was empty at survey time; exact key names were
reconstructed from model knowledge of the upstream repo. If the mount
appears, re-verify this schema first (SURVEY.md provenance section).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# Channels the projection can emit, in canonical order. "normals" expands to
# 3 channels (nx, ny, nz).
CHANNEL_ORDER = ("x", "y", "z", "remission", "depth", "normals")

# Default KITTI raw-drive <-> odometry-sequence mapping (SURVEY.md §2.2).
ODOMETRY_SEQUENCES: Dict[str, Tuple[str, int, int, int]] = {
    # seq: (date, drive, start_frame, end_frame)
    "00": ("2011_10_03", 27, 0, 4540),
    "01": ("2011_10_03", 42, 0, 1100),
    "02": ("2011_10_03", 34, 0, 4660),
    "04": ("2011_09_30", 16, 0, 270),
    "05": ("2011_09_30", 18, 0, 2760),
    "06": ("2011_09_30", 20, 0, 1100),
    "07": ("2011_09_30", 27, 0, 1100),
    "08": ("2011_09_30", 28, 1100, 5170),
    "09": ("2011_09_30", 33, 0, 1590),
    "10": ("2011_09_30", 34, 0, 1200),
}


class ConfigError(ValueError):
    pass


def _get(d: Dict[str, Any], key: str, default=None):
    """Fetch a key accepting both hyphenated (YAML) and underscored names."""
    if key in d:
        return d[key]
    alt = key.replace("-", "_")
    if alt in d:
        return d[alt]
    alt = key.replace("_", "-")
    if alt in d:
        return d[alt]
    return default


def _require(d: Dict[str, Any], key: str, ctx: str):
    v = _get(d, key, None)
    if v is None:
        raise ConfigError(f"missing required config key '{key}' in {ctx}")
    return v


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ProjectionConfig:
    """Spherical range-image projection parameters (SqueezeSeg convention)."""
    height: int = 64
    width: int = 1024
    fov_up_deg: float = 3.0
    fov_down_deg: float = -25.0
    max_points: int = 131072  # static per-scan point capacity (pad/truncate)
    # packed=True carries channels as packed-f16 pairs through EVERY
    # backend's routing (~40% less carried traffic; <=3cm xyz rounding and
    # quantized-range depth). packed=False keeps exact f32 payloads on the
    # sort/ring XLA backends; the Mosaic pallas-ring kernel is always
    # packed.
    packed: bool = False
    # backend: "sort" (sentinel-free sort + jump compact/expand, production)
    #        | "ring" (sort-FREE segmented min-scan; requires ring-ordered
    #          scans — pixel index non-decreasing over valid points, see
    #          ops/projection.py::project_batch_ring)
    #        | "sort-sentinel" (round-1 two-sort compaction, kept for parity)
    #        | "pallas" (fused RMW kernel — see ops/projection_pallas.py)
    #        | "pallas-ring" (VMEM-resident Mosaic kernel with O(N)
    #          movement — ops/projection_pallas_ring.py; ring contract).
    backend: str = "sort"
    # Scans per lax.map chunk inside the batched projector. The kernels'
    # per-scan cost degrades ~2.3x when the whole 144-scan training batch
    # runs as one fused program (working set falls out of VMEM/caches);
    # chunking at 16-24 measured 4x faster at B=144 on v5e
    # (docs/performance.md). 0 disables chunking.
    chunk: int = 16
    # pallas-ring only: scans per Mosaic grid step (flattened in-kernel;
    # bit-identical for any width — fewer grid steps amortize per-step
    # overhead). Falls back to 1 when the batch doesn't divide.
    kernel_spb: int = 1
    # pallas-ring only: packed (pix<<rq|rq) routing word in the kernel's
    # compaction (3 carried arrays instead of 4; bit-identical either
    # way). "auto" packs whenever the shape allows; "on"/"off" force it
    # (on raises for infeasible shapes). Config-exposed so the flagship
    # can pin the last on-chip-validated route while A/Bs run.
    kernel_packed: str = "auto"
    # pallas-ring only: the SLOT-ALIGNED direct routes (ops/projection.py)
    # — when the scan is a fixed ring/azimuth grid (the synthetic
    # fixtures; real scans binned to the grid), projection collapses to a
    # windowed min in pure XLA, no Mosaic kernel at all. "auto"/"on"
    # guard it with a runtime alignment predicate + lax.cond fallback to
    # the kernel (bit-exact for any input; on raises for infeasible
    # shapes — but the cond dispatch costs ~6 ms/step at flagship
    # operand sizes, see docs/performance.md); "trust" skips the
    # predicate (grid contract asserted by construction); "halves"
    # additionally expects the dual-half plane layout
    # (halves_permutation) and pays NO strided slices or f16 packing —
    # exact f32 payloads, the fastest route; "off" = kernel.
    kernel_aligned: str = "off"

    @property
    def fov_rad(self) -> float:
        import math
        return (self.fov_up_deg - self.fov_down_deg) * math.pi / 180.0

    @property
    def fov_down_rad(self) -> float:
        import math
        return self.fov_down_deg * math.pi / 180.0


@dataclass(frozen=True)
class DatasetConfig:
    root_path: str = ""
    # drives per split: {"2011_10_03": [27, 42], ...}
    train: Dict[str, List[int]] = field(default_factory=dict)
    validation: Dict[str, List[int]] = field(default_factory=dict)
    test: Dict[str, List[int]] = field(default_factory=dict)
    # temporal window
    sequence_size: int = 2
    combinations: Tuple[Tuple[int, int], ...] = ()  # default: consecutive
    # window start stride through each drive. 1 = every window (reference
    # behavior, frames re-projected in overlapping windows); sequence_size-1
    # covers every consecutive pair exactly once with minimal re-projection.
    window_stride: int = 1
    # projection + channels
    channels: Tuple[str, ...] = ("x", "y", "z", "remission", "depth")
    projection: ProjectionConfig = field(default_factory=ProjectionConfig)
    # per-channel normalization (applied fused with projection on device)
    mean: Tuple[float, ...] = ()
    std: Tuple[float, ...] = ()
    # IMU windows between frame pairs: pad/mask to this static length
    max_imu_per_pair: int = 16
    # device-side training augmentation: random global yaw per window
    augment_yaw: bool = False
    # host-side slot binning of REAL scans onto the fixed ring/azimuth
    # grid the aligned projection route needs (data/synthetic.py::
    # slot_bin_scan): each pixel keeps its best max_points/(H*W)
    # candidates, winner first. Pixel assignment uses the host (numpy)
    # trig — the reference's own projection semantics — which differs
    # from the device prologue by ulps on boundary points, so pair this
    # with kernel-aligned=trust (the runtime predicate of auto/on
    # recomputes pixels on device and would fall back on most real
    # scans). Synthetic drives are grid-aligned already and ignore it.
    slot_bin: bool = False
    # synthetic fixture mode for CI / benches without KITTI on disk
    synthetic: bool = False
    synthetic_frames: int = 64
    # eval (validation/test) drive length; 0 = same as synthetic_frames.
    # Longer held-out drives buy statistically meaningful KITTI relative
    # errors: a 192-frame (~153 m) drive yields n_segments=7 in one length
    # bucket, a 512-frame (~410 m) drive ~75 segments over 3 buckets
    # (eval/metrics.py protocol: 10-frame start stride, 100 m multiples).
    synthetic_eval_frames: int = 0
    # drives per split (train seeds 0.., val seeds 100.., test seeds 200..)
    synthetic_train_drives: int = 2
    synthetic_eval_drives: int = 1
    # world geometry placement: "origin" = fixed 60 m-radius blob around
    # the start pose (the historical fixture; drives longer than ~128
    # frames exit it and scans go EMPTY — physically blind stretches);
    # "corridor" = ground+pillars generated along the whole trajectory so
    # arbitrarily long drives stay in populated geometry.
    synthetic_world: str = "origin"
    # SemanticKITTI-format per-point segmentation labels for PointSeg
    # pretraining: <labels-path>/<drive-name>/<frame>.label (uint32 per
    # point, low 16 bits = semantic id). Empty = geometric pseudo-labels.
    labels_path: str = ""
    # optional raw-id -> train-id remap (SemanticKITTI "learning map");
    # ids not listed map to 0 (unlabeled).
    label_map: Dict[int, int] = field(default_factory=dict)
    labels_num_classes: int = 20

    @property
    def effective_combinations(self) -> Tuple[Tuple[int, int], ...]:
        if self.combinations:
            return self.combinations
        return tuple((i, i + 1) for i in range(self.sequence_size - 1))

    @property
    def num_pairs(self) -> int:
        return len(self.effective_combinations)

    @property
    def num_image_channels(self) -> int:
        n = 0
        for c in self.channels:
            n += 3 if c == "normals" else 1
        return n

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "DatasetConfig":
        kitti = _get(d, "kitti", {}) or {}

        def _split(block) -> Dict[str, List]:
            """A split is either {date: [drive,...]} or
            {sequences: ["00", ...]} using the raw<->odometry mapping."""
            block = block or {}
            seqs = _get(block, "sequences", None)
            if seqs is None:
                return {str(k): list(v) for k, v in block.items()}
            out: Dict[str, List] = {}
            for s_ in seqs:
                s_ = f"{int(s_):02d}" if str(s_).isdigit() else str(s_)
                if s_ not in ODOMETRY_SEQUENCES:
                    raise ConfigError(f"unknown KITTI odometry sequence '{s_}'")
                date, drive, start, end = ODOMETRY_SEQUENCES[s_]
                out.setdefault(date, []).append(
                    {"drive": drive, "start": start, "end": end})
            return out
        proj = ProjectionConfig(
            height=int(_get(d, "image-height", 64)),
            width=int(_get(d, "image-width", 1024)),
            fov_up_deg=float(_get(d, "fov-up", 3.0)),
            fov_down_deg=float(_get(d, "fov-down", -25.0)),
            max_points=int(_get(d, "max-points", 131072)),
            packed=bool(_get(d, "packed", False)),
            backend=str(_get(d, "backend", "sort")),
            chunk=int(_get(d, "projection-chunk", 16)),
            kernel_spb=int(_get(d, "kernel-spb", 1)),
            kernel_packed=str(_get(d, "kernel-packed", "auto")),
            kernel_aligned=str(_get(d, "kernel-aligned", "off")),
        )
        if proj.kernel_packed not in ("auto", "on", "off"):
            raise ConfigError(
                f"kernel-packed must be auto|on|off, got "
                f"{proj.kernel_packed!r}")
        if proj.kernel_aligned not in ("auto", "on", "off", "trust",
                                       "halves"):
            raise ConfigError(
                f"kernel-aligned must be auto|on|off|trust|halves, got "
                f"{proj.kernel_aligned!r}")
        if bool(_get(d, "slot-bin", False)) and (
                proj.max_points % (proj.height * proj.width)):
            raise ConfigError(
                f"slot-bin needs max-points ({proj.max_points}) to be a "
                f"multiple of H*W ({proj.height * proj.width})")
        if proj.kernel_aligned in ("trust", "halves"):
            # trust/halves skip the runtime alignment predicate, so the
            # GRID contract must hold by CONSTRUCTION of the data
            # pipeline: synthetic ring drives or host slot binning. Raw
            # real scans would silently project points at their slot's
            # pixel.
            if (not bool(_get(d, "synthetic", False))
                    and not bool(_get(d, "slot-bin", False))):
                raise ConfigError(
                    f"kernel-aligned={proj.kernel_aligned} requires "
                    "grid-aligned data by construction: set "
                    "datasets.synthetic or datasets.slot-bin (or use "
                    "kernel-aligned=auto, which keeps the runtime "
                    "predicate)")
            if bool(_get(d, "augment-yaw", False)):
                # device-side yaw rotation moves points off their
                # azimuth slots AFTER the host laid them out — the
                # asserted grid contract would be silently false.
                raise ConfigError(
                    f"kernel-aligned={proj.kernel_aligned} is "
                    "incompatible with augment-yaw (rotation breaks the "
                    "slot grid); use kernel-aligned=auto or off")
        combos = tuple(tuple(int(i) for i in c)
                       for c in (_get(d, "combinations", None) or ()))
        seq = int(_get(d, "sequence-size", 2))
        for c in combos:
            if len(c) != 2 or not all(0 <= i < seq for i in c):
                raise ConfigError(
                    f"combination {c} out of range for sequence-size {seq} "
                    f"(frame indices are 0..{seq - 1})")
        channels = tuple(_get(d, "channels", ["x", "y", "z", "remission", "depth"]))
        for c in channels:
            if c not in CHANNEL_ORDER:
                raise ConfigError(f"unknown projection channel '{c}'")
        return DatasetConfig(
            root_path=str(_get(kitti, "root-path", _get(d, "root-path", ""))),
            train=_split(_get(kitti, "train", {})),
            validation=_split(_get(kitti, "validation", {})),
            test=_split(_get(kitti, "test", {})),
            sequence_size=seq,
            combinations=combos,
            window_stride=int(_get(d, "window-stride", 1)),
            channels=channels,
            projection=proj,
            mean=tuple(float(x) for x in (_get(d, "mean", []) or [])),
            std=tuple(float(x) for x in (_get(d, "std", []) or [])),
            max_imu_per_pair=int(_get(d, "max-imu-per-pair", 16)),
            augment_yaw=bool(_get(d, "augment-yaw", False)),
            slot_bin=bool(_get(d, "slot-bin", False)),
            synthetic=bool(_get(d, "synthetic", False)),
            synthetic_frames=int(_get(d, "synthetic-frames", 64)),
            synthetic_eval_frames=int(_get(d, "synthetic-eval-frames", 0)),
            synthetic_train_drives=int(_get(d, "synthetic-train-drives", 2)),
            synthetic_eval_drives=int(_get(d, "synthetic-eval-drives", 1)),
            synthetic_world=str(_get(d, "synthetic-world", "origin")),
            labels_path=str(_get(d, "labels-path", "")),
            label_map={int(k): int(v)
                       for k, v in (_get(d, "label-map", {}) or {}).items()},
            labels_num_classes=int(_get(d, "labels-num-classes", 20)),
        )


# ---------------------------------------------------------------------------
# Nets
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LidarFeatConfig:
    # reference net names: lidar-feat-pointseg | lidar-feat-simple-0 | -1
    # (SURVEY.md §2.3 LidarPointSegFeat / LidarSimpleFeat0/1)
    name: str = "lidar-feat-pointseg"
    # pointseg options
    part: str = "encoder"        # encoder | encoder+decoder
    # `bypass` is accepted for reference-config compatibility; its upstream
    # semantics (skip-connection bypass) could not be verified against the
    # empty reference mount, so it maps to the decoder-bearing part.
    bypass: bool = False
    base_channels: int = 64
    dropout: float = 0.0
    pretrained: bool = False
    model_path: str = ""
    feature_size: int = 512      # flattened output feature dim (simple nets)
    # TPU-oriented knobs: h_stride=2 downsamples laser rows in the stem
    # (halves activation traffic through the whole tower); se toggles the
    # SELayer attention blocks.
    h_stride: int = 1
    w_stride: int = 2   # stem azimuth stride (2 = SqueezeSeg default)
    se: bool = True
    # EL/ASPP bottleneck width (0 = classic full-width context layer; >0
    # inserts 1x1 squeeze/expand around the dilated pyramid, ~10x fewer
    # FLOPs at 512 wide — models/blocks.py::ASPP).
    el_squeeze: int = 0
    # stem="s2d": space-to-depth stem (models/pointseg.py), fire="fused":
    # single-conv Fire modules (models/blocks.py) — TPU bandwidth knobs;
    # classic forms remain the reference-shaped defaults.
    # stem="s2d-pre": s2d layout emitted by the data side straight out of
    # the projection epilogue (train/step.py); param-identical to "s2d".
    # stem="factorized": run the stem conv PER FRAME (C -> 2*64 channels)
    # and sum u_i + v_j per pair on the downsampled grid — the full-res
    # pair stack never materializes (models/blocks.py::FactorizedStem;
    # equal math to classic by conv linearity, pointseg-only).
    stem: str = "classic"
    fire: str = "classic"
    # pool="cheap": (1,2)-window max pools; pool="stride": no pools, the
    # stage-entry Fire squeezes carry stride (1,2) (models/pointseg.py).
    # pool="stride-fold": stride mode with fire2's entry stride folded
    # into the stem — exact rewrite, encoder-only (models/pointseg.py).
    pool: str = "classic"

    @staticmethod
    def from_dict(name: str, d: Dict[str, Any]) -> "LidarFeatConfig":
        bypass = bool(_get(d, "bypass", False))
        default_part = "encoder+decoder" if bypass else "encoder"
        stem = str(_get(d, "stem", "classic"))
        fire = str(_get(d, "fire", "classic"))
        pool = str(_get(d, "pool", "classic"))
        part = str(_get(d, "part", default_part))
        if part not in ("encoder", "encoder+decoder"):
            raise ConfigError(
                f"part must be encoder|encoder+decoder, got {part!r}")
        if stem not in ("classic", "pair-split", "s2d", "s2d-pre",
                        "factorized"):
            raise ConfigError(
                "stem must be classic|pair-split|s2d|s2d-pre|factorized, "
                f"got {stem!r}")
        if stem == "pair-split" and part != "encoder":
            raise ConfigError(
                "stem=pair-split is encoder-only (the seg decoder reads "
                "the concatenated pair input the split never builds)")
        if fire not in ("classic", "fused", "mixed"):
            raise ConfigError(
                f"fire must be classic|fused|mixed, got {fire!r}")
        if pool not in ("classic", "cheap", "stride", "stride-fold"):
            raise ConfigError(
                f"pool must be classic|cheap|stride|stride-fold, got {pool!r}")
        if pool == "stride-fold" and (part != "encoder"
                                      or stem not in ("classic",
                                                      "pair-split")):
            # The fold is exact only while the skips are dead (no decoder)
            # and the stem is the (possibly input-split) strided 3x3
            # (models/pointseg.py).
            raise ConfigError(
                "pool=stride-fold requires part=encoder and a classic or "
                f"pair-split stem (got part={part!r}, stem={stem!r})")
        return LidarFeatConfig(
            name=name,
            part=part,
            bypass=bypass,
            base_channels=int(_get(d, "base-channels", 64)),
            dropout=float(_get(d, "dropout", 0.0)),
            pretrained=bool(_get(d, "pretrained", False)),
            model_path=str(_get(d, "model-path", "")),
            feature_size=int(_get(d, "feature-size", 512)),
            h_stride=int(_get(d, "h-stride", 1)),
            w_stride=int(_get(d, "w-stride", 2)),
            se=bool(_get(d, "se", True)),
            el_squeeze=int(_get(d, "el-squeeze", 0)),
            stem=stem,
            fire=fire,
            pool=pool,
        )


@dataclass(frozen=True)
class ImuFeatConfig:
    name: str = "imu-feat-rnn"   # imu-feat-rnn | imu-feat-fc
    rnn_type: str = "lstm"       # lstm | gru
    input_size: int = 6          # [ax,ay,az,wx,wy,wz]
    hidden_size: int = 128
    num_layers: int = 2
    bidirectional: bool = False

    @staticmethod
    def from_dict(name: str, d: Dict[str, Any]) -> "ImuFeatConfig":
        return ImuFeatConfig(
            name=name,
            rnn_type=str(_get(d, "type", "lstm")),
            input_size=int(_get(d, "input-size", 6)),
            hidden_size=int(_get(d, "hidden-size", 128)),
            num_layers=int(_get(d, "num-layers", 2)),
            bidirectional=bool(_get(d, "bidirectional", False)),
        )


@dataclass(frozen=True)
class FusionConfig:
    kind: str = "soft"  # soft | hard  (reference fusion-net: {type: ...})

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "FusionConfig":
        kind = str(_get(d, "type", "soft"))
        if kind not in ("soft", "hard"):
            raise ConfigError(f"fusion-net type must be soft|hard, got {kind}")
        return FusionConfig(kind=kind)


@dataclass(frozen=True)
class OdomFeatConfig:
    name: str = "odom-feat-rnn"  # odom-feat-rnn | odom-feat-fc
    rnn_type: str = "lstm"
    hidden_size: int = 256
    num_layers: int = 2

    @staticmethod
    def from_dict(name: str, d: Dict[str, Any]) -> "OdomFeatConfig":
        return OdomFeatConfig(
            name=name,
            rnn_type=str(_get(d, "type", "lstm")),
            hidden_size=int(_get(d, "hidden-size", 256)),
            num_layers=int(_get(d, "num-layers", 2)),
        )


@dataclass(frozen=True)
class ModelConfig:
    arch: str = "deeplio"  # deepio | deeplo | deeplio
    dropout: float = 0.25
    lidar: Optional[LidarFeatConfig] = None
    imu: Optional[ImuFeatConfig] = None
    fusion: Optional[FusionConfig] = None
    odom: OdomFeatConfig = field(default_factory=OdomFeatConfig)
    pretrained: bool = False
    model_path: str = ""
    # precision policy: bf16 activations on TPU, f32 params everywhere
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    def validate(self) -> None:
        if self.arch not in ("deepio", "deeplo", "deeplio"):
            raise ConfigError(f"arch must be deepio|deeplo|deeplio, got {self.arch}")
        if self.arch in ("deeplo", "deeplio") and self.lidar is None:
            raise ConfigError(f"arch {self.arch} requires a lidar-feat-net block")
        if self.arch in ("deepio", "deeplio") and self.imu is None:
            raise ConfigError(f"arch {self.arch} requires an imu-feat-net block")
        if self.arch == "deeplio" and self.fusion is None:
            raise ConfigError("arch deeplio requires a fusion-net block")


# ---------------------------------------------------------------------------
# Loss / optimizer / train
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LossConfig:
    # active loss: hws (fixed beta) | lws (learned Kendall uncertainty)
    # (reference: deeplio/losses/losses.py HWSLoss / LWSLoss)
    active: str = "lws"
    # translation/rotation norms: l1 | l2 ; rotation also supports geodesic
    x_norm: str = "l2"
    q_norm: str = "l2"
    beta: float = 1120.0   # hws rotation weight
    sx: float = 0.0        # lws learned log-variance inits
    sq: float = -2.5

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "LossConfig":
        active = str(_get(d, "active", _get(d, "type", "lws"))).lower()
        hws = _get(d, "hws", {}) or {}
        lws = _get(d, "lws", {}) or {}
        return LossConfig(
            active=active,
            x_norm=str(_get(d, "x-norm", "l2")),
            q_norm=str(_get(d, "q-norm", "l2")),
            beta=float(_get(hws, "beta", _get(d, "beta", 1120.0))),
            sx=float(_get(lws, "sx", _get(d, "sx", 0.0))),
            sq=float(_get(lws, "sq", _get(d, "sq", -2.5))),
        )


@dataclass(frozen=True)
class OptimConfig:
    name: str = "adam"         # adam | sgd
    lr: float = 1e-4
    weight_decay: float = 0.0
    momentum: float = 0.9      # sgd only
    # scheduler: none | step | cosine | plateau
    scheduler: str = "none"
    step_size: int = 20        # epochs per decay (step)
    gamma: float = 0.5
    warmup_steps: int = 0
    grad_clip: float = 0.0     # 0 = off
    # Run the optimizer update + apply over ONE raveled f32 vector instead
    # of per-leaf pytree ops. Adam/SGD are elementwise, so the math is
    # identical per element; the compiled program differs, so params agree
    # to last-ulp f32 (tests/distributed/test_shard_map.py). The payoff is
    # XLA emitting a couple of large fused kernels instead of ~a hundred
    # small per-leaf (w, m, v) tuple fusions (~2.5 ms/step at flagship
    # scale — docs/performance.md round-4 profile). Caveat: with
    # grad-clip > 0 the global norm reduces over one vector instead of
    # per-leaf partial sums, shifting the result by float rounding order.
    flat_update: bool = False
    # plateau scheduler (torch ReduceLROnPlateau semantics, applied at
    # validation time by the trainer): reduce lr by gamma after `patience`
    # validations without improvement; never below min_lr.
    patience: int = 3
    min_lr: float = 0.0
    # minimum absolute val-loss improvement that counts (torch `threshold`)
    threshold: float = 1e-4

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "OptimConfig":
        sched = _get(d, "scheduler", {}) or {}
        if isinstance(sched, str):
            sched = {"name": sched}
        return OptimConfig(
            name=str(_get(d, "name", _get(d, "type", "adam"))).lower(),
            lr=float(_get(d, "lr", 1e-4)),
            weight_decay=float(_get(d, "weight-decay", 0.0)),
            momentum=float(_get(d, "momentum", 0.9)),
            scheduler=str(_get(sched, "name", "none")).lower(),
            step_size=int(_get(sched, "step-size", 20)),
            gamma=float(_get(sched, "gamma", 0.5)),
            warmup_steps=int(_get(sched, "warmup-steps", 0)),
            grad_clip=float(_get(d, "grad-clip", 0.0)),
            flat_update=bool(_get(d, "flat-update", False)),
            patience=int(_get(sched, "patience", 3)),
            min_lr=float(_get(sched, "min-lr", 0.0)),
            threshold=float(_get(sched, "threshold", 1e-4)),
        )


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    epochs: int = 50
    seed: int = 42
    log_every: int = 25
    eval_every_epochs: int = 1
    checkpoint_dir: str = "checkpoints"
    checkpoint_every_steps: int = 500
    keep_checkpoints: int = 3
    # device mesh: data-parallel size (-1 = all local devices)
    data_parallel: int = -1
    prefetch: int = 2
    # epoch-level projection cache: project every frame ONCE into an
    # on-disk f16 memmap under <workdir>/proj_cache; later epochs stream
    # images and the compiled step skips projection (data/proj_cache.py).
    # Incompatible with augment-yaw (which rotates raw points).
    cache_projections: bool = False
    # optimizer steps per compiled program (unrolled in train/step.py):
    # amortizes per-program host dispatch on high-latency device relays.
    # Bit-identical math; epoch tails shorter than k are dropped.
    steps_per_call: int = 1
    # Stage the whole train/val split into HBM once and gather batches
    # device-side (data/device_bank.py): steady-state training ships one
    # [batch] int32 vector per step instead of re-transferring scans.
    # Bit-equal batches vs the host-fed path; single-process only; the
    # split must fit in device memory (checked at startup).
    device_dataset: bool = False

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "TrainConfig":
        return TrainConfig(
            batch_size=int(_get(d, "batch-size", 8)),
            epochs=int(_get(d, "epochs", 50)),
            seed=int(_get(d, "seed", 42)),
            log_every=int(_get(d, "log-every", 25)),
            eval_every_epochs=int(_get(d, "eval-every-epochs", 1)),
            checkpoint_dir=str(_get(d, "checkpoint-dir", "checkpoints")),
            checkpoint_every_steps=int(_get(d, "checkpoint-every-steps", 500)),
            keep_checkpoints=int(_get(d, "keep-checkpoints", 3)),
            data_parallel=int(_get(d, "data-parallel", -1)),
            prefetch=int(_get(d, "prefetch", 2)),
            steps_per_call=int(_get(d, "steps-per-call", 1)),
            cache_projections=bool(_get(d, "cache-projections", False)),
            device_dataset=bool(_get(d, "device-dataset", False)),
        )


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Config:
    datasets: DatasetConfig
    model: ModelConfig
    loss: LossConfig
    optim: OptimConfig
    train: TrainConfig
    raw: Dict[str, Any] = field(default_factory=dict, compare=False, repr=False)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        datasets = DatasetConfig.from_dict(_get(d, "datasets", {}) or {})
        arch = str(_get(d, "arch", "deeplio")).lower()
        arch_block: Dict[str, Any] = _get(d, arch, {}) or {}

        lidar = imu = fusion = None
        if arch in ("deeplo", "deeplio"):
            lspec = _require(arch_block, "lidar-feat-net", f"'{arch}' block")
            lname = str(lspec if isinstance(lspec, str)
                        else _get(lspec or {}, "name", "lidar-feat-pointseg"))
            lidar = LidarFeatConfig.from_dict(lname, _get(d, lname, {}) or {})
        if arch in ("deepio", "deeplio"):
            iname = str(_get(arch_block, "imu-feat-net", "imu-feat-rnn")
                        if isinstance(_get(arch_block, "imu-feat-net"), str)
                        else _get(_get(arch_block, "imu-feat-net", {}) or {}, "name",
                                  "imu-feat-rnn"))
            imu = ImuFeatConfig.from_dict(iname, _get(d, iname, {}) or {})
        if arch == "deeplio":
            fusion = FusionConfig.from_dict(_get(arch_block, "fusion-net", {}) or {})

        oname = str(_get(arch_block, "odom-feat-net", "odom-feat-rnn")
                    if isinstance(_get(arch_block, "odom-feat-net"), str)
                    else _get(_get(arch_block, "odom-feat-net", {}) or {}, "name",
                              "odom-feat-rnn"))
        odom = OdomFeatConfig.from_dict(oname, _get(d, oname, {}) or {})

        model = ModelConfig(
            arch=arch,
            dropout=float(_get(arch_block, "dropout", 0.25)),
            lidar=lidar,
            imu=imu,
            fusion=fusion,
            odom=odom,
            pretrained=bool(_get(arch_block, "pretrained", False)),
            model_path=str(_get(arch_block, "model-path", "")),
            compute_dtype=str(_get(d, "compute-dtype", "bfloat16")),
            param_dtype=str(_get(d, "param-dtype", "float32")),
        )
        model.validate()

        train = TrainConfig.from_dict(_get(d, "train", {}) or {})
        if train.cache_projections and datasets.augment_yaw:
            raise ConfigError(
                "cache-projections is incompatible with augment-yaw: the "
                "yaw augmentation rotates raw points, which cached images "
                "bypass. Disable one of them.")
        return Config(
            datasets=datasets,
            model=model,
            loss=LossConfig.from_dict(_get(d, "losses", {}) or {}),
            optim=OptimConfig.from_dict(_get(d, "optimizer", {}) or {}),
            train=train,
            raw=dict(d),
        )

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
