"""Device kernels: spherical projection (XLA scatter-min + Pallas), masked
LSTM scan, normals. The reference has no native kernels (SURVEY.md §2.9);
these replace its performance-critical numpy loader code on device."""

from deeplio_tpu.ops.projection import (
    assemble_channels,
    compute_normals,
    make_projector,
    normalize_channels,
    project_batch,
    project_scan,
    project_scan_np,
    spherical_uv,
)
