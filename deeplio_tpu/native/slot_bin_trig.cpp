// Vectorized spherical-angle pass for the native slot-bin loader op.
//
// THIS translation unit is compiled with -Ofast -march=native so g++
// vectorizes atan2f/asinf through libmvec (measured 2.9 ns/pt vs 38 ns
// scalar). Fast-math may perturb the TRANSCENDENTALS by a few ulp
// relative to numpy's SIMD trig — measured: yaw 0 ulp, pitch p99 = 2
// ulp, ZERO pixel-assignment flips over 4M random points at the
// flagship grid (docs/performance.md round-5). Everything whose ulps
// feed integer decisions elsewhere (range r -> quantized key, the
// floor/clip binning arithmetic) lives in slot_bin_core.cpp, compiled
// WITHOUT fast-math and with -ffp-contract=off, so only the
// transcendental approximations can differ — the same caveat class as
// device-vs-host trig (ops/projection.py kernel-aligned docs).
//
// Upstream equivalent: the projection math inside the reference's
// DataLoader workers (deeplio/datasets/kitti.py, SURVEY.md §2.2).

#include <cmath>
#include <cstdint>

extern "C" void dlt_yaw_pitch(
    const float* __restrict x, const float* __restrict y,
    const float* __restrict z, int64_t n,
    float* __restrict yaw, float* __restrict pitch) {
#pragma omp simd
  for (int64_t i = 0; i < n; i++) {
    yaw[i] = atan2f(y[i], x[i]);
    float ri = sqrtf(x[i] * x[i] + y[i] * y[i] + z[i] * z[i]);
    float d = z[i] / fmaxf(ri, 1e-9f);
    d = d > 1.f ? 1.f : (d < -1.f ? -1.f : d);
    pitch[i] = asinf(d);
  }
}
