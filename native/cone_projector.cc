// Native cone-beam forward projector.
//
// The reference depends on the TIGRE CUDA library for projection
// (preprocess/tigre_helpers.py:58-63); the TPU build replaces it with the
// XLA projector in nerfca_tpu/ops/projector.py. This C++ implementation is
// the third leg: a dependency-free OpenMP CPU projector used as (a) an
// independent numerical cross-check of the XLA kernel and (b) a fast
// dataset-generation path on hosts without accelerators.
//
// Math contract (identical to the XLA projector and the reference's CPU
// ray tracer, preprocess/proj_helpers.py:84-115):
//   - rays r(t) = o + t*d sampled at the caller's depth values;
//   - trilinear interpolation of the (x, y, z)-indexed volume, zero
//     outside;
//   - 'ct' mode: rectangle-rule sum of value * delta-depth with the final
//     delta = 1e-10; 'mip' mode: max over samples;
//   - world-to-voxel: idx = (p - off) / dvoxel + (n - 1) / 2.

#include <algorithm>
#include <cmath>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Volume {
  const float* data;
  int nx, ny, nz;

  inline float at(int ix, int iy, int iz) const {
    return data[(static_cast<int64_t>(ix) * ny + iy) * nz + iz];
  }

  // Trilinear sample at continuous voxel coordinates; zero outside.
  inline float sample(float x, float y, float z) const {
    if (x < 0.f || y < 0.f || z < 0.f || x > nx - 1.f || y > ny - 1.f ||
        z > nz - 1.f) {
      return 0.f;
    }
    x = std::min(x, nx - 1.f - 1e-6f);
    y = std::min(y, ny - 1.f - 1e-6f);
    z = std::min(z, nz - 1.f - 1e-6f);
    const int ix = static_cast<int>(x), iy = static_cast<int>(y),
              iz = static_cast<int>(z);
    const float fx = x - ix, fy = y - iy, fz = z - iz;
    const float c00 = at(ix, iy, iz) * (1 - fx) + at(ix + 1, iy, iz) * fx;
    const float c10 = at(ix, iy + 1, iz) * (1 - fx) + at(ix + 1, iy + 1, iz) * fx;
    const float c01 = at(ix, iy, iz + 1) * (1 - fx) + at(ix + 1, iy, iz + 1) * fx;
    const float c11 =
        at(ix, iy + 1, iz + 1) * (1 - fx) + at(ix + 1, iy + 1, iz + 1) * fx;
    const float c0 = c00 * (1 - fy) + c10 * fy;
    const float c1 = c01 * (1 - fy) + c11 * fy;
    return c0 * (1 - fz) + c1 * fz;
  }
};

}  // namespace

extern "C" {

// mode: 0 = attenuation line integral ('ct'), 1 = max intensity ('mip').
void cone_project(const float* volume_data, int nx, int ny, int nz,
                  const float* origins, const float* dirs, int64_t n_rays,
                  const float* depths, int n_samples, float dvx, float dvy,
                  float dvz, float offx, float offy, float offz, int mode,
                  float* out) {
  const Volume vol{volume_data, nx, ny, nz};
  const float cx = (nx - 1) * 0.5f, cy = (ny - 1) * 0.5f, cz = (nz - 1) * 0.5f;

#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rays; ++r) {
    const float ox = origins[3 * r], oy = origins[3 * r + 1],
                oz = origins[3 * r + 2];
    const float dx = dirs[3 * r], dy = dirs[3 * r + 1], dz = dirs[3 * r + 2];
    float acc = 0.f;
    float best = -INFINITY;
    for (int s = 0; s < n_samples; ++s) {
      const float t = depths[s];
      const float vx = (ox + t * dx - offx) / dvx + cx;
      const float vy = (oy + t * dy - offy) / dvy + cy;
      const float vz = (oz + t * dz - offz) / dvz + cz;
      const float val = vol.sample(vx, vy, vz);
      if (mode == 1) {
        best = std::max(best, val);
      } else {
        const float delta =
            (s + 1 < n_samples) ? depths[s + 1] - depths[s] : 1e-10f;
        acc += val * delta;
      }
    }
    out[r] = (mode == 1) ? best : acc;
  }
}

int cone_projector_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
