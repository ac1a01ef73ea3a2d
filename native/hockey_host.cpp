// hockey_host — native host-side runtime kernels for hockey_tpu.
//
// The device compute path is JAX/XLA; these are the host-side hot ops that
// sit between device calls in the per-frame loop (tracking association)
// where Python/numpy overhead is measurable at high frame rates:
//
//   - iou_matrix:   pairwise IoU of two xyxy box sets
//   - solve_lsap:   rectangular linear sum assignment (Jonker-Volgenant
//                   style shortest augmenting path, O(n^3)) used by
//                   ByteTrack's two association stages
//
// Exposed as a plain C ABI consumed via ctypes (tracking/native.py); the
// Python side falls back to numpy/scipy when the library isn't built.
//
// Build: make -C native   (or: g++ -O3 -shared -fPIC hockey_host.cpp
//                               -o libhockey_host.so)

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// a: n x 4, b: m x 4 (xyxy), out: n x m row-major.
void iou_matrix(const float* a, int32_t n, const float* b, int32_t m,
                float* out) {
  std::vector<float> area_b(m);
  for (int32_t j = 0; j < m; ++j) {
    const float* q = b + 4 * j;
    area_b[j] = (q[2] - q[0]) * (q[3] - q[1]);
  }
  for (int32_t i = 0; i < n; ++i) {
    const float* p = a + 4 * i;
    const float area_a = (p[2] - p[0]) * (p[3] - p[1]);
    float* row = out + (int64_t)i * m;
    for (int32_t j = 0; j < m; ++j) {
      const float* q = b + 4 * j;
      const float x1 = p[0] > q[0] ? p[0] : q[0];
      const float y1 = p[1] > q[1] ? p[1] : q[1];
      const float x2 = p[2] < q[2] ? p[2] : q[2];
      const float y2 = p[3] < q[3] ? p[3] : q[3];
      const float w = x2 - x1 > 0.f ? x2 - x1 : 0.f;
      const float h = y2 - y1 > 0.f ? y2 - y1 : 0.f;
      const float inter = w * h;
      const float uni = area_a + area_b[j] - inter;
      row[j] = uni > 1e-9f ? inter / uni : 0.f;
    }
  }
}

// Rectangular linear sum assignment (minimize cost). cost: n x m row-major.
// row_to_col[i] = assigned column for row i. Requires n <= m (caller
// transposes otherwise). Hungarian algorithm with potentials and shortest
// augmenting paths (O(n^2 m)). Returns 0 on success.
int32_t solve_lsap(const double* cost, int32_t n, int32_t m,
                   int32_t* row_to_col) {
  if (n == 0) return 0;
  if (n > m) return -1;

  // 1-indexed; p[j] = row matched to column j (0 = none).
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int32_t> p(m + 1, 0), way(m + 1, 0);

  for (int32_t i = 1; i <= n; ++i) {
    p[0] = i;
    int32_t j0 = 0;
    std::vector<double> minv(m + 1, DBL_MAX);
    std::vector<bool> used(m + 1, false);
    do {
      used[j0] = true;
      const int32_t i0 = p[j0];
      double delta = DBL_MAX;
      int32_t j1 = -1;
      for (int32_t j = 1; j <= m; ++j) {
        if (used[j]) continue;
        const double cur =
            cost[(int64_t)(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 == -1) return -2;  // infeasible
      for (int32_t j = 0; j <= m; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    // augment
    do {
      const int32_t j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != 0);
  }

  for (int32_t i = 0; i < n; ++i) row_to_col[i] = -1;
  for (int32_t j = 1; j <= m; ++j) {
    if (p[j] > 0) row_to_col[p[j] - 1] = j - 1;
  }
  return 0;
}

// Batched constant-velocity Kalman predict for the annotation stabilizer
// table: means n x 8 (cx, cy, w, h + velocities), in place.
void kalman_predict_means(float* means, int32_t n) {
  for (int32_t i = 0; i < n; ++i) {
    float* x = means + (int64_t)i * 8;
    x[0] += x[4];
    x[1] += x[5];
    x[2] += x[6];
    x[3] += x[7];
  }
}

}  // extern "C"
