// deepsir_tpu native host runtime: C++ data-pipeline kernels.
//
// TPU-native replacements for the compiled third-party extensions the
// reference leans on for its host data path (SURVEY.md §2.4):
//   * voxel_downsample   — Open3D voxel_down_sample (C++), used per sample
//                          (reference kitti_loader.py:337, oxford_loader.py:174)
//   * radius_matches     — Open3D KDTreeFlann radius search for GT
//                          correspondences (data_base.py:436-449)
//   * knn_search         — torch_points_kernels.knn (data_base.py:165,170)
//   * icp_point2point    — Open3D registration_icp for GT pose refinement
//                          (kitti_loader.py:268-270)
//
// Plain C ABI for ctypes. Single-threaded, grid/kd-tree accelerated.
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct Key3 {
  int32_t x, y, z;
  bool operator==(const Key3 &o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct Key3Hash {
  size_t operator()(const Key3 &k) const {
    // large-prime spatial hash
    return static_cast<size_t>(k.x) * 73856093u ^
           static_cast<size_t>(k.y) * 19349669u ^
           static_cast<size_t>(k.z) * 83492791u;
  }
};

inline Key3 voxel_of(const float *p, float inv_voxel) {
  return Key3{static_cast<int32_t>(std::floor(p[0] * inv_voxel)),
              static_cast<int32_t>(std::floor(p[1] * inv_voxel)),
              static_cast<int32_t>(std::floor(p[2] * inv_voxel))};
}

// ------------------------------------------------------------------ kd-tree
// Simple balanced kd-tree over 3D points (median split, implicit layout).
struct KDTree {
  const float *pts;  // (n, stride) xyz first
  int stride;
  std::vector<int> order;  // permutation, tree in nested-subrange form

  KDTree(const float *p, int n, int stride_) : pts(p), stride(stride_) {
    order.resize(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    build(0, n, 0);
  }

  inline const float *at(int i) const { return pts + order[i] * stride; }

  void build(int lo, int hi, int axis) {
    if (hi - lo <= 1) return;
    int mid = (lo + hi) / 2;
    std::nth_element(order.begin() + lo, order.begin() + mid,
                     order.begin() + hi, [&](int a, int b) {
                       return pts[a * stride + axis] < pts[b * stride + axis];
                     });
    build(lo, mid, (axis + 1) % 3);
    build(mid + 1, hi, (axis + 1) % 3);
  }

  // k-NN: max-heap of (dist, idx)
  void knn(const float *q, int k,
           std::priority_queue<std::pair<float, int>> &heap, int lo, int hi,
           int axis) const {
    if (hi <= lo) return;
    int mid = (lo + hi) / 2;
    const float *m = at(mid);
    float dx = q[0] - m[0], dy = q[1] - m[1], dz = q[2] - m[2];
    float d = dx * dx + dy * dy + dz * dz;
    if (static_cast<int>(heap.size()) < k) {
      heap.emplace(d, order[mid]);
    } else if (d < heap.top().first) {
      heap.pop();
      heap.emplace(d, order[mid]);
    }
    float diff = q[axis] - m[axis];
    int next_axis = (axis + 1) % 3;
    if (diff < 0) {
      knn(q, k, heap, lo, mid, next_axis);
      if (static_cast<int>(heap.size()) < k || diff * diff < heap.top().first)
        knn(q, k, heap, mid + 1, hi, next_axis);
    } else {
      knn(q, k, heap, mid + 1, hi, next_axis);
      if (static_cast<int>(heap.size()) < k || diff * diff < heap.top().first)
        knn(q, k, heap, lo, mid, next_axis);
    }
  }

  // single nearest neighbour with an upper bound; returns idx or -1
  int nearest(const float *q, float max_sq, float *out_sq) const {
    float best = max_sq;
    int best_i = -1;
    nearest_rec(q, 0, static_cast<int>(order.size()), 0, best, best_i);
    *out_sq = best;
    return best_i;
  }

  void nearest_rec(const float *q, int lo, int hi, int axis, float &best,
                   int &best_i) const {
    if (hi <= lo) return;
    int mid = (lo + hi) / 2;
    const float *m = at(mid);
    float dx = q[0] - m[0], dy = q[1] - m[1], dz = q[2] - m[2];
    float d = dx * dx + dy * dy + dz * dz;
    if (d < best) {
      best = d;
      best_i = order[mid];
    }
    float diff = q[axis] - m[axis];
    int next_axis = (axis + 1) % 3;
    if (diff < 0) {
      nearest_rec(q, lo, mid, next_axis, best, best_i);
      if (diff * diff < best) nearest_rec(q, mid + 1, hi, next_axis, best, best_i);
    } else {
      nearest_rec(q, mid + 1, hi, next_axis, best, best_i);
      if (diff * diff < best) nearest_rec(q, lo, mid, next_axis, best, best_i);
    }
  }
};

// --------------------------------------------------------------- 3x3 Kabsch
// Jacobi eigenvalue decomposition of a symmetric 3x3 (for SVD via A^T A).
void jacobi_eigen3(double a[3][3], double v[3][3]) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) v[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
  }
}

// Weighted Kabsch: rotation+translation aligning src -> tgt. out = 3x4.
void kabsch(const double *src, const double *tgt, const double *w, int n,
            double out[12]) {
  double wsum = 0, cs[3] = {0, 0, 0}, ct[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i) {
    double wi = w ? w[i] : 1.0;
    wsum += wi;
    for (int d = 0; d < 3; ++d) {
      cs[d] += wi * src[i * 3 + d];
      ct[d] += wi * tgt[i * 3 + d];
    }
  }
  if (wsum <= 0) wsum = 1;
  for (int d = 0; d < 3; ++d) {
    cs[d] /= wsum;
    ct[d] /= wsum;
  }
  double h[3][3] = {{0}};
  for (int i = 0; i < n; ++i) {
    double wi = w ? w[i] : 1.0;
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c)
        h[r][c] += wi * (src[i * 3 + r] - cs[r]) * (tgt[i * 3 + c] - ct[c]);
  }
  // SVD of H via eigen decomposition of H^T H = V S^2 V^T, U = H V S^-1
  double hth[3][3] = {{0}};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      for (int k = 0; k < 3; ++k) hth[r][c] += h[k][r] * h[k][c];
  double vmat[3][3];
  jacobi_eigen3(hth, vmat);
  // eigenvalues are on hth diagonal after rotation; sort descending
  double ev[3] = {hth[0][0], hth[1][1], hth[2][2]};
  int idx[3] = {0, 1, 2};
  std::sort(idx, idx + 3, [&](int a, int b) { return ev[a] > ev[b]; });
  double vs[3][3], sv[3];
  for (int c = 0; c < 3; ++c) {
    sv[c] = std::sqrt(std::max(ev[idx[c]], 0.0));
    for (int r = 0; r < 3; ++r) vs[r][c] = vmat[r][idx[c]];
  }
  // U columns = H v_c / s_c, with GRAM-SCHMIDT orthonormal completion for
  // (near-)zero singular values — identity-column substitution would make
  // U non-orthogonal and the result a shear, not a rotation (rank-deficient
  // correspondence sets: collinear or duplicated points)
  double u[3][3];
  for (int c = 0; c < 3; ++c) {
    double col[3];
    for (int r = 0; r < 3; ++r) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += h[r][k] * vs[k][c];
      col[r] = s;
    }
    if (sv[c] > 1e-12) {
      for (int r = 0; r < 3; ++r) col[r] /= sv[c];
    } else {
      // degenerate: pick any unit vector orthogonal to the earlier columns
      col[0] = 1.0; col[1] = 0.0; col[2] = 0.0;
    }
    // orthogonalize against previously fixed columns (no-op when sv large)
    for (int p = 0; p < c; ++p) {
      double dot = 0;
      for (int r = 0; r < 3; ++r) dot += col[r] * u[r][p];
      for (int r = 0; r < 3; ++r) col[r] -= dot * u[r][p];
    }
    double nrm = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
    if (nrm < 1e-12) {
      // still degenerate: cross product of prior columns (c is then 2), or
      // the basis vector least aligned with column 0
      if (c == 2) {
        col[0] = u[1][0] * u[2][1] - u[2][0] * u[1][1];
        col[1] = u[2][0] * u[0][1] - u[0][0] * u[2][1];
        col[2] = u[0][0] * u[1][1] - u[1][0] * u[0][1];
      } else {
        int least = 0;
        for (int r = 1; r < 3; ++r)
          if (std::abs(u[r][0]) < std::abs(u[least][0])) least = r;
        col[0] = col[1] = col[2] = 0.0;
        col[least] = 1.0;
        double dot = 0;
        for (int r = 0; r < 3; ++r) dot += col[r] * u[r][0];
        for (int r = 0; r < 3; ++r) col[r] -= dot * u[r][0];
      }
      nrm = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
      if (nrm < 1e-12) { col[0] = 1.0; col[1] = col[2] = 0.0; nrm = 1.0; }
    }
    for (int r = 0; r < 3; ++r) u[r][c] = col[r] / nrm;
  }
  // rotation = U diag(1,1,det(UV^T)) V^T ... for src->tgt: R = U_h? Use
  // R = U * D * V^T with H = sum (src-cs)(tgt-ct)^T => R = V D U^T? Careful:
  // with H = Σ s t^T (rows s, cols t), R maps src->tgt as R = U_t Σ V_s^T of
  // H^T. Equivalent: R = (H^T's left factors). We have H = U S V^T; the
  // optimal R = V D U^T with D = diag(1,1,det(V U^T)).
  double det = 0;
  {
    double m[3][3];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += vs[r][k] * u[c][k];
        m[r][c] = s;  // V U^T
      }
    det = m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1]) -
          m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0]) +
          m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
  }
  double dsign = det < 0 ? -1.0 : 1.0;
  double rot[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      double s = 0;
      for (int k = 0; k < 3; ++k)
        s += vs[r][k] * (k == 2 ? dsign : 1.0) * u[c][k];
      rot[r][c] = s;
    }
  for (int r = 0; r < 3; ++r) {
    double t = ct[r];
    for (int c = 0; c < 3; ++c) t -= rot[r][c] * cs[c];
    out[r * 4 + 0] = rot[r][0];
    out[r * 4 + 1] = rot[r][1];
    out[r * 4 + 2] = rot[r][2];
    out[r * 4 + 3] = t;
  }
}

inline void apply12(const double *t, const float *p, float *q) {
  for (int r = 0; r < 3; ++r)
    q[r] = static_cast<float>(t[r * 4 + 0] * p[0] + t[r * 4 + 1] * p[1] +
                              t[r * 4 + 2] * p[2] + t[r * 4 + 3]);
}

void compose12(const double *a, const double *b, double *out) {
  // out = a ∘ b (apply b first)
  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[r * 4 + k] * b[k * 4 + c];
      out[r * 4 + c] = s;
    }
    out[r * 4 + 3] = a[r * 4 + 0] * b[3] + a[r * 4 + 1] * b[7] +
                     a[r * 4 + 2] * b[11] + a[r * 4 + 3];
  }
}

}  // namespace

extern "C" {

// Mean-aggregate all C channels per occupied voxel. Output rows are ordered
// by (vx, vy, vz) lexicographically (deterministic; matches the numpy
// fallback). Returns number of voxels written (<= max_out).
int voxel_downsample(const float *points, int n, int c, float voxel_size,
                     float *out, int max_out) {
  float inv = 1.0f / voxel_size;
  std::unordered_map<Key3, int, Key3Hash> slots;
  slots.reserve(n * 2);
  std::vector<double> sums;
  std::vector<int> counts;
  std::vector<Key3> keys;
  for (int i = 0; i < n; ++i) {
    const float *p = points + i * c;
    Key3 k = voxel_of(p, inv);
    auto it = slots.find(k);
    int s;
    if (it == slots.end()) {
      s = static_cast<int>(keys.size());
      slots.emplace(k, s);
      keys.push_back(k);
      sums.resize(sums.size() + c, 0.0);
      counts.push_back(0);
    } else {
      s = it->second;
    }
    for (int d = 0; d < c; ++d) sums[s * c + d] += p[d];
    counts[s] += 1;
  }
  int v = static_cast<int>(keys.size());
  std::vector<int> order(v);
  for (int i = 0; i < v; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    if (keys[a].x != keys[b].x) return keys[a].x < keys[b].x;
    if (keys[a].y != keys[b].y) return keys[a].y < keys[b].y;
    return keys[a].z < keys[b].z;
  });
  int out_n = std::min(v, max_out);
  for (int i = 0; i < out_n; ++i) {
    int s = order[i];
    for (int d = 0; d < c; ++d)
      out[i * c + d] = static_cast<float>(sums[s * c + d] / counts[s]);
  }
  return out_n;
}

// All (i, j) with |T*src_i - ref_j| < radius, via a uniform grid over ref
// with cell == radius. trans: row-major 3x4. Writes at most max_pairs pairs
// but returns the TRUE total count, so the caller can detect buffer overflow
// and retry with a larger buffer instead of silently dropping matches.
int radius_matches(const float *src, int ns, int src_stride, const float *ref,
                   int nr, int ref_stride, const double *trans, float radius,
                   int32_t *out_pairs, int max_pairs) {
  float inv = 1.0f / radius;
  float r2 = radius * radius;
  std::unordered_map<Key3, std::vector<int>, Key3Hash> grid;
  grid.reserve(nr * 2);
  for (int j = 0; j < nr; ++j)
    grid[voxel_of(ref + j * ref_stride, inv)].push_back(j);

  int count = 0;
  for (int i = 0; i < ns; ++i) {
    float q[3];
    apply12(trans, src + i * src_stride, q);
    Key3 c0 = voxel_of(q, inv);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = grid.find(Key3{c0.x + dx, c0.y + dy, c0.z + dz});
          if (it == grid.end()) continue;
          for (int j : it->second) {
            const float *p = ref + j * ref_stride;
            float ddx = q[0] - p[0], ddy = q[1] - p[1], ddz = q[2] - p[2];
            if (ddx * ddx + ddy * ddy + ddz * ddz < r2) {
              if (count < max_pairs) {
                out_pairs[count * 2 + 0] = i;
                out_pairs[count * 2 + 1] = j;
              }
              ++count;
            }
          }
        }
  }
  return count;
}

// Exact kNN (ascending distance) via kd-tree. idx (nq, k), dist sq (nq, k).
void knn_search(const float *query, int nq, int q_stride, const float *ref,
                int nr, int ref_stride, int k, int32_t *idx, float *dist) {
  KDTree tree(ref, nr, ref_stride);
  std::vector<std::pair<float, int>> buf;
  for (int i = 0; i < nq; ++i) {
    std::priority_queue<std::pair<float, int>> heap;
    tree.knn(query + i * q_stride, k, heap, 0, nr, 0);
    buf.clear();
    while (!heap.empty()) {
      buf.push_back(heap.top());
      heap.pop();
    }
    // heap pops worst-first; reverse for ascending
    int m = static_cast<int>(buf.size());
    for (int j = 0; j < k; ++j) {
      if (j < m) {
        idx[i * k + j] = buf[m - 1 - j].second;
        dist[i * k + j] = buf[m - 1 - j].first;
      } else if (m > 0) {  // fewer refs than k: repeat the farthest found
        idx[i * k + j] = buf[0].second;
        dist[i * k + j] = buf[0].first;
      } else {  // empty reference cloud: inf sentinel (matches scipy), so
                // distance-thresholded callers see "no match" not a perfect one
        idx[i * k + j] = 0;
        dist[i * k + j] = std::numeric_limits<float>::infinity();
      }
    }
  }
}

// Point-to-point ICP (same contract as Open3D's TransformationEstimation-
// PointToPoint + the reference's usage): correspondences within
// max_corr_dist, unweighted Kabsch update, stop on relative rmse change.
// init/out: row-major 3x4 double. Returns iterations executed.
int icp_point2point(const float *src, int ns, int src_stride, const float *tgt,
                    int nt, int tgt_stride, float max_corr_dist,
                    const double *init, int max_iter, double tol,
                    double *out) {
  KDTree tree(tgt, nt, tgt_stride);
  double t_cur[12];
  std::memcpy(t_cur, init, sizeof(t_cur));
  float max_sq = max_corr_dist * max_corr_dist;
  std::vector<double> a, b;
  a.reserve(ns * 3);
  b.reserve(ns * 3);
  double prev_rmse = std::numeric_limits<double>::infinity();
  int it = 0;
  for (; it < max_iter; ++it) {
    a.clear();
    b.clear();
    double sq_sum = 0;
    for (int i = 0; i < ns; ++i) {
      float q[3];
      apply12(t_cur, src + i * src_stride, q);
      float d;
      int j = tree.nearest(q, max_sq, &d);
      if (j < 0) continue;
      a.push_back(q[0]);
      a.push_back(q[1]);
      a.push_back(q[2]);
      const float *p = tgt + j * tgt_stride;
      b.push_back(p[0]);
      b.push_back(p[1]);
      b.push_back(p[2]);
      sq_sum += d;
    }
    int m = static_cast<int>(a.size() / 3);
    if (m < 3) break;
    double delta[12];
    kabsch(a.data(), b.data(), nullptr, m, delta);
    double composed[12];
    compose12(delta, t_cur, composed);
    std::memcpy(t_cur, composed, sizeof(t_cur));
    double rmse = std::sqrt(sq_sum / m);
    if (std::abs(prev_rmse - rmse) < tol) {
      ++it;
      break;
    }
    prev_rmse = rmse;
  }
  std::memcpy(out, t_cur, sizeof(t_cur));
  return it;
}

}  // extern "C"
