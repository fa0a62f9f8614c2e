// Native host-side ops for the dal3d data pipeline and tooling.
//
// The reference implements these as C++/CUDA extensions (det3d/ops/point_cloud/
// point_cloud_ops.cc points_to_voxel; det3d/ops/nms/nms.cc
// rotate_non_max_suppression_cpu; the numba box_collision_test in
// det3d/core/sampler/preprocess.py:877). Here the device path is XLA/Pallas;
// these C++ kernels serve the *host* side: GT-AUG collision tests and
// voxelization inside data workers, plus rotated NMS / k-center for offline
// tooling. Exposed via a plain C ABI and loaded with ctypes (no pybind11).
//
// Build: python -m dal3d_tpu.native.build  (g++ -O3 -shared -fPIC)
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Hard voxelization (first-appearance order, first-K points per voxel).
// points: [n_points, n_feat] float32 (x,y,z first)
// outputs: voxels [max_voxels, max_points, n_feat], coords [max_voxels,3](zyx)
//          num_points_per_voxel [max_voxels]
// returns: number of voxels written
int points_to_voxel(const float* points, int64_t n_points, int n_feat,
                    const float* voxel_size, const float* range_min,
                    const int* grid_size, int max_points, int max_voxels,
                    float* voxels, int32_t* coords, int32_t* num_points_per_voxel) {
  const int nx = grid_size[0], ny = grid_size[1], nz = grid_size[2];
  std::unordered_map<int64_t, int> voxel_of;
  voxel_of.reserve(static_cast<size_t>(max_voxels) * 2);
  int n_voxels = 0;
  for (int64_t p = 0; p < n_points; ++p) {
    const float* pt = points + p * n_feat;
    int ix = static_cast<int>(std::floor((pt[0] - range_min[0]) / voxel_size[0]));
    int iy = static_cast<int>(std::floor((pt[1] - range_min[1]) / voxel_size[1]));
    int iz = static_cast<int>(std::floor((pt[2] - range_min[2]) / voxel_size[2]));
    if (ix < 0 || ix >= nx || iy < 0 || iy >= ny || iz < 0 || iz >= nz) continue;
    int64_t key = (static_cast<int64_t>(iz) * ny + iy) * nx + ix;
    auto it = voxel_of.find(key);
    int v;
    if (it == voxel_of.end()) {
      if (n_voxels >= max_voxels) continue;
      v = n_voxels++;
      voxel_of.emplace(key, v);
      coords[v * 3 + 0] = iz;
      coords[v * 3 + 1] = iy;
      coords[v * 3 + 2] = ix;
      num_points_per_voxel[v] = 0;
    } else {
      v = it->second;
    }
    int n = num_points_per_voxel[v];
    if (n < max_points) {
      std::memcpy(voxels + (static_cast<int64_t>(v) * max_points + n) * n_feat, pt,
                  sizeof(float) * n_feat);
      num_points_per_voxel[v] = n + 1;
    }
  }
  return n_voxels;
}

// ---------------------------------------------------------------------------
// Parallel mean voxelizer: same first-appearance / first-K semantics as
// points_to_voxel but emits per-voxel MEAN features directly (what the
// mean-VFE consumes), skipping the [max_voxels, max_points, n_feat] buffer.
//
// Exactness under parallelism: phase A computes voxel keys per point range
// (embarrassingly parallel); phase B assigns each KEY to one thread (hash
// ownership) and every thread scans all keys in point order, so each voxel's
// first-K accumulation order is exactly the sequential one; phase C merges
// the per-thread voxel lists (each ascending in first-point index p0) by p0,
// reproducing the sequential first-appearance voxel order and its
// max_voxels truncation bit-for-bit.
// emit_bf16 != 0 writes round-to-nearest-even bfloat16 (uint16) into
// mean_feats (halves the H2D payload).
struct VoxEntry {
  int64_t key;
  int64_t p0;
  int32_t cnt;
  int32_t sum_off;  // index into thread-local sum storage (n_feat floats)
};

static inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t lsb = (x >> 16) & 1u;
  x += 0x7fffu + lsb;  // round to nearest even
  return static_cast<uint16_t>(x >> 16);
}

int points_to_voxel_mean_mt(const float* points, int64_t n_points, int n_feat,
                            const float* voxel_size, const float* range_min,
                            const int* grid_size, int max_points, int max_voxels,
                            int n_threads, int emit_bf16,
                            void* mean_feats, int32_t* coords,
                            int32_t* num_points_per_voxel) {
  const int nx = grid_size[0], ny = grid_size[1], nz = grid_size[2];
  int T = n_threads > 0 ? n_threads
                        : static_cast<int>(std::thread::hardware_concurrency());
  if (T < 1) T = 1;
  if (T > 32) T = 32;

  if (T == 1) {
    // single-pass fast path: hash -> accumulate sums in-place; beats the
    // generic 3-phase machinery (no keys array, no merge) and the plain
    // points_to_voxel (no [mv, mp, F] buffer traffic).
    std::unordered_map<int64_t, int32_t> voxel_of;
    voxel_of.reserve(static_cast<size_t>(max_voxels) * 2);
    std::vector<float> sum(static_cast<size_t>(max_voxels) * n_feat, 0.0f);
    int n_voxels = 0;
    for (int64_t p = 0; p < n_points; ++p) {
      const float* pt = points + p * n_feat;
      int ix = static_cast<int>(std::floor((pt[0] - range_min[0]) / voxel_size[0]));
      int iy = static_cast<int>(std::floor((pt[1] - range_min[1]) / voxel_size[1]));
      int iz = static_cast<int>(std::floor((pt[2] - range_min[2]) / voxel_size[2]));
      if (ix < 0 || ix >= nx || iy < 0 || iy >= ny || iz < 0 || iz >= nz) continue;
      int64_t key = (static_cast<int64_t>(iz) * ny + iy) * nx + ix;
      auto it = voxel_of.find(key);
      int v;
      if (it == voxel_of.end()) {
        if (n_voxels >= max_voxels) continue;
        v = n_voxels++;
        voxel_of.emplace(key, v);
        coords[v * 3 + 0] = iz;
        coords[v * 3 + 1] = iy;
        coords[v * 3 + 2] = ix;
        num_points_per_voxel[v] = 0;
      } else {
        v = it->second;
      }
      int n = num_points_per_voxel[v];
      if (n < max_points) {
        float* s = sum.data() + static_cast<int64_t>(v) * n_feat;
        for (int f = 0; f < n_feat; ++f) s[f] += pt[f];
        num_points_per_voxel[v] = n + 1;
      }
    }
    float* outf = static_cast<float*>(mean_feats);
    uint16_t* outb = static_cast<uint16_t*>(mean_feats);
    for (int v = 0; v < n_voxels; ++v) {
      const float* s = sum.data() + static_cast<int64_t>(v) * n_feat;
      int c = num_points_per_voxel[v];
      const float inv = 1.0f / static_cast<float>(c > 0 ? c : 1);
      if (emit_bf16) {
        uint16_t* o = outb + static_cast<int64_t>(v) * n_feat;
        for (int f = 0; f < n_feat; ++f) o[f] = f32_to_bf16(s[f] * inv);
      } else {
        float* o = outf + static_cast<int64_t>(v) * n_feat;
        for (int f = 0; f < n_feat; ++f) o[f] = s[f] * inv;
      }
    }
    return n_voxels;
  }

  // phase A: keys (parallel over point ranges)
  std::vector<int64_t> keys(n_points);
  {
    auto keyfn = [&](int64_t lo, int64_t hi) {
      // same divide expression as points_to_voxel — reciprocal-multiply
      // differs by 1 ulp on cell boundaries and breaks bit-parity
      for (int64_t p = lo; p < hi; ++p) {
        const float* pt = points + p * n_feat;
        int ix = static_cast<int>(std::floor((pt[0] - range_min[0]) / voxel_size[0]));
        int iy = static_cast<int>(std::floor((pt[1] - range_min[1]) / voxel_size[1]));
        int iz = static_cast<int>(std::floor((pt[2] - range_min[2]) / voxel_size[2]));
        keys[p] = (ix < 0 || ix >= nx || iy < 0 || iy >= ny || iz < 0 || iz >= nz)
                      ? -1
                      : (static_cast<int64_t>(iz) * ny + iy) * nx + ix;
      }
    };
    {
      // T >= 2 here: T == 1 returned via the single-pass fast path above
      std::vector<std::thread> ts;
      int64_t chunk = (n_points + T - 1) / T;
      for (int t = 0; t < T; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n_points, lo + chunk);
        if (lo < hi) ts.emplace_back(keyfn, lo, hi);
      }
      for (auto& th : ts) th.join();
    }
  }

  // phase B: per-thread key-space ownership
  std::vector<std::vector<VoxEntry>> entries(T);
  std::vector<std::vector<float>> sums(T);
  auto ownfn = [&](int t) {
    std::unordered_map<int64_t, int32_t> local;
    local.reserve(static_cast<size_t>(max_voxels) * 2 / T + 16);
    auto& ent = entries[t];
    auto& sum = sums[t];
    for (int64_t p = 0; p < n_points; ++p) {
      int64_t key = keys[p];
      if (key < 0) continue;
      // cheap multiplicative hash for ownership (plain modulo stripes x)
      uint64_t h = static_cast<uint64_t>(key) * 0x9E3779B97F4A7C15ull;
      if (static_cast<int>((h >> 32) % static_cast<uint64_t>(T)) != t) continue;
      auto it = local.find(key);
      int32_t v;
      if (it == local.end()) {
        v = static_cast<int32_t>(ent.size());
        local.emplace(key, v);
        ent.push_back({key, p, 0, static_cast<int32_t>(sum.size())});
        sum.resize(sum.size() + n_feat, 0.0f);
      } else {
        v = it->second;
      }
      VoxEntry& e = ent[v];
      if (e.cnt < max_points) {
        float* s = sum.data() + e.sum_off;
        const float* pt = points + p * n_feat;
        for (int f = 0; f < n_feat; ++f) s[f] += pt[f];
        e.cnt++;
      }
    }
  };
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < T; ++t) ts.emplace_back(ownfn, t);
    for (auto& th : ts) th.join();
  }

  // phase C: p0-ordered T-way merge (each list is ascending in p0)
  std::vector<size_t> cur(T, 0);
  int n_voxels = 0;
  float* outf = static_cast<float*>(mean_feats);
  uint16_t* outb = static_cast<uint16_t*>(mean_feats);
  while (n_voxels < max_voxels) {
    int best_t = -1;
    int64_t best_p0 = INT64_MAX;
    for (int t = 0; t < T; ++t) {
      if (cur[t] < entries[t].size() && entries[t][cur[t]].p0 < best_p0) {
        best_p0 = entries[t][cur[t]].p0;
        best_t = t;
      }
    }
    if (best_t < 0) break;
    const VoxEntry& e = entries[best_t][cur[best_t]++];
    int64_t key = e.key;
    coords[n_voxels * 3 + 0] = static_cast<int32_t>(key / (static_cast<int64_t>(ny) * nx));
    coords[n_voxels * 3 + 1] = static_cast<int32_t>((key / nx) % ny);
    coords[n_voxels * 3 + 2] = static_cast<int32_t>(key % nx);
    num_points_per_voxel[n_voxels] = e.cnt;
    const float* s = sums[best_t].data() + e.sum_off;
    const float inv = 1.0f / static_cast<float>(e.cnt > 0 ? e.cnt : 1);
    if (emit_bf16) {
      uint16_t* o = outb + static_cast<int64_t>(n_voxels) * n_feat;
      for (int f = 0; f < n_feat; ++f) o[f] = f32_to_bf16(s[f] * inv);
    } else {
      float* o = outf + static_cast<int64_t>(n_voxels) * n_feat;
      for (int f = 0; f < n_feat; ++f) o[f] = s[f] * inv;
    }
    ++n_voxels;
  }
  return n_voxels;
}

// ---------------------------------------------------------------------------
// BEV convex-quad collision matrix (GT-AUG paste rejection).
// corners_a [na,4,2], corners_b [nb,4,2] -> out [na*nb] uint8
static inline float cross2(float ox, float oy, float px, float py, float qx, float qy) {
  return (px - ox) * (qy - oy) - (py - oy) * (qx - ox);
}

static bool quad_overlap(const float* a, const float* b) {
  // standup prefilter
  float ax0 = 1e30f, ay0 = 1e30f, ax1 = -1e30f, ay1 = -1e30f;
  float bx0 = 1e30f, by0 = 1e30f, bx1 = -1e30f, by1 = -1e30f;
  for (int i = 0; i < 4; ++i) {
    ax0 = std::min(ax0, a[i * 2]); ay0 = std::min(ay0, a[i * 2 + 1]);
    ax1 = std::max(ax1, a[i * 2]); ay1 = std::max(ay1, a[i * 2 + 1]);
    bx0 = std::min(bx0, b[i * 2]); by0 = std::min(by0, b[i * 2 + 1]);
    bx1 = std::max(bx1, b[i * 2]); by1 = std::max(by1, b[i * 2 + 1]);
  }
  if (ax1 <= bx0 || bx1 <= ax0 || ay1 <= by0 || by1 <= ay0) return false;
  // vertex containment (either direction)
  for (int pass = 0; pass < 2; ++pass) {
    const float* P = pass ? b : a;
    const float* Q = pass ? a : b;
    for (int i = 0; i < 4; ++i) {
      float px = P[i * 2], py = P[i * 2 + 1];
      bool all_pos = true, all_neg = true;
      for (int e = 0; e < 4; ++e) {
        float s = cross2(Q[e * 2], Q[e * 2 + 1], Q[((e + 1) & 3) * 2],
                         Q[((e + 1) & 3) * 2 + 1], px, py);
        all_pos &= (s >= 0); all_neg &= (s <= 0);
      }
      if (all_pos || all_neg) return true;
    }
  }
  // proper edge intersections
  for (int i = 0; i < 4; ++i) {
    float a0x = a[i * 2], a0y = a[i * 2 + 1];
    float a1x = a[((i + 1) & 3) * 2], a1y = a[((i + 1) & 3) * 2 + 1];
    for (int j = 0; j < 4; ++j) {
      float b0x = b[j * 2], b0y = b[j * 2 + 1];
      float b1x = b[((j + 1) & 3) * 2], b1y = b[((j + 1) & 3) * 2 + 1];
      float d1 = cross2(b0x, b0y, b1x, b1y, a0x, a0y);
      float d2 = cross2(b0x, b0y, b1x, b1y, a1x, a1y);
      float d3 = cross2(a0x, a0y, a1x, a1y, b0x, b0y);
      float d4 = cross2(a0x, a0y, a1x, a1y, b1x, b1y);
      if (d1 * d2 < 0 && d3 * d4 < 0) return true;
    }
  }
  return false;
}

void box_collision_test(const float* corners_a, int64_t na, const float* corners_b,
                        int64_t nb, uint8_t* out) {
  for (int64_t i = 0; i < na; ++i)
    for (int64_t j = 0; j < nb; ++j)
      out[i * nb + j] = quad_overlap(corners_a + i * 8, corners_b + j * 8) ? 1 : 0;
}

// ---------------------------------------------------------------------------
// Rotated NMS (host tooling path). boxes_corners [n,4,2] sorted by desc
// score; keep flags out [n]. Exact greedy with polygon-intersection IoU.
static float quad_area(const float* q) {
  float s = 0;
  for (int i = 0; i < 4; ++i)
    s += q[i * 2] * q[((i + 1) & 3) * 2 + 1] - q[((i + 1) & 3) * 2] * q[i * 2 + 1];
  return std::fabs(s) * 0.5f;
}

static float quad_inter_area(const float* A, const float* B) {
  // Sutherland–Hodgman clip of A by B's half-planes (B assumed convex)
  float poly[16 * 2];
  float tmp[16 * 2];
  int n = 4;
  std::memcpy(poly, A, sizeof(float) * 8);
  // winding of B
  float w = 0;
  for (int i = 0; i < 4; ++i)
    w += (B[((i + 1) & 3) * 2] - B[i * 2]) * (B[((i + 1) & 3) * 2 + 1] + B[i * 2 + 1]);
  bool ccw = w < 0;
  for (int e = 0; e < 4 && n > 0; ++e) {
    int e0 = ccw ? e : ((e + 1) & 3);
    int e1 = ccw ? ((e + 1) & 3) : e;
    float ex0 = B[e0 * 2], ey0 = B[e0 * 2 + 1], ex1 = B[e1 * 2], ey1 = B[e1 * 2 + 1];
    int m = 0;
    for (int i = 0; i < n; ++i) {
      float cx = poly[i * 2], cy = poly[i * 2 + 1];
      float nx2 = poly[((i + 1) % n) * 2], ny2 = poly[((i + 1) % n) * 2 + 1];
      float sc = cross2(ex0, ey0, ex1, ey1, cx, cy);
      float sn = cross2(ex0, ey0, ex1, ey1, nx2, ny2);
      if (sc >= 0) { tmp[m * 2] = cx; tmp[m * 2 + 1] = cy; ++m; }
      if ((sc >= 0) != (sn >= 0)) {
        float t = sc / (sc - sn);
        tmp[m * 2] = cx + t * (nx2 - cx);
        tmp[m * 2 + 1] = cy + t * (ny2 - cy);
        ++m;
      }
    }
    n = m;
    std::memcpy(poly, tmp, sizeof(float) * 2 * n);
  }
  if (n < 3) return 0.f;
  float s = 0;
  for (int i = 0; i < n; ++i)
    s += poly[i * 2] * poly[((i + 1) % n) * 2 + 1] - poly[((i + 1) % n) * 2] * poly[i * 2 + 1];
  return std::fabs(s) * 0.5f;
}

void rotate_nms_cpu(const float* corners, int64_t n, float iou_threshold, uint8_t* keep) {
  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) areas[i] = quad_area(corners + i * 8);
  std::fill(keep, keep + n, 1);
  for (int64_t i = 0; i < n; ++i) {
    if (!keep[i]) continue;
    for (int64_t j = i + 1; j < n; ++j) {
      if (!keep[j]) continue;
      float inter = quad_inter_area(corners + i * 8, corners + j * 8);
      float uni = areas[i] + areas[j] - inter;
      if (uni > 0 && inter / uni > iou_threshold) keep[j] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Brick-pack plan for the L0 brick/banded sparse engines (ops/sparse_brick.py
// from_voxels): assigns each voxel its target brick row and emits the active
// brick-cell list, so the device pack skips its compaction/grid scalar-index
// passes (~10 ms of the measured 18.5 ms from_voxels) and keeps only the
// differentiable feature scatter-add. Runs in the loader threads, overlapped
// with device compute — the same division of labor as the reference's CPU
// data workers (det3d/datasets/pipelines/preprocess.py Voxelization).
//
// coords [n, 3] int32 zyx (voxelizer output order). spatial != 0 compacts in
// y-major (y, x_brick, z) order (the banded engine's bounded-displacement
// contract, _compact_cells_spatial); else first-appearance order over the
// [cells..., dilation...] candidate list (_compact_cells). Both replicate the
// device semantics exactly, including the halo-dilation rule (a brick whose
// edge column is active materializes its w-neighbor) and the capacity-drop
// rule (spatial: highest ykey dropped; first-appearance: latest dropped).
//
// Outputs: brick_lin [mb_cap] int32 (sentinel D*H*(W/bw) on pad rows),
//          row [n] int32 (-1 = invalid voxel or dropped brick).
// Returns the TRUE active-brick count (> mb_cap means truncation occurred —
// the same observability contract as sparse_brick.count_active_bricks).
int brick_pack_plan(const int32_t* coords, int64_t n, const uint8_t* valid,
                    int D, int H, int W, int bw, int mb_cap, int spatial,
                    int32_t* brick_lin, int32_t* row) {
  const int Wb = W / bw;
  const int64_t nbc = static_cast<int64_t>(D) * H * Wb;
  std::vector<int64_t> cell(n);
  std::vector<int64_t> cand;
  cand.reserve(2 * n);
  for (int64_t i = 0; i < n; ++i) {
    if (valid && !valid[i]) { cell[i] = -1; continue; }
    int z = coords[i * 3 + 0], y = coords[i * 3 + 1], x = coords[i * 3 + 2];
    int64_t c = (static_cast<int64_t>(z) * H + y) * Wb + x / bw;
    cell[i] = c;
    cand.push_back(c);
  }
  // halo dilation candidates, in the device's candidate-list order
  if (bw >= 2) {
    for (int64_t i = 0; i < n; ++i) {
      if (cell[i] < 0) continue;
      int x = coords[i * 3 + 2];
      int wpos = x % bw, xb = x / bw;
      if (wpos == 0 && xb > 0) cand.push_back(cell[i] - 1);
      else if (wpos == bw - 1 && xb < Wb - 1) cand.push_back(cell[i] + 1);
    }
  } else {
    for (int64_t i = 0; i < n; ++i)
      if (cell[i] >= 0 && coords[i * 3 + 2] / bw > 0) cand.push_back(cell[i] - 1);
    for (int64_t i = 0; i < n; ++i)
      if (cell[i] >= 0 && coords[i * 3 + 2] / bw < Wb - 1) cand.push_back(cell[i] + 1);
  }

  std::unordered_map<int64_t, int32_t> rank;
  rank.reserve(cand.size() * 2 + 16);
  int64_t true_count = 0;
  if (spatial) {
    // unique cells sorted by y-major key (y, x_brick, z)
    std::vector<int64_t> uniq;
    uniq.reserve(cand.size());
    for (int64_t c : cand)
      if (rank.emplace(c, 0).second) uniq.push_back(c);
    true_count = static_cast<int64_t>(uniq.size());
    const int64_t HWb = static_cast<int64_t>(H) * Wb;
    std::sort(uniq.begin(), uniq.end(), [&](int64_t a, int64_t b) {
      int64_t ya = (a % HWb) / Wb, wa = a % Wb, za = a / HWb;
      int64_t yb = (b % HWb) / Wb, wb2 = b % Wb, zb = b / HWb;
      int64_t ka = (ya * Wb + wa) * D + za, kb = (yb * Wb + wb2) * D + zb;
      return ka < kb;
    });
    for (size_t r = 0; r < uniq.size(); ++r)
      rank[uniq[r]] = r < static_cast<size_t>(mb_cap) ? static_cast<int32_t>(r) : -1;
    for (int64_t r = 0; r < mb_cap; ++r)
      brick_lin[r] = r < static_cast<int64_t>(uniq.size())
                         ? static_cast<int32_t>(uniq[r]) : static_cast<int32_t>(nbc);
  } else {
    // LAST-appearance order over the candidate list: the device
    // _compact_cells picks each cell's representative with a last-writer-
    // wins scatter, so the compacted order is by last occurrence position
    std::unordered_map<int64_t, int64_t> last_pos;
    last_pos.reserve(cand.size() * 2 + 16);
    for (size_t p = 0; p < cand.size(); ++p) last_pos[cand[p]] = p;
    std::vector<std::pair<int64_t, int64_t>> order;  // (last_pos, cell)
    order.reserve(last_pos.size());
    for (auto& kv : last_pos) order.emplace_back(kv.second, kv.first);
    std::sort(order.begin(), order.end());
    true_count = static_cast<int64_t>(order.size());
    for (int64_t r = 0; r < mb_cap; ++r) brick_lin[r] = static_cast<int32_t>(nbc);
    for (size_t r = 0; r < order.size(); ++r) {
      int32_t rr = r < static_cast<size_t>(mb_cap) ? static_cast<int32_t>(r) : -1;
      rank[order[r].second] = rr;
      if (rr >= 0) brick_lin[rr] = static_cast<int32_t>(order[r].second);
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    if (cell[i] < 0) { row[i] = -1; continue; }
    auto it = rank.find(cell[i]);
    row[i] = it == rank.end() ? -1 : it->second;
  }
  return static_cast<int>(true_count);
}

// ---------------------------------------------------------------------------
// Greedy budgeted k-center over a dense distance matrix (host tooling path).
// dist [n*n] row-major; returns count of selected, writes into selected.
int kcenter_greedy(const float* dist, int64_t n, const float* frame_costs,
                   float budget, const float* init_fps, int32_t first_idx,
                   const uint8_t* already, int32_t* selected, int max_select) {
  std::vector<float> fps(init_fps, init_fps + n);
  const float NEG = -1e30f;
  for (int64_t i = 0; i < n; ++i)
    if (already[i]) fps[i] = NEG;
  int count = 0;
  float cost = frame_costs[first_idx];
  if (cost > budget && count > 0) return 0;
  selected[count++] = first_idx;
  fps[first_idx] = NEG;
  int32_t last = first_idx;
  while (count < max_select) {
    const float* row = dist + static_cast<int64_t>(last) * n;
    int32_t best = -1;
    float best_v = NEG;
    for (int64_t i = 0; i < n; ++i) {
      if (row[i] < fps[i]) fps[i] = row[i];
      if (already[i]) fps[i] = NEG;
      if (fps[i] > best_v) { best_v = fps[i]; best = static_cast<int32_t>(i); }
    }
    if (best < 0) break;
    float next_cost = cost + frame_costs[best];
    if (next_cost > budget) break;
    selected[count++] = best;
    cost = next_cost;
    fps[best] = NEG;
    last = best;
  }
  return count;
}

}  // extern "C"
