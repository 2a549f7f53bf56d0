// Native flat-BVH builder.
//
// C++ twin of raytracingrust_tpu/ops/bvh.py::_build_topology (the NumPy
// fallback): identical output contract — median split on the axis of
// greatest centroid spread with the reference's tie-breaking
// (lib/core/bvh.rs:81-88 in the Rust reference), stable sort by centroid,
// split at len/2, leaf = 1 primitive, DFS emission with hit/miss skip links.
// Exists because BVH build is the only host-side O(n log^2 n) step in the
// pipeline (the reference's own builder is native Rust); NumPy fancy-indexing
// overhead dominates for 100k+ primitive scenes.
//
// Exported C ABI, consumed via ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Builder {
  const float* mins;   // (n, 3)
  const float* maxs;   // (n, 3)
  float* node_min;     // (2n-1, 3) out
  float* node_max;     // (2n-1, 3) out
  int32_t* prim;       // (2n-1,) out
  int32_t* miss;       // (2n-1,) out
  std::vector<float> cent;  // (n, 3)
  int32_t count = 0;
  int32_t max_depth = 0;

  // Emit the subtree over ids[lo, hi) in DFS order; returns nothing — the
  // node count advances in `count` and each subtree patches its own miss
  // link to one-past-subtree.
  void emit(int32_t* ids, int32_t lo, int32_t hi, int32_t depth) {
    if (depth > max_depth) max_depth = depth;
    const int32_t me = count++;
    if (hi - lo == 1) {
      const int32_t p = ids[lo];
      for (int k = 0; k < 3; ++k) {
        node_min[me * 3 + k] = mins[p * 3 + k];
        node_max[me * 3 + k] = maxs[p * 3 + k];
      }
      prim[me] = p;
      miss[me] = me + 1;
      return;
    }
    float bmin[3] = {1e30f, 1e30f, 1e30f};
    float bmax[3] = {-1e30f, -1e30f, -1e30f};
    float cmin[3] = {1e30f, 1e30f, 1e30f};
    float cmax[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = lo; i < hi; ++i) {
      const int32_t p = ids[i];
      for (int k = 0; k < 3; ++k) {
        bmin[k] = std::min(bmin[k], mins[p * 3 + k]);
        bmax[k] = std::max(bmax[k], maxs[p * 3 + k]);
        const float c = cent[p * 3 + k];
        cmin[k] = std::min(cmin[k], c);
        cmax[k] = std::max(cmax[k], c);
      }
    }
    for (int k = 0; k < 3; ++k) {
      node_min[me * 3 + k] = bmin[k];
      node_max[me * 3 + k] = bmax[k];
    }
    prim[me] = -1;

    // axis of greatest centroid spread, reference tie-breaking:
    // x iff sx > sy && sx > sz; else y iff sy > sx && sy > sz; else z
    const float sx = cmax[0] - cmin[0];
    const float sy = cmax[1] - cmin[1];
    const float sz = cmax[2] - cmin[2];
    int axis = 2;
    if (sx > sy && sx > sz) axis = 0;
    else if (sy > sx && sy > sz) axis = 1;

    std::stable_sort(ids + lo, ids + hi, [&](int32_t a, int32_t b) {
      return cent[a * 3 + axis] < cent[b * 3 + axis];
    });

    const int32_t half = (hi - lo) / 2;
    emit(ids, lo, lo + half, depth + 1);
    emit(ids, lo + half, hi, depth + 1);
    miss[me] = count;  // one past my whole subtree
  }
};

}  // namespace

extern "C" int32_t rtrt_build_bvh(const float* mins, const float* maxs,
                                  int32_t n, float* node_min, float* node_max,
                                  int32_t* prim, int32_t* hit_link,
                                  int32_t* miss_link, int32_t* depth_out) {
  if (n <= 0) return 0;
  Builder b;
  b.mins = mins;
  b.maxs = maxs;
  b.node_min = node_min;
  b.node_max = node_max;
  b.prim = prim;
  b.miss = miss_link;
  b.cent.resize(static_cast<size_t>(n) * 3);
  for (int32_t i = 0; i < n * 3; ++i) b.cent[i] = 0.5f * (mins[i] + maxs[i]);

  std::vector<int32_t> ids(n);
  for (int32_t i = 0; i < n; ++i) ids[i] = i;
  b.emit(ids.data(), 0, n, 1);

  // hit links: leaves continue at their miss link, inner nodes descend to
  // the next DFS node
  for (int32_t i = 0; i < b.count; ++i)
    hit_link[i] = prim[i] >= 0 ? miss_link[i] : i + 1;
  *depth_out = b.max_depth;
  return b.count;  // == 2n - 1
}
