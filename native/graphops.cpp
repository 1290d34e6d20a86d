// mma_tpu native graph ops — host-side graph construction fast paths.
//
// The reference reaches its native graph machinery through scipy/networkx
// (C-backed CSR construction, node_classification/utils.py:66-71,139-146).
// This library provides the equivalent first-class native components for
// the TPU framework's ingest pipeline: stable edge sorting (two-pass
// counting sort, O(E+N) vs numpy lexsort's comparison sort), CSR offset
// construction, degree computation, symmetrization with deduplication,
// and edge-balanced partition boundaries for multi-host sharding.
//
// Exposed as a C ABI consumed via ctypes (mma_tpu/graph/native.py); a
// NumPy fallback keeps the framework fully functional without the build.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Stable sort of edges by (dst major, src minor): two-pass counting sort.
// out_perm receives the permutation applied (for carrying edge features).
void mma_sort_edges(const int32_t* src, const int32_t* dst, int64_t e,
                    int32_t n, int32_t* out_src, int32_t* out_dst,
                    int32_t* out_perm) {
  std::vector<int64_t> count(static_cast<size_t>(n) + 1, 0);
  std::vector<int32_t> tmp_perm(static_cast<size_t>(e));

  // Pass 1: stable counting sort by src.
  for (int64_t i = 0; i < e; ++i) count[src[i] + 1]++;
  for (int32_t v = 0; v < n; ++v) count[v + 1] += count[v];
  {
    std::vector<int64_t> pos(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < e; ++i)
      tmp_perm[pos[src[i]]++] = static_cast<int32_t>(i);
  }

  // Pass 2: stable counting sort by dst over the src-sorted order.
  std::fill(count.begin(), count.end(), 0);
  for (int64_t i = 0; i < e; ++i) count[dst[i] + 1]++;
  for (int32_t v = 0; v < n; ++v) count[v + 1] += count[v];
  {
    std::vector<int64_t> pos(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < e; ++i) {
      int32_t idx = tmp_perm[i];
      int64_t p = pos[dst[idx]]++;
      out_perm[p] = idx;
      out_src[p] = src[idx];
      out_dst[p] = dst[idx];
    }
  }
}

// CSR row offsets over a dst-sorted edge list (row_ptr has n+1 entries).
void mma_build_row_ptr(const int32_t* dst_sorted, int64_t e, int32_t n,
                       int32_t* row_ptr) {
  std::memset(row_ptr, 0, sizeof(int32_t) * (static_cast<size_t>(n) + 1));
  for (int64_t i = 0; i < e; ++i) row_ptr[dst_sorted[i] + 1]++;
  for (int32_t v = 0; v < n; ++v) row_ptr[v + 1] += row_ptr[v];
}

// Float in-degrees from destination ids.
void mma_degrees(const int32_t* dst, int64_t e, int32_t n, float* deg) {
  std::memset(deg, 0, sizeof(float) * static_cast<size_t>(n));
  for (int64_t i = 0; i < e; ++i) deg[dst[i]] += 1.0f;
}

// Symmetrize + deduplicate a directed edge list (drops self-loops, adds
// both directions, removes duplicates). Returns the new edge count;
// out_src/out_dst must have capacity 2*e. Two-phase usage: call once to
// get the count (outputs may be larger), buffers are filled directly.
int64_t mma_symmetrize(const int32_t* src, const int32_t* dst, int64_t e,
                       int32_t n, int32_t* out_src, int32_t* out_dst) {
  std::vector<int64_t> keys;
  keys.reserve(static_cast<size_t>(2 * e));
  for (int64_t i = 0; i < e; ++i) {
    if (src[i] == dst[i]) continue;  // no self-loops (utils.py semantics)
    keys.push_back(static_cast<int64_t>(dst[i]) * n + src[i]);
    keys.push_back(static_cast<int64_t>(src[i]) * n + dst[i]);
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  int64_t m = static_cast<int64_t>(keys.size());
  for (int64_t i = 0; i < m; ++i) {
    out_dst[i] = static_cast<int32_t>(keys[i] / n);
    out_src[i] = static_cast<int32_t>(keys[i] % n);
  }
  return m;
}

// Edge-balanced contiguous row partition: choose num_parts-1 row cut
// points so each part holds ~e/num_parts edges (multi-host sharding with
// whole rows per shard — SURVEY §7 "edge-balanced partitions").
void mma_balanced_row_cuts(const int32_t* row_ptr, int32_t n,
                           int32_t num_parts, int32_t* cuts /*num_parts+1*/) {
  int64_t total = row_ptr[n];
  cuts[0] = 0;
  int32_t row = 0;
  for (int32_t p = 1; p < num_parts; ++p) {
    int64_t target = total * p / num_parts;
    while (row < n && row_ptr[row] < target) ++row;
    cuts[p] = row;
  }
  cuts[num_parts] = n;
}

}  // extern "C"
