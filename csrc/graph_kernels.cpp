// Native host-side graph kernels for sgformer_tpu.
//
// The reference offloads its host graph work to compiled extensions
// (torch_sparse C++/CUDA SpMM plumbing, PyG's C++ neighbor sampler behind
// NeighborLoader — see SURVEY.md §2.4).  These are the TPU framework's
// equivalents for the two host-side hot paths:
//
//   1. chunk-plan construction for the MXU SpMM kernel (windowed edge
//      chunking of a dst-sorted CSR) — O(E), called once per graph but on
//      papers100M that is 3.2B edges;
//   2. layer-wise fanout neighbor sampling over CSR, the per-batch hot
//      loop of the sampled trainer.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Chunk plan builder
// ---------------------------------------------------------------------------

// Pass 1: number of chunks given edge counts per window (>=1 per window).
int64_t count_chunks(const int64_t* indptr, int64_t n_nodes, int64_t W,
                     int64_t C) {
  int64_t n_windows = (n_nodes + W - 1) / W;
  int64_t total = 0;
  for (int64_t w = 0; w < n_windows; ++w) {
    int64_t lo = w * W, hi = std::min((w + 1) * W, n_nodes);
    int64_t e = indptr[hi] - indptr[lo];
    int64_t k = (e + C - 1) / C;
    total += k > 0 ? k : 1;
  }
  return total;
}

// Pass 2: fill gather/local-dst/weight/window arrays (pre-zeroed by caller).
void fill_chunks(const int64_t* indptr, const int32_t* src,
                 const int32_t* dst, const float* weight, int64_t n_nodes,
                 int64_t W, int64_t C, int32_t* out_gather, int32_t* out_dst,
                 float* out_w, int32_t* out_wid) {
  int64_t n_windows = (n_nodes + W - 1) / W;
  int64_t chunk = 0;
  for (int64_t w = 0; w < n_windows; ++w) {
    int64_t lo = w * W, hi = std::min((w + 1) * W, n_nodes);
    int64_t e0 = indptr[lo], e1 = indptr[hi];
    int64_t n_chunks_w = std::max<int64_t>(1, (e1 - e0 + C - 1) / C);
    for (int64_t c = 0; c < n_chunks_w; ++c, ++chunk) {
      int64_t a = e0 + c * C;
      int64_t b = std::min(a + C, e1);
      int64_t base = chunk * C;
      for (int64_t e = a; e < b; ++e) {
        out_gather[base + e - a] = src[e];
        out_dst[base + e - a] = dst[e] - (int32_t)(w * W);
        out_w[base + e - a] = weight[e];
      }
      out_wid[chunk] = (int32_t)w;
    }
  }
}

// ---------------------------------------------------------------------------
// Neighbor sampling (xorshift128+ RNG, fanout without replacement for
// deg<=fanout, with-replacement draws otherwise — matching the vectorized
// numpy sampler's semantics so both backends are interchangeable)
// ---------------------------------------------------------------------------

static inline uint64_t xorshift(uint64_t* s) {
  uint64_t x = s[0];
  uint64_t const y = s[1];
  s[0] = y;
  x ^= x << 23;
  s[1] = x ^ y ^ (x >> 17) ^ (y >> 26);
  return s[1] + y;
}

// For each frontier node, emit up to `fanout` sampled in-neighbor edges.
// out_src/out_dst must hold frontier_len * fanout entries.  Returns the
// number of edges written.
int64_t sample_neighbors(const int64_t* indptr, const int64_t* indices,
                         const int64_t* frontier, int64_t frontier_len,
                         int64_t fanout, uint64_t seed, int64_t* out_src,
                         int64_t* out_dst) {
  uint64_t s[2] = {seed ^ 0x9e3779b97f4a7c15ULL, seed | 1};
  int64_t n = 0;
  for (int64_t i = 0; i < frontier_len; ++i) {
    int64_t v = frontier[i];
    int64_t lo = indptr[v], hi = indptr[v + 1];
    int64_t deg = hi - lo;
    if (deg <= 0) continue;
    if (deg <= fanout) {
      for (int64_t e = lo; e < hi; ++e) {
        out_src[n] = indices[e];
        out_dst[n] = v;
        ++n;
      }
    } else {
      for (int64_t k = 0; k < fanout; ++k) {
        int64_t off = (int64_t)(xorshift(s) % (uint64_t)deg);
        out_src[n] = indices[lo + off];
        out_dst[n] = v;
        ++n;
      }
    }
  }
  return n;
}

}  // extern "C"
