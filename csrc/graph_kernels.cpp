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
#include <cmath>
#include <vector>
#include <thread>
#include <atomic>
#include <queue>
#include <tuple>

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

// ---------------------------------------------------------------------------
// Full-batch sampler: the ENTIRE per-batch pipeline of the sampled trainer
// (multi-hop fanout sampling + local relabel + self-loops + dst sort +
// gcn-norm weights + static-shape padding) in one call.  The round-1 layout
// kept unique/relabel in numpy (~2.5 s/batch at fanout [15,10,5], batch
// 1000); this replaces it wholesale.  Sampling is WITHOUT replacement per
// (node, hop) — Floyd-style distinct draws — so no dedup pass exists at
// all.  ctypes releases the GIL during the call, so a Python thread pool
// runs batches concurrently (PyG gets the same effect from 12 worker
// processes, 100M/nb-sample.py:131-132).
// ---------------------------------------------------------------------------

#include <vector>

namespace {

// open-addressing global->local node map (power-of-two capacity)
struct NodeMap {
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;
  explicit NodeMap(int64_t cap) {
    uint64_t size = 16;
    while (size < (uint64_t)cap * 2) size <<= 1;
    keys.assign(size, -1);
    vals.assign(size, -1);
    mask = size - 1;
  }
  // returns local id, or -1 if absent and insert_id < 0
  int32_t lookup_or_insert(int64_t g, int32_t insert_id) {
    uint64_t h = ((uint64_t)g * 0x9e3779b97f4a7c15ULL) & mask;
    while (true) {
      if (keys[h] == g) return vals[h];
      if (keys[h] == -1) {
        if (insert_id < 0) return -1;
        keys[h] = g;
        vals[h] = insert_id;
        return insert_id;
      }
      h = (h + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

int64_t sample_batch(const int64_t* indptr, const int64_t* indices,
                     const int64_t* seeds, int64_t n_seeds,
                     const int64_t* fanouts, int64_t n_hops,
                     int64_t node_cap, int64_t edge_cap, uint64_t seed,
                     int64_t* node_ids, int32_t* out_src, int32_t* out_dst,
                     float* out_w, float* node_mask, int64_t* truncated) {
  uint64_t s[2] = {seed ^ 0x9e3779b97f4a7c15ULL, seed | 1};
  NodeMap map(node_cap);
  std::vector<int64_t> nodes;
  nodes.reserve(node_cap);
  truncated[0] = truncated[1] = 0;

  for (int64_t i = 0; i < n_seeds && (int64_t)nodes.size() < node_cap; ++i) {
    if (map.lookup_or_insert(seeds[i], (int32_t)nodes.size()) ==
        (int32_t)nodes.size())
      nodes.push_back(seeds[i]);
  }

  std::vector<int32_t> e_src, e_dst;
  e_src.reserve(edge_cap);
  e_dst.reserve(edge_cap);
  int64_t picks[64];  // fanout <= 64

  int64_t f_lo = 0, f_hi = (int64_t)nodes.size();
  for (int64_t hop = 0; hop < n_hops && f_lo < f_hi; ++hop) {
    int64_t fanout = fanouts[hop];
    if (fanout > 64) fanout = 64;
    for (int64_t d = f_lo; d < f_hi; ++d) {
      int64_t g = nodes[d];
      int64_t lo = indptr[g], deg = indptr[g + 1] - lo;
      int64_t k = deg < fanout ? deg : fanout;
      if (k <= 0) continue;
      if (deg <= fanout) {
        for (int64_t j = 0; j < k; ++j) picks[j] = lo + j;
      } else {
        // Floyd's distinct sampling of k offsets from [0, deg)
        for (int64_t j = 0; j < k; ++j) {
          int64_t r = (int64_t)(xorshift(s) % (uint64_t)(deg - k + j + 1));
          bool dup = false;
          for (int64_t t = 0; t < j; ++t)
            if (picks[t] == lo + r) { dup = true; break; }
          picks[j] = lo + (dup ? deg - k + j : r);
        }
      }
      for (int64_t j = 0; j < k; ++j) {
        int64_t sg = indices[picks[j]];
        int32_t sl = map.lookup_or_insert(
            sg, (int64_t)nodes.size() < node_cap ? (int32_t)nodes.size()
                                                 : -1);
        if (sl < 0) {  // node cap hit: drop this edge
          truncated[0] = 1;
          continue;
        }
        if (sl == (int32_t)nodes.size()) nodes.push_back(sg);
        e_src.push_back(sl);
        e_dst.push_back((int32_t)d);
      }
    }
    f_lo = f_hi;
    f_hi = (int64_t)nodes.size();
  }

  int64_t n_real = (int64_t)nodes.size();
  // self-loops on every real node (nb-sample.py:80 adds them globally)
  for (int32_t v = 0; v < (int32_t)n_real; ++v) {
    e_src.push_back(v);
    e_dst.push_back(v);
  }
  int64_t e = (int64_t)e_src.size();
  if (e > edge_cap) {
    truncated[1] = 1;
    e = edge_cap;
  }

  // counting sort by dst (stable) + in-degree for gcn norm
  std::vector<int64_t> cnt(n_real + 1, 0);
  for (int64_t i = 0; i < e; ++i) cnt[e_dst[i] + 1]++;
  std::vector<float> dinv(n_real);
  for (int64_t v = 0; v < n_real; ++v) {
    int64_t deg = cnt[v + 1];
    dinv[v] = deg > 0 ? 1.0f / std::sqrt((float)deg) : 0.0f;
  }
  for (int64_t v = 0; v < n_real; ++v) cnt[v + 1] += cnt[v];
  for (int64_t i = 0; i < e; ++i) {
    int64_t pos = cnt[e_dst[i]]++;
    out_src[pos] = e_src[i];
    out_dst[pos] = e_dst[i];
    out_w[pos] = dinv[e_dst[i]] * dinv[e_src[i]];
  }
  // padding (matches the numpy sampler's conventions)
  for (int64_t i = e; i < edge_cap; ++i) {
    out_src[i] = 0;
    out_dst[i] = (int32_t)(n_real > 0 ? n_real - 1 : 0);
    out_w[i] = 0.0f;
  }
  for (int64_t i = 0; i < node_cap; ++i) {
    node_ids[i] = i < n_real ? nodes[i] : 0;
    node_mask[i] = i < n_real ? 1.0f : 0.0f;
  }
  return n_real;
}


// ---------------------------------------------------------------------------
// Label-propagation clustering (the slab SpMM's locality reorder)
// ---------------------------------------------------------------------------
//
// Semantics mirror kernels/slabs.py::label_propagation: synchronous sweeps
// where each node adopts the most frequent label among its neighbors with a
// random tie-break (count + U[0, 0.5)), labels at/above max_size stop
// attracting NEW members, early stop when stable.  The numpy version is
// O(iters * E log E) in global lexsorts (~45 s on the 2.5M-edge arxiv-shaped
// bench graph); this is O(iters * E) with per-node neighbor-label sorts and
// threads over nodes.  RNG is per (sweep, node) splitmix64 — deterministic
// and thread-count independent (but a DIFFERENT stream than numpy's: cluster
// assignments are seed-dependent either way, quality is what is tested).

static inline uint64_t lpa_mix(uint64_t z) {
  z += 0x9e3779b97f4a7c15ull;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

int64_t lpa_cluster(const int64_t* src, const int64_t* dst, int64_t n_edges,
                    int64_t n_nodes, int64_t iters, int64_t max_size,
                    uint64_t seed, int64_t* labels_out) {
  if (n_nodes <= 0) return 0;
  // dst-CSR of in-neighbors (the edge list is undirected, so these are all
  // neighbors).  int32 internals (labels, indices): the sweep is a random
  // gather over labels[indices[e]], i.e. memory-latency bound — halving
  // the element size measurably speeds the sweep; node counts beyond
  // int32 are not reachable in this framework's host prep.
  std::vector<int64_t> indptr(n_nodes + 1, 0);
  for (int64_t e = 0; e < n_edges; ++e) indptr[dst[e] + 1]++;
  for (int64_t i = 0; i < n_nodes; ++i) indptr[i + 1] += indptr[i];
  std::vector<int32_t> indices(n_edges);
  {
    std::vector<int64_t> pos(indptr.begin(), indptr.end() - 1);
    for (int64_t e = 0; e < n_edges; ++e)
      indices[pos[dst[e]]++] = (int32_t)src[e];
  }

  std::vector<int32_t> labels(n_nodes), next(n_nodes);
  std::vector<int64_t> sizes(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) labels[i] = (int32_t)i;

  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? (int64_t)hw : 4;
  if (n_threads > n_nodes) n_threads = n_nodes > 0 ? n_nodes : 1;

  // Objective-based stop: clustered graphs keep improving well past 40
  // sweeps (a 1M-node/25K-community graph converges at ~56-90 with
  // locality 0.18-0.23 vs 0.04 at 40); uniform graphs churn forever
  // with no gain.  LPA coalescence is SIGMOID (slow micro-cluster phase
  // -> explosive merge -> saturation), so short-window early stops
  // misfire: no check happens before sweep MIN_STOP=40 (exactly the
  // historical fixed depth — graphs capped at iters<=40 behave
  // identically to before), and past 40 the loop stops once the true
  // objective — same-label fraction over a ~2M-edge stride sample —
  // gains <0.3 pp per CHECK sweeps.
  const int64_t CHECK = 8;
  const int64_t MIN_STOP = 40;
  const double MIN_GAIN = 0.003;
  int64_t stride = n_edges > 2000000 ? n_edges / 2000000 : 1;
  double prev_frac = -1.0;
  int64_t sweep = 0;
  for (; sweep < iters; ++sweep) {
    std::fill(sizes.begin(), sizes.end(), 0);
    for (int64_t i = 0; i < n_nodes; ++i) sizes[labels[i]]++;

    std::atomic<int64_t> changed(0);
    auto work = [&](int64_t lo, int64_t hi) {
      std::vector<int32_t> nb;
      int64_t local_changed = 0;
      for (int64_t d = lo; d < hi; ++d) {
        int64_t e0 = indptr[d], e1 = indptr[d + 1];
        next[d] = labels[d];
        if (e1 == e0) continue;
        nb.resize(e1 - e0);
        for (int64_t e = e0; e < e1; ++e) nb[e - e0] = labels[indices[e]];
        std::sort(nb.begin(), nb.end());
        double best_key = 0.0;
        int32_t best_label = labels[d];
        bool found = false;
        for (size_t a = 0; a < nb.size();) {
          size_t b = a;
          while (b < nb.size() && nb[b] == nb[a]) ++b;
          int32_t gl = nb[a];
          int64_t count = (int64_t)(b - a);
          // full labels stop attracting new members
          if (!(sizes[gl] >= max_size && gl != labels[d])) {
            uint64_t h = lpa_mix(seed ^ lpa_mix((uint64_t)sweep * 0x51ul ^
                                                (uint64_t)d) ^
                                 (uint64_t)gl * 0x2545f4914f6cdd1dull);
            double key = (double)count +
                         0.5 * ((double)(h >> 11) * 0x1.0p-53);
            if (!found || key > best_key) {
              best_key = key;
              best_label = gl;
              found = true;
            }
          }
          a = b;
        }
        if (found && best_label != labels[d]) {
          next[d] = best_label;
          local_changed++;
        }
      }
      changed.fetch_add(local_changed, std::memory_order_relaxed);
    };
    if (n_threads <= 1) {
      work(0, n_nodes);
    } else {
      std::vector<std::thread> ts;
      int64_t per = (n_nodes + n_threads - 1) / n_threads;
      for (int64_t t = 0; t < n_threads; ++t) {
        int64_t lo = t * per, hi = std::min(n_nodes, lo + per);
        if (lo < hi) ts.emplace_back(work, lo, hi);
      }
      for (auto& t : ts) t.join();
    }
    labels.swap(next);
    if (changed.load() == 0) {
      ++sweep;
      break;
    }
    if ((sweep + 1) % CHECK == 0 && sweep + 1 >= MIN_STOP - CHECK) {
      int64_t same = 0, tot = 0;
      for (int64_t e = 0; e < n_edges; e += stride) {
        tot++;
        same += labels[src[e]] == labels[dst[e]];
      }
      double frac = tot ? (double)same / (double)tot : 0.0;
      if (sweep + 1 >= MIN_STOP && frac < prev_frac + MIN_GAIN) {
        ++sweep;
        break;
      }
      prev_frac = frac;
    }
  }
  for (int64_t i = 0; i < n_nodes; ++i) labels_out[i] = labels[i];
  return sweep;
}

// ---------------------------------------------------------------------------
// Chunk-plan fill with IN-KERNEL per-window src sort (threaded)
// (replaces the host-side np.lexsort((src, dst // W)) + 4-array reindex
// that dominated remote-plan builds — 6 s of the 1M-node prep.  Edges
// arrive dst-sorted; each window's span is stable-sorted by src here, so
// the output is bit-identical to the lexsort path: equal-src ties keep
// their dst-sorted order.)
// ---------------------------------------------------------------------------

void fill_chunks_sorted(const int64_t* indptr, const int32_t* src,
                        const int32_t* dst, const float* weight,
                        int64_t n_nodes, int64_t W, int64_t C,
                        int32_t* out_gather, int32_t* out_dst, float* out_w,
                        int32_t* out_wid) {
  int64_t n_windows = (n_nodes + W - 1) / W;
  std::vector<int64_t> coff(n_windows + 1, 0);
  for (int64_t w = 0; w < n_windows; ++w) {
    int64_t lo = w * W, hi = std::min((w + 1) * W, n_nodes);
    int64_t e = indptr[hi] - indptr[lo];
    coff[w + 1] = coff[w] + std::max<int64_t>(1, (e + C - 1) / C);
  }
  auto work = [&](int64_t wlo, int64_t whi) {
    std::vector<int64_t> idx;
    for (int64_t w = wlo; w < whi; ++w) {
      int64_t lo = w * W, hi = std::min((w + 1) * W, n_nodes);
      int64_t e0 = indptr[lo], e1 = indptr[hi];
      int64_t ne = e1 - e0;
      idx.resize(ne);
      for (int64_t e = 0; e < ne; ++e) idx[e] = e0 + e;
      std::stable_sort(idx.begin(), idx.end(),
                       [&](int64_t a, int64_t b) { return src[a] < src[b]; });
      int64_t chunk0 = coff[w];
      int64_t n_chunks_w = std::max<int64_t>(1, (ne + C - 1) / C);
      for (int64_t c = 0; c < n_chunks_w; ++c) {
        int64_t a = c * C, b = std::min(a + C, ne);
        int64_t base = (chunk0 + c) * C;
        for (int64_t k = a; k < b; ++k) {
          int64_t e = idx[k];
          out_gather[base + k - a] = src[e];
          out_dst[base + k - a] = (int32_t)(dst[e] - lo);
          out_w[base + k - a] = weight[e];
        }
        out_wid[chunk0 + c] = (int32_t)w;
      }
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? (int64_t)hw : 4;
  if (n_threads > n_windows) n_threads = n_windows > 0 ? n_windows : 1;
  if (n_threads <= 1) {
    work(0, n_windows);
  } else {
    std::vector<std::thread> ts;
    int64_t per = (n_windows + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t) {
      int64_t lo = t * per, hi = std::min(n_windows, lo + per);
      if (lo < hi) ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
  }
}

// ---------------------------------------------------------------------------
// Boundary-aware best-fit-decreasing cluster packing
// (slabs.py::cluster_pack_perm's exact algorithm — the python heapq loop is
// ~20 s of the 1M-node prep at ~600K LPA clusters; this is the same
// deterministic control flow: max-heap ordered by (size desc, cluster asc,
// offset asc), split the largest pending cluster exactly at the slab
// boundary when nothing fits.  Output is bit-identical to the python
// version, which stays as the no-toolchain fallback and oracle.)
// ---------------------------------------------------------------------------

void cluster_pack(const int64_t* clusters, int64_t n_nodes,
                  int64_t slab_rows, int64_t* perm_out) {
  if (n_nodes <= 0) return;
  int64_t n_clusters = 0;
  for (int64_t i = 0; i < n_nodes; ++i)
    n_clusters = std::max(n_clusters, clusters[i] + 1);
  std::vector<int64_t> sizes(n_clusters, 0);
  for (int64_t i = 0; i < n_nodes; ++i) sizes[clusters[i]]++;
  std::vector<int64_t> starts(n_clusters + 1, 0);
  for (int64_t c = 0; c < n_clusters; ++c) starts[c + 1] = starts[c] + sizes[c];
  // stable counting sort of node ids by cluster (np.argsort(kind=stable))
  std::vector<int64_t> order(n_nodes);
  {
    std::vector<int64_t> pos(starts.begin(), starts.end() - 1);
    for (int64_t i = 0; i < n_nodes; ++i) order[pos[clusters[i]]++] = i;
  }
  // heap entries mirror python's (-size, cluster, off) tuples: pop order is
  // size desc, then cluster asc, then off asc
  using Ent = std::tuple<int64_t, int64_t, int64_t>;
  std::priority_queue<Ent, std::vector<Ent>, std::greater<Ent>> heap;
  for (int64_t c = 0; c < n_clusters; ++c)
    if (sizes[c] > 0) heap.emplace(-sizes[c], c, 0);
  std::vector<Ent> pending;  // (size, cluster, off), descending pop order
  int64_t out = 0;
  int64_t remaining = slab_rows;
  while (!heap.empty() || !pending.empty()) {
    while (!heap.empty()) {
      auto [neg, c, off] = heap.top();
      heap.pop();
      int64_t size = -neg;
      if (size <= remaining) {
        std::memcpy(perm_out + out, order.data() + starts[c] + off,
                    sizeof(int64_t) * size);
        out += size;
        remaining -= size;
        if (remaining == 0) break;
      } else {
        pending.emplace_back(size, c, off);
      }
    }
    if (remaining > 0 && !pending.empty()) {
      auto [size, c, off] = pending.front();
      pending.erase(pending.begin());
      std::memcpy(perm_out + out, order.data() + starts[c] + off,
                  sizeof(int64_t) * remaining);
      out += remaining;
      pending.emplace_back(size - remaining, c, off + remaining);
      remaining = 0;
    }
    for (auto& [size, c, off] : pending) heap.emplace(-size, c, off);
    pending.clear();
    remaining = slab_rows;
  }
}

}  // extern "C"
