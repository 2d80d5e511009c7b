// Native host runtime for dist_gnn_tpu: fast graph construction and
// extraction on the CPU side of the pipeline.
//
// TPU-native counterpart of the reference's host/device C++ runtime:
//  - dg_build_csc       replaces the scipy coo->csr preprocessing
//                       (reference python/DistGNN/dataloading/
//                       dataset_preprocess.py:37-45) with an OpenMP
//                       two-pass counting sort.
//  - dg_extract_subcsc  replaces ExtractIndptr/ExtractEdgeData
//                       (reference src/sampling/cuda/utils.cu:12-101):
//                       compacts the adjacency rows of a cached node set.
//
// Exposed with plain C linkage and driven from Python via ctypes
// (dist_gnn_tpu/utils/native.py). Build: make -C csrc

#include <atomic>
#include <cstdint>
#include <algorithm>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Build CSC (row = dst) from an edge list. out_indptr must be zeroed,
// length num_nodes+1. Returns 0 on success.
//
// DETERMINISTIC: within-row edge order is the original edge-list order
// (stable counting sort), identical to the numpy fallback's
// argsort(dst, kind="stable") path (dist_gnn_tpu/graph.py:110) and
// independent of OpenMP scheduling.  Host-side builds must be
// bit-reproducible across processes: in a multi-process cluster every
// rank constructs the same global arrays and device_puts them to a
// global sharding, which asserts cross-process equality.
int dg_build_csc(int64_t num_edges, int64_t num_nodes, const int32_t* dst,
                 const int32_t* src, const float* probs, int64_t* out_indptr,
                 int32_t* out_indices, float* out_probs) {
  if (num_nodes <= 0) return 1;
  // pass 1: degree count
  {
    std::atomic<int64_t>* counts =
        reinterpret_cast<std::atomic<int64_t>*>(out_indptr + 1);
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < num_edges; ++e) {
      int32_t d = dst[e];
      if (d < 0 || d >= num_nodes) continue;
      counts[d].fetch_add(1, std::memory_order_relaxed);
    }
  }
  // exclusive scan
  for (int64_t i = 0; i < num_nodes; ++i) out_indptr[i + 1] += out_indptr[i];
  // pass 2: scatter (per-row running cursor), tagging each slot with its
  // source edge id so pass 3 can restore the stable order
  int64_t* cursor = new int64_t[num_nodes];
  int64_t* eid = new int64_t[num_edges > 0 ? num_edges : 1];
  std::memcpy(cursor, out_indptr, sizeof(int64_t) * num_nodes);
  {
    std::atomic<int64_t>* cur = reinterpret_cast<std::atomic<int64_t>*>(cursor);
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < num_edges; ++e) {
      int32_t d = dst[e];
      if (d < 0 || d >= num_nodes) continue;
      int64_t pos = cur[d].fetch_add(1, std::memory_order_relaxed);
      eid[pos] = e;
    }
  }
  delete[] cursor;
  // pass 3: per-row sort by edge id (deterministic), then materialize
  // indices/probs from the edge list in that order
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t r = 0; r < num_nodes; ++r) {
    int64_t lo = out_indptr[r], hi = out_indptr[r + 1];
    if (hi - lo > 1) std::sort(eid + lo, eid + hi);
    for (int64_t p = lo; p < hi; ++p) {
      out_indices[p] = src[eid[p]];
      if (probs && out_probs) out_probs[p] = probs[eid[p]];
    }
  }
  delete[] eid;
  return 0;
}

// Compact the adjacency rows of cache_nids into a sub-CSR.
// sub_indptr (length num_cached+1) must already hold the exclusive scan of
// the cached nodes' degrees (computed cheaply in numpy).
int dg_extract_subcsc(int64_t num_cached, const int32_t* cache_nids,
                      const int64_t* indptr, const int32_t* indices,
                      const float* probs, const int64_t* sub_indptr,
                      int32_t* sub_indices, float* sub_probs) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < num_cached; ++i) {
    int64_t lo = indptr[cache_nids[i]];
    int64_t hi = indptr[cache_nids[i] + 1];
    int64_t out = sub_indptr[i];
    std::memcpy(sub_indices + out, indices + lo, sizeof(int32_t) * (hi - lo));
    if (probs && sub_probs)
      std::memcpy(sub_probs + out, probs + lo, sizeof(float) * (hi - lo));
  }
  return 0;
}

// Build per-row Walker alias tables for weighted neighbor sampling.
// For each CSC row, over its [indptr[r], indptr[r+1]) edge span, computes
// prob[e] (acceptance threshold in [0,1]) and alias[e] (fallback edge
// offset WITHIN the row) such that drawing slot j ~ U[0,deg) and taking
// j if u < prob[j] else alias[j] samples edge j with probability
// w_j / sum(w). Replaces the reference's per-draw CDF scan + binary
// search (src/sampling/cuda/rowwise_sampling_bias.cu:184-220) with O(1)
// draws. Robin-hood style two-stack construction per row, O(deg).
int dg_build_alias(int64_t num_rows, const int64_t* indptr,
                   const float* weights, float* prob, int32_t* alias) {
#pragma omp parallel
  {
    int64_t max_deg = 0;
    for (int64_t r = 0; r < num_rows; ++r) {
      int64_t d = indptr[r + 1] - indptr[r];
      if (d > max_deg) max_deg = d;
    }
    int32_t* small = new int32_t[max_deg];
    int32_t* large = new int32_t[max_deg];
    double* scaled = new double[max_deg];
#pragma omp for schedule(dynamic, 64)
    for (int64_t r = 0; r < num_rows; ++r) {
      int64_t lo = indptr[r], hi = indptr[r + 1];
      int64_t d = hi - lo;
      if (d == 0) continue;
      double total = 0;
      for (int64_t e = lo; e < hi; ++e) total += weights[e];
      if (total <= 0) {
        for (int64_t e = lo; e < hi; ++e) {
          prob[e] = 1.0f;
          alias[e] = static_cast<int32_t>(e - lo);
        }
        continue;
      }
      int64_t ns = 0, nl = 0;
      for (int64_t e = lo; e < hi; ++e) {
        scaled[e - lo] = weights[e] * d / total;
        if (scaled[e - lo] < 1.0)
          small[ns++] = static_cast<int32_t>(e - lo);
        else
          large[nl++] = static_cast<int32_t>(e - lo);
      }
      while (ns > 0 && nl > 0) {
        int32_t s = small[--ns];
        int32_t l = large[--nl];
        prob[lo + s] = static_cast<float>(scaled[s]);
        alias[lo + s] = l;
        scaled[l] = scaled[l] - (1.0 - scaled[s]);
        if (scaled[l] < 1.0)
          small[ns++] = l;
        else
          large[nl++] = l;
      }
      while (nl > 0) {
        int32_t l = large[--nl];
        prob[lo + l] = 1.0f;
        alias[lo + l] = l;
      }
      while (ns > 0) {  // numerical leftovers
        int32_t s = small[--ns];
        prob[lo + s] = 1.0f;
        alias[lo + s] = s;
      }
    }
    delete[] small;
    delete[] large;
    delete[] scaled;
  }
  return 0;
}

}  // extern "C"

// Parallel host feature-row gather: out[i] = base[ids[i]] for row_bytes-
// sized rows. The staging hot path of the host-resident base tier
// (dist_gnn_tpu/host_tier.py, parallel/host_dist.py) — replaces numpy's
// single-threaded fancy-index gather; the analog of the reference's
// pinned-host UVA reads (src/feature/cuda/feature_ops.cu:140-210) done
// host-side with OpenMP.
extern "C" int dg_gather_rows(int64_t num_ids, const int64_t* ids, const uint8_t* base,
                   int64_t num_rows, int64_t row_bytes, uint8_t* out) {
  if (row_bytes <= 0) return 1;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < num_ids; ++i) {
    int64_t r = ids[i];
    if (r < 0 || r >= num_rows) continue;  // caller pre-masks; skip = zeros
    std::memcpy(out + i * row_bytes, base + r * row_bytes, row_bytes);
  }
  return 0;
}
