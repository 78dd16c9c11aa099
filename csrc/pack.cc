// Native pair-chunk packer for the Pallas SpMM kernel.
//
// Reference analog: none — the reference (bkj/ppnp) has zero native code
// (SURVEY.md §2.1); its ingest is scipy. This is the production ingest
// tier for large graphs: O(nnz) two-pass packing of a CSR matrix into the
// PairChunks layout consumed by ppnp_tpu/kernels/spmm.py, mirroring the
// semantics of ppnp_tpu/ops/pairchunks.py::pair_chunks_from_scipy
// (within-pair slot order may differ; it is mathematically irrelevant).
//
// Build: make -C csrc   (or ppnp_tpu.native builds it on demand)
// ABI: plain C, consumed via ctypes.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

inline int64_t ceil_div(int64_t a, int64_t b) { return (a + b - 1) / b; }

}  // namespace

extern "C" {

// Pass 1: number of segments (per-pair chunking + per-dst-window padding
// to a seg_per_mid multiple), BEFORE global mids_per_step padding.
int64_t ppnp_pack_count(int64_t n_rows, int64_t n_cols,
                        const int64_t* indptr, const int32_t* indices,
                        int32_t window, int32_t window_src, int32_t chunk,
                        int32_t seg_per_mid) {
  const int64_t n_wrows = ceil_div(n_rows, window);
  const int64_t n_wcols = ceil_div(n_cols, window_src);
  std::vector<int64_t> pair_count(n_wcols);
  int64_t total = 0;
  for (int64_t dw = 0; dw < n_wrows; ++dw) {
    std::fill(pair_count.begin(), pair_count.end(), 0);
    const int64_t r1 = std::min<int64_t>(n_rows, (dw + 1) * window);
    for (int64_t r = dw * window; r < r1; ++r)
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e)
        ++pair_count[indices[e] / window_src];
    int64_t segs = 0;
    for (int64_t sw = 0; sw < n_wcols; ++sw)
      segs += ceil_div(pair_count[sw], chunk);
    total += ceil_div(segs, seg_per_mid) * seg_per_mid;
  }
  return total;
}

// Pass 2: fill caller-allocated outputs sized by ppnp_pack_count (plus any
// caller-side global padding rows, pre-zeroed by the caller):
//   seg_bs[n_seg]             src-window base row per segment
//   seg_dw_rows[n_seg]        dst-window base row per segment
//   e_src[n_seg*chunk]        src local index (row-major (n_seg, chunk))
//   e_dst[n_seg*chunk]        dst local index
//   e_w[n_seg*chunk]          edge weight (0 = padding slot)
// Returns the number of segments written (== pass-1 count).
int64_t ppnp_pack_fill(int64_t n_rows, int64_t n_cols,
                       const int64_t* indptr, const int32_t* indices,
                       const float* data,
                       int32_t window, int32_t window_src, int32_t chunk,
                       int32_t seg_per_mid,
                       int32_t* seg_bs, int32_t* seg_dw_rows,
                       int32_t* e_src, int32_t* e_dst, float* e_w) {
  const int64_t n_wrows = ceil_div(n_rows, window);
  const int64_t n_wcols = ceil_div(n_cols, window_src);
  std::vector<int64_t> pair_count(n_wcols), pair_seg0(n_wcols),
      pair_fill(n_wcols);
  int64_t seg_base = 0;  // first segment index of the current dst window
  for (int64_t dw = 0; dw < n_wrows; ++dw) {
    std::fill(pair_count.begin(), pair_count.end(), 0);
    const int64_t r0 = dw * window;
    const int64_t r1 = std::min<int64_t>(n_rows, r0 + window);
    for (int64_t r = r0; r < r1; ++r)
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e)
        ++pair_count[indices[e] / window_src];

    // Segment offsets per pair within this dst window.
    int64_t segs = 0;
    for (int64_t sw = 0; sw < n_wcols; ++sw) {
      pair_seg0[sw] = seg_base + segs;
      pair_fill[sw] = 0;
      segs += ceil_div(pair_count[sw], chunk);
    }
    const int64_t segs_pad = ceil_div(segs, seg_per_mid) * seg_per_mid;

    // Segment headers (including the per-dw padding segments).
    for (int64_t s = 0; s < segs_pad; ++s) {
      seg_bs[seg_base + s] = 0;
      seg_dw_rows[seg_base + s] = static_cast<int32_t>(r0);
    }
    for (int64_t sw = 0; sw < n_wcols; ++sw) {
      const int64_t nseg_p = ceil_div(pair_count[sw], chunk);
      for (int64_t s = 0; s < nseg_p; ++s)
        seg_bs[pair_seg0[sw] + s] = static_cast<int32_t>(sw * window_src);
    }

    // Scatter edges into their pair's slots (row-major within the window,
    // which is a valid within-pair order).
    for (int64_t r = r0; r < r1; ++r) {
      for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
        const int64_t sw = indices[e] / window_src;
        const int64_t k = pair_fill[sw]++;
        const int64_t slot = (pair_seg0[sw] + k / chunk) * chunk + k % chunk;
        e_src[slot] = static_cast<int32_t>(indices[e] % window_src);
        e_dst[slot] = static_cast<int32_t>(r - r0);
        e_w[slot] = data[e];
      }
    }
    seg_base += segs_pad;
  }
  return seg_base;
}

}  // extern "C"
