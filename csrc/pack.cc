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

// ---------------------------------------------------------------------------
// Banded (sliding-window) packer — native twin of
// ppnp_tpu/ops/pairchunks.py::pair_chunks_banded. Inputs are the
// deduplicated COO edges ALREADY lexsorted by (dst, src) (the Python
// wrapper sorts; numpy's lexsort is fast). The band walk, per-band stable
// src sort, and greedy segment cut replicate the numpy code exactly
// (stable sort ⇒ bit-identical slot layout), so the two paths are tested
// for array equality, not just math equivalence.
// ---------------------------------------------------------------------------

namespace {

// Shared band walk: calls per-band `emit(i, j, bd, order)` where
// [i, j) is the band's edge range, bd its dst base, and `order` the
// band-local stable src order. Returns total padded segment count.
template <typename Emit>
int64_t band_walk(int64_t nnz, int64_t n_rows_pad, int64_t n_cols_pad,
                  const int64_t* dst, const int64_t* src,
                  int32_t window, int32_t window_src, int32_t chunk,
                  int32_t seg_per_mid, Emit emit) {
  std::vector<int64_t> order;   // band-local edge order (src-sorted)
  std::vector<int64_t> starts;  // per-seg start (band-local position)
  std::vector<int64_t> bases;   // per-seg src base
  int64_t total_pad_segs = 0;
  int64_t i = 0;
  while (i < nnz) {
    int64_t bd = std::min((dst[i] >> 3) << 3, n_rows_pad - window);
    const int64_t* jp = std::lower_bound(dst + i, dst + nnz, bd + window);
    const int64_t j = jp - dst;
    order.resize(j - i);
    for (int64_t k = 0; k < j - i; ++k) order[k] = i + k;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return src[a] < src[b]; });
    starts.clear();
    bases.clear();
    int64_t k = 0;
    const int64_t n = j - i;
    while (k < n) {
      int64_t bs = std::min((src[order[k]] >> 3) << 3,
                            n_cols_pad - window_src);
      // first band-local position whose src >= bs + window_src
      int64_t lo = k, hi = n;
      while (lo < hi) {
        int64_t m = (lo + hi) / 2;
        if (src[order[m]] < bs + window_src) lo = m + 1; else hi = m;
      }
      starts.push_back(k);
      bases.push_back(bs);
      k = std::min(lo, k + chunk);
    }
    total_pad_segs +=
        ceil_div(static_cast<int64_t>(starts.size()), seg_per_mid) *
        seg_per_mid;
    emit(i, j, bd, order, starts, bases, total_pad_segs);
    i = j;
  }
  return total_pad_segs;
}

}  // namespace

extern "C" {

// Pass 1: total per-band-padded segment count (before the caller's global
// mids_per_step padding). Edges must be (dst, src)-lexsorted.
int64_t ppnp_band_count(int64_t nnz, int64_t n_rows_pad, int64_t n_cols_pad,
                        const int64_t* dst, const int64_t* src,
                        int32_t window, int32_t window_src, int32_t chunk,
                        int32_t seg_per_mid) {
  return band_walk(nnz, n_rows_pad, n_cols_pad, dst, src, window, window_src,
                   chunk, seg_per_mid,
                   [](int64_t, int64_t, int64_t, const std::vector<int64_t>&,
                      const std::vector<int64_t>&, const std::vector<int64_t>&,
                      int64_t) {});
}

// Pass 2: fill caller-allocated, pre-zeroed outputs (sized by pass 1 plus
// the caller's global padding):
//   seg_bs[n_seg_pad]          per-seg src base (band padding segs stay 0)
//   mid_bd[n_mid_pad]          per-mid dst base (global padding mids stay 0)
//   flat_src/flat_dst[n_seg_pad*chunk], flat_w[...]  slot arrays,
//     flat index = seg*chunk + rank (caller reshapes/transposes).
// Returns the number of real (band-padded) segments, == pass-1 count.
int64_t ppnp_band_fill(int64_t nnz, int64_t n_rows_pad, int64_t n_cols_pad,
                       const int64_t* dst, const int64_t* src, const float* w,
                       int32_t window, int32_t window_src, int32_t chunk,
                       int32_t seg_per_mid,
                       int32_t* seg_bs, int32_t* mid_bd,
                       int32_t* flat_src, int32_t* flat_dst, float* flat_w) {
  return band_walk(
      nnz, n_rows_pad, n_cols_pad, dst, src, window, window_src, chunk,
      seg_per_mid,
      [&](int64_t i, int64_t j, int64_t bd, const std::vector<int64_t>& order,
          const std::vector<int64_t>& starts, const std::vector<int64_t>& bases,
          int64_t seg_end_pad) {
        const int64_t n_segs = static_cast<int64_t>(starts.size());
        const int64_t band_pad_segs =
            ceil_div(n_segs, static_cast<int64_t>(seg_per_mid)) * seg_per_mid;
        const int64_t seg0 = seg_end_pad - band_pad_segs;
        for (int64_t s = 0; s < n_segs; ++s)
          seg_bs[seg0 + s] = static_cast<int32_t>(bases[s]);
        for (int64_t m = seg0 / seg_per_mid; m < seg_end_pad / seg_per_mid;
             ++m)
          mid_bd[m] = static_cast<int32_t>(bd);
        int64_t segk = 0;
        for (int64_t p = 0; p < j - i; ++p) {
          while (segk + 1 < n_segs && starts[segk + 1] <= p) ++segk;
          const int64_t e = order[p];
          const int64_t slot = (seg0 + segk) * chunk + (p - starts[segk]);
          flat_src[slot] = static_cast<int32_t>(src[e] - bases[segk]);
          flat_dst[slot] = static_cast<int32_t>(dst[e] - bd);
          flat_w[slot] = w[e];
        }
      });
}

}  // extern "C"

// CSR-direct banded packer: canonical CSR (sorted indices, no dups) IS
// (dst, src)-lexsorted, so the Python wrapper can skip the COO expansion,
// int64 casts, and lexsort entirely when packing without a permutation.
// Band walk over indptr; per band, edges sort stable by int32 src.
// Output contract identical to ppnp_band_fill.

namespace {

template <typename Emit>
int64_t band_walk_csr(int64_t n_rows, int64_t n_rows_pad, int64_t n_cols_pad,
                      const int64_t* indptr, const int32_t* indices,
                      int32_t window, int32_t window_src, int32_t chunk,
                      int32_t seg_per_mid, Emit emit) {
  const int64_t nnz = indptr[n_rows];
  std::vector<int64_t> order;   // global edge ids, band-local src order
  std::vector<int64_t> starts;  // per-seg start (band-local position)
  std::vector<int64_t> bases;   // per-seg src base
  int64_t total_pad_segs = 0;
  int64_t i = 0, r = 0;
  while (i < nnz) {
    while (indptr[r + 1] <= i) ++r;  // row of edge i (skip empty rows)
    const int64_t bd = std::min((r >> 3) << 3, n_rows_pad - window);
    const int64_t row_end = std::min(bd + window, n_rows);
    const int64_t j = indptr[row_end];
    order.resize(j - i);
    for (int64_t k = 0; k < j - i; ++k) order[k] = i + k;
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      return indices[a] < indices[b];
    });
    starts.clear();
    bases.clear();
    const int64_t n = j - i;
    int64_t k = 0;
    while (k < n) {
      const int64_t bs = std::min(
          (static_cast<int64_t>(indices[order[k]]) >> 3) << 3,
          n_cols_pad - window_src);
      int64_t lo = k, hi = n;
      while (lo < hi) {
        int64_t m = (lo + hi) / 2;
        if (indices[order[m]] < bs + window_src) lo = m + 1; else hi = m;
      }
      starts.push_back(k);
      bases.push_back(bs);
      k = std::min(lo, k + chunk);
    }
    total_pad_segs +=
        ceil_div(static_cast<int64_t>(starts.size()), seg_per_mid) *
        seg_per_mid;
    emit(i, j, bd, row_end, order, starts, bases, total_pad_segs);
    i = j;
  }
  return total_pad_segs;
}

}  // namespace

extern "C" {

int64_t ppnp_band_count_csr(int64_t n_rows, int64_t n_rows_pad,
                            int64_t n_cols_pad,
                            const int64_t* indptr, const int32_t* indices,
                            int32_t window, int32_t window_src, int32_t chunk,
                            int32_t seg_per_mid) {
  return band_walk_csr(
      n_rows, n_rows_pad, n_cols_pad, indptr, indices, window, window_src,
      chunk, seg_per_mid,
      [](int64_t, int64_t, int64_t, int64_t, const std::vector<int64_t>&,
         const std::vector<int64_t>&, const std::vector<int64_t>&,
         int64_t) {});
}

int64_t ppnp_band_fill_csr(int64_t n_rows, int64_t n_rows_pad,
                           int64_t n_cols_pad,
                           const int64_t* indptr, const int32_t* indices,
                           const float* data,
                           int32_t window, int32_t window_src, int32_t chunk,
                           int32_t seg_per_mid,
                           int32_t* seg_bs, int32_t* mid_bd,
                           int32_t* flat_src, int32_t* flat_dst,
                           float* flat_w) {
  std::vector<int32_t> edge_dst;  // per-band scratch: dst row per edge
  return band_walk_csr(
      n_rows, n_rows_pad, n_cols_pad, indptr, indices, window, window_src,
      chunk, seg_per_mid,
      [&](int64_t i, int64_t j, int64_t bd, int64_t row_end,
          const std::vector<int64_t>& order, const std::vector<int64_t>& starts,
          const std::vector<int64_t>& bases, int64_t seg_end_pad) {
        const int64_t n_segs = static_cast<int64_t>(starts.size());
        const int64_t band_pad_segs =
            ceil_div(n_segs, static_cast<int64_t>(seg_per_mid)) * seg_per_mid;
        const int64_t seg0 = seg_end_pad - band_pad_segs;
        for (int64_t s = 0; s < n_segs; ++s)
          seg_bs[seg0 + s] = static_cast<int32_t>(bases[s]);
        for (int64_t m = seg0 / seg_per_mid; m < seg_end_pad / seg_per_mid;
             ++m)
          mid_bd[m] = static_cast<int32_t>(bd);
        edge_dst.resize(j - i);
        for (int64_t r = bd; r < row_end; ++r) {
          const int64_t e0 = std::max(indptr[r], i);
          for (int64_t e = e0; e < indptr[r + 1]; ++e)
            edge_dst[e - i] = static_cast<int32_t>(r - bd);
        }
        int64_t segk = 0;
        for (int64_t p = 0; p < j - i; ++p) {
          while (segk + 1 < n_segs && starts[segk + 1] <= p) ++segk;
          const int64_t e = order[p];
          const int64_t slot = (seg0 + segk) * chunk + (p - starts[segk]);
          flat_src[slot] = static_cast<int32_t>(indices[e] - bases[segk]);
          flat_dst[slot] = edge_dst[e - i];
          flat_w[slot] = data[e];
        }
      });
}

}  // extern "C"
