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
// ppnp_tpu/ops/pairchunks.py::pair_chunks_banded. Single-pass: the band
// walk (per-band stable src sort + greedy segment cut) runs ONCE,
// appending into growable buffers behind an opaque handle; the Python
// wrapper then reads the segment count, allocates the globally padded
// numpy arrays, and copies out. Two entry points share the walk: COO
// (edges already (dst, src)-lexsorted — the permuted path) and
// CSR-direct (canonical CSR is already in that order, so indptr/indices
// are consumed with no lexsort or int64 expansion). The stable sort
// replicates numpy's argsort(kind="stable") ⇒ bit-identical slot layout,
// tested by exact array equality in tests/test_banded.py.
// ---------------------------------------------------------------------------

namespace {

struct BandPack {
  std::vector<int32_t> seg_bs;    // [n_seg] src base per segment
  std::vector<int32_t> mid_bd;    // [n_seg/seg_per_mid] dst base per mid
  std::vector<int32_t> flat_src;  // [n_seg*chunk] slot = seg*chunk + rank
  std::vector<int32_t> flat_dst;
  std::vector<float> flat_w;
  int32_t chunk = 0, seg_per_mid = 0;

  int64_t n_seg() const { return static_cast<int64_t>(seg_bs.size()); }
};

// One band: `n` edges, band-local src accessor `bsrc(p)` over the stable
// src-sorted order, dst/weight accessors by the same p. Cuts segments,
// pads to a seg_per_mid multiple, appends slots.
template <typename SrcAt, typename DstAt, typename WAt>
void append_band(BandPack& out, int64_t bd, int64_t n, int64_t n_cols_pad,
                 int32_t window_src, int32_t chunk, int32_t seg_per_mid,
                 SrcAt bsrc, DstAt bdst, WAt bw) {
  const int64_t seg0 = out.n_seg();
  std::vector<int64_t> starts;  // band-local start position per segment
  int64_t k = 0;
  while (k < n) {
    const int64_t bs = std::min((bsrc(k) >> 3) << 3,
                                n_cols_pad - window_src);
    int64_t lo = k, hi = n;  // first position with src >= bs + window_src
    while (lo < hi) {
      int64_t m = (lo + hi) / 2;
      if (bsrc(m) < bs + window_src) lo = m + 1; else hi = m;
    }
    out.seg_bs.push_back(static_cast<int32_t>(bs));
    starts.push_back(k);
    k = std::min(lo, k + chunk);
  }
  const int64_t n_segs = out.n_seg() - seg0;
  const int64_t pad_segs =
      ceil_div(n_segs, static_cast<int64_t>(seg_per_mid)) * seg_per_mid;
  out.seg_bs.resize(seg0 + pad_segs, 0);  // band padding segs keep base 0
  out.mid_bd.resize((seg0 + pad_segs) / seg_per_mid,
                    static_cast<int32_t>(bd));
  out.flat_src.resize((seg0 + pad_segs) * chunk, 0);
  out.flat_dst.resize((seg0 + pad_segs) * chunk, 0);
  out.flat_w.resize((seg0 + pad_segs) * chunk, 0.0f);
  int64_t segk = 0;
  for (int64_t p = 0; p < n; ++p) {
    while (segk + 1 < n_segs && starts[segk + 1] <= p) ++segk;
    const int64_t slot = (seg0 + segk) * chunk + (p - starts[segk]);
    out.flat_src[slot] =
        static_cast<int32_t>(bsrc(p) - out.seg_bs[seg0 + segk]);
    out.flat_dst[slot] = static_cast<int32_t>(bdst(p) - bd);
    out.flat_w[slot] = bw(p);
  }
}

}  // namespace

extern "C" {

// COO entry: edges (dst, src)-lexsorted, deduplicated.
void* ppnp_band_pack(int64_t nnz, int64_t n_rows_pad, int64_t n_cols_pad,
                     const int64_t* dst, const int64_t* src, const float* w,
                     int32_t window, int32_t window_src, int32_t chunk,
                     int32_t seg_per_mid) {
  auto* out = new BandPack;
  out->chunk = chunk;
  out->seg_per_mid = seg_per_mid;
  std::vector<int64_t> order;
  int64_t i = 0;
  while (i < nnz) {
    const int64_t bd = std::min((dst[i] >> 3) << 3, n_rows_pad - window);
    const int64_t j =
        std::lower_bound(dst + i, dst + nnz, bd + window) - dst;
    order.resize(j - i);
    for (int64_t k = 0; k < j - i; ++k) order[k] = i + k;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return src[a] < src[b]; });
    append_band(*out, bd, j - i, n_cols_pad, window_src, chunk, seg_per_mid,
                [&](int64_t p) { return src[order[p]]; },
                [&](int64_t p) { return dst[order[p]]; },
                [&](int64_t p) { return w[order[p]]; });
    i = j;
  }
  return out;
}

// CSR entry: canonical CSR (sorted indices, no duplicates).
void* ppnp_band_pack_csr(int64_t n_rows, int64_t n_rows_pad,
                         int64_t n_cols_pad,
                         const int64_t* indptr, const int32_t* indices,
                         const float* data,
                         int32_t window, int32_t window_src, int32_t chunk,
                         int32_t seg_per_mid) {
  auto* out = new BandPack;
  out->chunk = chunk;
  out->seg_per_mid = seg_per_mid;
  const int64_t nnz = indptr[n_rows];
  std::vector<int64_t> order;
  std::vector<int32_t> edge_dst;  // band-local dst row per edge
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
    edge_dst.resize(j - i);
    for (int64_t rr = r; rr < row_end; ++rr) {
      const int64_t e0 = std::max(indptr[rr], i);
      for (int64_t e = e0; e < indptr[rr + 1]; ++e)
        edge_dst[e - i] = static_cast<int32_t>(rr - bd);
    }
    append_band(*out, bd, j - i, n_cols_pad, window_src, chunk, seg_per_mid,
                [&](int64_t p) {
                  return static_cast<int64_t>(indices[order[p]]);
                },
                [&](int64_t p) {
                  return static_cast<int64_t>(bd + edge_dst[order[p] - i]);
                },
                [&](int64_t p) { return data[order[p]]; });
    i = j;
  }
  return out;
}

int64_t ppnp_band_pack_nseg(void* handle) {
  return static_cast<BandPack*>(handle)->n_seg();
}

// Copy into caller-allocated, pre-zeroed, globally padded arrays:
//   seg_bs[>=n_seg], mid_bd[>=n_seg/seg_per_mid],
//   flat_src/flat_dst/flat_w[>=n_seg*chunk].
void ppnp_band_pack_take(void* handle, int32_t* seg_bs, int32_t* mid_bd,
                         int32_t* flat_src, int32_t* flat_dst,
                         float* flat_w) {
  auto* p = static_cast<BandPack*>(handle);
  std::copy(p->seg_bs.begin(), p->seg_bs.end(), seg_bs);
  std::copy(p->mid_bd.begin(), p->mid_bd.end(), mid_bd);
  std::copy(p->flat_src.begin(), p->flat_src.end(), flat_src);
  std::copy(p->flat_dst.begin(), p->flat_dst.end(), flat_dst);
  std::copy(p->flat_w.begin(), p->flat_w.end(), flat_w);
}

void ppnp_band_pack_free(void* handle) {
  delete static_cast<BandPack*>(handle);
}

}  // extern "C"
