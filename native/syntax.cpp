// syntax.cpp — CTU/CU/TU/residual CABAC syntax writer.
//
// Host entropy stage of the TPU-native framework (role of ref
// hmr_arithmetic_encoding.c:424-2061, re-designed record-driven: the
// device produces dense per-4x4 decision maps + raster coefficient
// planes, and this walker emits the exact spec syntax in coding order).
// Implemented from ITU-T H.265 sections 7.3.8 (syntax), 9.3.3
// (binarization) and 9.3.4 (context derivation).
#include <algorithm>
#include <cstring>
#include <vector>

#include "bitstream.h"
#include "cabac.h"
#include "hevc_types.h"

namespace hevc {

void write_slice_header(Bitstream& b, const HevcCfg* cfg,
                        const FrameRec* rec,
                        const std::vector<uint32_t>& entry_offsets);

namespace {

inline int log2i(int v) {
  int l = 0;
  while ((1 << l) < v) ++l;
  return l;
}

// ---- scan order tables (spec 6.5) ----
struct ScanTables {
  // [log2-2][scanIdx] -> scan-pos -> (x, y) packed as y*size+x
  std::vector<uint16_t> scan[4][3];
  ScanTables() {
    for (int l = 2; l <= 5; ++l) {
      int n = 1 << l;
      for (int s = 0; s < 3; ++s) scan[l - 2][s] = build(n, s);
    }
  }
  static std::vector<uint16_t> block_scan(int n, int s) {
    std::vector<uint16_t> v;
    if (s == 1) {  // horizontal
      for (int y = 0; y < n; ++y)
        for (int x = 0; x < n; ++x) v.push_back(y * n + x);
    } else if (s == 2) {  // vertical
      for (int x = 0; x < n; ++x)
        for (int y = 0; y < n; ++y) v.push_back(y * n + x);
    } else {  // up-right diagonal
      for (int d = 0; d < 2 * n - 1; ++d)
        for (int y = std::min(d, n - 1); y >= 0; --y) {
          int x = d - y;
          if (x >= 0 && x < n) v.push_back(y * n + x);
        }
    }
    return v;
  }
  static std::vector<uint16_t> build(int n, int s) {
    if (n == 4) return block_scan(4, s);
    auto cg = block_scan(n / 4, s);
    auto in = block_scan(4, s);
    std::vector<uint16_t> v;
    for (uint16_t c : cg) {
      int cy = c / (n / 4), cx = c % (n / 4);
      for (uint16_t i : in) {
        int iy = i / 4, ix = i % 4;
        v.push_back((cy * 4 + iy) * n + cx * 4 + ix);
      }
    }
    return v;
  }
};
const ScanTables g_scans;

const uint8_t kCtxIndMap4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                   6, 6, 8, 8, 7, 7, 8, 8};
const uint8_t kMinInGroup[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};
const uint8_t kGroupIdx[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6,
                               6, 7, 7, 7, 7, 8, 8, 8, 8, 8, 8,
                               8, 8, 9, 9, 9, 9, 9, 9, 9, 9};

class SliceWriter {
 public:
  SliceWriter(const HevcCfg* cfg, const FrameRec* rec)
      : cfg_(*cfg), rec_(*rec), cabac_(&bs_) {
    w_ = cfg_.width;
    h_ = cfg_.height;
    w4_ = w_ >> 2;
    cw_ = cfg_.coded_width > 0 ? cfg_.coded_width : w_;
    ch_ = cfg_.coded_height > 0 ? cfg_.coded_height : h_;
    ctu_log2_ = log2i(cfg_.ctu_size);
    min_cu_log2_ = log2i(cfg_.min_cu_size);
    ctus_x_ = (cw_ + cfg_.ctu_size - 1) >> ctu_log2_;
    ctus_y_ = (ch_ + cfg_.ctu_size - 1) >> ctu_log2_;
    h4_ = h_ >> 2;
    is_p_ = rec_.slice_type != 2;
    // tile grid (uniform spacing, spec 6.5.1): per-CTU tile id and
    // tile-scan coding rank; single tile -> rank == raster index
    tcols_ = std::max(1, cfg_.tile_cols);
    trows_ = std::max(1, cfg_.tile_rows);
    tiled_ = tcols_ > 1 || trows_ > 1;
    tile_of_ctu_.resize(ctus_x_ * ctus_y_);
    ctu_rank_.resize(ctus_x_ * ctus_y_);
    col_bd_.resize(tcols_ + 1);
    row_bd_.resize(trows_ + 1);
    for (int i = 0; i <= tcols_; ++i) col_bd_[i] = i * ctus_x_ / tcols_;
    for (int i = 0; i <= trows_; ++i) row_bd_[i] = i * ctus_y_ / trows_;
    int rank = 0;
    for (int tr = 0; tr < trows_; ++tr)
      for (int tc = 0; tc < tcols_; ++tc)
        for (int cy = row_bd_[tr]; cy < row_bd_[tr + 1]; ++cy)
          for (int cx = col_bd_[tc]; cx < col_bd_[tc + 1]; ++cx) {
            tile_of_ctu_[cy * ctus_x_ + cx] = tr * tcols_ + tc;
            ctu_rank_[cy * ctus_x_ + cx] = rank++;
          }
    if (is_p_) derive_inter_fields();
  }

  void encode_ctu(int cx, int cy) {
    if (rec_.sao_luma || rec_.sao_chroma) write_sao(cx, cy);
    // quantization group = CTU (diff_cu_qp_delta_depth 0): arm one
    // cu_qp_delta for the CTU, emitted at its first coded TU (spec
    // 7.3.8.10); a CTU with no coded cbf keeps the predicted QP
    // (= previous in decoding order, since the left/above QGs lie
    // in other CTBs and are unavailable per spec 8.6.1)
    if (cfg_.cu_qp_delta_enabled) {
      qp_pending_ = true;
      pending_qp_ = m4(reinterpret_cast<const uint8_t*>(rec_.qp_map),
                       cx << ctu_log2_, cy << ctu_log2_);
    }
    quadtree(cx << ctu_log2_, cy << ctu_log2_, ctu_log2_, 0);
  }

  std::vector<uint8_t> encode() {
    if (tiled_) return encode_tiles();
    if (cfg_.wpp_enabled && ctus_y_ > 1) return encode_wpp();
    write_slice_header(bs_, &cfg_, &rec_, {});
    ctx_.init(rec_.slice_type, rec_.slice_qp);
    cabac_.start();
    prev_qp_ = rec_.slice_qp;
    for (int cy = 0; cy < ctus_y_; ++cy) {
      for (int cx = 0; cx < ctus_x_; ++cx) {
        encode_ctu(cx, cy);
        bool last = (cy == ctus_y_ - 1) && (cx == ctus_x_ - 1);
        cabac_.encode_terminate(last ? 1 : 0);
      }
    }
    cabac_.finish();
    bs_.put_bit(1);  // rbsp stop bit
    bs_.align_zero();
    return bs_.bytes();
  }

  // WPP: one substream per CTU row (spec 7.3.8.1 slice_segment_data
  // with entropy_coding_sync: end_of_subset_one_bit + byte alignment
  // between rows; contexts of a row initialize from the snapshot taken
  // after the 2nd CTU of the row above — spec 9.3.1; role of ref
  // hmr_encoder_lib.c:785-804/1835-1886).  Entry point offsets count
  // NAL-unit bytes, so emulation-prevention insertions inside each
  // substream are added (ref count_needed_start_codes,
  // hmr_headers.c:550).
  std::vector<uint8_t> encode_wpp() {
    std::vector<std::vector<uint8_t>> subs(ctus_y_);
    ContextSet base;
    base.init(rec_.slice_type, rec_.slice_qp);
    ContextSet snap = base;       // after 2nd CTU of previous row
    for (int cy = 0; cy < ctus_y_; ++cy) {
      Bitstream row_bs;
      ctx_ = (cy == 0 || ctus_x_ == 1) ? base : snap;
      cabac_.set_stream(&row_bs);
      cabac_.start();
      prev_qp_ = rec_.slice_qp;   // QpY_prev resets per row (8.6.1)
      for (int cx = 0; cx < ctus_x_; ++cx) {
        encode_ctu(cx, cy);
        if (cx == 1) snap = ctx_;
        bool last = (cy == ctus_y_ - 1) && (cx == ctus_x_ - 1);
        cabac_.encode_terminate(last ? 1 : 0);
        if (cx == ctus_x_ - 1 && !last)
          cabac_.encode_terminate(1);  // end_of_subset_one_bit
      }
      cabac_.finish();
      row_bs.put_bit(1);           // byte_alignment / rbsp stop
      row_bs.align_zero();
      subs[cy] = row_bs.bytes();
    }
    cabac_.set_stream(&bs_);
    return assemble_substreams(subs);
  }

  // Tiles: one substream per tile, CTUs in tile-scan order, CABAC
  // contexts re-initialized at each tile start (spec 9.3.1; no WPP
  // inheritance across tiles), QpY_prev reset to slice QP (spec
  // 8.6.1), end_of_subset_one_bit + byte alignment between tiles.
  std::vector<uint8_t> encode_tiles() {
    int n_tiles = tcols_ * trows_;
    std::vector<std::vector<uint8_t>> subs(n_tiles);
    for (int t = 0; t < n_tiles; ++t) {
      int tc = t % tcols_;
      int tr = t / tcols_;
      Bitstream tile_bs;
      ctx_.init(rec_.slice_type, rec_.slice_qp);
      cabac_.set_stream(&tile_bs);
      cabac_.start();
      prev_qp_ = rec_.slice_qp;
      for (int cy = row_bd_[tr]; cy < row_bd_[tr + 1]; ++cy)
        for (int cx = col_bd_[tc]; cx < col_bd_[tc + 1]; ++cx) {
          encode_ctu(cx, cy);
          bool last_in_tile = (cy == row_bd_[tr + 1] - 1)
              && (cx == col_bd_[tc + 1] - 1);
          bool last = last_in_tile && t == n_tiles - 1;
          cabac_.encode_terminate(last ? 1 : 0);
          if (last_in_tile && !last)
            cabac_.encode_terminate(1);  // end_of_subset_one_bit
        }
      cabac_.finish();
      tile_bs.put_bit(1);  // byte_alignment / rbsp stop
      tile_bs.align_zero();
      subs[t] = tile_bs.bytes();
    }
    cabac_.set_stream(&bs_);
    return assemble_substreams(subs);
  }

  // entry points: substream sizes in NAL-unit bytes (add the
  // emulation-prevention bytes the EBSP pass will insert; the zero
  // run cannot cross the header boundary — the header's alignment
  // byte is nonzero)
  std::vector<uint8_t> assemble_substreams(
      const std::vector<std::vector<uint8_t>>& subs) {
    int n = static_cast<int>(subs.size());
    std::vector<uint32_t> offsets(n - 1);
    int run = 0;
    for (int j = 0; j < n; ++j) {
      uint32_t ins = 0;
      for (uint8_t byte : subs[j]) {
        if (run >= 2 && byte <= 3) {
          ++ins;
          run = 0;
        }
        run = (byte == 0) ? run + 1 : 0;
      }
      if (j < n - 1)
        offsets[j] = static_cast<uint32_t>(subs[j].size()) + ins;
    }
    write_slice_header(bs_, &cfg_, &rec_, offsets);
    for (const auto& s : subs)
      for (uint8_t byte : s) bs_.put_byte(byte);
    return bs_.bytes();
  }

 private:
  int prev_qp_ = 0;
  bool qp_pending_ = false;
  int pending_qp_ = 0;
  // ---- map accessors (4x4 granularity) ----
  int m4(const uint8_t* p, int x, int y) const {
    return p[(y >> 2) * w4_ + (x >> 2)];
  }
  int depth_at(int x, int y) const { return m4(rec_.cu_depth, x, y); }
  bool is_intra(int x, int y) const {
    return rec_.slice_type == 2 || m4(rec_.pred_mode, x, y) != 0;
  }
  bool skip_at(int x, int y) const {
    return !d_skip_.empty() && d_skip_[(y >> 2) * w4_ + (x >> 2)];
  }

  // ---- merge/AMVP derivation (spec 8.5.3.2.3 / 8.5.3.2.5-8) ----
  //
  // The device ships only the final per-4x4 MV field (mv_x/mv_y) and
  // pred_mode; this pre-pass re-derives, decoder-exactly, which CUs are
  // expressible as merge/skip and computes mvd + mvp_idx for the rest
  // (role of ref get_merge_mvp_candidates/get_amvp_candidates
  // hmr_motion_inter.c:1786/1864, lifted into the host stage so the
  // device needs no candidate-list logic).  P slice, 1 reference,
  // temporal MVP disabled in SPS.
  struct MV {
    int x = 0, y = 0, ref = 0;
  };
  static bool mv_eq(const MV& a, const MV& b) {
    // merge candidates compare motion vectors AND reference indices
    // (spec 8.5.3.2.3)
    return a.x == b.x && a.y == b.y && a.ref == b.ref;
  }
  // POC distance of list0 reference r: the r+1-th previous picture
  // (IPPP FIFO; RPS delta_poc 1 each — hevc headers.cpp short_term_rps)
  static int ref_poc_delta(int r) { return r + 1; }
  // spec 8.5.3.2.8 temporal/spatial mv scaling by POC distances
  static int scale_mv_comp(int v, int tb, int td) {
    if (tb == td) return v;
    int tx = (16384 + std::abs(td) / 2) / td;
    int dsf = std::min(4095, std::max(-4096, (tb * tx + 32) >> 6));
    long long p = static_cast<long long>(dsf) * v;
    int mag = static_cast<int>((std::llabs(p) + 127) >> 8);
    int s = p < 0 ? -mag : mag;
    return std::min(32767, std::max(-32768, s));
  }
  uint32_t zaddr(int x, int y) const {  // 4x4 z-scan address within CTU
    uint32_t x4 = (x & (cfg_.ctu_size - 1)) >> 2;
    uint32_t y4 = (y & (cfg_.ctu_size - 1)) >> 2;
    uint32_t z = 0;
    for (int b = 0; b < 8; ++b)
      z |= ((x4 >> b) & 1u) << (2 * b) | ((y4 >> b) & 1u) << (2 * b + 1);
    return z;
  }
  // z-scan-order availability (spec 6.4.1), single slice; a neighbour
  // in a different tile is unavailable and coding order is tile-scan
  bool same_tile(int xn, int yn, int xc, int yc) const {
    if (!tiled_) return true;
    return tile_of_ctu_[(yn >> ctu_log2_) * ctus_x_ + (xn >> ctu_log2_)]
        == tile_of_ctu_[(yc >> ctu_log2_) * ctus_x_
                        + (xc >> ctu_log2_)];
  }
  bool zavail(int xn, int yn, int xc, int yc) const {
    if (xn < 0 || yn < 0 || xn >= cw_ || yn >= ch_) return false;
    if (!same_tile(xn, yn, xc, yc)) return false;
    int cn = ctu_rank_[(yn >> ctu_log2_) * ctus_x_ + (xn >> ctu_log2_)];
    int cc = ctu_rank_[(yc >> ctu_log2_) * ctus_x_ + (xc >> ctu_log2_)];
    if (cn != cc) return cn < cc;
    return zaddr(xn, yn) < zaddr(xc, yc);
  }
  bool avail_inter(int xn, int yn, int xc, int yc) const {
    return zavail(xn, yn, xc, yc) && !is_intra(xn, yn);
  }
  MV mv_at(int x, int y) const {
    int i = (y >> 2) * w4_ + (x >> 2);
    int r = (rec_.num_ref_l0 > 1 && rec_.ref_idx) ? rec_.ref_idx[i] : 0;
    return {rec_.mv_x[i], rec_.mv_y[i], r};
  }

  void derive_inter_fields() {
    d_merge_.assign(h4_ * w4_, 0);
    d_mergeidx_.assign(h4_ * w4_, 0);
    d_skip_.assign(h4_ * w4_, 0);
    d_mvp_.assign(h4_ * w4_, 0);
    d_mvdx_.assign(h4_ * w4_, 0);
    d_mvdy_.assign(h4_ * w4_, 0);
    for (int cy = 0; cy < ctus_y_; ++cy)
      for (int cx = 0; cx < ctus_x_; ++cx)
        derive_qt(cx << ctu_log2_, cy << ctu_log2_, ctu_log2_, 0);
  }

  void derive_qt(int x0, int y0, int log2, int depth) {
    bool boundary = x0 + (1 << log2) > cw_ || y0 + (1 << log2) > ch_;
    if (boundary || depth_at(x0, y0) > depth) {
      int half = 1 << (log2 - 1);
      derive_qt(x0, y0, log2 - 1, depth + 1);
      if (x0 + half < cw_)
        derive_qt(x0 + half, y0, log2 - 1, depth + 1);
      if (y0 + half < ch_) {
        derive_qt(x0, y0 + half, log2 - 1, depth + 1);
        if (x0 + half < cw_)
          derive_qt(x0 + half, y0 + half, log2 - 1, depth + 1);
      }
      return;
    }
    int s = 1 << log2;
    if (!is_intra(x0, y0) && m4(rec_.part_size, x0, y0) == 1) {
      // inter NxN: four PUs in z order (spec 8.5.3.2.3 runs per PU;
      // intra-CU neighbour positions resolve through the same z-scan
      // availability — PU0's samples are available to PU1/2/3, later
      // PUs' are not; cu_skip_flag never applies to NxN CUs).
      // Ref part-size syntax: hmr_arithmetic_encoding.c:424-531.
      int half = s >> 1;
      derive_cu(x0, y0, half, false);
      derive_cu(x0 + half, y0, half, false);
      derive_cu(x0, y0 + half, half, false);
      derive_cu(x0 + half, y0 + half, half, false);
      return;
    }
    derive_cu(x0, y0, s, true);
  }

  void derive_cu(int x0, int y0, int s, bool allow_skip = true) {
    if (is_intra(x0, y0)) return;
    const MV cur = mv_at(x0, y0);
    // neighbour sample positions (spec 8.5.3.2.3)
    const int a1x = x0 - 1, a1y = y0 + s - 1;
    const int b1x = x0 + s - 1, b1y = y0 - 1;
    const int b0x = x0 + s, b0y = y0 - 1;
    const int a0x = x0 - 1, a0y = y0 + s;
    const int b2x = x0 - 1, b2y = y0 - 1;
    const bool aa1 = avail_inter(a1x, a1y, x0, y0);
    const bool ab1 = avail_inter(b1x, b1y, x0, y0);
    const bool ab0 = avail_inter(b0x, b0y, x0, y0);
    const bool aa0 = avail_inter(a0x, a0y, x0, y0);
    const bool ab2 = avail_inter(b2x, b2y, x0, y0);
    const MV mA1 = aa1 ? mv_at(a1x, a1y) : MV{};
    const MV mB1 = ab1 ? mv_at(b1x, b1y) : MV{};
    const MV mB0 = ab0 ? mv_at(b0x, b0y) : MV{};
    const MV mA0 = aa0 ? mv_at(a0x, a0y) : MV{};
    const MV mB2 = ab2 ? mv_at(b2x, b2y) : MV{};

    // ---- merge candidate list (8.5.3.2.3: A1,B1,B0,A0,[B2]; zero pad)
    MV list[5];
    int n = 0;
    if (aa1) list[n++] = mA1;
    if (ab1 && !(aa1 && mv_eq(mB1, mA1))) list[n++] = mB1;
    if (ab0 && !(ab1 && mv_eq(mB0, mB1))) list[n++] = mB0;
    if (aa0 && !(aa1 && mv_eq(mA0, mA1))) list[n++] = mA0;
    if (n < 4 && ab2 && !(aa1 && mv_eq(mB2, mA1)) &&
        !(ab1 && mv_eq(mB2, mB1)))
      list[n++] = mB2;
    int zero_idx = 0;
    int nref = std::max(1, rec_.num_ref_l0);
    while (n < rec_.num_merge_cands) {
      // spec 8.5.3.2.4: zero candidates cycle refIdxL0 over the
      // active references
      list[n++] = MV{0, 0, zero_idx < nref ? zero_idx : 0};
      ++zero_idx;
    }

    int merge_idx = -1;
    for (int k = 0; k < rec_.num_merge_cands; ++k)
      if (mv_eq(list[k], cur)) {
        merge_idx = k;
        break;
      }

    int mvp_idx = 0, mvdx = 0, mvdy = 0;
    bool merge = merge_idx >= 0;
    bool skip = allow_skip && merge && !any_cbf_cu(x0, y0, s);
    if (!merge) {
      // ---- AMVP (8.5.3.2.5-8): two-pass per side — same-ref first,
      // then POC-scaled (multi-ref); with one reference the scaled
      // branches are identity.  Mirrors HM fillMvpCand ordering:
      // A: A0,A1 same-ref, else A0,A1 scaled; B: B0,B1,B2 same-ref,
      // and only when NO left neighbour exists at all (isScaledFlag
      // == 0) B re-derives with scaling.
      const int tb = ref_poc_delta(cur.ref);
      auto scaled = [&](const MV& m) {
        int td = ref_poc_delta(m.ref);
        return MV{scale_mv_comp(m.x, tb, td),
                  scale_mv_comp(m.y, tb, td), cur.ref};
      };
      MV amvp[2];
      int m = 0;
      bool is_scaled_flag = aa0 || aa1;   // any left neighbour
      // A (left) candidate
      bool has_a = false;
      MV a{};
      if (aa0 && mA0.ref == cur.ref) { a = mA0; has_a = true; }
      else if (aa1 && mA1.ref == cur.ref) { a = mA1; has_a = true; }
      else if (aa0) { a = scaled(mA0); has_a = true; }
      else if (aa1) { a = scaled(mA1); has_a = true; }
      // B (above) candidate: same-ref pass
      bool has_b = false;
      MV b{};
      if (ab0 && mB0.ref == cur.ref) { b = mB0; has_b = true; }
      else if (ab1 && mB1.ref == cur.ref) { b = mB1; has_b = true; }
      else if (ab2 && mB2.ref == cur.ref) { b = mB2; has_b = true; }
      if (!is_scaled_flag && !has_b) {
        // scaling pass for B only when the left side had no
        // neighbours at all (spec isScaledFlagLX)
        if (ab0) { b = scaled(mB0); has_b = true; }
        else if (ab1) { b = scaled(mB1); has_b = true; }
        else if (ab2) { b = scaled(mB2); has_b = true; }
      }
      if (has_a) amvp[m++] = a;
      if (has_b && (!has_a || !(a.x == b.x && a.y == b.y)))
        amvp[m++] = b;
      while (m < 2) amvp[m++] = MV{};
      int c0 = std::abs(cur.x - amvp[0].x) + std::abs(cur.y - amvp[0].y);
      int c1 = std::abs(cur.x - amvp[1].x) + std::abs(cur.y - amvp[1].y);
      mvp_idx = c1 < c0 ? 1 : 0;
      mvdx = cur.x - amvp[mvp_idx].x;
      mvdy = cur.y - amvp[mvp_idx].y;
    }
    for (int dy = 0; dy < s; dy += 4)
      for (int dx = 0; dx < s; dx += 4) {
        int i = ((y0 + dy) >> 2) * w4_ + ((x0 + dx) >> 2);
        d_merge_[i] = merge ? 1 : 0;
        d_mergeidx_[i] = merge ? merge_idx : 0;
        d_skip_[i] = skip ? 1 : 0;
        d_mvp_[i] = mvp_idx;
        d_mvdx_[i] = static_cast<int16_t>(mvdx);
        d_mvdy_[i] = static_cast<int16_t>(mvdy);
      }
  }
  bool cbf_chroma_region(const uint8_t* map, int x, int y, int size) const {
    int step = std::max(size >> 2, 1);
    for (int dy = 0; dy < size; dy += 4)
      for (int dx = 0; dx < size; dx += 4)
        if (map[((y + dy) >> 2) * w4_ + ((x + dx) >> 2)]) return true;
    (void)step;
    return false;
  }

  // ---- SAO (spec 7.3.8.3) ----
  void write_sao(int cx, int cy) {
    int ci = cy * ctus_x_ + cx;
    int merge = rec_.sao_merge ? rec_.sao_merge[ci] : 0;
    // merge flags present only when the neighbour CTU is in the same
    // tile (spec 7.3.8.3 leftCtbInTile / upCtbInTile)
    bool left_ok = cx > 0 && (!tiled_ || tile_of_ctu_[ci - 1]
                              == tile_of_ctu_[ci]);
    bool up_ok = cy > 0 && (!tiled_ || tile_of_ctu_[ci - ctus_x_]
                            == tile_of_ctu_[ci]);
    if (left_ok)
      cabac_.encode_bin(&ctx_.ctx[CTX_SAO_MERGE], merge == 1);
    if (merge != 1 && up_ok)
      cabac_.encode_bin(&ctx_.ctx[CTX_SAO_MERGE], merge == 2);
    if (merge != 0) return;
    for (int c = 0; c < 3; ++c) {
      if (c == 0 && !rec_.sao_luma) continue;
      if (c > 0 && !rec_.sao_chroma) continue;
      int type = rec_.sao_type ? rec_.sao_type[ci * 3 + c] : 0;
      if (c <= 1) {  // luma idx / chroma idx (cr inherits cb)
        cabac_.encode_bin(&ctx_.ctx[CTX_SAO_TYPE], type != 0);
        if (type != 0) cabac_.encode_bypass(type >= 2);  // 0=BO,1=EO
      }
      if (type == 0) continue;
      const int8_t* off = rec_.sao_offset + (ci * 3 + c) * 4;
      for (int i = 0; i < 4; ++i) {  // sao_offset_abs, TR cMax 7
        int a = std::abs(off[i]);
        for (int k = 0; k < a; ++k) cabac_.encode_bypass(1);
        if (a < 7) cabac_.encode_bypass(0);
      }
      if (type == 1) {  // BO: signs + band position
        for (int i = 0; i < 4; ++i)
          if (off[i] != 0) cabac_.encode_bypass(off[i] < 0);
        cabac_.encode_bypass_bins(rec_.sao_band_pos[ci * 3 + c], 5);
      } else if (c <= 1) {  // EO class (cr inherits)
        cabac_.encode_bypass_bins(type - 2, 2);
      }
    }
  }

  // ---- coding quadtree (spec 7.3.8.4) ----
  void quadtree(int x0, int y0, int log2, int depth) {
    int size = 1 << log2;
    // spec 7.3.8.4: split_cu_flag inferred 1 when the block
    // overhangs the coded picture; children outside are not walked
    bool boundary = x0 + size > cw_ || y0 + size > ch_;
    bool split = boundary || depth_at(x0, y0) > depth;
    if (!boundary && log2 > min_cu_log2_) {
      int ctx = 0;
      if (zavail(x0 - 1, y0, x0, y0) && depth_at(x0 - 1, y0) > depth)
        ++ctx;
      if (zavail(x0, y0 - 1, x0, y0) && depth_at(x0, y0 - 1) > depth)
        ++ctx;
      cabac_.encode_bin(&ctx_.ctx[CTX_SPLIT_CU + ctx], split);
    }
    if (split) {
      int half = size >> 1;
      quadtree(x0, y0, log2 - 1, depth + 1);
      if (x0 + half < cw_)
        quadtree(x0 + half, y0, log2 - 1, depth + 1);
      if (y0 + half < ch_) {
        quadtree(x0, y0 + half, log2 - 1, depth + 1);
        if (x0 + half < cw_)
          quadtree(x0 + half, y0 + half, log2 - 1, depth + 1);
      }
    } else {
      coding_unit(x0, y0, log2);
    }
  }

  void coding_unit(int x0, int y0, int log2) {
    bool intra = is_intra(x0, y0);
    if (is_p_) {
      // cu_skip_flag, ctx from neighbours
      int ctx = 0;
      if (zavail(x0 - 1, y0, x0, y0) && skip_at(x0 - 1, y0)) ++ctx;
      if (zavail(x0, y0 - 1, x0, y0) && skip_at(x0, y0 - 1)) ++ctx;
      bool skip = skip_at(x0, y0);
      cabac_.encode_bin(&ctx_.ctx[CTX_SKIP + ctx], skip);
      if (skip) {
        write_merge_idx(d_mergeidx_[(y0 >> 2) * w4_ + (x0 >> 2)]);
        return;
      }
      cabac_.encode_bin(&ctx_.ctx[CTX_PRED_MODE], intra);
    }
    int part = m4(rec_.part_size, x0, y0);  // 0 = 2Nx2N, 1 = NxN
    if (intra) {
      if (log2 == min_cu_log2_)
        cabac_.encode_bin(&ctx_.ctx[CTX_PART_SIZE], part == 0);
      write_intra_modes(x0, y0, log2, part);
      bool intra_split = part != 0;
      int max_depth = cfg_.max_intra_tr_depth + (intra_split ? 1 : 0);
      transform_tree(x0, y0, x0, y0, log2, 0, 0, max_depth, intra_split,
                     true);
    } else {
      // part_mode is signalled for every inter CU (spec 7.3.8.5)
      write_inter_part_mode(part);
      int half = 1 << (log2 - 1);
      if (part == 0) {
        prediction_unit(x0, y0);
      } else {
        prediction_unit(x0, y0);
        prediction_unit(x0 + half, y0);
        prediction_unit(x0, y0 + half);
        prediction_unit(x0 + half, y0 + half);
      }
      bool merge2nx2n =
          part == 0 && d_merge_[(y0 >> 2) * w4_ + (x0 >> 2)] != 0;
      if (!merge2nx2n) {
        bool root_cbf = any_cbf_cu(x0, y0, 1 << log2);
        cabac_.encode_bin(&ctx_.ctx[CTX_ROOT_CBF], root_cbf);
        if (!root_cbf) return;
      }
      // inter MaxTrafoDepth = max_transform_hierarchy_depth_inter;
      // depth-0 split forced only when it is 0 with a non-2Nx2N part
      bool split0 = part != 0 && cfg_.max_inter_tr_depth == 0;
      transform_tree(x0, y0, x0, y0, log2, 0, 0,
                     cfg_.max_inter_tr_depth + (split0 ? 1 : 0), split0,
                     false);
    }
  }

  bool cbf_any(int x0, int y0, int size) const {
    return cbf_chroma_region(rec_.cbf_cb, x0, y0, size) ||
           cbf_chroma_region(rec_.cbf_cr, x0, y0, size);
  }
  bool any_cbf_cu(int x0, int y0, int size) const {
    return cbf_chroma_region(rec_.cbf_y, x0, y0, size) ||
           cbf_any(x0, y0, size);
  }

  void write_inter_part_mode(int part) {
    // without AMP, min CU > 8: 2Nx2N=1, 2NxN=01, Nx2N=001, NxN=000
    if (part == 0) {
      cabac_.encode_bin(&ctx_.ctx[CTX_PART_SIZE], 1);
    } else {  // NxN
      cabac_.encode_bin(&ctx_.ctx[CTX_PART_SIZE], 0);
      cabac_.encode_bin(&ctx_.ctx[CTX_PART_SIZE + 1], 0);
      cabac_.encode_bin(&ctx_.ctx[CTX_PART_SIZE + 2], 0);
    }
  }

  void write_merge_idx(int idx) {
    int cmax = rec_.num_merge_cands - 1;
    if (cmax <= 0) return;
    cabac_.encode_bin(&ctx_.ctx[CTX_MERGE_IDX], idx > 0);
    if (idx > 0) {
      for (int k = 1; k < idx; ++k) cabac_.encode_bypass(1);
      if (idx < cmax) cabac_.encode_bypass(0);
    }
  }

  void prediction_unit(int x0, int y0) {
    int i4 = (y0 >> 2) * w4_ + (x0 >> 2);
    bool merge = d_merge_[i4] != 0;
    cabac_.encode_bin(&ctx_.ctx[CTX_MERGE_FLAG], merge);
    if (merge) {
      write_merge_idx(d_mergeidx_[i4]);
      return;
    }
    // P slice: no inter_pred_idc; ref_idx_l0 only with >1 active
    // reference (TR cMax = active-1; 2 active -> one ctx bin)
    if (rec_.num_ref_l0 > 1) {
      int r = rec_.ref_idx ? rec_.ref_idx[i4] : 0;
      cabac_.encode_bin(&ctx_.ctx[CTX_REF_PIC], r != 0);
    }
    write_mvd(d_mvdx_[i4], d_mvdy_[i4]);
    cabac_.encode_bin(&ctx_.ctx[CTX_MVP_IDX], d_mvp_[i4]);
  }

  void write_egk(uint32_t v, int k) {  // k-th order Exp-Golomb, bypass
    while (v >= (1u << k)) {
      cabac_.encode_bypass(1);
      v -= 1u << k;
      ++k;
    }
    cabac_.encode_bypass(0);
    for (int i = k - 1; i >= 0; --i) cabac_.encode_bypass((v >> i) & 1);
  }

  void write_mvd(int mx, int my) {  // spec 7.3.8.9
    cabac_.encode_bin(&ctx_.ctx[CTX_MVD], mx != 0);
    cabac_.encode_bin(&ctx_.ctx[CTX_MVD], my != 0);
    if (mx != 0)
      cabac_.encode_bin(&ctx_.ctx[CTX_MVD + 1], std::abs(mx) > 1);
    if (my != 0)
      cabac_.encode_bin(&ctx_.ctx[CTX_MVD + 1], std::abs(my) > 1);
    if (mx != 0) {
      if (std::abs(mx) > 1) write_egk(std::abs(mx) - 2, 1);
      cabac_.encode_bypass(mx < 0);
    }
    if (my != 0) {
      if (std::abs(my) > 1) write_egk(std::abs(my) - 2, 1);
      cabac_.encode_bypass(my < 0);
    }
  }

  // ---- intra modes (spec 8.4.2 MPM derivation) ----
  int luma_mode_or_dc(int x, int y, int x0, int y0) const {
    // neighbour candidate: DC if unavailable (frame/tile boundary),
    // inter, or above outside CTU
    if (x < 0 || y < 0) return 1;
    if (!zavail(x, y, x0, y0)) return 1;
    if (!is_intra(x, y)) return 1;
    if (y < y0 && (y >> ctu_log2_) != (y0 >> ctu_log2_)) return 1;
    return m4(rec_.intra_luma_mode, x, y);
  }

  void derive_mpm(int x0, int y0, int cand[3]) const {
    int a = luma_mode_or_dc(x0 - 1, y0, x0, y0);
    int b = luma_mode_or_dc(x0, y0 - 1, x0, y0);
    if (a == b) {
      if (a < 2) {
        cand[0] = 0;
        cand[1] = 1;
        cand[2] = 26;
      } else {
        cand[0] = a;
        cand[1] = 2 + ((a + 29) % 32);
        cand[2] = 2 + ((a - 2 + 1) % 32);
      }
    } else {
      cand[0] = a;
      cand[1] = b;
      if (a != 0 && b != 0)
        cand[2] = 0;
      else
        cand[2] = (a + b < 2) ? 26 : 1;
    }
  }

  void write_intra_modes(int x0, int y0, int log2, int part) {
    int n_pu = part == 0 ? 1 : 4;
    int half = 1 << (log2 - 1);
    int px[4] = {x0, x0 + half, x0, x0 + half};
    int py[4] = {y0, y0, y0 + half, y0 + half};
    int modes[4], cands[4][3];
    bool in_mpm[4];
    int mpm_idx[4];
    for (int i = 0; i < n_pu; ++i) {
      modes[i] = m4(rec_.intra_luma_mode, px[i], py[i]);
      derive_mpm(px[i], py[i], cands[i]);
      in_mpm[i] = false;
      mpm_idx[i] = 0;
      for (int k = 0; k < 3; ++k)
        if (cands[i][k] == modes[i]) {
          in_mpm[i] = true;
          mpm_idx[i] = k;
          break;
        }
      cabac_.encode_bin(&ctx_.ctx[CTX_INTRA_LUMA], in_mpm[i]);
    }
    for (int i = 0; i < n_pu; ++i) {
      if (in_mpm[i]) {
        cabac_.encode_bypass(mpm_idx[i] != 0);
        if (mpm_idx[i] != 0) cabac_.encode_bypass(mpm_idx[i] - 1);
      } else {
        int c[3] = {cands[i][0], cands[i][1], cands[i][2]};
        std::sort(c, c + 3);
        int rem = modes[i];
        for (int k = 2; k >= 0; --k)
          if (rem > c[k]) --rem;
        cabac_.encode_bypass_bins(rem, 5);
      }
    }
    // chroma (one PU in 4:2:0)
    int cm = m4(rec_.intra_chroma_mode, x0, y0);
    int lm = m4(rec_.intra_luma_mode, x0, y0);
    if (cm == lm) {
      cabac_.encode_bin(&ctx_.ctx[CTX_CHROMA_PRED], 0);
    } else {
      int list[4] = {0, 26, 10, 1};
      for (int k = 0; k < 4; ++k)
        if (list[k] == lm) list[k] = 34;
      int idx = 0;
      for (int k = 0; k < 4; ++k)
        if (list[k] == cm) idx = k;
      cabac_.encode_bin(&ctx_.ctx[CTX_CHROMA_PRED], 1);
      cabac_.encode_bypass_bins(idx, 2);
    }
  }

  // ---- transform tree (spec 7.3.8.8) ----
  void transform_tree(int x0, int y0, int x_base, int y_base, int log2,
                      int tr_depth, int blk_idx, int max_depth,
                      bool intra_split, bool intra) {
    bool split;
    bool forced_split = (log2 > log2i(cfg_.max_tu_size)) ||
                        (intra_split && tr_depth == 0);
    bool forced_leaf =
        (log2 == log2i(cfg_.min_tu_size)) || (tr_depth >= max_depth);
    if (forced_split) {
      split = true;
    } else if (forced_leaf) {
      split = false;
    } else {
      split = m4(rec_.tr_depth, x0, y0) > tr_depth;
      cabac_.encode_bin(&ctx_.ctx[CTX_TRANS_SUBDIV + 5 - log2], split);
    }
    int size = 1 << log2;
    bool parent_cb = tr_depth == 0 ||
                     cbf_chroma_region(rec_.cbf_cb, x_parent_, y_parent_,
                                       size << 1);
    bool parent_cr = tr_depth == 0 ||
                     cbf_chroma_region(rec_.cbf_cr, x_parent_, y_parent_,
                                       size << 1);
    bool cb = cbf_chroma_region(rec_.cbf_cb, x0, y0, size);
    bool cr = cbf_chroma_region(rec_.cbf_cr, x0, y0, size);
    if (log2 > 2) {
      if (parent_cb)
        cabac_.encode_bin(&ctx_.ctx[CTX_CBF_CHROMA + tr_depth], cb);
      if (parent_cr)
        cabac_.encode_bin(&ctx_.ctx[CTX_CBF_CHROMA + tr_depth], cr);
    } else {
      cb = cbf_chroma_region(rec_.cbf_cb, x_base, y_base, size << 1);
      cr = cbf_chroma_region(rec_.cbf_cr, x_base, y_base, size << 1);
    }
    if (split) {
      int half = size >> 1;
      int sx = x_parent_, sy = y_parent_;
      x_parent_ = x0;
      y_parent_ = y0;
      transform_tree(x0, y0, x0, y0, log2 - 1, tr_depth + 1, 0, max_depth,
                     intra_split, intra);
      transform_tree(x0 + half, y0, x0, y0, log2 - 1, tr_depth + 1, 1,
                     max_depth, intra_split, intra);
      transform_tree(x0, y0 + half, x0, y0, log2 - 1, tr_depth + 1, 2,
                     max_depth, intra_split, intra);
      transform_tree(x0 + half, y0 + half, x0, y0, log2 - 1, tr_depth + 1,
                     3, max_depth, intra_split, intra);
      x_parent_ = sx;
      y_parent_ = sy;
      return;
    }
    // leaf
    bool cbf_y = m4(rec_.cbf_y, x0, y0) != 0;
    if (intra || tr_depth != 0 || cb || cr) {
      cabac_.encode_bin(
          &ctx_.ctx[CTX_CBF_LUMA + (tr_depth == 0 ? 1 : 0)], cbf_y);
    } else {
      cbf_y = true;  // inferred
    }
    // transform_unit: cu_qp_delta precedes the residuals of the
    // first TU with any coded cbf (spec 7.3.8.10)
    bool chroma_here = (log2 > 2) ? (cb || cr)
                                  : (blk_idx == 3 && (cb || cr));
    if (qp_pending_ && (cbf_y || chroma_here)) {
      write_cu_qp_delta(pending_qp_ - prev_qp_);
      prev_qp_ = pending_qp_;
      qp_pending_ = false;
    }
    if (cbf_y) residual(x0, y0, log2, 0, intra);
    if (log2 > 2) {
      if (cb) residual(x0, y0, log2 - 1, 1, intra);
      if (cr) residual(x0, y0, log2 - 1, 2, intra);
    } else if (blk_idx == 3) {
      if (cb) residual(x_base, y_base, 2, 1, intra);
      if (cr) residual(x_base, y_base, 2, 2, intra);
    }
  }

  void write_cu_qp_delta(int d) {
    int a = d < 0 ? -d : d;
    // cu_qp_delta_abs: TU(5) prefix (first bin ctx 0, rest ctx 1),
    // then EG0 bypass suffix; bypass sign (spec 9.3.3.10)
    int prefix = a < 5 ? a : 5;
    for (int i = 0; i < prefix; ++i)
      cabac_.encode_bin(&ctx_.ctx[CTX_DQP + (i == 0 ? 0 : 1)], 1);
    if (prefix < 5)
      cabac_.encode_bin(&ctx_.ctx[CTX_DQP + (prefix == 0 ? 0 : 1)], 0);
    else {
      // EG0 suffix of a-5 (spec 9.3.3.3: ONES-terminated prefix)
      uint32_t sym = static_cast<uint32_t>(a - 5);
      int k = 0;
      while (sym >= (1u << k)) {
        cabac_.encode_bypass(1);
        sym -= 1u << k;
        ++k;
      }
      cabac_.encode_bypass(0);
      while (k--) cabac_.encode_bypass((sym >> k) & 1);
    }
    if (a) cabac_.encode_bypass(d < 0);
  }

  // ---- residual coding (spec 7.3.8.11) ----
  int scan_idx_for(int x0, int y0, int log2, int c_idx, bool intra) const {
    if (!intra) return 0;
    if (log2 == 2 || (log2 == 3 && c_idx == 0)) {
      int mode = c_idx == 0 ? m4(rec_.intra_luma_mode, x0, y0)
                            : m4(rec_.intra_chroma_mode, x0, y0);
      if (mode >= 6 && mode <= 14) return 2;
      if (mode >= 22 && mode <= 30) return 1;
    }
    return 0;
  }

  void residual(int x0, int y0, int log2, int c_idx, bool intra) {
    const double fb0 = cabac_.frac_bits();  // calibration bracket
    c1_of_prev_cg_ = 1;  // greater1 context-set state resets per TB
    int n = 1 << log2;
    int16_t blk[32 * 32];
    if (c_idx == 0) {
      for (int r = 0; r < n; ++r)
        memcpy(blk + r * n, rec_.coeff_y + (y0 + r) * w_ + x0,
               n * sizeof(int16_t));
    } else {
      const int16_t* pl = c_idx == 1 ? rec_.coeff_cb : rec_.coeff_cr;
      int cw = w_ >> 1, cx = x0 >> 1, cy = y0 >> 1;
      for (int r = 0; r < n; ++r)
        memcpy(blk + r * n, pl + (cy + r) * cw + cx, n * sizeof(int16_t));
    }
    int scan_idx = scan_idx_for(x0, y0, log2, c_idx, intra);
    const auto& scan = g_scans.scan[log2 - 2][scan_idx];
    int num = n * n;
    int last = -1;
    for (int i = num - 1; i >= 0; --i)
      if (blk[scan[i]] != 0) {
        last = i;
        break;
      }
    if (last < 0) return;  // must not happen (cbf set)

    // last significant coefficient position
    int lx = scan[last] % n, ly = scan[last] / n;
    if (scan_idx == 2) std::swap(lx, ly);
    write_last_xy(lx, ly, log2, c_idx);

    int last_cg = last >> 4;
    uint8_t cg_flags[64] = {0};
    for (int i = 0; i <= last; ++i)
      if (blk[scan[i]]) cg_flags[i >> 4] = 1;
    int ncg_side = n >> 2;

    uint32_t go_rice_cap = 0;
    (void)go_rice_cap;
    for (int cg = last_cg; cg >= 0; --cg) {
      int cg_raster = scan[cg * 16] / 4;  // position of CG in CG grid
      int cg_x = (scan[cg * 16] % n) >> 2;
      int cg_y = (scan[cg * 16] / n) >> 2;
      (void)cg_raster;
      bool infer_sb_dc = false;
      if (cg < last_cg && cg > 0) {
        int right = (cg_x + 1 < ncg_side)
                        ? cg_coded(cg_flags, scan, cg_x + 1, cg_y, n)
                        : 0;
        int below = (cg_y + 1 < ncg_side)
                        ? cg_coded(cg_flags, scan, cg_x, cg_y + 1, n)
                        : 0;
        int ctx = (c_idx ? 2 : 0) + std::min(right + below, 1);
        cabac_.encode_bin(&ctx_.ctx[CTX_SIG_CG + ctx], cg_flags[cg]);
        infer_sb_dc = true;
        if (!cg_flags[cg]) continue;
      }
      // cg == 0 and cg == last_cg have coded_sub_block_flag inferred 1:
      // their significance maps are always coded, even if CG0 is empty.
      int pattern = sig_pattern(cg_flags, scan, cg_x, cg_y, n);

      // significance map
      int first_pos = cg * 16;
      int start = (cg == last_cg) ? last - 1 : cg * 16 + 15;
      int sig_cnt = (cg == last_cg) ? 1 : 0;
      int abs_coeff[16];
      int sign_bits[16];
      int nsig = 0;
      if (cg == last_cg) {
        abs_coeff[nsig] = std::abs(static_cast<int>(blk[scan[last]]));
        sign_bits[nsig] = blk[scan[last]] < 0;
        ++nsig;
      }
      int first_nz_pos = last, last_nz_pos = -1;
      if (cg == last_cg) {
        first_nz_pos = last;
        last_nz_pos = last;
      }
      for (int i = start; i >= first_pos; --i) {
        int v = blk[scan[i]];
        int sig = v != 0;
        bool infer = infer_sb_dc && (i == first_pos) && (sig_cnt == 0);
        if (!infer) {
          int ctx =
              sig_ctx(scan[i] % n, scan[i] / n, log2, c_idx, pattern,
                      cg_x + cg_y, scan_idx);
          cabac_.encode_bin(&ctx_.ctx[CTX_SIG + ctx], sig);
        }
        if (sig) {
          abs_coeff[nsig] = std::abs(v);
          sign_bits[nsig] = v < 0;
          ++nsig;
          ++sig_cnt;
          if (i < first_nz_pos) first_nz_pos = i;
          if (i > last_nz_pos || last_nz_pos < 0) last_nz_pos = i;
        }
      }
      if (cg == last_cg) {
        if (last < first_nz_pos) first_nz_pos = last;
        if (last > last_nz_pos) last_nz_pos = last;
      }
      // NOTE: abs_coeff[] is in coding order (reverse scan: high freq
      // first);  first_nz_pos/last_nz_pos are scan positions.

      if (nsig == 0) continue;  // empty implied CG0: sig map only

      bool sign_hidden = cfg_.sign_hiding &&
                         (last_nz_pos - first_nz_pos) >= 4;

      // greater1 flags
      int ctx_set = (cg > 0 && c_idx == 0) ? 2 : 0;
      if (!c1_of_prev_cg_) ctx_set += 1;
      int c1 = 1;
      int num_c1 = std::min(nsig, 8);
      int first_c2 = -1;
      for (int i = 0; i < num_c1; ++i) {
        int bin = abs_coeff[i] > 1;
        cabac_.encode_bin(
            &ctx_.ctx[CTX_ONE + (c_idx ? 16 : 0) + 4 * ctx_set + c1], bin);
        if (bin) {
          c1 = 0;
          if (first_c2 == -1) first_c2 = i;
        } else if (c1 > 0 && c1 < 3) {
          ++c1;
        }
      }
      c1_of_prev_cg_ = c1;
      if (first_c2 >= 0) {
        cabac_.encode_bin(
            &ctx_.ctx[CTX_ABS + (c_idx ? 4 : 0) + ctx_set],
            abs_coeff[first_c2] > 2);
      }
      // signs (coding order = reverse scan), hidden sign is the last in
      // coding order (= first_nz in scan order)
      for (int i = 0; i < nsig; ++i) {
        if (sign_hidden && i == nsig - 1) continue;
        cabac_.encode_bypass(sign_bits[i]);
      }
      // remaining levels
      int rice = 0;
      int first_coeff2 = 1;
      for (int i = 0; i < nsig; ++i) {
        int base = (i < 8) ? (2 + first_coeff2) : 1;
        if (abs_coeff[i] >= base) {
          write_remain(abs_coeff[i] - base, rice);
          if (abs_coeff[i] > (3 << rice)) rice = std::min(rice + 1, 4);
        }
        if (abs_coeff[i] >= 2) first_coeff2 = 0;
      }
    }
    double d = cabac_.frac_bits() - fb0;
    resid_frac_bits_ += d;
    resid_frac_by_c_[c_idx] += d;
    ++resid_tb_count_[c_idx == 0 ? 0 : 1];
  }

  static int cg_coded(const uint8_t* cg_flags,
                      const std::vector<uint16_t>& scan, int cg_x, int cg_y,
                      int n) {
    // find scan CG index of CG (cg_x, cg_y)
    int ncg = (n >> 2);
    for (int cg = 0; cg < ncg * ncg; ++cg) {
      int px = (scan[cg * 16] % n) >> 2;
      int py = (scan[cg * 16] / n) >> 2;
      if (px == cg_x && py == cg_y) return cg_flags[cg];
    }
    return 0;
  }

  int sig_pattern(const uint8_t* cg_flags, const std::vector<uint16_t>& scan,
                  int cg_x, int cg_y, int n) const {
    int ncg = n >> 2;
    int right = (cg_x + 1 < ncg) ? cg_coded(cg_flags, scan, cg_x + 1, cg_y, n)
                                 : 0;
    int below = (cg_y + 1 < ncg) ? cg_coded(cg_flags, scan, cg_x, cg_y + 1, n)
                                 : 0;
    return right + 2 * below;
  }

  int sig_ctx(int x, int y, int log2, int c_idx, int pattern, int cg_sum,
              int scan_idx) const {
    if (log2 == 2) {
      int s = kCtxIndMap4x4[4 * y + x];
      return c_idx == 0 ? s : 27 + s;
    }
    if (x == 0 && y == 0) return c_idx == 0 ? 0 : 27;
    int xp = x & 3, yp = y & 3;
    int s;
    switch (pattern) {
      case 0:
        s = (xp + yp == 0) ? 2 : (xp + yp < 3) ? 1 : 0;
        break;
      case 1:
        s = (yp == 0) ? 2 : (yp == 1) ? 1 : 0;
        break;
      case 2:
        s = (xp == 0) ? 2 : (xp == 1) ? 1 : 0;
        break;
      default:
        s = 2;
    }
    if (c_idx == 0) {
      if (cg_sum > 0) s += 3;
      if (log2 == 3) s += (scan_idx == 0) ? 9 : 15;
      else s += 21;
      return s;
    }
    if (log2 == 3) s += 9;
    else s += 12;
    return 27 + s;
  }

  void write_last_xy(int lx, int ly, int log2, int c_idx) {
    int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
    int cmax = (log2 << 1) - 1;
    int off, shift;
    if (c_idx == 0) {
      off = 3 * (log2 - 2) + ((log2 - 1) >> 2);
      shift = (log2 + 1) >> 2;
    } else {
      off = 15;
      shift = log2 - 2;
    }
    for (int b = 0; b < gx; ++b)
      cabac_.encode_bin(&ctx_.ctx[CTX_LAST_X + off + (b >> shift)], 1);
    if (gx < cmax)
      cabac_.encode_bin(&ctx_.ctx[CTX_LAST_X + off + (gx >> shift)], 0);
    for (int b = 0; b < gy; ++b)
      cabac_.encode_bin(&ctx_.ctx[CTX_LAST_Y + off + (b >> shift)], 1);
    if (gy < cmax)
      cabac_.encode_bin(&ctx_.ctx[CTX_LAST_Y + off + (gy >> shift)], 0);
    if (gx > 3) {
      int nbits = (gx - 2) >> 1;
      cabac_.encode_bypass_bins(lx - kMinInGroup[gx], nbits);
    }
    if (gy > 3) {
      int nbits = (gy - 2) >> 1;
      cabac_.encode_bypass_bins(ly - kMinInGroup[gy], nbits);
    }
  }

  void write_remain(uint32_t v, int rice) {  // spec 9.3.3.13
    if (v < (3u << rice)) {
      uint32_t len = v >> rice;
      for (uint32_t i = 0; i < len; ++i) cabac_.encode_bypass(1);
      cabac_.encode_bypass(0);
      cabac_.encode_bypass_bins(v & ((1 << rice) - 1), rice);
    } else {
      int len = rice;
      v -= 3u << rice;
      while (v >= (1u << len)) {
        v -= 1u << len;
        ++len;
      }
      int prefix = 3 + len + 1 - rice;
      cabac_.encode_bypass_bins((1u << prefix) - 2, prefix);
      cabac_.encode_bypass_bins(v, len);
    }
  }

  HevcCfg cfg_;
  FrameRec rec_;
  Bitstream bs_;
  CabacEncoder cabac_;
  ContextSet ctx_;
  int w_, h_, w4_, h4_, ctu_log2_, min_cu_log2_, ctus_x_, ctus_y_;
  int cw_ = 0, ch_ = 0;   // coded picture dims (<= strides w_, h_)
  bool is_p_ = false;
  // tiles (uniform spacing, spec 6.5.1)
  int tcols_ = 1, trows_ = 1;
  bool tiled_ = false;
  std::vector<int> tile_of_ctu_, ctu_rank_, col_bd_, row_bd_;
  std::vector<uint8_t> d_merge_, d_mergeidx_, d_skip_, d_mvp_;
  std::vector<int16_t> d_mvdx_, d_mvdy_;
  int x_parent_ = 0, y_parent_ = 0;
  int c1_of_prev_cg_ = 1;

 public:
  // live-context calibration counters (residual_coding() only)
  double resid_frac_bits_ = 0.0;
  double resid_frac_by_c_[3] = {0.0, 0.0, 0.0};
  int64_t resid_tb_count_[2] = {0, 0};
};

}  // namespace

std::vector<uint8_t> encode_slice_rbsp(const HevcCfg* cfg,
                                       const FrameRec* rec,
                                       double* resid_bits) {
  SliceWriter w(cfg, rec);
  std::vector<uint8_t> out = w.encode();
  if (resid_bits) {
    resid_bits[0] = w.resid_frac_bits_;
    resid_bits[1] = w.resid_frac_by_c_[0];
    resid_bits[2] = w.resid_frac_by_c_[1];
    resid_bits[3] = w.resid_frac_by_c_[2];
  }
  return out;
}

std::vector<uint8_t> encode_slice_rbsp(const HevcCfg* cfg,
                                       const FrameRec* rec) {
  return encode_slice_rbsp(cfg, rec, nullptr);
}

}  // namespace hevc
