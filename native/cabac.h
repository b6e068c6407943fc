// cabac.h — HEVC CABAC binary arithmetic encoder + context models.
// Host-side entropy engine of the TPU-native framework (role of ref
// hmr_binary_encoding.c / hmr_ctx_tables.h, implemented per spec
// 9.3.4.3 with the standard carry-buffered byte-out).
#ifndef HEVC_CABAC_H
#define HEVC_CABAC_H

#include <cmath>
#include <cstdint>
#include <cstring>

#include "bitstream.h"

namespace hevc {

// spec Table 9-46 rangeTabLPS
extern const uint8_t kLpsTable[64][4];
// spec Table 9-47 transIdxLPS (MPS transition is min(s+1, 62))
extern const uint8_t kNextStateLps[64];
// renorm shift by (lps >> 3)
extern const uint8_t kRenormTable[32];

// Context state packed as (pState << 1) | valMps.
inline uint8_t ctx_init(int init_value, int qp) {
  qp = qp < 0 ? 0 : (qp > 51 ? 51 : qp);
  int slope = (init_value >> 4) * 5 - 45;
  int offset = ((init_value & 15) << 3) - 16;
  int s = ((slope * qp) >> 4) + offset;
  s = s < 1 ? 1 : (s > 126 ? 126 : s);
  int mps = s >= 64;
  return static_cast<uint8_t>(((mps ? s - 64 : 63 - s) << 1) | mps);
}

// Fractional bit-cost table for the live-context counter (role of the
// reference's g_bc_entropy_bits, hmr_binary_encoding.c:280): cost in
// bits of coding the MPS / LPS in each of the 64 states, from the
// standard CABAC state probability model p_lps(s) = 0.5 * alpha^s,
// alpha = (0.01875 / 0.5)^(1/63).
inline const double* bin_cost_table() {
  static double t[128];
  static bool init = false;
  if (!init) {
    const double alpha = std::pow(0.01875 / 0.5, 1.0 / 63.0);
    double p = 0.5;
    for (int s = 0; s < 64; ++s) {
      t[2 * s + 0] = -std::log2(1.0 - p);   // MPS cost
      t[2 * s + 1] = -std::log2(p);         // LPS cost
      p *= alpha;
    }
    init = true;
  }
  return t;
}

class CabacEncoder {
 public:
  explicit CabacEncoder(Bitstream* bs) : bs_(bs) {}

  // live-context fractional bit counter (always on; one lookup+add per
  // bin).  frac_bits() deltas bracket syntax regions for calibration.
  double frac_bits() const { return frac_bits_; }

  // retarget the byte sink (WPP substreams: one Bitstream per CTU row)
  void set_stream(Bitstream* bs) { bs_ = bs; }

  void start() {
    low_ = 0;
    range_ = 510;
    bits_left_ = 23;
    num_buffered_ = 0;
    buffered_ = 0xff;
  }

  void encode_bin(uint8_t* ctx, int bin) {
    uint32_t state = *ctx >> 1;
    uint32_t mps = *ctx & 1;
    frac_bits_ += bin_cost_table()[
        2 * state + (static_cast<uint32_t>(bin) != mps ? 1 : 0)];
    uint32_t lps = kLpsTable[state][(range_ >> 6) & 3];
    range_ -= lps;
    if (static_cast<uint32_t>(bin) != mps) {
      int nbits = kRenormTable[lps >> 3];
      low_ = (low_ + range_) << nbits;
      range_ = lps << nbits;
      if (state == 0) mps ^= 1;
      *ctx = static_cast<uint8_t>((kNextStateLps[state] << 1) | mps);
      bits_left_ -= nbits;
      test_write();
    } else {
      uint32_t next = state + 1 > 62 ? 62 : state + 1;
      *ctx = static_cast<uint8_t>((next << 1) | mps);
      if (range_ >= 256) return;
      low_ <<= 1;
      range_ <<= 1;
      --bits_left_;
      test_write();
    }
  }

  void encode_bypass(int bin) {
    frac_bits_ += 1.0;
    low_ <<= 1;
    if (bin) low_ += range_;
    --bits_left_;
    test_write();
  }

  void encode_bypass_bins(uint32_t pattern, int n) {
    for (int i = n - 1; i >= 0; --i) encode_bypass((pattern >> i) & 1);
  }

  void encode_terminate(int bin) {
    range_ -= 2;
    if (bin) {
      low_ = (low_ + range_) << 7;
      range_ = 2 << 7;
      bits_left_ -= 7;
      test_write();
    } else if (range_ < 256) {
      low_ <<= 1;
      range_ <<= 1;
      --bits_left_;
      test_write();
    }
  }

  void finish() {
    if ((low_ >> (32 - bits_left_)) != 0) {
      bs_->put_byte(static_cast<uint8_t>(buffered_ + 1));
      while (num_buffered_ > 1) {
        bs_->put_byte(0x00);
        --num_buffered_;
      }
      low_ -= 1u << (32 - bits_left_);
    } else {
      if (num_buffered_ > 0) bs_->put_byte(static_cast<uint8_t>(buffered_));
      while (num_buffered_ > 1) {
        bs_->put_byte(0xff);
        --num_buffered_;
      }
    }
    bs_->put(low_ >> 8, 24 - bits_left_);
  }

 private:
  void test_write() {
    if (bits_left_ < 12) write_out();
  }
  void write_out() {
    uint32_t lead = low_ >> (24 - bits_left_);
    bits_left_ += 8;
    low_ &= 0xffffffffu >> bits_left_;
    if (lead == 0xff) {
      ++num_buffered_;
    } else if (num_buffered_ > 0) {
      uint32_t carry = lead >> 8;
      bs_->put_byte(static_cast<uint8_t>(buffered_ + carry));
      uint8_t fill = static_cast<uint8_t>((0xff + carry) & 0xff);
      while (num_buffered_ > 1) {
        bs_->put_byte(fill);
        --num_buffered_;
      }
      buffered_ = lead & 0xff;
    } else {
      num_buffered_ = 1;
      buffered_ = lead & 0xff;
    }
  }

  Bitstream* bs_;
  uint32_t low_ = 0;
  uint32_t range_ = 510;
  int bits_left_ = 23;
  int num_buffered_ = 0;
  uint32_t buffered_ = 0xff;
  double frac_bits_ = 0.0;
};

// ---------------------------------------------------------------------
// Context model set, flat array with named offsets.  Layout is our own
// (the framework's context-snapshot ABI for WPP substreams); init
// values are the spec tables (Table 9-5..9-32), rows [B, P, I].
// ---------------------------------------------------------------------

enum CtxOffsets {
  CTX_SPLIT_CU = 0,        // 3
  CTX_SKIP = 3,            // 3
  CTX_MERGE_FLAG = 6,      // 1
  CTX_MERGE_IDX = 7,       // 1
  CTX_PART_SIZE = 8,       // 4
  CTX_PRED_MODE = 12,      // 1
  CTX_INTRA_LUMA = 13,     // 1
  CTX_CHROMA_PRED = 14,    // 2
  CTX_INTER_DIR = 16,      // 5
  CTX_MVD = 21,            // 2
  CTX_REF_PIC = 23,        // 2
  CTX_DQP = 25,            // 3
  CTX_CBF_LUMA = 28,       // 4 (2 used)
  CTX_CBF_CHROMA = 32,     // 4
  CTX_ROOT_CBF = 36,       // 1
  CTX_LAST_X = 37,         // 30 (15 luma + 15 chroma)
  CTX_LAST_Y = 67,         // 30
  CTX_SIG_CG = 97,         // 4 (2 luma + 2 chroma)
  CTX_SIG = 101,           // 42 (27 luma + 15 chroma)
  CTX_ONE = 143,           // 24 (16 luma + 8 chroma)
  CTX_ABS = 167,           // 6 (4 luma + 2 chroma)
  CTX_MVP_IDX = 173,       // 1
  CTX_SAO_MERGE = 174,     // 1
  CTX_SAO_TYPE = 175,      // 1
  CTX_TRANS_SUBDIV = 176,  // 3
  CTX_TQ_BYPASS = 179,     // 1
  NUM_CTX = 180
};

struct ContextSet {
  uint8_t ctx[NUM_CTX];
  // slice_type: 2 = I, 1 = P, 0 = B; qp = slice QP.
  void init(int slice_type, int qp);
};

}  // namespace hevc
#endif
