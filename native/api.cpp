// api.cpp — C ABI entry points (ctypes-consumable).
#include <cstring>
#include <vector>

#include "bitstream.h"
#include "cabac.h"
#include "hevc_types.h"

namespace hevc {
void write_parameter_sets_impl(const HevcCfg* cfg, std::vector<uint8_t>& out);
std::vector<uint8_t> encode_slice_rbsp(const HevcCfg* cfg,
                                       const FrameRec* rec);
std::vector<uint8_t> encode_slice_rbsp(const HevcCfg* cfg,
                                       const FrameRec* rec,
                                       double* resid_bits);
}  // namespace hevc

extern "C" {

int32_t hevc_write_parameter_sets(const HevcCfg* cfg, uint8_t* out,
                                  int32_t cap) {
  std::vector<uint8_t> buf;
  hevc::write_parameter_sets_impl(cfg, buf);
  if (static_cast<int32_t>(buf.size()) > cap) return -1;
  memcpy(out, buf.data(), buf.size());
  return static_cast<int32_t>(buf.size());
}

// stats[0] (optional, may be null): live-context fractional CABAC bits
// spent inside residual_coding() — the calibration target for the
// device-side rdbits estimator.
int32_t hevc_encode_slice_stats(const HevcCfg* cfg, const FrameRec* rec,
                                uint8_t* out, int32_t cap,
                                double* stats) {
  std::vector<uint8_t> rbsp = hevc::encode_slice_rbsp(cfg, rec, stats);
  std::vector<uint8_t> nalu;
  nalu.reserve(rbsp.size() + 16);
  int nal_type = rec->is_idr ? 19 /*IDR_W_RADL*/ : 1 /*TRAIL_R*/;
  hevc::Bitstream::write_nalu(nalu, nal_type, 0, rbsp);
  if (static_cast<int32_t>(nalu.size()) > cap) return -1;
  memcpy(out, nalu.data(), nalu.size());
  return static_cast<int32_t>(nalu.size());
}

int32_t hevc_encode_slice(const HevcCfg* cfg, const FrameRec* rec,
                          uint8_t* out, int32_t cap) {
  std::vector<uint8_t> rbsp = hevc::encode_slice_rbsp(cfg, rec);
  std::vector<uint8_t> nalu;
  nalu.reserve(rbsp.size() + 16);
  int nal_type = rec->is_idr ? 19 /*IDR_W_RADL*/ : 1 /*TRAIL_R*/;
  hevc::Bitstream::write_nalu(nalu, nal_type, 0, rbsp);
  if (static_cast<int32_t>(nalu.size()) > cap) return -1;
  memcpy(out, nalu.data(), nalu.size());
  return static_cast<int32_t>(nalu.size());
}

}  // extern "C"

// CABAC engine self-test hook: encodes a bin sequence (kinds: 0 = ctx
// bin on context (arg>>1) of a small pool, 1 = bypass) terminated by
// encode_terminate(1) + finish, so a mirrored spec decoder can fuzz the
// engine in isolation.
extern "C" int32_t hevc_cabac_selftest(const uint8_t* kinds,
                                       const uint8_t* bins, int32_t n,
                                       uint8_t* out, int32_t cap) {
  hevc::Bitstream bs;
  hevc::CabacEncoder enc(&bs);
  uint8_t ctxs[8];
  for (int i = 0; i < 8; ++i) ctxs[i] = hevc::ctx_init(i * 31 + 7, 30);
  enc.start();
  for (int32_t i = 0; i < n; ++i) {
    if (kinds[i] & 1)
      enc.encode_bypass(bins[i]);
    else
      enc.encode_bin(&ctxs[(kinds[i] >> 1) & 7], bins[i]);
  }
  enc.encode_terminate(1);
  enc.finish();
  const auto& b = bs.bytes();
  if (static_cast<int32_t>(b.size()) > cap) return -1;
  memcpy(out, b.data(), b.size());
  return static_cast<int32_t>(b.size());
}
