// bitstream.h — MSB-first bit writer, exp-Golomb, EBSP/NAL packaging.
// TPU-native framework host layer (role of ref hmr_bitstream.c:63-160,
// re-implemented from the HEVC spec).
#ifndef HEVC_BITSTREAM_H
#define HEVC_BITSTREAM_H

#include <cstdint>
#include <vector>

namespace hevc {

class Bitstream {
 public:
  void put(uint32_t value, int nbits) {
    // MSB first
    for (int i = nbits - 1; i >= 0; --i) put_bit((value >> i) & 1);
  }
  void put_bit(int b) {
    cur_ = (cur_ << 1) | (b & 1);
    if (++nbits_ == 8) {
      bytes_.push_back(static_cast<uint8_t>(cur_));
      cur_ = 0;
      nbits_ = 0;
    }
  }
  void put_byte(uint8_t b) {  // requires byte alignment (CABAC output)
    bytes_.push_back(b);
  }
  void ue(uint32_t v) {  // Exp-Golomb unsigned
    uint32_t vp1 = v + 1;
    int len = 0;
    for (uint32_t t = vp1; t > 1; t >>= 1) ++len;
    put(0, len);
    put(vp1, len + 1);
  }
  void se(int32_t v) {  // Exp-Golomb signed: k -> 2|k| - (k>0)
    ue(v <= 0 ? static_cast<uint32_t>(-v) * 2
              : static_cast<uint32_t>(v) * 2 - 1);
  }
  void rbsp_trailing() {
    put_bit(1);
    align_zero();
  }
  void align_zero() {
    while (nbits_ != 0) put_bit(0);
  }
  bool aligned() const { return nbits_ == 0; }
  size_t bit_count() const { return bytes_.size() * 8 + nbits_; }
  const std::vector<uint8_t>& bytes() const { return bytes_; }

  // Append as an Annex-B NALU: start code + NAL header + EBSP-escaped
  // payload (emulation prevention 0x03; spec 7.4.2 / ref
  // hmr_bitstream.c:124-160).
  static void write_nalu(std::vector<uint8_t>& out, int nal_type,
                         int temporal_id, const std::vector<uint8_t>& rbsp,
                         bool long_startcode = true) {
    if (long_startcode) out.push_back(0);
    out.push_back(0);
    out.push_back(0);
    out.push_back(1);
    out.push_back(static_cast<uint8_t>(nal_type << 1));
    out.push_back(static_cast<uint8_t>(temporal_id + 1));
    int zeros = 0;
    for (uint8_t b : rbsp) {
      if (zeros >= 2 && b <= 3) {
        out.push_back(3);
        zeros = 0;
      }
      out.push_back(b);
      zeros = (b == 0) ? zeros + 1 : 0;
    }
  }

 private:
  std::vector<uint8_t> bytes_;
  uint32_t cur_ = 0;
  int nbits_ = 0;
};

}  // namespace hevc
#endif
