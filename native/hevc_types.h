// hevc_types.h — C ABI shared between the host entropy library and Python.
//
// The device (JAX/Pallas) side of the framework produces dense per-4x4
// decision maps + raster coefficient planes ("FrameRec"); this host
// library walks them in HEVC coding order and emits the Annex-B
// bitstream (headers + CABAC slice data).  This is the TPU-native
// replacement for the reference's entropy layer
// (ref: hmr_arithmetic_encoding.c / hmr_binary_encoding.c /
//  hmr_bitstream.c / hmr_headers.c), re-designed around a
// record-driven, stateless-per-call API so slices can be entropy-coded
// on host threads pipelined behind device compute.
#ifndef HEVC_TYPES_H
#define HEVC_TYPES_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct HevcCfg {
  int32_t width;             // padded luma width  (multiple of ctu_size)
  int32_t height;            // padded luma height
  int32_t conf_win_right;    // conformance window, chroma units
  int32_t conf_win_bottom;
  int32_t ctu_size;          // 16/32/64
  int32_t min_cu_size;       // usually 8
  int32_t min_tu_size;       // 4
  int32_t max_tu_size;       // 32
  int32_t max_intra_tr_depth;  // max_transform_hierarchy_depth_intra
  int32_t max_inter_tr_depth;
  int32_t init_qp;           // PPS init_qp_minus26 + 26
  int32_t sign_hiding;       // PPS sign_data_hiding_enabled_flag
  int32_t sao_enabled;       // SPS sample_adaptive_offset_enabled_flag
  int32_t deblock_disabled;  // PPS deblocking off
  int32_t num_ref_frames;
  int32_t bit_depth;         // 8
  int32_t strong_intra_smoothing;  // SPS flag (0 in round 1)
  int32_t cu_qp_delta_enabled;     // PPS (0 = fixed QP)
  int32_t diff_cu_qp_delta_depth;
  int32_t frame_rate_num;
  int32_t frame_rate_den;
  int32_t chroma_qp_offset;
  int32_t scaling_list_enabled;  // SPS flag; 1 = default lists
  int32_t wpp_enabled;  // PPS entropy_coding_sync: one substream per
                        // CTU row + entry points (ref WPP syntax,
                        // hmr_encoder_lib.c:785-804, hmr_headers.c:581)
  int32_t tile_cols;    // PPS tiles (uniform spacing, spec 6.5.1);
  int32_t tile_rows;    // <=1 each = no tiles; mutually exclusive with
                        // wpp_enabled (Main profile allows either)
  int32_t coded_width;   // CODED picture dims (multiple of min CU; the
  int32_t coded_height;  // SPS dims).  0 = width/height (legacy
                         // CTU-padded coding).  width/height stay the
                         // MAP/COEFF plane strides; CUs beyond the
                         // coded bounds are never walked (implicit
                         // boundary splits, spec 7.3.8.4).
} HevcCfg;

// Per-4x4-block dense maps, row-major [height/4][width/4].
// Coefficients are raster planes (luma [h][w], chroma [h/2][w/2]) of
// quantized levels; the writer extracts TU blocks and scans them.
typedef struct FrameRec {
  const uint8_t* cu_depth;          // CTU-relative depth, CU = ctu >> d
  const uint8_t* pred_mode;         // 1 = intra, 0 = inter
  const uint8_t* part_size;         // 0 = 2Nx2N, 1 = NxN (intra, max depth)
  const uint8_t* intra_luma_mode;   // 0..34 per 4x4 (per-PU granular)
  const uint8_t* intra_chroma_mode; // actual chroma mode 0..34
  const uint8_t* tr_depth;          // TU split depth relative to CU
  const uint8_t* cbf_y;             // leaf-TU granular
  const uint8_t* cbf_cb;            // per-depth chroma cbf: bit d = cbf at
  const uint8_t* cbf_cr;            //   trafodepth d (supports split TUs)
  const int8_t*  qp_map;            // QP per 4x4 block
  const int16_t* coeff_y;
  const int16_t* coeff_cb;
  const int16_t* coeff_cr;
  // inter fields (P slices)
  const uint8_t* skip_flag;
  const uint8_t* merge_flag;
  const uint8_t* merge_idx;
  const int16_t* mv_x;              // quarter-pel, per 4x4
  const int16_t* mv_y;
  const int16_t* mvd_x;             // signalled MVD
  const int16_t* mvd_y;
  const uint8_t* mvp_idx;
  const uint8_t* ref_idx;
  // SAO per-CTU params: [ctus][3] each; type: 0=off,1=BO,2..5=EO class,
  // merge: 0=new,1=left,2=above;  offsets [ctus][3][4]; band_pos [ctus][3]
  const uint8_t* sao_merge;         // per ctu: 0 new, 1 left, 2 above
  const uint8_t* sao_type;          // per ctu per comp
  const int8_t*  sao_offset;        // per ctu per comp, 4 values
  const uint8_t* sao_band_pos;      // per ctu per comp
  int32_t slice_type;               // 2 = I, 1 = P, 0 = B
  int32_t poc;
  int32_t slice_qp;
  int32_t is_idr;
  int32_t num_merge_cands;          // MaxNumMergeCand (2 in fast mode)
  int32_t sao_luma;                 // slice_sao_luma_flag
  int32_t sao_chroma;
  int32_t last_idr_poc;             // for POC LSB computation
  int32_t num_ref_l0;               // active list0 refs (1 when
                                    // only one prior pic exists)
} FrameRec;

// Writes VPS+SPS+PPS as Annex-B (with start codes) into out; returns
// byte count or -1 on overflow.
int32_t hevc_write_parameter_sets(const HevcCfg* cfg, uint8_t* out,
                                  int32_t cap);

// Encodes one slice NALU (slice header + CABAC slice data, EBSP-escaped,
// with start code) into out; returns byte count or -1 on overflow.
int32_t hevc_encode_slice(const HevcCfg* cfg, const FrameRec* rec,
                          uint8_t* out, int32_t cap);

#ifdef __cplusplus
}
#endif
#endif  // HEVC_TYPES_H
