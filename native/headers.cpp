// headers.cpp — VPS/SPS/PPS and slice-header writers (spec 7.3.2/7.3.6).
// Host layer of the TPU-native framework (role of ref hmr_headers.c,
// written directly from the spec syntax tables).
#include <cmath>
#include <vector>

#include "bitstream.h"
#include "hevc_types.h"

namespace hevc {

namespace {

int log2i(int v) {
  int l = 0;
  while ((1 << l) < v) ++l;
  return l;
}

void profile_tier_level(Bitstream& b) {
  b.put(0, 2);        // general_profile_space
  b.put(0, 1);        // general_tier_flag
  b.put(1, 5);        // general_profile_idc = Main
  uint32_t compat = 0;
  compat |= 1u << (31 - 1);  // Main
  compat |= 1u << (31 - 2);  // Main10 accepts Main
  b.put(compat, 32);
  b.put(1, 1);  // general_progressive_source_flag
  b.put(0, 1);  // general_interlaced_source_flag
  b.put(0, 1);  // general_non_packed_constraint_flag
  b.put(1, 1);  // general_frame_only_constraint_flag
  b.put(0, 22);  // general_reserved_zero_44bits
  b.put(0, 22);
  b.put(123, 8);  // general_level_idc = 4.1
}

void short_term_rps(Bitstream& b, int num_negative) {
  b.ue(num_negative);  // num_negative_pics
  b.ue(0);             // num_positive_pics
  for (int i = 0; i < num_negative; ++i) {
    b.ue(0);       // delta_poc_s0_minus1 (delta 1 each)
    b.put(1, 1);   // used_by_curr_pic_s0_flag
  }
}

std::vector<uint8_t> make_vps(const HevcCfg* cfg) {
  Bitstream b;
  b.put(0, 4);       // vps_video_parameter_set_id
  b.put(3, 2);       // vps_base_layer_internal/available (reserved 3)
  b.put(0, 6);       // vps_max_layers_minus1
  b.put(0, 3);       // vps_max_sub_layers_minus1
  b.put(1, 1);       // vps_temporal_id_nesting_flag
  b.put(0xffff, 16); // vps_reserved_0xffff_16bits
  profile_tier_level(b);
  b.put(0, 1);       // vps_sub_layer_ordering_info_present_flag
  b.ue(cfg->num_ref_frames);  // vps_max_dec_pic_buffering_minus1
  b.ue(0);           // vps_max_num_reorder_pics
  b.ue(0);           // vps_max_latency_increase_plus1
  b.put(0, 6);       // vps_max_layer_id
  b.ue(0);           // vps_num_layer_sets_minus1
  b.put(0, 1);       // vps_timing_info_present_flag
  b.put(0, 1);       // vps_extension_flag
  b.rbsp_trailing();
  return b.bytes();
}

std::vector<uint8_t> make_sps(const HevcCfg* cfg) {
  Bitstream b;
  b.put(0, 4);  // sps_video_parameter_set_id
  b.put(0, 3);  // sps_max_sub_layers_minus1
  b.put(1, 1);  // sps_temporal_id_nesting_flag
  profile_tier_level(b);
  b.ue(0);  // sps_seq_parameter_set_id
  b.ue(1);  // chroma_format_idc 4:2:0
  // CODED picture dims (min-CU multiple; width/height are the padded
  // plane strides when coded_* set — implicit boundary splits cover
  // the partial CTUs, spec 7.3.8.4)
  b.ue(cfg->coded_width > 0 ? cfg->coded_width : cfg->width);
  b.ue(cfg->coded_height > 0 ? cfg->coded_height : cfg->height);
  const bool conf = cfg->conf_win_right || cfg->conf_win_bottom;
  b.put(conf, 1);
  if (conf) {
    b.ue(0);
    b.ue(cfg->conf_win_right);
    b.ue(0);
    b.ue(cfg->conf_win_bottom);
  }
  b.ue(cfg->bit_depth - 8);  // luma
  b.ue(cfg->bit_depth - 8);  // chroma
  b.ue(4);                   // log2_max_pic_order_cnt_lsb_minus4 -> 8 bits
  b.put(0, 1);               // sps_sub_layer_ordering_info_present_flag
  b.ue(cfg->num_ref_frames);
  b.ue(0);
  b.ue(0);
  b.ue(log2i(cfg->min_cu_size) - 3);
  b.ue(log2i(cfg->ctu_size) - log2i(cfg->min_cu_size));
  b.ue(log2i(cfg->min_tu_size) - 2);
  b.ue(log2i(cfg->max_tu_size) - log2i(cfg->min_tu_size));
  b.ue(cfg->max_inter_tr_depth);
  b.ue(cfg->max_intra_tr_depth);
  b.put(cfg->scaling_list_enabled ? 1 : 0, 1);  // scaling_list_enabled_flag
  if (cfg->scaling_list_enabled)
    b.put(0, 1);  // sps_scaling_list_data_present_flag -> default lists
  b.put(0, 1);  // amp_enabled_flag
  b.put(cfg->sao_enabled ? 1 : 0, 1);
  b.put(0, 1);  // pcm_enabled_flag
  b.ue(1);      // num_short_term_ref_pic_sets
  short_term_rps(b, cfg->num_ref_frames);
  b.put(0, 1);  // long_term_ref_pics_present_flag
  b.put(0, 1);  // sps_temporal_mvp_enabled_flag
  b.put(cfg->strong_intra_smoothing ? 1 : 0, 1);
  b.put(0, 1);  // vui_parameters_present_flag
  b.put(0, 1);  // sps_extension_present_flag
  b.rbsp_trailing();
  return b.bytes();
}

std::vector<uint8_t> make_pps(const HevcCfg* cfg) {
  Bitstream b;
  b.ue(0);      // pps_pic_parameter_set_id
  b.ue(0);      // pps_seq_parameter_set_id
  b.put(0, 1);  // dependent_slice_segments_enabled_flag
  b.put(0, 1);  // output_flag_present_flag
  b.put(0, 3);  // num_extra_slice_header_bits
  b.put(cfg->sign_hiding ? 1 : 0, 1);
  b.put(0, 1);  // cabac_init_present_flag
  b.ue(0);      // num_ref_idx_l0_default_active_minus1
  b.ue(0);      // num_ref_idx_l1_default_active_minus1
  b.se(cfg->init_qp - 26);
  b.put(0, 1);  // constrained_intra_pred_flag
  b.put(0, 1);  // transform_skip_enabled_flag
  b.put(cfg->cu_qp_delta_enabled ? 1 : 0, 1);
  if (cfg->cu_qp_delta_enabled) b.ue(cfg->diff_cu_qp_delta_depth);
  b.se(cfg->chroma_qp_offset);  // pps_cb_qp_offset
  b.se(cfg->chroma_qp_offset);  // pps_cr_qp_offset
  b.put(0, 1);  // pps_slice_chroma_qp_offsets_present_flag
  b.put(0, 1);  // weighted_pred_flag
  b.put(0, 1);  // weighted_bipred_flag
  b.put(0, 1);  // transquant_bypass_enabled_flag
  bool tiles = cfg->tile_cols > 1 || cfg->tile_rows > 1;
  b.put(tiles ? 1 : 0, 1);  // tiles_enabled_flag
  b.put(cfg->wpp_enabled ? 1 : 0, 1);  // entropy_coding_sync (WPP)
  if (tiles) {
    b.ue(cfg->tile_cols - 1);  // num_tile_columns_minus1
    b.ue(cfg->tile_rows - 1);  // num_tile_rows_minus1
    b.put(1, 1);               // uniform_spacing_flag (spec 6.5.1)
    b.put(1, 1);               // loop_filter_across_tiles_enabled_flag
  }
  b.put(1, 1);  // pps_loop_filter_across_slices_enabled_flag
  b.put(1, 1);  // deblocking_filter_control_present_flag
  b.put(0, 1);  // deblocking_filter_override_enabled_flag
  b.put(cfg->deblock_disabled ? 1 : 0, 1);
  if (!cfg->deblock_disabled) {
    b.se(0);  // pps_beta_offset_div2
    b.se(0);  // pps_tc_offset_div2
  }
  b.put(0, 1);  // pps_scaling_list_data_present_flag
  b.put(0, 1);  // lists_modification_present_flag
  b.ue(0);      // log2_parallel_merge_level_minus2
  b.put(0, 1);  // slice_segment_header_extension_present_flag
  b.put(0, 1);  // pps_extension_present_flag
  b.rbsp_trailing();
  return b.bytes();
}

}  // namespace

// Slice header bits (up to and including byte alignment); used by the
// slice encoder in syntax.cpp.  entry_offsets: WPP substream sizes in
// NAL-unit bytes (entry_point_offset_minus1 + 1 each), empty when the
// slice is a single substream (ref hmr_headers.c:581-610).
void write_slice_header(Bitstream& b, const HevcCfg* cfg,
                        const FrameRec* rec,
                        const std::vector<uint32_t>& entry_offsets) {
  b.put(1, 1);  // first_slice_segment_in_pic_flag
  if (rec->is_idr) b.put(0, 1);  // no_output_of_prior_pics_flag
  b.ue(0);                       // slice_pic_parameter_set_id
  b.ue(rec->slice_type);         // 2 = I, 1 = P
  if (!rec->is_idr) {
    b.put(rec->poc & 0xff, 8);   // slice_pic_order_cnt_lsb
    int nref = rec->num_ref_l0 > 0 ? rec->num_ref_l0 : 1;
    if (nref < cfg->num_ref_frames) {
      // fewer pictures in the DPB than the SPS RPS claims (first P
      // frames after an IDR): write a slice-local RPS.  stRpsIdx =
      // num_short_term_ref_pic_sets (1) != 0, so the
      // inter_ref_pic_set_prediction_flag is present (spec 7.3.7).
      b.put(0, 1);               // short_term_ref_pic_set_sps_flag
      b.put(0, 1);               // inter_ref_pic_set_prediction_flag
      short_term_rps(b, nref);
    } else {
      b.put(1, 1);               // short_term_ref_pic_set_sps_flag
      // single RPS in SPS -> no index
    }
  }
  if (cfg->sao_enabled) {
    b.put(rec->sao_luma ? 1 : 0, 1);
    b.put(rec->sao_chroma ? 1 : 0, 1);
  }
  if (rec->slice_type != 2) {
    int nref = rec->num_ref_l0 > 0 ? rec->num_ref_l0 : 1;
    if (nref != 1) {
      // PPS default is 1 active ref; multi-ref slices override
      b.put(1, 1);  // num_ref_idx_active_override_flag
      b.ue(nref - 1);  // num_ref_idx_l0_active_minus1
    } else {
      b.put(0, 1);  // num_ref_idx_active_override_flag
    }
    b.ue(5 - rec->num_merge_cands);  // five_minus_max_num_merge_cand
  }
  b.se(rec->slice_qp - cfg->init_qp);
  // spec: present iff pps_loop_filter_across_slices_enabled_flag &&
  // (slice_sao_luma || slice_sao_chroma || !deblocking_disabled)
  if (rec->sao_luma || rec->sao_chroma || !cfg->deblock_disabled) {
    b.put(1, 1);  // slice_loop_filter_across_slices_enabled_flag
  }
  if (cfg->wpp_enabled || cfg->tile_cols > 1 || cfg->tile_rows > 1) {
    b.ue(static_cast<uint32_t>(entry_offsets.size()));
    if (!entry_offsets.empty()) {
      uint32_t maxv = 1;
      for (uint32_t o : entry_offsets) maxv = std::max(maxv, o);
      int len = 1;
      while ((1u << len) < maxv) ++len;  // bits for (offset-1) values
      b.ue(static_cast<uint32_t>(len - 1));
      for (uint32_t o : entry_offsets) b.put(o - 1, len);
    }
  }
  // byte_alignment()
  b.put_bit(1);
  b.align_zero();
}

void write_parameter_sets_impl(const HevcCfg* cfg,
                               std::vector<uint8_t>& out) {
  Bitstream::write_nalu(out, 32, 0, make_vps(cfg));
  Bitstream::write_nalu(out, 33, 0, make_sps(cfg));
  Bitstream::write_nalu(out, 34, 0, make_pps(cfg));
}

}  // namespace hevc
