"""Intra-frame row-band sharding across chips (the WPP replacement).

The reference's WPP threads own interleaved CTU rows with a 2-CTU
diagonal lag (ref: wfpp_encoder_thread hmr_encoder_lib.c:2357); on TPU
the P-frame pipeline has NO intra-frame dependency at all, so CTU-row
bands shard cleanly over the chip mesh:

* each chip encodes a contiguous band: ME against the (replicated)
  reference picture, MC, transform/quant, reconstruction and the
  vertical deblocking pass — all row-local by construction (vertical
  edges only read/write pixels of their own rows);
* one `all_gather` over the row axis (ICI) assembles the frame, then
  the horizontal deblock pass + SAO run replicated (they are a small
  fraction of frame compute; a halo-exchange version is a later
  optimization);
* the next frame's reference is the gathered result, which is the
  inter-frame dependency exchange (role of the reference's
  synchro_sem[1] frame pipelining, hmr_encoder_lib.c:1948).

Bit-transparency: the sharded program produces exactly the
single-device `encode_p_frame` outputs (asserted in
tests/test_sharding.py) — sharding never changes the bitstream.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from homerhevc_tpu import tables
from homerhevc_tpu.models import inter_frame
from homerhevc_tpu.ops import deblock, interp, me, packing, quant, sao, \
    transform


@functools.partial(
    jax.jit, static_argnames=("mesh", "row_axis", "block", "sign_hiding",
                              "deblocking", "sao_enabled", "ctu",
                              "chroma_rd_scale", "chroma_qp_offset",
                              "scaling_lists", "vis_h", "vis_w"))
def encode_p_frame_rowsharded(y, u, v, ref_y, ref_u, ref_v, *, qp,
                              mesh: Mesh, row_axis: str = "row",
                              block: int = 16, sign_hiding: bool = True,
                              deblocking: bool = True,
                              sao_enabled: bool = True, ctu: int = 64,
                              chroma_rd_scale: float = 1.0,
                              chroma_qp_offset: int = 0,
                              scaling_lists: bool = False,
                              vis_h: int = None, vis_w: int = None):
    """P-frame encode with CTU-row bands sharded over mesh[row_axis].

    Inputs are full planes (uint8/int32); the reference planes are
    replicated (read-only). Returns the single-device output dict
    (replicated).  Intra fallback is not active on this path yet.
    """
    h, w = y.shape
    n = mesh.shape[row_axis]
    assert (h // n) % ctu == 0, "band height must be CTU-aligned"
    s, cs = block, block // 2
    hb = h // n
    sbh_scan = tuple(tables.scan_order(s, tables.SCAN_DIAG)) \
        if sign_hiding else None
    sbh_scan_c = tuple(tables.scan_order(cs, tables.SCAN_DIAG)) \
        if sign_hiding else None
    qp = jnp.asarray(qp, jnp.int32)
    qp_c = jnp.asarray(tables.CHROMA_QP_TABLE)[
        jnp.clip(qp + chroma_qp_offset, 0, 57)]

    # conformance-window padding mask (matches encode_p_frame's inv16)
    inv_full = None
    if (vis_h is not None and vis_w is not None
            and (vis_h < h or vis_w < w)):
        iy = np.arange(h // s) * s >= vis_h
        ix = np.arange(w // s) * s >= vis_w
        inv_full = jnp.asarray(iy[:, None] | ix[None, :])

    def local(y_b, u_b, v_b, refy, refu, refv, qp, qp_c):
        band = jax.lax.axis_index(row_axis).astype(jnp.int32)
        row0 = band * hb
        cur = y_b.astype(jnp.int32)
        refy = refy.astype(jnp.int32)
        bh, bw = hb // s, w // s

        lam = tables.rd_lambda(qp, False)
        lam_c = tables.rd_lambda(qp_c, False)
        ref_pad = jnp.pad(refy, me.REF_PAD, mode="edge")
        pos_y = row0 + jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * s, bw)
        pos_x = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * s, bh)
        cur_b = inter_frame._blocks(cur, s)
        # the shared fused ME (ops/me.motion_estimate); the global-
        # motion candidate uses the FULL field median (ICI all_gather
        # via median_fn) so results stay bit-transparent
        sqlam_me = jnp.sqrt(lam.astype(jnp.float32))

        def full_median(mv0_grid):
            mv0_full = jax.lax.all_gather(mv0_grid, row_axis) \
                .reshape(h // s, bw, 2)
            return me.field_median(mv0_full)

        mv_q, sad_me, pred = me.motion_estimate(
            cur, refy, s, sqrt_lam=sqlam_me, row0=row0,
            median_fn=full_median)
        mv_q = mv_q.reshape(-1, 2)

        # merge/skip RD (two coherence-propagation rounds, matching
        # encode_p_frame): candidate fields derive from the FULL grid
        # via all_gather (left/top cross band boundaries)
        brow = band * bh

        def band_rows(a):
            return jax.lax.dynamic_slice(
                a, (brow, 0, 0), (bh, bw, 2))

        mv_me = mv_q.reshape(bh, bw, 2)
        mv_band = mv_me
        inv_b = None
        inv_g = None
        if inv_full is not None:
            inv_b = jax.lax.dynamic_slice(
                inv_full, (brow, 0), (bh, bw)).reshape(-1)
            inv_g = (inv_b.reshape(bh, bw)[::2, ::2]
                     & inv_b.reshape(bh, bw)[1::2, 1::2]).reshape(-1)
        carry = None
        for _ in range(2):
            mv_grid_full = jax.lax.all_gather(
                mv_band, row_axis).reshape(h // s, bw, 2)
            cands_full = inter_frame.merge_candidate_fields(
                mv_grid_full, me.field_median(mv_grid_full))
            cands = [(band_rows(c), m) for c, m in cands_full]
            mv_flat, level_y, recon_y, pred_sel, cost16, carry = \
                inter_frame._merge_skip_rd(
                    cur_b, ref_pad, pos_y, pos_x, mv_me, pred, qp,
                    lam, s, sbh_scan, cand_fields=cands,
                    scaling=scaling_lists, carry_in=carry, inv=inv_b)
            mv_band = mv_flat.reshape(bh, bw, 2)
        pred = pred_sel
        mv = mv_band
        cbf_y = jnp.any(level_y != 0, (-1, -2)).reshape(bh, bw)

        # device CU-quadtree consolidation (matches encode_p_frame;
        # 32/64 groups never cross CTU-aligned band boundaries)
        (mv, level_y, recon_y, cbf_y, cu_depth, tr_depth, chroma16) = \
            inter_frame.quadtree_consolidate(
                cur_b, pred_sel, mv, level_y, recon_y,
                cost16, jnp.zeros((bh * bw,), bool), qp, lam, bh, bw,
                sign_hiding, scaling_lists,
                ref_pad=ref_pad, y0=pos_y[0], inv=inv_b)
        mv_fl = mv.reshape(-1, 2)

        cpad = me.REF_PAD // 2

        def chroma(plane_b, refp):
            refc = refp.astype(jnp.int32)
            rp = jnp.pad(refc, cpad, mode="edge")
            mv_f = mv_fl
            cw = me._gather_windows(
                rp,
                cpad + pos_y // 2 + (mv_f[:, 0] >> 3) - 1,
                cpad + pos_x // 2 + (mv_f[:, 1] >> 3) - 1, cs + 3)
            cpred = interp.mc_chroma_phases(cw, mv_f[:, 0] & 7,
                                            mv_f[:, 1] & 7, cs)
            cb = inter_frame._blocks(plane_b.astype(jnp.int32), cs)
            lvl, rrc = inter_frame._tq(cb - cpred, cs, qp_c, False,
                                       sbh_scan_c, scaling_lists)
            rec = jnp.clip(cpred + rrc, 0, 255)
            lvl, rec = inter_frame._rd_zero(lvl, rec, cpred, cb,
                                            lam_c * chroma_rd_scale,
                                            inv=inv_b)
            # 16x16 chroma TBs where the luma TB is 32-wide
            g2h, g2w = bh // 2, bw // 2
            asm = lambda t: t.reshape(g2h, 2, g2w, 2, cs, cs) \
                .transpose(0, 2, 1, 4, 3, 5).reshape(-1, 2 * cs, 2 * cs)
            pred16 = asm(cpred.reshape(bh, bw, cs, cs))
            orig16 = asm(cb.reshape(bh, bw, cs, cs))
            scan16 = tuple(tables.scan_order(2 * cs, tables.SCAN_DIAG)) \
                if sign_hiding else None
            lvl16, rr16 = inter_frame._tq(orig16 - pred16, 2 * cs, qp_c,
                                          False, scan16, scaling_lists)
            rec16 = jnp.clip(pred16 + rr16, 0, 255)
            lvl16, rec16 = inter_frame._rd_zero(
                lvl16, rec16, pred16, orig16, lam_c * chroma_rd_scale,
                inv=inv_g)
            cbf16 = jnp.any(lvl16 != 0, (-1, -2))

            def tiles(p16):
                return p16.reshape(g2h, g2w, 2, cs, 2, cs) \
                    .transpose(0, 2, 1, 4, 3, 5).reshape(bh, bw, cs, cs)

            ch16 = jnp.repeat(jnp.repeat(chroma16, 2, 0), 2, 1)
            sel16 = ch16.reshape(-1)[:, None, None]
            lvl = jnp.where(sel16, tiles(lvl16).reshape(-1, cs, cs), lvl)
            rec = jnp.where(sel16, tiles(rec16).reshape(-1, cs, cs), rec)
            cbf = jnp.where(
                ch16, jnp.repeat(jnp.repeat(
                    cbf16.reshape(g2h, g2w), 2, 0), 2, 1),
                jnp.any(lvl != 0, (-1, -2)).reshape(bh, bw))
            return lvl, rec, cbf

        level_u, recon_u, cbf_u = chroma(u_b, refu)
        level_v, recon_v, cbf_v = chroma(v_b, refv)

        band_y = inter_frame._unblocks(recon_y, hb, w)
        band_u = inter_frame._unblocks(recon_u, hb // 2, w // 2)
        band_v = inter_frame._unblocks(recon_v, hb // 2, w // 2)

        tb2 = (tr_depth == 0) & (cu_depth == 1) | (cu_depth == 0)
        if deblocking:
            # vertical pass is row-local: filter within the band
            bs_v, _ = inter_frame.inter_boundary_strength(
                cbf_y.astype(jnp.int32), mv, s, hb, w, tb2=tb2)
            band_y = deblock._luma_pass(band_y, bs_v, qp)

        # ---- assemble the frame (ICI all_gather over the row axis)
        full_y = jax.lax.all_gather(band_y, row_axis).reshape(h, w)
        full_u = jax.lax.all_gather(band_u, row_axis) \
            .reshape(h // 2, w // 2)
        full_v = jax.lax.all_gather(band_v, row_axis) \
            .reshape(h // 2, w // 2)
        cbf_y_f = jax.lax.all_gather(cbf_y, row_axis).reshape(h // s, bw)
        cbf_u_f = jax.lax.all_gather(cbf_u, row_axis).reshape(h // s, bw)
        cbf_v_f = jax.lax.all_gather(cbf_v, row_axis).reshape(h // s, bw)
        mv_f = jax.lax.all_gather(mv, row_axis).reshape(h // s, bw, 2)
        lvl_y_f = jax.lax.all_gather(level_y, row_axis) \
            .reshape(-1, s, s)
        lvl_u_f = jax.lax.all_gather(level_u, row_axis) \
            .reshape(-1, cs, cs)
        lvl_v_f = jax.lax.all_gather(level_v, row_axis) \
            .reshape(-1, cs, cs)

        if deblocking:
            # horizontal pass on the assembled frame (replicated)
            tb2_f = jax.lax.all_gather(tb2, row_axis).reshape(h // s, bw)
            _, bs_h = inter_frame.inter_boundary_strength(
                cbf_y_f.astype(jnp.int32), mv_f, s, h, w, tb2=tb2_f)
            full_y = deblock._luma_pass(full_y.T, bs_h.T, qp).T

        sao_fields = None
        if sao_enabled:
            yf = jax.lax.all_gather(y_b.astype(jnp.int32), row_axis) \
                .reshape(h, w)
            uf = jax.lax.all_gather(u_b.astype(jnp.int32), row_axis) \
                .reshape(h // 2, w // 2)
            vf = jax.lax.all_gather(v_b.astype(jnp.int32), row_axis) \
                .reshape(h // 2, w // 2)
            full_y, full_u, full_v, sao_fields = sao.sao_frame(
                yf, uf, vf, full_y, full_u, full_v, lam, lam_c, ctu)

        nb = (h // s) * bw
        # RC distortion signal (psum over bands == single-device sum)
        dist16 = jax.lax.psum(
            jnp.sum(jnp.abs(recon_y - cur_b)), row_axis) // nb
        cap_y, cap_c, esc_y, esc_c = inter_frame.p_caps(nb)
        cap_ys, cap_cs, esc_ys, esc_cs = inter_frame.p_caps_small(nb)
        pk_y_s, pk_y_f = packing.compact_blocks_i8_tiers(
            lvl_y_f, [(cap_ys, esc_ys), (cap_y, esc_y)])
        pk_u_s, pk_u_f = packing.compact_blocks_i8_tiers(
            lvl_u_f, [(cap_cs, esc_cs), (cap_c, esc_c)])
        pk_v_s, pk_v_f = packing.compact_blocks_i8_tiers(
            lvl_v_f, [(cap_cs, esc_cs), (cap_c, esc_c)])
        parts = [
            mv_f.astype(jnp.int16).reshape(-1),
            jnp.zeros((nb,), jnp.int16),           # ref_idx (1-ref path)
            jnp.stack([cbf_y_f, cbf_u_f, cbf_v_f])
            .astype(jnp.int16).reshape(-1),
            jnp.zeros((nb,), jnp.int16),           # is_intra (fallback off)
            jnp.zeros((nb,), jnp.int16),           # intra modes
            jax.lax.all_gather(cu_depth, row_axis)
            .astype(jnp.int16).reshape(-1),
            jax.lax.all_gather(tr_depth, row_axis)
            .astype(jnp.int16).reshape(-1),
            jnp.zeros((1,), jnp.int16),            # cand count
            jnp.clip(dist16, 0, 32767).astype(jnp.int16)[None],
            pk_y_s, pk_u_s, pk_v_s]
        if sao_fields is not None:
            parts.append(sao.pack_sao_fields(sao_fields))
        packed = jnp.concatenate(parts)
        packed_full = jnp.concatenate([pk_y_f, pk_u_f, pk_v_f])
        return dict(recon_y=full_y, recon_u=full_u, recon_v=full_v,
                    mv=mv_f, packed=packed, packed_full=packed_full)

    spec_y = P(row_axis)
    rep = P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec_y, spec_y, spec_y, rep, rep, rep, rep, rep),
        out_specs=dict(recon_y=rep, recon_u=rep, recon_v=rep, mv=rep,
                       packed=rep, packed_full=rep),
        check_vma=False)
    return fn(y, u, v, ref_y, ref_u, ref_v, qp, qp_c)
