"""Batched P-frame (inter) encoder — the TPU compute path for IPPP.

Re-designs the reference's per-CTU inter loop (ref: motion_inter_full
hmr_motion_inter.c:2791, wfpp_encoder_thread hmr_encoder_lib.c:2357) as
a fully batched JAX program with NO intra-frame sequencing: every block
predicts from the previous frame's (deblocked) reconstruction, so ME,
MC, transform/quant and reconstruction all run as single dense launches
over all blocks of the frame — the wavefront disappears entirely.

Scope: 16x16 motion decisions (host-side bottom-up merging folds
uniform regions into 32x32/64x64 CUs), 1 reference frame,
integer/half/quarter-pel ME (dense hierarchical search, ops/me.py),
MV-coherence snapping, zero-residual RD, isolated intra fallback with
scene-change detection, inter deblocking + SAO.  The host entropy stage
derives merge/skip/AMVP from the MV field decoder-exactly
(native/syntax.cpp), so the device needs no candidate-list logic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.models import schedule
from homerhevc_tpu.ops import (deblock, interp, intra, me, packing, quant,
                               sao, transform)


def _blocks(plane: jnp.ndarray, b: int):
    h, w = plane.shape
    return plane.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3) \
        .reshape(-1, b, b)


def _unblocks(blocks: jnp.ndarray, h: int, w: int):
    b = blocks.shape[-1]
    return blocks.reshape(h // b, w // b, b, b).transpose(0, 2, 1, 3) \
        .reshape(h, w)


def _rd_zero(level, recon, pred, cur, lam):
    """Zero-residual RD decision (role of the reference's merge/skip
    zero-residual pass, check_rd_cost_merge_2nx2n hmr_motion_inter.c:
    2699-2786 and the cost_rd coefficient-sum heuristic hmr_common.h:50):
    drop a block's coefficients when the rate saved outweighs the
    distortion added.  Skip CUs emerge at the host stage when all three
    components go zero on a merged MV."""
    ssd_coded = jnp.sum((recon - cur) ** 2, (-1, -2)).astype(jnp.float32)
    ssd_zero = jnp.sum((pred - cur) ** 2, (-1, -2)).astype(jnp.float32)
    bits = 16.0 + 3.0 * jnp.sum(jnp.abs(level), (-1, -2)) \
        .astype(jnp.float32)
    zero = ssd_zero <= ssd_coded + lam * bits
    level = jnp.where(zero[:, None, None], 0, level)
    recon = jnp.where(zero[:, None, None], pred, recon)
    return level, recon


def _tq(resid, size, qp, is_intra, sbh_scan):
    coeff = transform.forward_transform(resid, size)
    level, du = quant.quantize(coeff, qp, size, is_intra=is_intra)
    if sbh_scan is not None:
        level = quant.sign_bit_hide(level, du, sbh_scan, size)
    deq = quant.dequantize(level, qp, size)
    r = transform.inverse_transform(deq, size)
    return level, r


def p_caps(nb: int):
    """Compaction capacities: (luma blocks, chroma blocks, luma escape
    BLOCKS, chroma escape BLOCKS); blocks must be even (int8 pairing)."""
    cap_y = min(nb, max(64, nb * 60 // 100))
    cap_c = min(nb, max(32, nb * 35 // 100))
    return cap_y, cap_c, min(cap_y, max(16, nb // 64)), \
        min(cap_c, max(8, nb // 128))


def inter_boundary_strength(cbf: jnp.ndarray, mv: jnp.ndarray,
                            block: int, h: int, w: int,
                            is_intra=None):
    """BS maps for a P frame (spec 8.7.2.4; ref
    get_boundary_strength_single hmr_deblocking_filter.c:138): BS=2 at a
    PU/TU boundary when either side is intra, else 1 when either side
    has luma cbf or the MVs differ by >= 4 quarter-pel in any
    component."""
    bh, bw = cbf.shape
    mvdiff_v = (jnp.abs(mv[:, :-1] - mv[:, 1:]) >= 4).any(-1)
    cond_v = (cbf[:, :-1] | cbf[:, 1:]).astype(bool) | mvdiff_v  # [bh,bw-1]
    mvdiff_h = (jnp.abs(mv[:-1] - mv[1:]) >= 4).any(-1)
    cond_h = (cbf[:-1] | cbf[1:]).astype(bool) | mvdiff_h        # [bh-1,bw]
    val_v = cond_v.astype(jnp.int32)
    val_h = cond_h.astype(jnp.int32)
    if is_intra is not None:
        ii = is_intra.astype(bool)
        val_v = jnp.where(ii[:, :-1] | ii[:, 1:], 2, val_v)
        val_h = jnp.where(ii[:-1] | ii[1:], 2, val_h)

    step = block // 8
    bs_v = jnp.zeros((h // 4, w // 8), jnp.int32)
    colv = jnp.repeat(val_v, block // 4, axis=0)
    bs_v = bs_v.at[:, step::step].set(colv)
    bs_h = jnp.zeros((h // 8, w // 4), jnp.int32)
    rowh = jnp.repeat(val_h, block // 4, axis=1)
    bs_h = bs_h.at[step::step, :].set(rowh)
    return bs_v, bs_h


def chroma_boundary_strength(is_intra: jnp.ndarray, block: int,
                             hc: int, wc: int):
    """Chroma BS maps (only BS==2 filters, spec 8.7.2.5.5): 2 where
    either side of a block edge is intra.  Segment shapes
    [hc//2, wc//8] / [hc//8, wc//2]; block edges every block//2 chroma
    px."""
    ii = is_intra.astype(bool)
    v2 = (ii[:, :-1] | ii[:, 1:]).astype(jnp.int32) * 2   # [bh, bw-1]
    h2 = (ii[:-1] | ii[1:]).astype(jnp.int32) * 2         # [bh-1, bw]
    cb = block // 2                                       # chroma block px
    step = cb // 8
    bs_v = jnp.zeros((hc // 2, wc // 8), jnp.int32)
    bs_v = bs_v.at[:, step::step].set(jnp.repeat(v2, cb // 2, axis=0))
    bs_h = jnp.zeros((hc // 8, wc // 2), jnp.int32)
    bs_h = bs_h.at[step::step, :].set(jnp.repeat(h2, cb // 2, axis=1))
    return bs_v, bs_h


_FALLBACK_CAP = 512          # max intra CUs per P frame (static shape)


def _intra_fallback_pass(cur_b, u, v, recon_y, recon_u, recon_v,
                         level_y, level_u, level_v,
                         cbf_y, cbf_u, cbf_v, inter_pred,
                         qp, qp_c, s, cs, bh, bw, h, w,
                         sbh_scan, sbh_scan_c):
    """Replace up to _FALLBACK_CAP inter CUs by intra CUs.

    Intra CUs are restricted to blocks whose 8-neighborhood stays
    inter, so their ADI reference pixels come from inter
    reconstructions that are final — the whole pass stays one batched
    launch with no wavefront.  Candidates: DC-prediction SAD beats the
    inter SAD with margin; the best ones are gathered via top-k (stream
    compaction), fully mode-searched (all 35 modes), TQ-reconstructed
    and scattered back."""
    nb = bh * bw
    kcap = min(_FALLBACK_CAP, nb)
    plane_y = _unblocks(recon_y, h, w)
    buf = jnp.zeros((1 + h + s, 1 + w + s), jnp.int32)
    buf = buf.at[1:1 + h, 1:1 + w].set(plane_y)

    avail = schedule.availability(bw, bh, 64 // s)
    amask = np.stack([avail["bottomleft"], avail["left"],
                      avail["corner"], avail["top"],
                      avail["topright"]], -1).reshape(nb, 5)
    seg = np.zeros((5, 4 * s + 1), dtype=bool)
    seg[0, 0:s] = True
    seg[1, s:2 * s] = True
    seg[2, 2 * s] = True
    seg[3, 2 * s + 1:3 * s + 1] = True
    seg[4, 3 * s + 1:] = True
    pix_avail = jnp.asarray(amask @ seg > 0)          # [nb, 4S+1]

    pos_y = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * s, bw)
    pos_x = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * s, bh)

    def gather_adi(b, py, px, size):
        top = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            b, (yy, xx), (1, 2 * size + 1))[0])(py, px)
        left = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            b, (yy + 1, xx), (2 * size, 1))[:, 0])(py, px)
        return jnp.concatenate([left[:, ::-1], top], -1)

    adi = intra.substitute_refs(gather_adi(buf, pos_y, pos_x, s),
                                pix_avail)

    # ---- DC-proxy decision + isolation
    dc = (jnp.sum(adi[:, s:2 * s], -1) + jnp.sum(
        adi[:, 2 * s + 1:3 * s + 1], -1) + s) // (2 * s)
    dc_sad = jnp.sum(jnp.abs(cur_b - dc[:, None, None]), (-1, -2))
    inter_sad = jnp.sum(jnp.abs(cur_b - inter_pred), (-1, -2))
    cand = dc_sad.astype(jnp.float32) < 0.75 * inter_sad
    cand_count = cand.sum().astype(jnp.int32)
    cgrid = cand.reshape(bh, bw)
    pad = jnp.pad(cgrid, 1)
    neigh = jnp.zeros_like(cgrid)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = neigh | pad[1 + dy:1 + dy + bh, 1 + dx:1 + dx + bw]
    isolated = (cgrid & ~neigh).reshape(nb)

    gain = jnp.where(isolated, inter_sad - dc_sad, -1)
    _, sel = jax.lax.top_k(gain, kcap)                # block indices
    sel_ok = gain[sel] > 0                            # [kcap]

    # ---- full 35-mode search on the selected blocks
    adi_sel = adi[sel]
    preds = intra.predict_all_modes(adi_sel, s, True)  # [k, 35, S, S]
    cur_sel = cur_b[sel]
    sads = jnp.sum(jnp.abs(preds - cur_sel[:, None]), (-1, -2))
    best = jnp.argmin(sads, -1).astype(jnp.int32)     # [k]
    pred_sel = jnp.take_along_axis(
        preds, best[:, None, None, None], 1)[:, 0]
    lvl_sel, rr = _tq(cur_sel - pred_sel, s, qp, True, sbh_scan)
    rec_sel = jnp.clip(pred_sel + rr, 0, 255)
    cbf_sel = jnp.any(lvl_sel != 0, (-1, -2))

    # ---- chroma (DM) for the same blocks
    def chroma_intra(plane_blocks, plane_full, scan):
        pfull = _unblocks(plane_blocks, h // 2, w // 2)
        cbuf = jnp.zeros((1 + h // 2 + cs, 1 + w // 2 + cs), jnp.int32)
        cbuf = cbuf.at[1:1 + h // 2, 1:1 + w // 2].set(pfull)
        segc = np.zeros((5, 4 * cs + 1), dtype=bool)
        segc[0, 0:cs] = True
        segc[1, cs:2 * cs] = True
        segc[2, 2 * cs] = True
        segc[3, 2 * cs + 1:3 * cs + 1] = True
        segc[4, 3 * cs + 1:] = True
        pix_c = jnp.asarray(amask @ segc > 0)[sel]
        adi_c = intra.substitute_refs(
            gather_adi(cbuf, pos_y[sel] // 2, pos_x[sel] // 2, cs),
            pix_c)
        preds_c = intra.predict_all_modes(adi_c, cs, False)
        pred_c = jnp.take_along_axis(
            preds_c, best[:, None, None, None], 1)[:, 0]
        orig_c = _blocks(jnp.asarray(plane_full, jnp.int32), cs)[sel]
        lvl_c, rr_c = _tq(orig_c - pred_c, cs, qp_c, True, scan)
        rec_c = jnp.clip(pred_c + rr_c, 0, 255)
        return lvl_c, rec_c, jnp.any(lvl_c != 0, (-1, -2))

    lvl_cu, rec_cu, cbf_cu = chroma_intra(recon_u, u, sbh_scan_c)
    lvl_cv, rec_cv, cbf_cv = chroma_intra(recon_v, v, sbh_scan_c)

    # ---- scatter back (drop non-accepted via OOB index)
    slot = jnp.where(sel_ok, sel, nb)

    def put(blocks, vals):
        return blocks.at[slot].set(vals, mode="drop")

    def put_map(m, vals):
        return m.reshape(-1).at[slot].set(vals, mode="drop") \
            .reshape(bh, bw)

    recon_y = put(recon_y, rec_sel)
    level_y = put(level_y, lvl_sel)
    recon_u = put(recon_u, rec_cu)
    level_u = put(level_u, lvl_cu)
    recon_v = put(recon_v, rec_cv)
    level_v = put(level_v, lvl_cv)
    cbf_y = put_map(cbf_y, cbf_sel)
    cbf_u = put_map(cbf_u, cbf_cu)
    cbf_v = put_map(cbf_v, cbf_cv)
    is_intra_blk = jnp.zeros((nb,), jnp.int32).at[slot].set(1,
                                                            mode="drop")
    intra_modes = jnp.zeros((nb,), jnp.int32).at[slot].set(best,
                                                           mode="drop")
    return (recon_y, recon_u, recon_v, level_y, level_u, level_v,
            cbf_y, cbf_u, cbf_v, is_intra_blk, intra_modes, cand_count)


def encode_p_frame(y, u, v, ref_y, ref_u, ref_v, qp: int, block: int = 16,
                   sign_hiding: bool = False, deblocking: bool = False,
                   sao_enabled: bool = False, ctu: int = 64,
                   intra_fallback: bool = False,
                   chroma_rd_scale: float = 1.0,
                   chroma_qp_offset: int = 0,
                   me_precision: int = 2):
    """Encode one P frame against one reference.

    y/u/v: uint8 planes (CTU-padded); ref_*: int32 reconstructed (and
    deblocked) reference planes of the same shapes.
    Returns FrameRecord fields incl. quarter-pel MVs [bh, bw, 2] (y, x).
    """
    h, w = y.shape
    s = block
    cs = block // 2
    bh, bw = h // s, w // s
    qp = jnp.asarray(qp, jnp.int32)   # traced (per-frame rate control)
    qp_c = jnp.asarray(tables.CHROMA_QP_TABLE)[
        jnp.clip(qp + chroma_qp_offset, 0, 57)]
    sbh_scan = tuple(tables.scan_order(s, tables.SCAN_DIAG)) \
        if sign_hiding else None
    sbh_scan_c = tuple(tables.scan_order(cs, tables.SCAN_DIAG)) \
        if sign_hiding else None

    cur = jnp.asarray(y, jnp.int32)
    refy = jnp.asarray(ref_y, jnp.int32)
    lam = tables.rd_lambda(qp, False)
    lam_c = tables.rd_lambda(qp_c, False)
    # ME returns the final MC prediction (the winning subpel candidate)
    mv, sad_me, pred = me.motion_estimate(cur, refy, block=s,
                                          precision=me_precision)
    pos_y = (jnp.arange(bh, dtype=jnp.int32) * s)[:, None]
    pos_x = (jnp.arange(bw, dtype=jnp.int32) * s)[None, :]
    pos_y = jnp.broadcast_to(pos_y, (bh, bw)).reshape(-1)
    pos_x = jnp.broadcast_to(pos_x, (bh, bw)).reshape(-1)

    cur_b = _blocks(cur, s)
    # MV-coherence snap toward neighbor/zero candidates (merge/skip RD)
    ref_pad = jnp.pad(refy, me.REF_PAD, mode="edge")
    cands = me.snap_candidates(mv)
    left_pred = cands[1][0].reshape(-1, 2)
    mv_flat, pred, _ = me.snap_mvs(
        cur_b, ref_pad, pos_y, pos_x, mv.reshape(-1, 2), pred,
        sad_me.reshape(-1), cands, left_pred, jnp.sqrt(lam), s)
    mv = mv_flat.reshape(bh, bw, 2)
    mv_f = mv.reshape(-1, 2)

    level_y, rres = _tq(cur_b - pred, s, qp, False, sbh_scan)
    recon_y = jnp.clip(pred + rres, 0, 255)
    level_y, recon_y = _rd_zero(level_y, recon_y, pred, cur_b, lam)
    cbf_y = jnp.any(level_y != 0, axis=(-1, -2)).reshape(bh, bw)

    # ---- chroma MC (4-tap, eighth-pel = luma quarter-pel values)
    cpad = me.REF_PAD // 2

    def chroma(plane, refp, scan):
        refc = jnp.asarray(refp, jnp.int32)
        rp = jnp.pad(refc, cpad, mode="edge")
        cw = me._gather_windows(
            rp,
            cpad + pos_y // 2 + (mv_f[:, 0] >> 3) - 1,
            cpad + pos_x // 2 + (mv_f[:, 1] >> 3) - 1, cs + 3)
        cpred = interp.mc_chroma_phases(cw, mv_f[:, 0] & 7,
                                        mv_f[:, 1] & 7, cs)
        cb = _blocks(jnp.asarray(plane, jnp.int32), cs)
        lvl, rr = _tq(cb - cpred, cs, qp_c, False, scan)
        rec = jnp.clip(cpred + rr, 0, 255)
        lvl, rec = _rd_zero(lvl, rec, cpred, cb,
                            lam_c * chroma_rd_scale)
        cbf = jnp.any(lvl != 0, axis=(-1, -2)).reshape(bh, bw)
        return lvl, rec, cbf

    level_u, recon_u, cbf_u = chroma(u, ref_u, sbh_scan_c)
    level_v, recon_v, cbf_v = chroma(v, ref_v, sbh_scan_c)

    # ---- isolated intra fallback (scene changes / uncovered content;
    # role of the reference's per-CU intra-vs-inter arbitration,
    # hmr_motion_inter.c:3043)
    nb = bh * bw
    is_intra_blk = jnp.zeros((nb,), jnp.int32)
    intra_modes = jnp.zeros((nb,), jnp.int32)
    cand_count = jnp.int32(0)
    if intra_fallback:
        (recon_y, recon_u, recon_v, level_y, level_u, level_v,
         cbf_y, cbf_u, cbf_v, is_intra_blk, intra_modes, cand_count) = \
            _intra_fallback_pass(
                cur_b, u, v, recon_y, recon_u, recon_v,
                level_y, level_u, level_v, cbf_y, cbf_u, cbf_v,
                pred, qp, qp_c, s, cs, bh, bw, h, w,
                sbh_scan, sbh_scan_c)

    out_y = _unblocks(recon_y, h, w)
    out_u = _unblocks(recon_u, h // 2, w // 2)
    out_v = _unblocks(recon_v, h // 2, w // 2)

    if deblocking:
        # spec 8.7.2.4: the cbf term of the BS is the LUMA TB only
        ii = is_intra_blk.reshape(bh, bw) if intra_fallback else None
        bs_v, bs_h = inter_boundary_strength(cbf_y.astype(jnp.int32),
                                             mv, s, h, w, is_intra=ii)
        out_y = deblock.deblock_luma(out_y, bs_v, bs_h, qp)
        if intra_fallback:
            # chroma filters only BS==2 edges (intra-adjacent)
            bs_vc, bs_hc = chroma_boundary_strength(ii, s, h // 2, w // 2)
            out_u = deblock.deblock_chroma(out_u, bs_vc, bs_hc, qp_c)
            out_v = deblock.deblock_chroma(out_v, bs_vc, bs_hc, qp_c)

    sao_fields = None
    if sao_enabled:
        lam = tables.rd_lambda(qp, False)
        lam_c = tables.rd_lambda(qp_c, False)
        out_y, out_u, out_v, sao_fields = sao.sao_frame(
            jnp.asarray(y, jnp.int32), jnp.asarray(u, jnp.int32),
            jnp.asarray(v, jnp.int32), out_y, out_u, out_v,
            lam, lam_c, ctu)

    out = dict(
        recon_y=out_y, recon_u=out_u, recon_v=out_v,
        coeff_y=_unblocks(level_y, h, w).astype(jnp.int16),
        coeff_cb=_unblocks(level_u, h // 2, w // 2).astype(jnp.int16),
        coeff_cr=_unblocks(level_v, h // 2, w // 2).astype(jnp.int16),
        mv=mv,
        cbf=jnp.stack([cbf_y, cbf_u, cbf_v]).astype(jnp.int32),
    )
    # single-transfer marshaling with nonzero-block compaction (the
    # device->host link is a high-latency, low-bandwidth tunnel)
    cap_y, cap_c, esc_y, esc_c = p_caps(nb)
    parts = [
        mv.astype(jnp.int16).reshape(-1),
        out["cbf"].astype(jnp.int16).reshape(-1),
        is_intra_blk.astype(jnp.int16),
        intra_modes.astype(jnp.int16),
        cand_count.astype(jnp.int16)[None],
        packing.compact_blocks_i8(level_y, cap_y, esc_y),
        packing.compact_blocks_i8(level_u, cap_c, esc_c),
        packing.compact_blocks_i8(level_v, cap_c, esc_c)]
    if sao_fields is not None:
        parts.append(sao.pack_sao_fields(sao_fields))
    out["packed"] = jnp.concatenate(parts)
    return out


encode_p_frame_jit = jax.jit(
    encode_p_frame,
    static_argnames=("block", "sign_hiding", "deblocking",
                     "sao_enabled", "ctu", "intra_fallback",
                     "chroma_rd_scale", "chroma_qp_offset",
                     "me_precision"))


def encode_p_chunk(ys, us, vs, ref_y, ref_u, ref_v, qp, **flags):
    """Encode K consecutive P frames in ONE device program (lax.scan
    over the inter-frame reference dependency).

    Amortizes the host<->device round trip over K frames: one dispatch,
    one packed transfer (role of the reference's frame pipeline at
    chunk granularity).  ys: uint8 [K, H, W]; qp scalar (rate control
    moves to chunk granularity under batching).

    Returns dict(recon_* = last frame's reconstruction, packed [K, L]).
    """
    def step(carry, xs):
        ry, ru, rv = carry
        y, u, v = xs
        out = encode_p_frame(y, u, v, ry, ru, rv, qp=qp, **flags)
        per_frame = dict(packed=out["packed"], coeff_y=out["coeff_y"],
                         coeff_cb=out["coeff_cb"],
                         coeff_cr=out["coeff_cr"])
        return ((out["recon_y"], out["recon_u"], out["recon_v"]),
                per_frame)

    (ry, ru, rv), outs = jax.lax.scan(
        step, (jnp.asarray(ref_y, jnp.int32), jnp.asarray(ref_u, jnp.int32),
               jnp.asarray(ref_v, jnp.int32)), (ys, us, vs))
    return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                packed=outs["packed"], coeff_y=outs["coeff_y"],
                coeff_cb=outs["coeff_cb"], coeff_cr=outs["coeff_cr"])


encode_p_chunk_jit = jax.jit(
    encode_p_chunk,
    static_argnames=("block", "sign_hiding", "deblocking",
                     "sao_enabled", "ctu", "intra_fallback",
                     "chroma_rd_scale", "chroma_qp_offset",
                     "me_precision"))
