"""Batched P-frame (inter) encoder — the TPU compute path for IPPP.

Re-designs the reference's per-CTU inter loop (ref: motion_inter_full
hmr_motion_inter.c:2791, wfpp_encoder_thread hmr_encoder_lib.c:2357) as
a fully batched JAX program with NO intra-frame sequencing: every block
predicts from the previous frame's (deblocked) reconstruction, so ME,
MC, transform/quant and reconstruction all run as single dense launches
over all blocks of the frame — the wavefront disappears entirely.

Round-1 scope: 16x16 2Nx2N inter CUs, 1 reference frame, quarter-pel
ME (dense hierarchical search, ops/me.py), inter deblocking.  The host
entropy stage derives merge/skip/AMVP from the MV field decoder-exactly
(native/mvpred.cpp), so the device needs no candidate-list logic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.ops import (deblock, interp, me, packing, quant, sao,
                               transform)


def _blocks(plane: jnp.ndarray, b: int):
    h, w = plane.shape
    return plane.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3) \
        .reshape(-1, b, b)


def _unblocks(blocks: jnp.ndarray, h: int, w: int):
    b = blocks.shape[-1]
    return blocks.reshape(h // b, w // b, b, b).transpose(0, 2, 1, 3) \
        .reshape(h, w)


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
    values, chroma escape values); blocks must be even (int8 pairing)."""
    cap_y = min(nb, max(64, nb * 60 // 100))
    cap_c = min(nb, max(32, nb * 35 // 100))
    return cap_y, cap_c, max(256, nb // 2), max(128, nb // 8)


def inter_boundary_strength(cbf: jnp.ndarray, mv: jnp.ndarray,
                            block: int, h: int, w: int):
    """BS maps for an all-inter frame (spec 8.7.2.4; ref
    get_boundary_strength_single hmr_deblocking_filter.c:138): BS=1 at a
    PU/TU boundary when either side has cbf or the MVs differ by >= 4
    quarter-pel in any component; never 2 (no intra CUs)."""
    bh, bw = cbf.shape
    mvdiff_v = (jnp.abs(mv[:, :-1] - mv[:, 1:]) >= 4).any(-1)
    cond_v = (cbf[:, :-1] | cbf[:, 1:]).astype(bool) | mvdiff_v  # [bh,bw-1]
    mvdiff_h = (jnp.abs(mv[:-1] - mv[1:]) >= 4).any(-1)
    cond_h = (cbf[:-1] | cbf[1:]).astype(bool) | mvdiff_h        # [bh-1,bw]

    step = block // 8
    bs_v = jnp.zeros((h // 4, w // 8), jnp.int32)
    colv = jnp.repeat(cond_v.astype(jnp.int32), block // 4, axis=0)
    bs_v = bs_v.at[:, step::step].set(colv)
    bs_h = jnp.zeros((h // 8, w // 4), jnp.int32)
    rowh = jnp.repeat(cond_h.astype(jnp.int32), block // 4, axis=1)
    bs_h = bs_h.at[step::step, :].set(rowh)
    return bs_v, bs_h


def encode_p_frame(y, u, v, ref_y, ref_u, ref_v, qp: int, block: int = 16,
                   sign_hiding: bool = False, deblocking: bool = False,
                   sao_enabled: bool = False, ctu: int = 64):
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
    qp_c = jnp.asarray(tables.CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]
    sbh_scan = tuple(tables.scan_order(s, tables.SCAN_DIAG)) \
        if sign_hiding else None
    sbh_scan_c = tuple(tables.scan_order(cs, tables.SCAN_DIAG)) \
        if sign_hiding else None

    cur = jnp.asarray(y, jnp.int32)
    refy = jnp.asarray(ref_y, jnp.int32)
    # ME returns the final MC prediction (the winning subpel candidate)
    mv, _sad, pred = me.motion_estimate(cur, refy, block=s)
    mv_f = mv.reshape(-1, 2)
    pos_y = (jnp.arange(bh, dtype=jnp.int32) * s)[:, None]
    pos_x = (jnp.arange(bw, dtype=jnp.int32) * s)[None, :]
    pos_y = jnp.broadcast_to(pos_y, (bh, bw)).reshape(-1)
    pos_x = jnp.broadcast_to(pos_x, (bh, bw)).reshape(-1)

    cur_b = _blocks(cur, s)
    level_y, rres = _tq(cur_b - pred, s, qp, False, sbh_scan)
    recon_y = jnp.clip(pred + rres, 0, 255)
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
        cbf = jnp.any(lvl != 0, axis=(-1, -2)).reshape(bh, bw)
        return lvl, rec, cbf

    level_u, recon_u, cbf_u = chroma(u, ref_u, sbh_scan_c)
    level_v, recon_v, cbf_v = chroma(v, ref_v, sbh_scan_c)

    out_y = _unblocks(recon_y, h, w)
    out_u = _unblocks(recon_u, h // 2, w // 2)
    out_v = _unblocks(recon_v, h // 2, w // 2)

    if deblocking:
        # spec 8.7.2.4: the cbf term of the BS is the LUMA TB only
        bs_v, bs_h = inter_boundary_strength(cbf_y.astype(jnp.int32),
                                             mv, s, h, w)
        out_y = deblock.deblock_luma(out_y, bs_v, bs_h, qp)
        # chroma filters only BS==2 edges; all-inter frame has none

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
    nb = bh * bw
    cap_y, cap_c, esc_y, esc_c = p_caps(nb)
    parts = [
        mv.astype(jnp.int16).reshape(-1),
        out["cbf"].astype(jnp.int16).reshape(-1),
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
                     "sao_enabled", "ctu"))
