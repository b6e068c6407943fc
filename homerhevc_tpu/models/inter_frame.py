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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.models import schedule
from homerhevc_tpu.ops import (deblock, interp, intra, me, packing, quant,
                               rdbits, sao, transform)


def _blocks(plane: jnp.ndarray, b: int):
    h, w = plane.shape
    return plane.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3) \
        .reshape(-1, b, b)


def _unblocks(blocks: jnp.ndarray, h: int, w: int):
    b = blocks.shape[-1]
    return blocks.reshape(h // b, w // b, b, b).transpose(0, 2, 1, 3) \
        .reshape(h, w)


# Distortion weight for blocks fully inside the conformance-window
# padding.  Zero would be "correct" (the pixels are never displayed)
# but lets the padded band drift arbitrarily under zero-residual
# folding — and the band IS read by the MC of visible edge blocks in
# later frames (content entering at the pan edge predicts from it), so
# unbounded drift decays visible quality frame over frame (measured:
# -0.5 dB over 11 P frames at qp26 on the bench pan).  A small weight
# keeps MV arbitration honest in the band (coherent global-motion skip
# beats junk MVs) and codes a refresh coefficient only when drift
# exceeds ~1/w of the visible threshold.
_PAD_DIST_W = 0.0625


def _rd_zero(level, recon, pred, cur, lam, inv=None, qp=None):
    """Zero-residual RD decision (role of the reference's merge/skip
    zero-residual pass, check_rd_cost_merge_2nx2n hmr_motion_inter.c:
    2699-2786 and the cost_rd coefficient-sum heuristic hmr_common.h:50):
    drop a block's coefficients when the rate saved outweighs the
    distortion added.  Skip CUs emerge at the host stage when all three
    components go zero on a merged MV."""
    ssd_coded = jnp.sum((recon - cur) ** 2, (-1, -2)).astype(jnp.float32)
    ssd_zero = jnp.sum((pred - cur) ** 2, (-1, -2)).astype(jnp.float32)
    if inv is not None:
        # conformance-window padding: no displayable distortion, but a
        # small weight keeps the padded band loosely tracking the
        # edge-replicated source (see _PAD_DIST_W)
        ssd_coded = jnp.where(inv, ssd_coded * _PAD_DIST_W, ssd_coded)
        ssd_zero = jnp.where(inv, ssd_zero * _PAD_DIST_W, ssd_zero)
    # CABAC-LUT bit estimate (role of the reference's counter env,
    # hmr_binary_encoding.c:280): exact binarization structure replaces
    # the old 3*sum|level| proxy
    bits = rdbits.residual_bits(level, level.shape[-1], qp=qp) + 2.0
    zero = ssd_zero <= ssd_coded + lam * bits
    level = jnp.where(zero[:, None, None], 0, level)
    recon = jnp.where(zero[:, None, None], pred, recon)
    return level, recon


def _tq(resid, size, qp, is_intra, sbh_scan, scaling=False):
    coeff = transform.forward_transform(resid, size)
    level, du = quant.quantize(coeff, qp, size, is_intra=is_intra,
                               scaling=scaling)
    if sbh_scan is not None:
        level = quant.sign_bit_hide(level, du, sbh_scan, size)
    deq = quant.dequantize(level, qp, size, is_intra=is_intra,
                           scaling=scaling)
    r = transform.inverse_transform(deq, size)
    return level, r


def _mc_plane_luma(ref_pad, mv, y0, out_h: int, out_w: int):
    """Whole-plane luma MC at ONE (traced) quarter-pel MV: a single
    dynamic slice + separable 8-tap filtering — no per-block gathers
    (coherent candidates like the global-motion field don't need them).
    Bit-exact vs per-block mc_luma_at."""
    win = jax.lax.dynamic_slice(
        ref_pad,
        (me.REF_PAD + y0 + (mv[0] >> 2) - 3,
         me.REF_PAD + (mv[1] >> 2) - 3),
        (out_h + 7, out_w + 7))
    ch = jnp.asarray(interp.LUMA_FILTERS)[mv[1] & 3]
    cv = jnp.asarray(interp.LUMA_FILTERS)[mv[0] & 3]
    tmp = interp._hfilter(win, ch, 8, out_w)
    pred = interp._vfilter(tmp, cv, 8, out_h) >> 6
    return jnp.clip((pred + 32) >> 6, 0, 255)


def merge_candidate_fields(mv_grid, med=None):
    """Candidate MV fields [(field [bh,bw,2], is_merge), ...] from a
    round-1 ME grid: left / top neighbours (merge-priced), global
    median and zero (mvd-priced).  `med` may be precomputed (the
    row-sharded path passes the full-frame median)."""
    left = jnp.concatenate([mv_grid[:, :1], mv_grid[:, :-1]], 1)
    top = jnp.concatenate([mv_grid[:1], mv_grid[:-1]], 0)
    if med is None:
        med = me.field_median(mv_grid)
    glob = jnp.broadcast_to(med, mv_grid.shape)
    zero = jnp.zeros_like(mv_grid)
    # the global candidate is priced as mergeable: once the field turns
    # coherent the neighbours really do carry it (self-fulfilling, and
    # RD-guarded by the SSD term when the content is not global)
    return [(left, True), (top, True), (glob, True), (zero, False)]


def _cand_rd(cur_c, preds, qp, lam, s, sbh_scan, scaling, bits_mv, nc,
             n, inv=None):
    """Shared candidate evaluation: TQ + zero-residual fold + cost.
    cur_c/preds: [nc*n, S, S]; bits_mv [nc, n].  Returns
    (level, recon [nc*n, S, S], cost [nc, n]).

    inv [n] bool marks blocks fully OUTSIDE the conformance window
    (CTU padding): their pixels are never displayed, so they carry no
    distortion and always fold to the zero-residual variant — the
    padding costs merge/skip flags instead of coefficients."""
    qp_cands = jnp.tile(qp, nc) if jnp.ndim(qp) > 0 else qp
    level, rr = _tq(cur_c - preds, s, qp_cands, False, sbh_scan,
                    scaling)
    recon = jnp.clip(preds + rr, 0, 255)
    ssd_coded = jnp.sum((recon - cur_c) ** 2, (-1, -2)) \
        .astype(jnp.float32).reshape(nc, n)
    ssd_zero = jnp.sum((preds - cur_c) ** 2, (-1, -2)) \
        .astype(jnp.float32).reshape(nc, n)
    if inv is not None:
        ssd_coded = jnp.where(inv[None], ssd_coded * _PAD_DIST_W,
                              ssd_coded)
        ssd_zero = jnp.where(inv[None], ssd_zero * _PAD_DIST_W,
                             ssd_zero)
    bits_resid = (rdbits.residual_bits(level, s, qp=qp_cands)
                  + 2.0).reshape(nc, n)
    cost_coded = ssd_coded + lam * (bits_mv + bits_resid)
    cost_zero = ssd_zero + lam * (bits_mv + 1.0)
    use_zero = cost_zero <= cost_coded
    cost = jnp.where(use_zero, cost_zero, cost_coded)
    level = jnp.where(use_zero.reshape(-1)[:, None, None], 0, level)
    recon = jnp.where(use_zero.reshape(-1)[:, None, None], preds,
                      recon)
    return level, recon, cost


def _merge_skip_rd(cur_b, ref_pad, pos_y, pos_x, mv_own, pred_own,
                   qp, lam, s, sbh_scan, cand_fields=None,
                   scaling=False, carry_in=None, ref_grid=None,
                   ref_pads=None, inv=None, neigh_refs=None):
    """Merge/skip RD arbitration over candidate MVs (TPU redesign of the
    reference's check_rd_cost_merge_2nx2n, hmr_motion_inter.c:2622-2787,
    evaluated densely for every block at once).

    Candidates: the block's own ME result, the left / top neighbours'
    MVs, the global (median) motion, and zero.  Every candidate gets an
    EXACT subpel prediction, a full T/Q/IQ/IT reconstruction and a
    forced-zero-residual variant; costs are SSD + lambda * bits with
    CABAC-LUT bit estimates (merge candidates price the merge index,
    others price the exact mvd binarization).  The winner's
    (mv, level, recon, cbf) fields are gathered per block; coherent
    winners become skip/merge CUs in the host syntax stage.

    carry_in: optional cached evaluations from a previous coherence
    round — dict(mv/level/recon/pred [.. per block], cost [n]) of that
    round's winner plus `fixed` = (all_mv, preds, level, recon, cost)
    of the own/glob/zero candidates (whose predictions do not change
    between rounds).  When given, only the left/top candidates are
    re-evaluated — 2 TQ passes instead of 5.

    cur_b: [n, S, S]; mv_own/pred_own from ME. Returns
    (mv [n,2], level [n,S,S], recon [n,S,S], pred [n,S,S],
    best_cost [n], carry_out).

    Multi-reference (spec ref_idx_l0, ref hmr_encoder_lib.c:1546):
    with `ref_grid` [bh, bw] (the per-block ME reference pick) and
    `ref_pads` [R, Hp, Wp], every candidate carries its (mv, ref)
    pair — left/top propagate the neighbour's ref, global/zero use
    ref 0 — and the winner's ref is in carry_out["ref"].
    """
    if cand_fields is None:
        cand_fields = merge_candidate_fields(mv_own)
    left_f = cand_fields[0][0].reshape(-1, 2)
    n = cur_b.shape[0]
    bh, bw = mv_own.shape[:2]
    h, w = bh * s, bw * s
    y0 = pos_y[0]                     # band row offset (0 single-dev)
    multi = ref_grid is not None
    if multi:
        own_ref = ref_grid.reshape(-1)
        if neigh_refs is not None:
            # banded: neighbour refs precomputed from the FULL grid
            left_ref, top_ref = neigh_refs
        else:
            left_ref = jnp.concatenate([ref_grid[:, :1],
                                        ref_grid[:, :-1]], 1).reshape(-1)
            top_ref = jnp.concatenate([ref_grid[:1],
                                       ref_grid[:-1]], 0).reshape(-1)
    else:
        own_ref = left_ref = top_ref = jnp.zeros((n,), jnp.int32)

    # left/top predictions need per-block gathers (ONE batched call)
    lt_mv = jnp.concatenate([cand_fields[0][0].reshape(-1, 2),
                             cand_fields[1][0].reshape(-1, 2)], 0)
    lt_ref = jnp.concatenate([left_ref, top_ref], 0)
    if multi:
        lt_pred = me.mc_luma_at(ref_pads, jnp.tile(pos_y, 2),
                                jnp.tile(pos_x, 2), lt_mv, s,
                                ref=lt_ref)
    else:
        lt_pred = me.mc_luma_at(ref_pad, jnp.tile(pos_y, 2),
                                jnp.tile(pos_x, 2), lt_mv, s)
    bits_lt = jnp.full((2, n), 3.0)
    lvl_lt, rec_lt, cost_lt = _cand_rd(
        jnp.tile(cur_b, (2, 1, 1)), lt_pred, qp, lam, s, sbh_scan,
        scaling, bits_lt, 2, n, inv=inv)

    if carry_in is None:
        # own + global + zero (global: one MV -> whole-plane MC; zero:
        # a plane crop — no per-block gathers)
        med = cand_fields[2][0][0, 0]
        glob_pred = _blocks(_mc_plane_luma(ref_pad, med, y0, h, w), s)
        zero_pred = _blocks(jax.lax.dynamic_slice(
            ref_pad, (me.REF_PAD + y0, me.REF_PAD), (h, w)), s)
        ogz_mv = jnp.concatenate(
            [mv_own.reshape(-1, 2), cand_fields[2][0].reshape(-1, 2),
             jnp.zeros((n, 2), jnp.int32)], 0)
        ogz_pred = jnp.concatenate([pred_own, glob_pred, zero_pred], 0)
        # the AMVP-priced own candidate pays its ref_idx bin (TR with
        # 2 active refs: 1 ctx bin)
        bits_ogz = jnp.stack(
            [rdbits.mvd_bits(mv_own.reshape(-1, 2) - left_f) + 5.0
             + own_ref.astype(jnp.float32),
             jnp.full((n,), 3.0),
             rdbits.mvd_bits(-left_f) + 5.0], 0)
        lvl_ogz, rec_ogz, cost_ogz = _cand_rd(
            jnp.tile(cur_b, (3, 1, 1)), ogz_pred, qp, lam, s, sbh_scan,
            scaling, bits_ogz, 3, n, inv=inv)
        ogz_ref = jnp.concatenate(
            [own_ref, jnp.zeros((2 * n,), jnp.int32)], 0)
        fixed = (ogz_mv, ogz_pred, lvl_ogz, rec_ogz, cost_ogz, ogz_ref)
        all_mv = jnp.concatenate([lt_mv, ogz_mv], 0)
        all_ref = jnp.concatenate([lt_ref, ogz_ref], 0)
        preds = jnp.concatenate([lt_pred, ogz_pred], 0)
        level = jnp.concatenate([lvl_lt, lvl_ogz], 0)
        recon = jnp.concatenate([rec_lt, rec_ogz], 0)
        cost = jnp.concatenate([cost_lt, cost_ogz], 0)
    else:
        # cached own/glob/zero + previous round's winner
        fixed = carry_in["fixed"]
        ogz_mv, ogz_pred, lvl_ogz, rec_ogz, cost_ogz, ogz_ref = fixed
        all_mv = jnp.concatenate(
            [lt_mv, ogz_mv, carry_in["mv"]], 0)
        all_ref = jnp.concatenate([lt_ref, ogz_ref, carry_in["ref"]], 0)
        preds = jnp.concatenate([lt_pred, ogz_pred, carry_in["pred"]], 0)
        level = jnp.concatenate([lvl_lt, lvl_ogz, carry_in["level"]], 0)
        recon = jnp.concatenate([rec_lt, rec_ogz, carry_in["recon"]], 0)
        cost = jnp.concatenate([cost_lt, cost_ogz,
                                carry_in["cost"][None]], 0)

    best = jnp.argmin(cost, axis=0)                         # [n]
    best_cost = jnp.min(cost, axis=0)
    nc_all = cost.shape[0]
    # winner extraction as a one-hot contraction instead of row
    # gathers: the [nc*n, S, S] gathers were dispatch-bound (~2 ms per
    # frame); a 5-way masked sum is pure VPU work.  Exact: every value
    # (mv, qpel counts; pixels; levels |.|<=2^15) is an exact f32.
    oh = (jnp.arange(nc_all)[:, None] == best[None]) \
        .astype(jnp.float32)                                # [nc, n]
    # one-hot selection: 3-pass bf16 split is exact for int values
    # within f32 range (device-gated by me.pallas_selftest)
    hp = jax.lax.Precision.HIGH

    def pick3(a):  # [nc*n, S, S] -> [n, S, S]
        af = a.reshape(nc_all, n, -1).astype(jnp.float32)
        return jnp.einsum("cn,cnx->nx", oh, af, precision=hp) \
            .astype(a.dtype).reshape(n, *a.shape[1:])

    mv_sel = jnp.einsum("cn,cnk->nk", oh,
                        all_mv.reshape(nc_all, n, 2)
                        .astype(jnp.float32),
                        precision=hp).astype(jnp.int32)
    ref_out = jnp.einsum("cn,cn->n", oh,
                         all_ref.reshape(nc_all, n)
                         .astype(jnp.float32),
                         precision=hp).astype(jnp.int32)
    lvl_sel = pick3(level)
    rec_sel = pick3(recon)
    pred_out = pick3(preds)
    carry_out = dict(fixed=fixed, mv=mv_sel, pred=pred_out,
                     level=lvl_sel, recon=rec_sel,
                     cost=best_cost, ref=ref_out)
    return (mv_sel, lvl_sel, rec_sel, pred_out, best_cost, carry_out)


def _asm_tiles(t, n: int):
    """[g, n*n, 16, 16] z-row-major tiles -> [g, 16n, 16n]."""
    g = t.shape[0]
    return t.reshape(g, n, n, 16, 16).transpose(0, 1, 3, 2, 4) \
        .reshape(g, 16 * n, 16 * n)


def _split_tiles(p, n: int):
    """[g, 16n, 16n] -> [g, n*n, 16, 16] (inverse of _asm_tiles)."""
    g = p.shape[0]
    return p.reshape(g, n, 16, n, 16).transpose(0, 1, 3, 2, 4) \
        .reshape(g, n * n, 16, 16)


def _quadtree_level(cur_b, pred_sel, mv_flat, level_y,
                    recon_y, cost_child, elig_tile, qp, lam, bh, bw,
                    n: int, sbh_scan16, sbh_scan_big, scaling=False,
                    ref_flat=None, ref_pad=None, ref_pads=None,
                    y0=0, inv=None, coded=None):
    """One consolidation level: fold n x n groups of 16x16 tiles into a
    (16n)x(16n) CU when the parent RD (with TU-size RDO) beats the sum
    of the children (TPU redesign of consolidate_prediction_info +
    encode_inter's TU split, ref hmr_motion_inter.c:2503/2213).

    n=2: 32x32 CUs with a 32 TB (tr_depth 0) or four 16 TBs (tr_depth
    1), or forced-zero residual.  n=4: 64x64 CUs with four 32 TBs
    (tr_depth 1 — a 64 TB does not exist) or zero residual.

    Tile tensors are the [nb, 16, 16] block space; coefficients of big
    TBs are stored as their 16x16 plane tiles, which the raster
    coefficient planes (and the host writer) read back exactly.

    Returns updated (mv_flat, level_y, recon_y, cost [g], take [g],
    cbf_tiles [g, n*n], trd_tiles [g] int, tidx [g, n*n]).
    """
    gh, gw = bh // n, bw // n
    gy = jnp.arange(gh, dtype=jnp.int32)
    gx = jnp.arange(gw, dtype=jnp.int32)
    dy = jnp.arange(n, dtype=jnp.int32)
    tidx = ((n * gy[:, None, None, None] + dy[None, None, :, None]) * bw
            + (n * gx[None, :, None, None] + dy[None, None, None, :]))
    tidx = tidx.reshape(-1, n * n)                   # [g, n*n]
    g = tidx.shape[0]
    flat = tidx.reshape(-1)

    o_tiles = cur_b[flat].reshape(g, n * n, 16, 16)
    mv_tiles = mv_flat[flat].reshape(g, n * n, 2)
    # MV-uniform groups reuse the children's predictions as the parent
    # prediction (no MC).  NON-uniform groups are evaluated too, at the
    # group's MAJORITY (mv, ref): a noisy-but-coherent field (texture
    # aliasing scatters a few blocks off the true motion) still
    # consolidates into one 32/64 CU when the RD favors it — the role
    # of the reference's large-CU search the uniform-only rule missed.
    uniform = (mv_tiles == mv_tiles[:, :1]).all((-1, -2))
    ref_uni = jnp.ones((g,), bool)
    ref_grp = None
    if ref_flat is not None:
        # a merged CU carries ONE (mv, ref_idx) pair: mixed-reference
        # groups cannot consolidate (spec: ref_idx is per-PU)
        ref_tiles = ref_flat[flat].reshape(g, n * n)
        ref_uni = (ref_tiles == ref_tiles[:, :1]).all(-1)
        uniform = uniform & ref_uni
        ref_grp = ref_tiles[:, 0]
    # majority (mode) MV over the group's tiles
    eq = (mv_tiles[:, :, None] == mv_tiles[:, None, :]).all(-1)
    maj_i = jnp.argmax(jnp.sum(eq, -1), -1)              # [g]
    maj_mv = jnp.take_along_axis(
        mv_tiles, maj_i[:, None, None], 1)[:, 0]         # [g, 2]
    pmv = jnp.where(uniform[:, None], mv_tiles[:, 0], maj_mv)
    pred_t = pred_sel[flat].reshape(g, n * n, 16, 16)
    if ref_pad is not None:
        # one MC gather per group at the majority MV (only consumed by
        # non-uniform groups; SPMD computes it everywhere)
        s_big = 16 * n
        gyy = (y0 + jnp.arange(gh, dtype=jnp.int32) * s_big)[:, None]
        gxx = (jnp.arange(gw, dtype=jnp.int32) * s_big)[None, :]
        gpy = jnp.broadcast_to(gyy, (gh, gw)).reshape(-1)
        gpx = jnp.broadcast_to(gxx, (gh, gw)).reshape(-1)
        if ref_pads is not None and ref_grp is not None:
            pred_maj = me.mc_luma_at(ref_pads, gpy, gpx, maj_mv,
                                     s_big, ref=ref_grp)
        else:
            pred_maj = me.mc_luma_at(ref_pad, gpy, gpx, maj_mv, s_big)
        pred_t = jnp.where(uniform[:, None, None, None], pred_t,
                           _split_tiles(pred_maj, n))

    # per-group qp/lambda (groups never cross a CTU, so the per-tile
    # maps are uniform within a group)
    if jnp.ndim(qp) > 0:
        qp_g = qp[flat].reshape(g, n * n)[:, 0]
        lam_g = lam[flat].reshape(g, n * n)[:, 0]
        qp_tile = qp[flat]
    else:
        qp_g = qp
        lam_g = lam
        qp_tile = qp

    # visibility weight per tile (conformance-window padding carries
    # no distortion)
    visw = None
    if inv is not None:
        visw = jnp.where(inv[flat].reshape(g, n * n), _PAD_DIST_W, 1.0)

    def tile_ssd(a, b):
        ssd_t = jnp.sum((a - b) ** 2, (-1, -2)).astype(jnp.float32)
        if visw is not None:
            ssd_t = ssd_t * visw
        return jnp.sum(ssd_t, -1)

    # zero-residual variant
    ssd_zero = tile_ssd(pred_t, o_tiles)
    # merge-priced parent MV for uniform groups; majority-MV parents
    # usually land next to same-MV neighbours (the host finds a merge)
    # but may end up mvd-coded — price between the two
    bits_mv = jnp.where(uniform, 3.0, 6.0)
    cost_zero = ssd_zero + lam_g * (bits_mv + 1.0)

    if n == 2:
        # tr_depth 1: four 16x16 TBs on the parent prediction
        l16, rr16 = _tq((o_tiles - pred_t).reshape(-1, 16, 16), 16,
                        qp_tile, False, sbh_scan16, scaling)
        rec16 = jnp.clip(pred_t.reshape(-1, 16, 16) + rr16, 0, 255)
        l16 = l16.reshape(g, n * n, 16, 16)
        rec16 = rec16.reshape(g, n * n, 16, 16)
        ssd16 = tile_ssd(rec16, o_tiles)
        rb16 = jnp.sum(rdbits.residual_bits(
            l16.reshape(-1, 16, 16), 16, qp=qp_tile)
            .reshape(g, n * n), -1)
        cost_tr1 = ssd16 + lam_g * (bits_mv + rb16 + 5.0)
        big = 32
    else:
        cost_tr1 = jnp.full((g,), jnp.inf, jnp.float32)
        l16 = rec16 = None
        big = 32                       # 64-CU TBs are 32 as well

    # big-TB variant (32 TBs): n==2 -> one TB; n==4 -> four TBs
    orig_big = _asm_tiles(o_tiles, n)
    pred_big = _asm_tiles(pred_t, n)
    if n == 4:
        q = _split_quads64(orig_big - pred_big)      # [g*4, 32, 32]
        qp_q = jnp.repeat(qp_g, 4) if jnp.ndim(qp) > 0 else qp
        lB, rrB = _tq(q, 32, qp_q, False, sbh_scan_big, scaling)
        recB = jnp.clip(_split_quads64(pred_big) + rrB, 0, 255)
        rbB = jnp.sum(rdbits.residual_bits(lB, 32, qp=qp_q)
                      .reshape(g, 4), -1)
        lvl_big = _join_quads64(lB)
        rec_big = _join_quads64(recB)
        cbf_big_q = jnp.any(lB != 0, (-1, -2)).reshape(g, 4)
    else:
        lvl_big, rrB = _tq(orig_big - pred_big, 32, qp_g, False,
                           sbh_scan_big, scaling)
        rec_big = jnp.clip(pred_big + rrB, 0, 255)
        rbB = rdbits.residual_bits(lvl_big, 32, qp=qp_g)
        cbf_big_q = jnp.any(lvl_big != 0, (-1, -2))[:, None]
    ssd_big = tile_ssd(_split_tiles(rec_big, n), o_tiles)
    cost_big = ssd_big + lam_g * (bits_mv + rbB + 4.0)

    parent_cost = jnp.minimum(jnp.minimum(cost_big, cost_tr1),
                              cost_zero)
    maj_ok = ref_uni if ref_pad is not None else uniform
    elig = maj_ok & ~(elig_tile[flat].reshape(g, n * n).any(-1))
    if coded is not None:
        # merged CUs straddling the coded bounds cannot be signalled
        # (implicit boundary splits would re-tile their TBs)
        s_big2 = 16 * n
        gpy2 = y0 + (jnp.arange(gh, dtype=jnp.int32)
                     * s_big2)[:, None]
        gpx2 = (jnp.arange(gw, dtype=jnp.int32) * s_big2)[None, :]
        inside = ((gpx2 + s_big2 <= coded[0])
                  & (gpy2 + s_big2 <= coded[1]))
        elig = elig & jnp.broadcast_to(inside, (gh, gw)).reshape(-1)
    children = jnp.sum(cost_child[flat].reshape(g, n * n), -1) \
        + lam_g * 1.0
    take = elig & (parent_cost < children)

    use_zero = cost_zero <= jnp.minimum(cost_big, cost_tr1)
    use_big = ~use_zero & (cost_big <= cost_tr1)

    zz = use_zero[:, None, None, None]
    bb = use_big[:, None, None, None]
    lvl_big_t = _split_tiles(lvl_big, n)
    rec_big_t = _split_tiles(rec_big, n)
    if n == 2:
        lvl_par = jnp.where(zz, 0, jnp.where(bb, lvl_big_t, l16))
        rec_par = jnp.where(zz, pred_t, jnp.where(bb, rec_big_t, rec16))
        cbf16_t = jnp.any(l16 != 0, (-1, -2))        # [g, 4]
        cbf_par = jnp.where(
            use_zero[:, None], False,
            jnp.where(use_big[:, None],
                      jnp.broadcast_to(cbf_big_q, (g, n * n)), cbf16_t))
        trd = jnp.where(use_zero | use_big, 0, 1)
    else:
        lvl_par = jnp.where(zz, 0, lvl_big_t)
        rec_par = jnp.where(zz, pred_t, rec_big_t)
        # per-tile cbf from per-quadrant cbf: tile (ty, tx) of the 4x4
        # grid lies in quadrant (ty//2)*2 + tx//2
        qmap = jnp.asarray([0, 0, 1, 1, 0, 0, 1, 1,
                            2, 2, 3, 3, 2, 2, 3, 3])
        cbf_par = jnp.where(use_zero[:, None], False,
                            cbf_big_q[:, qmap])
        trd = jnp.ones((g,), jnp.int32)

    tk = take[:, None, None, None]
    level_y = level_y.at[flat].set(
        jnp.where(tk, lvl_par, level_y[flat].reshape(g, n * n, 16, 16))
        .reshape(-1, 16, 16))
    recon_y = recon_y.at[flat].set(
        jnp.where(tk, rec_par, recon_y[flat].reshape(g, n * n, 16, 16))
        .reshape(-1, 16, 16))
    # taken majority-MV parents changed the prediction under their
    # tiles: keep pred_sel exact for the next consolidation level
    pred_sel = pred_sel.at[flat].set(
        jnp.where(tk, pred_t,
                  pred_sel[flat].reshape(g, n * n, 16, 16))
        .reshape(-1, 16, 16))
    mv_flat = mv_flat.at[flat].set(
        jnp.where(take[:, None, None],
                  jnp.broadcast_to(pmv[:, None], (g, n * n, 2)),
                  mv_tiles).reshape(-1, 2))
    cost_out = jnp.where(take, parent_cost, children)
    return (mv_flat, level_y, recon_y, pred_sel, cost_out, take,
            cbf_par, trd, tidx)


def _split_quads64(p):
    """[g, 64, 64] -> [g*4, 32, 32] (z-row-major quadrants)."""
    g = p.shape[0]
    return p.reshape(g, 2, 32, 2, 32).transpose(0, 1, 3, 2, 4) \
        .reshape(-1, 32, 32)


def _join_quads64(q):
    """[g*4, 32, 32] -> [g, 64, 64]."""
    g = q.shape[0] // 4
    return q.reshape(g, 2, 2, 32, 32).transpose(0, 1, 3, 2, 4) \
        .reshape(g, 64, 64)


def quadtree_consolidate(cur_b, pred_sel, mv, level_y,
                         recon_y, cost16, is_intra_blk, qp, lam,
                         bh: int, bw: int, sign_hiding: bool,
                         scaling: bool = False, ref_flat=None,
                         ref_pad=None, ref_pads=None, y0=0, inv=None,
                         coded=None):
    """Full bottom-up CU consolidation 16 -> 32 -> 64 with TU RDO.

    Returns (mv [bh,bw,2], level_y, recon_y, cbf_y [bh,bw],
    cu_depth [bh,bw], tr_depth [bh,bw], chroma16 [bh//2,bw//2] mask of
    32-regions whose chroma is one 16x16 TB)."""
    sbh16 = tuple(tables.scan_order(16, tables.SCAN_DIAG)) \
        if sign_hiding else None
    sbh32 = tuple(tables.scan_order(32, tables.SCAN_DIAG)) \
        if sign_hiding else None
    mv_flat = mv.reshape(-1, 2)
    intra_t = is_intra_blk.astype(bool)

    # level 32
    (mv_flat, level_y, recon_y, pred_sel, cost32, take32, cbf32_t,
     trd32, tidx32) = _quadtree_level(
        cur_b, pred_sel, mv_flat, level_y, recon_y,
        cost16, intra_t, qp, lam, bh, bw, 2, sbh16, sbh32, scaling,
        ref_flat, ref_pad, ref_pads, y0, inv, coded)

    # level 64: with the majority-MV path any ref-uniform, intra-free
    # group is eligible — the parent is evaluated at the 16 tiles'
    # majority (mv, ref) even when the 32-children did not consolidate
    cost32_tile = jnp.zeros((bh * bw,), jnp.float32) \
        .at[tidx32.reshape(-1)].set(jnp.repeat(cost32 / 4.0, 4))
    (mv_flat, level_y, recon_y, pred_sel, cost64, take64, cbf64_t,
     trd64, tidx64) = _quadtree_level(
        cur_b, pred_sel, mv_flat, level_y, recon_y,
        cost32_tile, intra_t, qp, lam, bh, bw, 4, sbh16,
        sbh32, scaling, ref_flat, ref_pad, ref_pads, y0, inv, coded)

    # granule maps
    cu_depth = jnp.full((bh * bw,), 2, jnp.int32)
    tr_depth = jnp.zeros((bh * bw,), jnp.int32)
    cbf_y = jnp.any(level_y != 0, (-1, -2))
    g32 = tidx32.reshape(-1)
    cu_depth = cu_depth.at[g32].set(
        jnp.where(jnp.repeat(take32, 4), 1, cu_depth[g32]))
    tr_depth = tr_depth.at[g32].set(
        jnp.where(jnp.repeat(take32, 4),
                  jnp.repeat(trd32, 4), tr_depth[g32]))
    cbf_y = cbf_y.at[g32].set(
        jnp.where(jnp.repeat(take32, 4), cbf32_t.reshape(-1),
                  cbf_y[g32]))
    g64 = tidx64.reshape(-1)
    cu_depth = cu_depth.at[g64].set(
        jnp.where(jnp.repeat(take64, 16), 0, cu_depth[g64]))
    tr_depth = tr_depth.at[g64].set(
        jnp.where(jnp.repeat(take64, 16), 1, tr_depth[g64]))
    cbf_y = cbf_y.at[g64].set(
        jnp.where(jnp.repeat(take64, 16), cbf64_t.reshape(-1),
                  cbf_y[g64]))

    # chroma 16x16-TB regions: 32-CU with tr_depth 0, or any 64-CU
    ch32 = take32 & (trd32 == 0)
    chroma16 = ch32.reshape(bh // 2, bw // 2)
    in64 = jnp.zeros((bh * bw,), bool).at[g64].set(
        jnp.repeat(take64, 16))
    chroma16 = chroma16 | in64.reshape(bh, bw)[::2, ::2]
    return (mv_flat.reshape(bh, bw, 2), level_y, recon_y,
            cbf_y.reshape(bh, bw), cu_depth.reshape(bh, bw),
            tr_depth.reshape(bh, bw), chroma16)


def _even(x: int, nb: int) -> int:
    """Round the cap up to even (int8 row-pairing), never above the
    even floor of nb (an odd-nb frame overflowing its cap falls back to
    the raw planes — graceful, not wrong)."""
    return min(x + (x & 1), nb - (nb & 1))


def p_caps(nb: int):
    """Full-tier compaction capacities: (luma blocks, chroma blocks,
    luma escape BLOCKS, chroma escape BLOCKS); block caps must be even
    (int8 row-pairing).  The full tier lives in HBM and ships only on
    small-tier overflow, so its block caps are 100% — dense (hostile)
    content must not fall through to per-plane raw pulls, which cost
    a tunnel round trip each (measured 500+ ms/chunk).  Escapes
    (|level| > 127) keep a bounded cap; the raw-plane fallback remains
    the ultimate safety."""
    cap_y = _even(nb, nb)
    cap_c = _even(nb, nb)
    return cap_y, cap_c, min(cap_y, max(64, nb // 4)), \
        min(cap_c, max(32, nb // 8))


def p_caps_small(nb: int):
    """Small-tier capacities for the always-pulled transfer.  Measured
    nonzero-block density at the bench operating point (720p IPPP QP32)
    is ~1.5% luma / ~1.4% chroma; 12%/10% gives ~8x headroom while
    cutting the shipped buffer ~5x vs the full tier.  Overflow costs
    one extra pull of the full tier (graceful), not correctness."""
    cap_y = _even(min(nb, max(64, nb * 12 // 100)), nb)
    cap_c = _even(min(nb, max(32, nb * 10 // 100)), nb)
    return cap_y, cap_c, min(cap_y, max(4, nb // 256)), \
        min(cap_c, max(4, nb // 512))


def inter_boundary_strength(cbf: jnp.ndarray, mv: jnp.ndarray,
                            block: int, h: int, w: int,
                            is_intra=None, tb2=None, ref=None,
                            mv8=None, nxn=None, cbf8=None):
    """BS maps for a P frame (spec 8.7.2.4; ref
    get_boundary_strength_single hmr_deblocking_filter.c:138): BS=2 at a
    PU/TU boundary when either side is intra, else 1 when either side
    has luma cbf or the MVs differ by >= 4 quarter-pel in any
    component.  tb2 (optional [bh, bw] bool) marks granules covered by
    32-wide TBs (quadtree-merged CUs); their interior edges are not
    TU/PU boundaries and are not filtered.

    8x8 split CUs: with mv8 ([2bh, 2bw, 2] per-8x8-sub-CU MVs), nxn
    ([bh, bw] split flags) and cbf8 ([2bh, 2bw] per-8 luma TB cbf),
    the MV and cbf terms evaluate at 8-pel granularity; a 16-interior
    8-edge is a CU (PU+TU) boundary only inside a split block."""
    bh, bw = cbf.shape
    cond_v = (cbf[:, :-1] | cbf[:, 1:]).astype(bool)  # [bh, bw-1]
    cond_h = (cbf[:-1] | cbf[1:]).astype(bool)        # [bh-1, bw]
    if mv8 is not None:
        # per-8 TB cbf across 16-aligned edges (split CUs have four
        # TB8s; others replicate the 16 TB's cbf — identical term)
        c8 = cbf8.astype(bool)
        cond_v = (c8[:, 1:-1:2] | c8[:, 2::2])        # [2bh, bw-1]
        cond_h = (c8[1:-1:2, :] | c8[2::2, :])        # [bh-1, 2bw]
    if mv8 is None:
        cond_v = cond_v | (jnp.abs(mv[:, :-1] - mv[:, 1:]) >= 4).any(-1)
        cond_h = cond_h | (jnp.abs(mv[:-1] - mv[1:]) >= 4).any(-1)
    if ref is not None:
        # spec 8.7.2.4: different reference pictures across the edge
        # -> BS 1 (multi-ref)
        rv = (ref[:, :-1] != ref[:, 1:])
        rh = (ref[:-1] != ref[1:])
        if mv8 is not None:
            rv = jnp.repeat(rv, 2, 0)
            rh = jnp.repeat(rh, 2, 1)
        cond_v = cond_v | rv
        cond_h = cond_h | rh
    if tb2 is not None:
        # interior edges of a 32-wide TB are not TU/PU boundaries:
        # boundary j (between granules j and j+1) is interior iff j is
        # even and the granules belong to a 2x-scaled TB
        j = jnp.arange(bw - 1)
        interior_v = ((j % 2) == 0)[None, :] & tb2[:, 1:]
        i = jnp.arange(bh - 1)
        interior_h = ((i % 2) == 0)[:, None] & tb2[1:, :]
        if mv8 is not None:
            interior_v = jnp.repeat(interior_v, 2, 0)
            interior_h = jnp.repeat(interior_h, 2, 1)
        cond_v = cond_v & ~interior_v
        cond_h = cond_h & ~interior_h
    if mv8 is not None:
        mvd8_v = (jnp.abs(mv8[:, :-1] - mv8[:, 1:]) >= 4).any(-1)
        mvd8_h = (jnp.abs(mv8[:-1] - mv8[1:]) >= 4).any(-1)
        # 16-aligned edges (odd 8-col j): cbf/ref/tb2 term (already at
        # 8-segment granularity) OR'd with the per-sub-CU mv term
        val16_v = cond_v.astype(jnp.int32) \
            | mvd8_v[:, 1::2].astype(jnp.int32)       # [2bh, bw-1]
        val16_h = cond_h.astype(jnp.int32) \
            | mvd8_h[1::2, :].astype(jnp.int32)       # [bh-1, 2bw]
        # 16-interior 8-edges: CU boundaries inside split blocks only
        # (both TU and PU boundary there: cbf + mv terms)
        c8 = cbf8.astype(bool)
        ci_v = c8[:, 0:-1:2] | c8[:, 1::2]            # [2bh, bw]
        ci_h = c8[0:-1:2, :] | c8[1::2, :]            # [bh, 2bw]
        nxn_r = jnp.repeat(nxn, 2, 0)                 # [2bh, bw]
        vali_v = ((mvd8_v[:, 0::2] | ci_v) & nxn_r).astype(jnp.int32)
        nxn_c = jnp.repeat(nxn, 2, 1)                 # [bh, 2bw]
        vali_h = ((mvd8_h[0::2, :] | ci_h) & nxn_c).astype(jnp.int32)
        if is_intra is not None:
            ii = is_intra.astype(bool)
            i_v = jnp.repeat(ii[:, :-1] | ii[:, 1:], 2, 0)
            val16_v = jnp.where(i_v, 2, val16_v)
            i_h = jnp.repeat(ii[:-1] | ii[1:], 2, 1)
            val16_h = jnp.where(i_h, 2, val16_h)
        bs_v = jnp.zeros((h // 4, w // 8), jnp.int32)
        bs_v = bs_v.at[:, 2::2].set(jnp.repeat(val16_v, 2, 0))
        bs_v = bs_v.at[:, 1::2].set(jnp.repeat(vali_v, 2, 0))
        bs_h = jnp.zeros((h // 8, w // 4), jnp.int32)
        bs_h = bs_h.at[2::2, :].set(jnp.repeat(val16_h, 2, 1))
        bs_h = bs_h.at[1::2, :].set(jnp.repeat(vali_h, 2, 1))
        return bs_v, bs_h
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


def _edge_qp_maps(eff_map, h: int, w: int, cell: int):
    """Per-edge average QP maps for the luma deblock passes (spec
    8.7.2.5.3: qp = (QpP + QpQ + 1) >> 1) from a QP grid with `cell`-px
    cells: [h/4, w/8] for vertical edges and [h/8, w/4] for
    horizontal."""
    ncy, ncx = eff_map.shape
    rows = jnp.repeat(eff_map, cell // 4, axis=0)      # [h/4, ncx]
    x = jnp.arange(w // 8) * 8
    cl = jnp.clip((x - 1) // cell, 0, ncx - 1)
    cr = jnp.clip(x // cell, 0, ncx - 1)
    qp_v = (rows[:, cl] + rows[:, cr] + 1) >> 1        # [h/4, w/8]
    cols = jnp.repeat(eff_map, cell // 4, axis=1)      # [ncy, w/4]
    yy = jnp.arange(h // 8) * 8
    rt = jnp.clip((yy - 1) // cell, 0, ncy - 1)
    rb = jnp.clip(yy // cell, 0, ncy - 1)
    qp_h = (cols[rt, :] + cols[rb, :] + 1) >> 1        # [h/8, w/4]
    return qp_v, qp_h


def _edge_qp_maps_chroma(eff_map, h: int, w: int, cell: int,
                         chroma_qp_offset: int):
    """Chroma per-edge QP maps ([hc/2, wc/8], [hc/8, wc/2]): average
    luma QP of the sides mapped through the chroma table (spec
    8.7.2.5.5)."""
    ncy, ncx = eff_map.shape
    cqt = jnp.asarray(tables.CHROMA_QP_TABLE)
    hc, wc = h // 2, w // 2
    rows = jnp.repeat(eff_map, cell // 4, axis=0)      # [hc/2, ncx]
    x = jnp.arange(wc // 8) * 16                       # luma x of edge
    cl = jnp.clip((x - 1) // cell, 0, ncx - 1)
    cr = jnp.clip(x // cell, 0, ncx - 1)
    avg_v = (rows[:, cl] + rows[:, cr] + 1) >> 1
    qp_v = cqt[jnp.clip(avg_v + chroma_qp_offset, 0, 57)]
    cols = jnp.repeat(eff_map, cell // 4, axis=1)      # [ncy, wc/2]
    yy = jnp.arange(hc // 8) * 16
    rt = jnp.clip((yy - 1) // cell, 0, ncy - 1)
    rb = jnp.clip(yy // cell, 0, ncy - 1)
    avg_h = (cols[rt, :] + cols[rb, :] + 1) >> 1
    qp_h = cqt[jnp.clip(avg_h + chroma_qp_offset, 0, 57)]
    return qp_v, qp_h


_FALLBACK_CAP = 512          # max intra CUs per P frame (static shape)
_NXN_CAP = 512               # max inter-NxN CUs per P frame (chroma
                             # per-PU MC is compacted to this cap)


def _intra_fallback_luma(cur_b, recon_y, level_y, cbf_y, inter_pred,
                         qp, s, bh, bw, h, w, sbh_scan,
                         scaling=False, rounds: int = 2, inv=None,
                         geom=None, serial: int = 0):
    """Luma half of the intra fallback: replace up to _FALLBACK_CAP
    inter CUs per round by intra CUs, over `rounds` batched passes.

    Within a round, intra CUs are restricted to blocks whose
    8-neighborhood holds no other PENDING pick, so their ADI reference
    pixels are final (inter reconstructions, or intra blocks COMMITTED
    by earlier rounds — both decoder-exact) — each round stays one
    batched launch with no wavefront, and successive rounds grow
    contiguous intra regions ring by ring (role of the reference's
    free per-CU intra/inter arbitration, hmr_motion_inter.c:3043).
    Candidates: DC-prediction SAD beats the inter SAD with margin; the
    best are gathered via top-k (stream compaction), fully
    mode-searched (all 35 modes), TQ-reconstructed and scattered back.
    Chroma follows per round in _intra_fallback_chroma once the
    (post-quadtree) chroma reconstruction its ADI needs exists."""
    nb = bh * bw
    kcap = min(_FALLBACK_CAP, nb)

    avail = schedule.availability(bw, bh, 64 // s)
    amask = np.stack([avail["bottomleft"], avail["left"],
                      avail["corner"], avail["top"],
                      avail["topright"]], -1).reshape(nb, 5)

    pos_y = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * s, bw)
    pos_x = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * s, bh)
    inter_sad = jnp.sum(jnp.abs(cur_b - inter_pred), (-1, -2))

    is_intra_blk = jnp.zeros((nb,), jnp.int32)
    intra_modes = jnp.zeros((nb,), jnp.int32)
    cand_count = jnp.int32(0)
    rounds_out = []
    for rnd in range(rounds):
        plane_y = _unblocks(recon_y, h, w)

        # ---- DC-proxy decision from DENSE plane ops (the exact ADI
        # gather over every block was the stage's dominant cost; the
        # proxy only RANKS candidates, the coding below uses exact
        # refs).  Top/left first-ring sums come from the edge-padded
        # reconstruction.
        pp = jnp.pad(plane_y, ((1, 0), (1, 0)), mode="edge")
        top_sum = pp[0:h:s, 1:1 + w].reshape(bh, bw, s).sum(-1)
        left_sum = pp[1:1 + h, 0:w:s].reshape(bh, s, bw).sum(1)
        dc = ((top_sum + left_sum + s) // (2 * s)).reshape(nb)
        dc_sad = jnp.sum(jnp.abs(cur_b - dc[:, None, None]), (-1, -2))
        cand = (dc_sad.astype(jnp.float32) < 0.75 * inter_sad) \
            & (is_intra_blk == 0)
        if inv is not None:
            cand = cand & ~inv
        if rnd == 0:
            cand_count = cand.sum().astype(jnp.int32)
        cgrid = cand.reshape(bh, bw)
        pad = jnp.pad(cgrid, 1)
        neigh = jnp.zeros_like(cgrid)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh = neigh | pad[1 + dy:1 + dy + bh,
                                    1 + dx:1 + dx + bw]
        isolated = (cgrid & ~neigh).reshape(nb)

        gain = jnp.where(isolated, inter_sad - dc_sad, -1)
        _, sel = jax.lax.top_k(gain, kcap)            # block indices
        sel_ok = gain[sel] > 0                        # [kcap]

        # ---- full 35-mode search on the selected blocks (exact ADI
        # references gathered for the SELECTED blocks only)
        buf = jnp.zeros((1 + h + s, 1 + w + s), jnp.int32)
        buf = buf.at[1:1 + h, 1:1 + w].set(plane_y)
        adi_sel = _substitute_static(
            _gather_adi_blocks(buf, pos_y[sel], pos_x[sel], s),
            sel, amask, s, geom)
        preds = intra.predict_all_modes(adi_sel, s, True)
        cur_sel = cur_b[sel]
        sads = jnp.sum(jnp.abs(preds - cur_sel[:, None]), (-1, -2))
        best = jnp.argmin(sads, -1).astype(jnp.int32)  # [k]
        pred_sel = jnp.take_along_axis(
            preds, best[:, None, None, None], 1)[:, 0]
        qp_sel = qp[sel] if jnp.ndim(qp) > 0 else qp
        lvl_sel, rr = _tq(cur_sel - pred_sel, s, qp_sel, True,
                          sbh_scan, scaling)
        rec_sel = jnp.clip(pred_sel + rr, 0, 255)
        cbf_sel = jnp.any(lvl_sel != 0, (-1, -2))

        slot = jnp.where(sel_ok, sel, nb)
        recon_y = recon_y.at[slot].set(rec_sel, mode="drop")
        level_y = level_y.at[slot].set(lvl_sel, mode="drop")
        cbf_y = cbf_y.reshape(-1).at[slot].set(cbf_sel, mode="drop") \
            .reshape(bh, bw)
        is_intra_blk = is_intra_blk.at[slot].set(1, mode="drop")
        intra_modes = intra_modes.at[slot].set(best, mode="drop")
        rounds_out.append((sel, slot, best))

    # ---- SERIAL pass: contiguous candidate regions (pan-entry strips,
    # uncovered bands) deadlock the isolation rule — no block is free
    # of pending neighbours.  Commit up to `serial` remaining
    # candidates ONE BY ONE in CODING order (CTU raster + z), chaining
    # the reconstruction like the decoder does; a lax.cond skips the
    # scan when no candidates remain.  DEFAULT OFF: each scan step is
    # dispatch-bound (~2-4 ms of tiny ops), and with the current
    # DC-proxy gate the pass measured RD-neutral on the hard-pan
    # family — enable after the gate prices full-mode intra.
    serial_out = None
    if serial > 0:
        cap_s = min(serial, nb)
        plane_y = _unblocks(recon_y, h, w)
        pp = jnp.pad(plane_y, ((1, 0), (1, 0)), mode="edge")
        top_sum = pp[0:h:s, 1:1 + w].reshape(bh, bw, s).sum(-1)
        left_sum = pp[1:1 + h, 0:w:s].reshape(bh, s, bw).sum(1)
        dc = ((top_sum + left_sum + s) // (2 * s)).reshape(nb)
        dc_sad = jnp.sum(jnp.abs(cur_b - dc[:, None, None]), (-1, -2))
        cand = (dc_sad.astype(jnp.float32) < 0.75 * inter_sad) \
            & (is_intra_blk == 0)
        if inv is not None:
            cand = cand & ~inv
        # blocks whose recon an already-committed intra block's ADI may
        # have read must stay inter (8-neighbourhood of committed)
        ig = is_intra_blk.reshape(bh, bw).astype(bool)
        padg = jnp.pad(ig, 1)
        nei = jnp.zeros_like(ig)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nei = nei | padg[1 + dy:1 + dy + bh, 1 + dx:1 + dx + bw]
        cand = cand & ~nei.reshape(nb)
        gain = jnp.where(cand, inter_sad - dc_sad, -1)
        gv, sel0 = jax.lax.top_k(gain, cap_s)
        ok0 = gv > 0
        order = jnp.asarray(np.asarray(
            schedule.coding_order(bw, bh, 64 // s), np.int32)
            .reshape(-1))
        rank = jnp.where(ok0, order[sel0], jnp.int32(1 << 30))
        perm = jnp.argsort(rank)
        sel_s = sel0[perm]
        ok_s = ok0[perm]
        buf0 = jnp.zeros((1 + h + s, 1 + w + s), jnp.int32) \
            .at[1:1 + h, 1:1 + w].set(plane_y)

        def sstep(carry, x):
            buf, r_y, l_y, cbfl, isb, im = carry
            sl, okk = x
            py = pos_y[sl]
            px = pos_x[sl]
            win = jax.lax.dynamic_slice(buf, (py, px),
                                        (2 * s + 1, 2 * s + 1))
            adi = jnp.concatenate(
                [jnp.flip(win[1:2 * s + 1, 0]), win[0, :]])[None]
            adi = _substitute_static(adi, sl[None], amask, s, geom)
            preds = intra.predict_all_modes(adi, s, True)[0]
            cur1 = cur_b[sl]
            sads = jnp.sum(jnp.abs(preds - cur1[None]), (-1, -2))
            bst = jnp.argmin(sads).astype(jnp.int32)
            pred1 = preds[bst]
            qp1 = qp[sl] if jnp.ndim(qp) > 0 else qp
            lvl1, rr1 = _tq(cur1[None] - pred1[None], s, qp1, True,
                            sbh_scan, scaling)
            rec1 = jnp.clip(pred1[None] + rr1, 0, 255)
            slot1 = jnp.where(okk, sl, nb)
            r_y = r_y.at[slot1].set(rec1[0], mode="drop")
            l_y = l_y.at[slot1].set(lvl1[0], mode="drop")
            cbfl = cbfl.at[slot1].set(jnp.any(lvl1 != 0), mode="drop")
            isb = isb.at[slot1].set(1, mode="drop")
            im = im.at[slot1].set(bst, mode="drop")
            newbuf = jax.lax.dynamic_update_slice(
                buf, rec1[0], (1 + py, 1 + px))
            buf = jnp.where(okk, newbuf, buf)
            return (buf, r_y, l_y, cbfl, isb, im), None

        def run(c):
            out, _ = jax.lax.scan(sstep, c, (sel_s, ok_s))
            return out

        carry0 = (buf0, recon_y, level_y, cbf_y.reshape(-1),
                  is_intra_blk, intra_modes)
        (_, recon_y, level_y, cbf_flat, is_intra_blk, intra_modes) = \
            jax.lax.cond(ok_s.any(), run, lambda c: c, carry0)
        cbf_y = cbf_flat.reshape(bh, bw)
        slot_s = jnp.where(ok_s, sel_s, nb)
        best_s = intra_modes[jnp.clip(sel_s, 0, nb - 1)]
        serial_out = (sel_s, slot_s, best_s, ok_s)
    return (recon_y, level_y, cbf_y, is_intra_blk, intra_modes,
            cand_count, rounds_out, amask, serial_out)

def _gather_adi_blocks(b, py, px, size):
    """ADI L-shapes for k blocks: ONE (2S+1)-square window gather per
    block (rides the Pallas DMA kernel on TPU), then static slices of
    the window's first row/column.  The previous [k, 4S+1] flat
    jnp.take lowered to an elementwise XLA gather (~0.9 ms/frame)."""
    win = me._gather_windows(b, py, px, 2 * size + 1)
    left = win[:, np.arange(2 * size, 0, -1), 0]   # p(-1+j..) bottom-up
    top = win[:, 0, :]                             # corner + top row
    return jnp.concatenate([left, top], -1)


@functools.lru_cache(maxsize=None)
def _fill_tables_np(amask_key, s: int, geom=None):
    """Static reference-substitution machinery for the fallback blocks:
    (pattern_id [nb] int32, M [npat, 4S+2, 4S+1] f32 fill matrices).
    The availability pattern per block is STATIC (block grid position),
    so the spec 8.4.4.2.2 forward-fill becomes, per pattern, a 0/1
    selection matrix over the adi extended with a constant-128 slot —
    replacing both the on-device associative_scan (~1.1 ms/frame) and
    its take_along_axis successor (same cost: element-wise gather)."""
    amask = np.frombuffer(amask_key, dtype=bool).reshape(-1, 5)
    n = 4 * s + 1
    seg = np.zeros((5, n), dtype=bool)
    seg[0, 0:s] = True
    seg[1, s:2 * s] = True
    seg[2, 2 * s] = True
    seg[3, 2 * s + 1:3 * s + 1] = True
    seg[4, 3 * s + 1:] = True
    av_blk = amask @ seg > 0                       # [nb, n]
    if geom is not None:
        # clip reference pixels at the CODED picture bounds (the
        # decoder substitutes samples beyond them, spec 8.4.4.2.2)
        bw_, step, cwt, cht = geom
        idx = np.arange(av_blk.shape[0])
        px = (idx % bw_) * step
        py = (idx // bw_) * step
        j = np.arange(n)
        row = np.where(j < 2 * s, py[:, None] + 2 * s - 1 - j,
                       py[:, None] - 1)
        col = np.where(j <= 2 * s, px[:, None] - 1,
                       px[:, None] + (j - 2 * s - 1))
        av_blk &= (row < cht) & (col < cwt)
    pats, inv = np.unique(av_blk, axis=0, return_inverse=True)
    av = pats                                      # [npat, n]
    pos = np.arange(n)
    ff = np.maximum.accumulate(np.where(av, pos, -1), -1)
    first = av.argmax(-1)
    fidx = np.where(ff >= 0, ff, first[:, None])   # [npat, n]
    m = np.zeros((av.shape[0], n + 1, n), np.float32)
    for p in range(av.shape[0]):
        if av[p].any():
            m[p, fidx[p], pos] = 1.0
        else:
            m[p, n, :] = 1.0                       # all-unavailable: 128
    return inv.astype(np.int32), m


def _substitute_static(adi, sel, amask, s: int, geom=None):
    """substitute_refs with the fill precomputed from the static
    availability mask as per-pattern selection matmuls (one-hot x 0/1 x
    8-bit samples: 1-pass bf16 exact); bit-identical to
    intra.substitute_refs."""
    inv, m = _fill_tables_np(np.ascontiguousarray(
        amask, dtype=bool).tobytes(), s, geom)
    oh = jax.nn.one_hot(jnp.asarray(inv)[sel], m.shape[0],
                        dtype=jnp.float32)               # [k, npat]
    mb = jnp.einsum("kp,pij->kij", oh, jnp.asarray(m),
                    precision=jax.lax.Precision.DEFAULT)
    adi_ext = jnp.concatenate(
        [adi, jnp.full(adi.shape[:-1] + (1,), 128, adi.dtype)], -1)
    return jnp.einsum("ki,kij->kj", adi_ext.astype(jnp.float32), mb,
                      precision=jax.lax.Precision.DEFAULT) \
        .astype(jnp.int32)


def _intra_fallback_chroma(plane_blocks, plane_full, level_c, cbf_c,
                           sel, slot, best, amask, qp_c, cs, bh, bw,
                           h, w, scan, scaling=False, geom=None):
    """Chroma (DM) for the fallback blocks, run AFTER the inter chroma
    coding so the ADI neighbours are the final reconstruction (fallback
    neighbourhoods are excluded from CU merging, so those pixels are
    decoder-exact)."""
    pfull = _unblocks(plane_blocks, h // 2, w // 2)
    cbuf = jnp.zeros((1 + h // 2 + cs, 1 + w // 2 + cs), jnp.int32)
    cbuf = cbuf.at[1:1 + h // 2, 1:1 + w // 2].set(pfull)
    pos_y = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * 2 * cs, bw)
    pos_x = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * 2 * cs, bh)
    adi_c = _substitute_static(
        _gather_adi_blocks(cbuf, pos_y[sel] // 2, pos_x[sel] // 2, cs),
        sel, amask, cs, geom)
    pred_c = intra.predict_single_mode(adi_c, best, cs, False)
    orig_c = _blocks(jnp.asarray(plane_full, jnp.int32), cs)[sel]
    qpc_sel = qp_c[sel] if jnp.ndim(qp_c) > 0 else qp_c
    lvl_c, rr_c = _tq(orig_c - pred_c, cs, qpc_sel, True, scan, scaling)
    rec_c = jnp.clip(pred_c + rr_c, 0, 255)
    cbf_sel = jnp.any(lvl_c != 0, (-1, -2))
    plane_blocks = plane_blocks.at[slot].set(rec_c, mode="drop")
    level_c = level_c.at[slot].set(lvl_c, mode="drop")
    cbf_c = cbf_c.reshape(-1).at[slot].set(cbf_sel, mode="drop") \
        .reshape(bh, bw)
    return plane_blocks, level_c, cbf_c


def _intra_fallback_chroma_serial(plane_blocks, plane_full, level_c,
                                  cbf_c, serial_out, amask, qp_c, cs,
                                  bh, bw, h, w, scan, scaling=False,
                                  geom=None):
    """Chroma (DM) for the SERIAL fallback blocks: one lax.scan in the
    same coding order, chaining the chroma reconstruction (the serial
    blocks may be mutually adjacent, unlike the isolated rounds)."""
    sel_s, slot_s, best_s, ok_s = serial_out
    nb = bh * bw
    pfull = _unblocks(plane_blocks, h // 2, w // 2)
    cbuf0 = jnp.zeros((1 + h // 2 + cs, 1 + w // 2 + cs), jnp.int32) \
        .at[1:1 + h // 2, 1:1 + w // 2].set(pfull)
    pos_y = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * cs, bw)
    pos_x = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * cs, bh)
    orig_b = _blocks(jnp.asarray(plane_full, jnp.int32), cs)

    def cstep(carry, x):
        cbuf, pb, lc, cc = carry
        sl, slot1, bst, okk = x
        cpy = pos_y[sl]
        cpx = pos_x[sl]
        win = jax.lax.dynamic_slice(cbuf, (cpy, cpx),
                                    (2 * cs + 1, 2 * cs + 1))
        adi = jnp.concatenate(
            [jnp.flip(win[1:2 * cs + 1, 0]), win[0, :]])[None]
        adi = _substitute_static(adi, sl[None], amask, cs, geom)
        pred1 = intra.predict_single_mode(adi, bst[None], cs, False)[0]
        orig1 = orig_b[sl]
        qp1 = qp_c[sl] if jnp.ndim(qp_c) > 0 else qp_c
        lvl1, rr1 = _tq(orig1[None] - pred1[None], cs, qp1, True,
                        scan, scaling)
        rec1 = jnp.clip(pred1[None] + rr1, 0, 255)
        pb = pb.at[slot1].set(rec1[0], mode="drop")
        lc = lc.at[slot1].set(lvl1[0], mode="drop")
        cc = cc.at[slot1].set(jnp.any(lvl1 != 0), mode="drop")
        newbuf = jax.lax.dynamic_update_slice(
            cbuf, rec1[0], (1 + cpy, 1 + cpx))
        cbuf = jnp.where(okk, newbuf, cbuf)
        return (cbuf, pb, lc, cc), None

    def run(c):
        out, _ = jax.lax.scan(cstep, c, (sel_s, slot_s, best_s, ok_s))
        return out

    carry0 = (cbuf0, plane_blocks, level_c, cbf_c.reshape(-1))
    (_, plane_blocks, level_c, cbf_flat) = jax.lax.cond(
        ok_s.any(), run, lambda c: c, carry0)
    return plane_blocks, level_c, cbf_flat.reshape(bh, bw)


def encode_p_frame(y, u, v, ref_y, ref_u, ref_v, qp: int, block: int = 16,
                   sign_hiding: bool = False, deblocking: bool = False,
                   sao_enabled: bool = False, ctu: int = 64,
                   intra_fallback: bool = False,
                   chroma_rd_scale: float = 1.0,
                   chroma_qp_offset: int = 0,
                   me_precision: int = 2,
                   scaling_lists: bool = False,
                   me_subpel_r: int = 2,
                   qp_map=None,
                   ref2_y=None, ref2_u=None, ref2_v=None, has_ref2=None,
                   vis_h: int = None, vis_w: int = None,
                   merge_rounds: int = 2, fallback_rounds: int = 2,
                   fallback_serial: int = 0,
                   quadtree_majority: bool = True,
                   inter_nxn: bool = False,
                   true_size: bool = False,
                   wpp_substreams: bool = False,
                   axis_name: str = None, n_bands: int = 1):
    """Encode one P frame against one or two references.

    Row-band sharding (the WPP replacement, ref wfpp_encoder_thread
    hmr_encoder_lib.c:2357): with `axis_name` set, this SAME body runs
    band-local inside shard_map over `n_bands` chips — y/u/v are
    CTU-row bands, the reference planes are replicated, and the few
    cross-band points (global ME median, merge neighbour fields, the
    intra fallback, the deblock H pass, SAO, packing) use ICI
    all_gathers / replicated compute so the bitstream is BIT-IDENTICAL
    to the single-device run (asserted in tests/test_sharding.py).

    Speed-ladder knobs (mapped from perf_mode/rd_mode in api.py; each
    measured on TPU in STATUS.md's ladder table):
    merge_rounds — coherence-propagation rounds of the merge/skip RD;
    fallback_rounds — isolated-intra growth rounds; quadtree_majority —
    evaluate non-MV-uniform 32/64 parents at the majority MV (extra MC
    gathers).

    y/u/v: uint8 planes (CTU-padded); ref_*: int32 reconstructed (and
    deblocked) reference planes of the same shapes.
    Returns FrameRecord fields incl. quarter-pel MVs [bh, bw, 2] (y, x).

    Multi-reference (spec ref_idx_l0; ref ref_pic_list machinery,
    hmr_encoder_lib.c:1546-1576): ref2_* is the second-most-recent
    reconstruction (list0 index 1).  ME runs on both and every block
    picks its reference by cost; the per-block pick flows through
    merge/skip RD (candidates carry (mv, ref) pairs), quadtree
    consolidation (mixed-ref groups don't merge) and chroma MC.
    `has_ref2` (traced bool) masks the pick to 0 for frames that only
    have one reference available (the first P after an IDR) — they are
    coded with num_ref_idx_active = 1 and no ref_idx syntax.
    """
    ax = axis_name
    hb, w = y.shape                  # band height (= frame h when ax None)
    h = hb * n_bands                 # FULL frame height
    s = block
    cs = block // 2
    bh, bw = hb // s, w // s         # band block grid
    BH = h // s                      # full block grid rows
    if ax is None:
        row0 = 0
        brow = 0
    else:
        bidx = jax.lax.axis_index(ax).astype(jnp.int32)
        row0 = bidx * hb             # band pixel-row offset
        brow = bidx * bh             # band block-row offset

    def allg_rows(x):
        """Gather bands along axis 0 (identity single-device)."""
        if ax is None:
            return x
        g = jax.lax.all_gather(x, ax)
        return g.reshape((g.shape[0] * g.shape[1],) + g.shape[2:])

    def band_rows(x, rows=None):
        """Slice this band's rows back out of a full array (identity
        single-device)."""
        if ax is None:
            return x
        r = bh if rows is None else rows
        start = (brow * (r // bh),) + (0,) * (x.ndim - 1)
        return jax.lax.dynamic_slice(
            x, start, (r,) + x.shape[1:])

    qp = jnp.asarray(qp, jnp.int32)   # traced (per-frame rate control)
    qp_c = jnp.asarray(tables.CHROMA_QP_TABLE)[
        jnp.clip(qp + chroma_qp_offset, 0, 57)]
    # per-CTU QP (cu_qp_delta / per-CTU rate control, ref
    # hmr_rc_calc_cu_qp hmr_rate_control.c:261): a FULL-frame
    # [ctus_y, ctus_x] map expanded to per-16-tile arrays; None =
    # uniform slice QP
    ncy, ncx = h // ctu, w // ctu
    if qp_map is None:
        qp_map = jnp.broadcast_to(qp, (ncy, ncx))
    qp_map = jnp.asarray(qp_map, jnp.int32)
    r16 = ctu // s
    qp_t_full = jnp.repeat(jnp.repeat(qp_map, r16, 0), r16, 1)  # [BH,bw]
    qp_t = band_rows(qp_t_full).reshape(-1)
    qp_ct = jnp.asarray(tables.CHROMA_QP_TABLE)[
        jnp.clip(qp_t + chroma_qp_offset, 0, 57)]
    lam_t = tables.rd_lambda(qp_t, False).astype(jnp.float32)
    lam_ct = tables.rd_lambda(qp_ct, False).astype(jnp.float32)
    sbh_scan = tuple(tables.scan_order(s, tables.SCAN_DIAG)) \
        if sign_hiding else None
    sbh_scan_c = tuple(tables.scan_order(cs, tables.SCAN_DIAG)) \
        if sign_hiding else None

    # true-size coding: the decoder's DPB holds only the CODED
    # picture and clamps MC reads at its bounds — equivalent to an
    # edge-replicated pad.  Rebuild every reference plane that way
    # so prediction matches the decoder bit-exactly; the pad-band
    # content of previous reconstructions is never referenced.
    cw8 = ch8 = None
    if true_size and vis_w is not None:
        cw8 = (vis_w + 15) // 16 * 16
        ch8 = (vis_h + 15) // 16 * 16
        if cw8 == w and ch8 == h:
            cw8 = ch8 = None
    if cw8 is not None:
        def _repad(p, bh_, bw_):
            p = jnp.asarray(p, jnp.int32)
            return jnp.pad(p[:bh_, :bw_],
                           ((0, p.shape[0] - bh_),
                            (0, p.shape[1] - bw_)), mode="edge")
        ref_y = _repad(ref_y, ch8, cw8)
        ref_u = _repad(ref_u, ch8 // 2, cw8 // 2)
        ref_v = _repad(ref_v, ch8 // 2, cw8 // 2)
        if ref2_y is not None:
            ref2_y = _repad(ref2_y, ch8, cw8)
            ref2_u = _repad(ref2_u, ch8 // 2, cw8 // 2)
            ref2_v = _repad(ref2_v, ch8 // 2, cw8 // 2)
    geom_l = None if cw8 is None else (bw, s, cw8, ch8)
    geom_c = None if cw8 is None else (bw, s // 2, cw8 // 2, ch8 // 2)
    cur = jnp.asarray(y, jnp.int32)
    refy = jnp.asarray(ref_y, jnp.int32)
    lam = tables.rd_lambda(qp, False)
    lam_c = tables.rd_lambda(qp_c, False)
    # ME returns the final MC prediction (the winning subpel candidate);
    # candidates pay sqrt(lambda)-scaled mv bits vs the field median
    # (the reference's mvcost-vs-AMVP, hmr_motion_inter.c:1300)
    sqlam_me = jnp.sqrt(lam.astype(jnp.float32)) \
        if hasattr(lam, "astype") else jnp.sqrt(jnp.float32(lam))
    median_fn = None
    if ax is not None:
        # the global-motion candidate must see the FULL field so band
        # results stay bit-transparent
        def median_fn(mv0_grid):
            return me.field_median(
                allg_rows(mv0_grid).reshape(BH, bw, 2))
    mv, sad_me, pred = me.motion_estimate(cur, refy, block=s,
                                          precision=me_precision,
                                          subpel_r=me_subpel_r,
                                          sqrt_lam=sqlam_me,
                                          row0=row0,
                                          median_fn=median_fn)
    multi_ref = ref2_y is not None
    ref_sel = None
    if multi_ref:
        ref2y = jnp.asarray(ref2_y, jnp.int32)
        mv1, sad1, pred1 = me.motion_estimate(cur, ref2y, block=s,
                                              precision=me_precision,
                                              subpel_r=me_subpel_r,
                                              sqrt_lam=sqlam_me,
                                              row0=row0,
                                              median_fn=median_fn)
        # per-block reference pick: SAD + a sqrt-lambda-priced ref_idx
        # bin (HM-style ME bit weighting), masked off when the second
        # reference is not actually available this frame
        if has_ref2 is None:
            has_ref2 = jnp.bool_(True)
        ref1_pen = jnp.sqrt(lam_t.reshape(bh, bw).astype(jnp.float32)) \
            * 1.5
        sel = (sad1.reshape(bh, bw) + ref1_pen
               < sad_me.reshape(bh, bw)) & has_ref2
        ref_sel = sel.astype(jnp.int32)
        mv = jnp.where(sel[..., None], mv1, mv)
        pred = jnp.where(sel.reshape(-1)[:, None, None],
                         pred1, pred)
    pos_y = (row0 + jnp.arange(bh, dtype=jnp.int32) * s)[:, None]
    pos_x = (jnp.arange(bw, dtype=jnp.int32) * s)[None, :]
    pos_y = jnp.broadcast_to(pos_y, (bh, bw)).reshape(-1)
    pos_x = jnp.broadcast_to(pos_x, (bh, bw)).reshape(-1)

    cur_b = _blocks(cur, s)
    # blocks fully outside the conformance window (CTU padding) are
    # never displayed: they carry no distortion and fold to skip,
    # costing flags instead of coefficients (vis_h/vis_w = visible
    # frame dims; None = CTU-multiple frame)
    inv16 = inv_full = None
    if (vis_h is not None and vis_w is not None
            and (vis_h < h or vis_w < w)):
        iy = np.arange(BH) * s >= vis_h
        ix = np.arange(bw) * s >= vis_w
        inv_full = jnp.asarray(iy[:, None] | ix[None, :])  # [BH, bw]
        inv16 = band_rows(inv_full).reshape(-1)
    # merge/skip RD arbitration over candidate MVs (exact predictions,
    # full-lambda SSD + CABAC-LUT bits; ref check_rd_cost_merge_2nx2n).
    # Two rounds: round 2 rebuilds the neighbour candidates from round
    # 1's winners, propagating coherence the reference gets for free
    # from its sequential raster scan.
    ref_pad = jnp.pad(refy, me.REF_PAD, mode="edge")
    ref_pads = None
    if multi_ref:
        ref_pads = jnp.stack(
            [ref_pad, jnp.pad(ref2y, me.REF_PAD, mode="edge")])
    mv_me = mv
    with jax.named_scope("merge_rd"):
        # round 2 re-evaluates only the left/top propagation candidates;
        # own/global/zero (and round 1's winner) are carried cached.
        # Banded: neighbour candidate fields derive from the FULL grid
        # (left/top cross band boundaries), gathered over ICI.
        carry = None
        rgrid = ref_sel
        for _ in range(merge_rounds):
            if ax is None:
                cands = merge_candidate_fields(mv)
                nrefs = None
            else:
                mv_full = allg_rows(mv)
                cands_full = merge_candidate_fields(
                    mv_full, me.field_median(mv_full))
                cands = [(band_rows(c), m) for c, m in cands_full]
                nrefs = None
                if rgrid is not None:
                    rfull = allg_rows(rgrid)
                    left_r = jnp.concatenate(
                        [rfull[:, :1], rfull[:, :-1]], 1)
                    top_r = jnp.concatenate(
                        [rfull[:1], rfull[:-1]], 0)
                    nrefs = (band_rows(left_r).reshape(-1),
                             band_rows(top_r).reshape(-1))
            mv_flat, level_y, recon_y, pred_sel, cost16, carry = \
                _merge_skip_rd(cur_b, ref_pad, pos_y, pos_x, mv_me,
                               pred, qp_t, lam_t, s, sbh_scan,
                               cand_fields=cands,
                               scaling=scaling_lists, carry_in=carry,
                               ref_grid=rgrid, ref_pads=ref_pads,
                               inv=inv16, neigh_refs=nrefs)
            mv = mv_flat.reshape(bh, bw, 2)
            if multi_ref:
                rgrid = carry["ref"].reshape(bh, bw)
    if multi_ref:
        ref_sel = carry["ref"].reshape(bh, bw)
    pred = pred_sel
    mv_f = mv_flat
    cbf_y = jnp.any(level_y != 0, axis=(-1, -2)).reshape(bh, bw)
    cpad = me.REF_PAD // 2

    # ---- isolated intra fallback, LUMA (scene changes / uncovered
    # content; role of the reference's per-CU intra-vs-inter
    # arbitration, hmr_motion_inter.c:3043).  Chroma follows after the
    # (single) chroma coding pass below.
    nb = bh * bw
    is_intra_blk = jnp.zeros((nb,), jnp.int32)
    intra_modes = jnp.zeros((nb,), jnp.int32)
    cand_count = jnp.int32(0)
    if intra_fallback and ax is None:
        (recon_y, level_y, cbf_y, is_intra_blk, intra_modes,
         cand_count, fb_rounds, fb_amask, fb_serial) = \
            _intra_fallback_luma(
                cur_b, recon_y, level_y, cbf_y, pred, qp_t, s, bh, bw,
                h, w, sbh_scan, scaling_lists,
                rounds=fallback_rounds, inv=inv16, geom=geom_l,
                serial=fallback_serial)
    elif intra_fallback:
        # banded: the fallback's global top-k selection and its intra
        # reference pixels cross band boundaries, and the stage is a
        # small fraction of frame compute — gather and run it
        # REPLICATED (every chip computes the identical result, so the
        # bitstream matches the single-device run), then slice the
        # band's rows back out.
        qtf = qp_t_full.reshape(-1)
        invf = inv_full.reshape(-1) if inv_full is not None else None
        (rec_f, lvl_f, cbf_f, isb_f, im_f, cand_count, fb_rounds,
         fb_amask, fb_serial) = _intra_fallback_luma(
            allg_rows(cur_b), allg_rows(recon_y), allg_rows(level_y),
            allg_rows(cbf_y), allg_rows(pred),
            qtf, s, BH, bw, h, w, sbh_scan, scaling_lists,
            rounds=fallback_rounds, inv=invf, geom=geom_l,
            serial=fallback_serial)
        recon_y = band_rows(rec_f.reshape(BH, bw, s, s)) \
            .reshape(-1, s, s)
        level_y = band_rows(lvl_f.reshape(BH, bw, s, s)) \
            .reshape(-1, s, s)
        cbf_y = band_rows(cbf_f)
        is_intra_blk = band_rows(isb_f.reshape(BH, bw)).reshape(-1)
        intra_modes = band_rows(im_f.reshape(BH, bw)).reshape(-1)

    if intra_fallback:
        # frame-level intra-preference signal for the scene-change
        # restart (ref intra-ratio check, hmr_motion_inter.c:2836):
        # the fallback's DC proxy is blind to angular-predictable
        # content (rotating edges / wipes), so ALSO count blocks whose
        # dense 35-mode SATD beats the ME result — when most of the
        # frame would rather be intra, the next frame restarts as IDR.
        # The dense pass is expensive (~14 ms/frame), so it only runs
        # (lax.cond — a real branch under jit/scan) when the cheap
        # signals suggest a possible scene change: many DC-proxy
        # candidates, or a poorly predicted frame (high mean ME SAD).
        # Banded: runs replicated on the gathered source so the packed
        # count matches the single-device run bit-exactly.
        from homerhevc_tpu.models import intra_frame as _intra_model
        NB = BH * bw
        cur_full = cur if ax is None else allg_rows(cur)
        sad_me_sum = jnp.sum(sad_me) if ax is None else \
            jax.lax.psum(jnp.sum(sad_me), ax)
        sad_me_full = sad_me if ax is None else \
            allg_rows(sad_me.reshape(bh, bw)).reshape(-1)

        def _dense_count(_):
            with jax.named_scope("intra_pref"):
                _, ip_cost = _intra_model._dense_best(
                    cur_full, 16, ctu,
                    jnp.sqrt(tables.rd_lambda(qp, True)
                             .astype(jnp.float32)))
                return jnp.sum(
                    ip_cost.reshape(-1) < sad_me_full.reshape(-1)
                    .astype(jnp.float32)).astype(jnp.int32)

        mean_sad_px = sad_me_sum.astype(jnp.float32) / (h * w)
        maybe_scene = (cand_count > NB // 4) | (mean_sad_px > 6.0)
        ip_count = jax.lax.cond(maybe_scene, _dense_count,
                                lambda _: jnp.int32(0), None)
        cand_count = jnp.maximum(cand_count, ip_count)

    # ---- 8x8 inter CUs: 16x16 blocks with divergent motion re-code
    # as FOUR 8x8 2Nx2N CUs, each with its own MV and 8x8 TB (the
    # spec-legal form of 8x8 motion granularity here: the stream's
    # MinCbLog2SizeY is 3 for the intra 8x8/4x4 CUs, and part_mode NxN
    # is only allowed when log2CbSize == MinCbLog2SizeY, spec 7.4.9.5 —
    # so NxN-at-16 cannot be signalled.  Role of the reference's
    # max-depth NxN/8x8 search, hmr_motion_inter.c:3088.)
    # Each quadrant refines ±2 integer pel around the CU's winning MV
    # (keeping its subpel phase); taken when the RD incl. split/per-CU
    # header+mv bits beats the 16x16 winner.  Chroma for taken blocks
    # codes four 4x4 TBs MC'd at each sub-CU's MV in the chroma stage.
    nxn16 = jnp.zeros((nb,), bool)
    mv8_pu = None
    cbf8q = None
    # intra-fallback dilation (8-neighbourhood): blocks whose recon the
    # fallback's ADI may have read must NOT be re-coded by any later
    # stage (split8/quadtree) — the decoder reconstructs the intra
    # block from the FINAL neighbours (also feeds qt_excl below)
    ig_full = (is_intra_blk.reshape(bh, bw) if ax is None
               else allg_rows(is_intra_blk.reshape(bh, bw))) \
        .astype(bool)
    gh_f = ig_full.shape[0]
    pad_i = jnp.pad(ig_full, 1)
    dil_full = jnp.zeros_like(ig_full)
    for ddy in (-1, 0, 1):
        for ddx in (-1, 0, 1):
            dil_full = dil_full | pad_i[1 + ddy:1 + ddy + gh_f,
                                        1 + ddx:1 + ddx + bw]
    dil = band_rows(dil_full)
    if inter_nxn:
        with jax.named_scope("inter_split8"):
            r8 = 3
            capb = min(_NXN_CAP, nb)
            bh8, bw8 = 2 * bh, 2 * bw
            mv16_8 = jnp.repeat(jnp.repeat(mv, 2, 0), 2, 1) \
                .reshape(-1, 2)                         # [4nb, 2]
            # --- candidate selection FIRST (the dense per-quadrant
            # pass cost ~20 ms/frame at 720p; divergent-motion blocks
            # are sparse).  Signal: the winner's residual energy.
            # The cap is chosen over the GLOBAL grid so row sharding
            # picks identical candidates; each band then compacts its
            # own members (<= cap slots).
            resid16 = jnp.sum(jnp.abs(cur_b - pred_sel),
                              (-1, -2)).astype(jnp.float32)
            elig = (is_intra_blk == 0) & ~dil.reshape(-1)
            if inv16 is not None:
                elig = elig & ~inv16
            key_band = jnp.where(elig, resid16, -1.0)
            key_full = key_band if ax is None else \
                allg_rows(key_band.reshape(bh, bw)).reshape(-1)
            NBf = key_full.shape[0]
            kv_f, sel_gf = jax.lax.top_k(key_full, min(_NXN_CAP, NBf))
            keep_f = jnp.zeros((NBf,), bool).at[sel_gf].set(kv_f > 0)
            cand_band = band_rows(keep_f.reshape(-1, bw)).reshape(-1) \
                & elig
            kb, bsel = jax.lax.top_k(
                jnp.where(cand_band,
                          jnp.int32(1 << 30) - jnp.arange(nb), 0),
                capb)
            okb = kb > 0                               # [capb]
            slot16 = jnp.where(okb, bsel, nb)
            byi, bxi = bsel // bw, bsel % bw
            qdy = jnp.asarray([0, 0, 1, 1], jnp.int32)
            qdx = jnp.asarray([0, 1, 0, 1], jnp.int32)
            pu_sel = ((2 * byi[:, None] + qdy[None]) * bw8
                      + 2 * bxi[:, None] + qdx[None]).reshape(-1)
            slot8 = jnp.where(jnp.repeat(okb, 4), pu_sel, 4 * nb)

            # --- per-quadrant refine + code on the compacted set
            cur8_all = _blocks(cur, 8)                  # [4nb, 8, 8]
            cur8 = cur8_all[pu_sel]                     # [4capb, 8, 8]
            p8y_all = (row0 + jnp.arange(bh8, dtype=jnp.int32) * 8)
            p8y = p8y_all[pu_sel // bw8]
            p8x = (pu_sel % bw8) * 8
            mv16_q = mv16_8[pu_sel]
            ref8 = None
            if multi_ref:
                ref8 = jnp.repeat(ref_sel.reshape(-1)[bsel], 4)
            g8y = me.REF_PAD + p8y + (mv16_q[:, 0] >> 2) - r8
            g8x = me.REF_PAD + p8x + (mv16_q[:, 1] >> 2) - r8
            if multi_ref:
                win8 = me._gather_windows_ref(ref_pads, ref8, g8y, g8x,
                                              8 + 2 * r8)
            else:
                win8 = me._gather_windows(ref_pad, g8y, g8x, 8 + 2 * r8)
            sads8 = me._stacked_window_sads(win8, cur8, 8, r8)
            offs8 = jnp.asarray(
                [(dy, dx) for dy in range(-r8, r8 + 1)
                 for dx in range(-r8, r8 + 1)], jnp.int32)
            mv8 = mv16_q + 4 * offs8[jnp.argmin(sads8, 0)]  # qpel
            pred8 = me.mc_luma_at(ref_pads if multi_ref else ref_pad,
                                  p8y, p8x, mv8, 8, ref=ref8)

            def _asm8(t):   # [4capb, 8, 8] q-major -> [capb, 16, 16]
                return t.reshape(-1, 2, 2, 8, 8) \
                    .transpose(0, 1, 3, 2, 4).reshape(-1, 16, 16)

            # four 8x8 TBs, one per sub-CU
            sbh8 = tuple(tables.scan_order(8, tables.SCAN_DIAG)) \
                if sign_hiding else None
            qp_q = jnp.repeat(qp_t[bsel], 4)
            lam_q = jnp.repeat(lam_t[bsel], 4)
            lvl8, rr8 = _tq(cur8 - pred8, 8, qp_q, False, sbh8,
                            scaling_lists)
            rec8 = jnp.clip(pred8 + rr8, 0, 255)
            # per-sub-CU zero-residual fold (skip-style) — each 8x8 CU
            # decides independently (selected blocks are never in the
            # conformance padding, so no inv weighting here)
            lvl8, rec8 = _rd_zero(lvl8, rec8, pred8, cur8, lam_q,
                                  qp=qp_q)
            rec_nxn = _asm8(rec8)                       # [capb, 16, 16]
            lvl_nxn = _asm8(lvl8)
            orig_sel = cur_b[bsel]
            ssd_n = jnp.sum((rec_nxn - orig_sel) ** 2,
                            (-1, -2)).astype(jnp.float32)
            mvd8 = mv8 - mv16_q
            # per-sub-CU bits: header (~3 bins) + merge (~2) when the
            # MV kept the parent (a neighbour will carry it) else mvd
            cu_bits = 3.0 + jnp.where((mvd8 == 0).all(-1), 2.0,
                                      rdbits.mvd_bits(mvd8) + 4.0)
            rb_q = rdbits.residual_bits(lvl8, 8, qp=qp_q)
            bits16 = (cu_bits + rb_q).reshape(-1, 4).sum(-1) + 1.0
            cost_nxn = ssd_n + lam_t[bsel] * bits16
            diverged = (mvd8 != 0).any(-1).reshape(-1, 4).any(-1)
            take = okb & diverged & (cost_nxn < cost16[bsel])
            slot16 = jnp.where(take, bsel, nb)
            slot8 = jnp.where(jnp.repeat(take, 4), pu_sel, 4 * nb)
            nxn16 = jnp.zeros((nb,), bool).at[slot16].set(
                True, mode="drop")
            level_y = level_y.at[slot16].set(lvl_nxn, mode="drop")
            recon_y = recon_y.at[slot16].set(rec_nxn, mode="drop")
            cbf_y = cbf_y.reshape(-1).at[slot16].set(
                jnp.any(lvl_nxn != 0, (-1, -2)),
                mode="drop").reshape(bh, bw)
            cost16 = cost16.at[slot16].set(cost_nxn, mode="drop")
            # final per-sub-CU MVs and TB cbfs (committed blocks keep
            # their refined quadrants; others collapse to the CU MV)
            mv8_pu = mv16_8.at[slot8].set(mv8, mode="drop")
            cbf8q = jnp.zeros((4 * nb,), bool).at[slot8].set(
                jnp.any(lvl8 != 0, (-1, -2)), mode="drop")

    # ---- device CU-quadtree consolidation (VERDICT round-2 item 3):
    # fold 2x2 / 4x4 tile groups into 32/64 CUs with TU-size RDO.
    # Groups touching (or adjacent to) intra-fallback blocks are
    # excluded so the fallback's intra reference pixels stay exactly
    # what the decoder reconstructs; NxN CUs are leaves by definition.
    with jax.named_scope("quadtree"):
        # (dilation computed above, before split8)
        qt_excl = dil.reshape(-1) | nxn16
        (mv, level_y, recon_y, cbf_y, cu_depth, tr_depth, chroma16) = \
            quadtree_consolidate(
                cur_b, pred_sel, mv, level_y, recon_y,
                cost16, qt_excl, qp_t, lam_t, bh, bw,
                sign_hiding, scaling_lists,
                ref_flat=None if not multi_ref else ref_sel.reshape(-1),
                ref_pad=ref_pad if quadtree_majority else None,
                ref_pads=ref_pads if quadtree_majority else None,
                y0=row0, inv=inv16,
                coded=None if cw8 is None else (cw8, ch8))
        # split blocks become four 8x8 CUs (depth 3, TU8 leaves)
        cu_depth = jnp.where(nxn16.reshape(bh, bw), 3, cu_depth)
        mv_f = mv.reshape(-1, 2)

        # chroma coding (single pass, post-quadtree): prediction at
        # the final MV; one 16x16 chroma TB where the luma TB is
        # 32-wide, else four 8x8 TBs
        qp_ct_g = qp_ct.reshape(bh // 2, 2, bw // 2, 2)[:, 0, :, 0] \
            .reshape(-1)
        lam_ct_g = lam_ct.reshape(bh // 2, 2, bw // 2, 2)[:, 0, :, 0] \
            .reshape(-1)

        # window gather for BOTH chroma planes (and both references in
        # multi-ref) as ONE stacked ref-indexed call, hoisted out of
        # the vmap below (the Pallas gather kernel cannot sit under
        # jax.vmap)
        cby = cpad + pos_y // 2 + (mv_f[:, 0] >> 3) - 1
        cbx = cpad + pos_x // 2 + (mv_f[:, 1] >> 3) - 1
        cpadf = lambda p: jnp.pad(jnp.asarray(p, jnp.int32), cpad,
                                  mode="edge")
        if multi_ref:
            cplanes = jnp.stack([cpadf(ref_u), cpadf(ref2_u),
                                 cpadf(ref_v), cpadf(ref2_v)])
            ri = ref_sel.reshape(-1)
            ri2 = jnp.concatenate([ri, 2 + ri])
        else:
            cplanes = jnp.stack([cpadf(ref_u), cpadf(ref_v)])
            ri2 = jnp.repeat(jnp.arange(2, dtype=jnp.int32), nb)
        cw2 = me._gather_windows_ref(
            cplanes, ri2, jnp.tile(cby, 2), jnp.tile(cbx, 2),
            cs + 3).reshape(2, nb, cs + 3, cs + 3)

        def rechroma(plane, cw, scan):
            cpred = interp.mc_chroma_phases(cw, mv_f[:, 0] & 7,
                                            mv_f[:, 1] & 7, cs)
            cb = _blocks(jnp.asarray(plane, jnp.int32), cs)
            # TB8 path
            lvl8, rr8 = _tq(cb - cpred, cs, qp_ct, False, scan,
                            scaling_lists)
            rec8 = jnp.clip(cpred + rr8, 0, 255)
            lvl8, rec8 = _rd_zero(lvl8, rec8, cpred, cb,
                                  lam_ct * chroma_rd_scale, inv=inv16,
                                  qp=qp_ct)
            # TB16 path over 2x2 groups of chroma blocks
            g2h, g2w = bh // 2, bw // 2
            asm = lambda t: t.reshape(g2h, 2, g2w, 2, cs, cs) \
                .transpose(0, 2, 1, 4, 3, 5).reshape(-1, 2 * cs, 2 * cs)
            spl = lambda p: p.reshape(g2h, g2w, 2, cs, 2, cs) \
                .transpose(0, 2, 1, 4, 3, 5)
            pred16 = asm(cpred.reshape(bh, bw, cs, cs))
            orig16 = asm(cb.reshape(bh, bw, cs, cs))
            scan16 = tuple(tables.scan_order(2 * cs, tables.SCAN_DIAG)) \
                if sign_hiding else None
            lvl16c, rr16c = _tq(orig16 - pred16, 2 * cs, qp_ct_g,
                                False, scan16, scaling_lists)
            rec16c = jnp.clip(pred16 + rr16c, 0, 255)
            inv16g = None
            if inv16 is not None:
                inv16g = inv16.reshape(bh, bw)[::2, ::2].reshape(-1) \
                    & inv16.reshape(bh, bw)[1::2, 1::2].reshape(-1)
            lvl16c, rec16c = _rd_zero(lvl16c, rec16c, pred16, orig16,
                                      lam_ct_g * chroma_rd_scale,
                                      inv=inv16g, qp=qp_ct_g)
            cbf16c = jnp.any(lvl16c != 0, (-1, -2))      # [g2]

            def tiles(p16):   # [g2, 2cs, 2cs] -> [bh, bw, cs, cs]
                return p16.reshape(g2h, g2w, 2, cs, 2, cs) \
                    .transpose(0, 2, 1, 4, 3, 5) \
                    .reshape(bh, bw, cs, cs)

            ch16 = jnp.repeat(jnp.repeat(chroma16, 2, 0), 2, 1)
            sel16 = ch16.reshape(-1)[:, None, None]
            new_lvl = jnp.where(sel16,
                                tiles(lvl16c).reshape(-1, cs, cs), lvl8)
            new_rec = jnp.where(sel16,
                                tiles(rec16c).reshape(-1, cs, cs), rec8)
            new_cbf = jnp.where(
                ch16, jnp.repeat(jnp.repeat(
                    cbf16c.reshape(g2h, g2w), 2, 0), 2, 1),
                jnp.any(new_lvl != 0, (-1, -2)).reshape(bh, bw))
            return new_lvl, new_rec, new_cbf

        # Cb and Cr share every shape and table: run them as ONE
        # vmapped call (halves the sequential op count of the stage)
        lvl_c2, rec_c2, cbf_c2 = jax.vmap(
            lambda p, cwv: rechroma(p, cwv, sbh_scan_c))(
                jnp.stack([jnp.asarray(u, jnp.int32),
                           jnp.asarray(v, jnp.int32)]), cw2)
        level_u, level_v = lvl_c2[0], lvl_c2[1]
        recon_u, recon_v = rec_c2[0], rec_c2[1]
        cbf_u, cbf_v = cbf_c2[0], cbf_c2[1]

        # split-CU chroma: each committed 8x8 sub-CU carries a 4x4
        # chroma TB MC'd at ITS MV (compacted to _NXN_CAP blocks; the
        # TB8 results above are fully overwritten at these slots)
        cbf8c_u = jnp.zeros((4 * nb,), bool)
        cbf8c_v = jnp.zeros((4 * nb,), bool)
        if inter_nxn:
            capb = min(_NXN_CAP, nb)
            keyb = jnp.where(nxn16,
                             jnp.int32(1 << 30) - jnp.arange(nb), 0)
            kv, bsel = jax.lax.top_k(keyb, capb)
            okb = kv > 0
            byi, bxi = bsel // bw, bsel % bw
            qdy = jnp.asarray([0, 0, 1, 1], jnp.int32)
            qdx = jnp.asarray([0, 1, 0, 1], jnp.int32)
            pu_idx = ((2 * byi[:, None] + qdy[None]) * (2 * bw)
                      + 2 * bxi[:, None] + qdx[None]).reshape(-1)
            mv8s = mv8_pu[pu_idx]                      # [4capb, 2]
            puy = pos_y[bsel][:, None] + qdy[None] * 8
            pux = pos_x[bsel][:, None] + qdx[None] * 8
            cby_n = cpad + puy.reshape(-1) // 2 + (mv8s[:, 0] >> 3) - 1
            cbx_n = cpad + pux.reshape(-1) // 2 + (mv8s[:, 1] >> 3) - 1
            if multi_ref:
                rs = jnp.repeat(ref_sel.reshape(-1)[bsel], 4)
                ri_uv = jnp.concatenate([rs, 2 + rs])
            else:
                ri_uv = jnp.repeat(jnp.arange(2, dtype=jnp.int32),
                                   4 * capb)
            cw_n = me._gather_windows_ref(
                cplanes, ri_uv, jnp.tile(cby_n, 2), jnp.tile(cbx_n, 2),
                4 + 3)                                 # [2*4capb, 7, 7]
            pn = interp.mc_chroma_phases(
                cw_n, jnp.tile(mv8s[:, 0] & 7, 2),
                jnp.tile(mv8s[:, 1] & 7, 2), 4)        # [2*4capb, 4, 4]

            def quads(cblk):   # [capb, 8, 8] -> [capb*4, 4, 4]
                return cblk.reshape(-1, 2, 4, 2, 4) \
                    .transpose(0, 1, 3, 2, 4).reshape(-1, 4, 4)

            def unquads(q):    # [capb*4, 4, 4] -> [capb, 8, 8]
                return q.reshape(-1, 2, 2, 4, 4) \
                    .transpose(0, 1, 3, 2, 4).reshape(-1, 8, 8)

            ou = _blocks(jnp.asarray(u, jnp.int32), cs)[bsel]
            ov = _blocks(jnp.asarray(v, jnp.int32), cs)[bsel]
            orig4 = jnp.concatenate([quads(ou), quads(ov)])
            scan4 = tuple(tables.scan_order(4, tables.SCAN_DIAG)) \
                if sign_hiding else None
            qpc_sel = jnp.tile(jnp.repeat(qp_ct[bsel], 4), 2)
            lamc_sel = jnp.tile(jnp.repeat(lam_ct[bsel], 4), 2)
            lvl4, rr4 = _tq(orig4 - pn, 4, qpc_sel, False, scan4,
                            scaling_lists)
            rec4 = jnp.clip(pn + rr4, 0, 255)
            lvl4, rec4 = _rd_zero(lvl4, rec4, pn, orig4,
                                  lamc_sel * chroma_rd_scale,
                                  qp=qpc_sel)
            cbf4 = jnp.any(lvl4 != 0, (-1, -2))        # [2*4capb]
            slots = jnp.where(okb, bsel, nb)
            level_u = level_u.at[slots].set(
                unquads(lvl4[:4 * capb]), mode="drop")
            recon_u = recon_u.at[slots].set(
                unquads(rec4[:4 * capb]), mode="drop")
            level_v = level_v.at[slots].set(
                unquads(lvl4[4 * capb:]), mode="drop")
            recon_v = recon_v.at[slots].set(
                unquads(rec4[4 * capb:]), mode="drop")
            # per-sub-CU chroma cbfs + per-16 rollup
            slots4 = jnp.where(okb[:, None], pu_idx.reshape(capb, 4),
                               4 * nb).reshape(-1)
            cbf8c_u = cbf8c_u.at[slots4].set(
                cbf4[:4 * capb], mode="drop")
            cbf8c_v = cbf8c_v.at[slots4].set(
                cbf4[4 * capb:], mode="drop")
            any_u = cbf4[:4 * capb].reshape(capb, 4).any(-1)
            any_v = cbf4[4 * capb:].reshape(capb, 4).any(-1)
            cbf_u = cbf_u.reshape(-1).at[slots].set(
                any_u, mode="drop").reshape(bh, bw)
            cbf_v = cbf_v.reshape(-1).at[slots].set(
                any_v, mode="drop").reshape(bh, bw)

    # ---- fallback chroma (after the chroma pass so its DM intra
    # prediction reads final neighbour reconstructions)
    if intra_fallback and ax is None:
        # per round, so a later round's chroma ADI reads the committed
        # chroma reconstructions of the earlier rounds
        for fb_sel, fb_slot, fb_best in fb_rounds:
            recon_u, level_u, cbf_u = _intra_fallback_chroma(
                recon_u, u, level_u, cbf_u, fb_sel, fb_slot, fb_best,
                fb_amask, qp_ct, cs, bh, bw, h, w, sbh_scan_c,
                scaling_lists, geom=geom_c)
            recon_v, level_v, cbf_v = _intra_fallback_chroma(
                recon_v, v, level_v, cbf_v, fb_sel, fb_slot, fb_best,
                fb_amask, qp_ct, cs, bh, bw, h, w, sbh_scan_c,
                scaling_lists, geom=geom_c)
        if fb_serial is not None:
            recon_u, level_u, cbf_u = _intra_fallback_chroma_serial(
                recon_u, u, level_u, cbf_u, fb_serial, fb_amask,
                qp_ct, cs, bh, bw, h, w, sbh_scan_c, scaling_lists,
                geom=geom_c)
            recon_v, level_v, cbf_v = _intra_fallback_chroma_serial(
                recon_v, v, level_v, cbf_v, fb_serial, fb_amask,
                qp_ct, cs, bh, bw, h, w, sbh_scan_c, scaling_lists,
                geom=geom_c)
    elif intra_fallback:
        # banded: replicated like the luma fallback (fb_rounds carry
        # FULL-frame block indices), then slice the band back out
        qct_f = jnp.asarray(tables.CHROMA_QP_TABLE)[
            jnp.clip(qp_t_full.reshape(-1) + chroma_qp_offset, 0, 57)]
        gath = [allg_rows(a) for a in
                (recon_u, level_u, cbf_u, recon_v, level_v, cbf_v,
                 jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32))]
        ru_f, lu_f, cu_f, rv_f, lv_f, cv_f, u_f, v_f = gath
        for fb_sel, fb_slot, fb_best in fb_rounds:
            ru_f, lu_f, cu_f = _intra_fallback_chroma(
                ru_f, u_f, lu_f, cu_f, fb_sel, fb_slot, fb_best,
                fb_amask, qct_f, cs, BH, bw, h, w, sbh_scan_c,
                scaling_lists, geom=geom_c)
            rv_f, lv_f, cv_f = _intra_fallback_chroma(
                rv_f, v_f, lv_f, cv_f, fb_sel, fb_slot, fb_best,
                fb_amask, qct_f, cs, BH, bw, h, w, sbh_scan_c,
                scaling_lists, geom=geom_c)
        if fb_serial is not None:
            ru_f, lu_f, cu_f = _intra_fallback_chroma_serial(
                ru_f, u_f, lu_f, cu_f, fb_serial, fb_amask,
                qct_f, cs, BH, bw, h, w, sbh_scan_c, scaling_lists,
                geom=geom_c)
            rv_f, lv_f, cv_f = _intra_fallback_chroma_serial(
                rv_f, v_f, lv_f, cv_f, fb_serial, fb_amask,
                qct_f, cs, BH, bw, h, w, sbh_scan_c, scaling_lists,
                geom=geom_c)
        bslc = lambda a: band_rows(a.reshape(BH, bw, cs, cs)) \
            .reshape(-1, cs, cs)
        recon_u, level_u = bslc(ru_f), bslc(lu_f)
        recon_v, level_v = bslc(rv_f), bslc(lv_f)
        cbf_u, cbf_v = band_rows(cu_f), band_rows(cv_f)

    # running-distortion signal for rate control (role of the
    # reference's avg_dist accumulation, hmr_encoder_lib.c:2722-2752):
    # mean per-16x16-block luma SAD of the unfiltered reconstruction
    NB = BH * bw
    dsum = jnp.sum(jnp.abs(recon_y - cur_b))
    if ax is not None:
        dsum = jax.lax.psum(dsum, ax)
    dist16 = dsum // NB

    # ---- assemble the frame (identity single-device; ICI all_gather
    # banded — role of the reference's frame-assembly joins).  The
    # trailing stages (deblock H, SAO, packing) run on full-frame maps;
    # the vertical deblock pass stays band-local (row-local math).
    out_y = _unblocks(recon_y, hb, w)
    out_u = _unblocks(recon_u, hb // 2, w // 2)
    out_v = _unblocks(recon_v, hb // 2, w // 2)
    if ax is not None:
        level_y = allg_rows(level_y)
        level_u = allg_rows(level_u)
        level_v = allg_rows(level_v)
        cbf_u = allg_rows(cbf_u)
        cbf_v = allg_rows(cbf_v)
        mv = allg_rows(mv)
        cu_depth = allg_rows(cu_depth)
        tr_depth = allg_rows(tr_depth)
        is_intra_blk = allg_rows(
            is_intra_blk.reshape(bh, bw)).reshape(-1)
        intra_modes = allg_rows(intra_modes.reshape(bh, bw)).reshape(-1)
        if multi_ref:
            ref_sel = allg_rows(ref_sel)
        nxn16 = allg_rows(nxn16.reshape(bh, bw)).reshape(-1)
        if mv8_pu is not None:
            mv8_pu = allg_rows(
                mv8_pu.reshape(2 * bh, 2 * bw, 2)).reshape(-1, 2)
            cbf8q = allg_rows(
                cbf8q.reshape(2 * bh, 2 * bw)).reshape(-1)
            cbf8c_u = allg_rows(
                cbf8c_u.reshape(2 * bh, 2 * bw)).reshape(-1)
            cbf8c_v = allg_rows(
                cbf8c_v.reshape(2 * bh, 2 * bw)).reshape(-1)
        out_u = allg_rows(out_u)
        out_v = allg_rows(out_v)
        u = allg_rows(jnp.asarray(u, jnp.int32))
        v = allg_rows(jnp.asarray(v, jnp.int32))

    # final per-8x8-sub-CU MV field (full frame): split blocks keep
    # their refined quadrants, everything else replicates the (possibly
    # quadtree-consolidated) CU MV; per-8 TB cbf maps likewise
    mv8_final = jnp.repeat(jnp.repeat(mv, 2, 0), 2, 1).reshape(-1, 2)
    cbf8_y = jnp.repeat(jnp.repeat(cbf_y, 2, 0), 2, 1).reshape(-1) \
        if ax is None else None
    if ax is not None:
        cbf8_y = jnp.repeat(jnp.repeat(
            allg_rows(cbf_y), 2, 0), 2, 1).reshape(-1)
    cbf8_bits = jnp.zeros((4 * BH * bw,), jnp.int32)
    if mv8_pu is not None:
        nxn8f = jnp.repeat(jnp.repeat(nxn16.reshape(BH, bw), 2, 0),
                           2, 1).reshape(-1)
        mv8_final = jnp.where(nxn8f[:, None], mv8_pu, mv8_final)
        cbf8_y = jnp.where(nxn8f, cbf8q, cbf8_y)
        cbf8_bits = (jnp.where(nxn8f, cbf8q, False).astype(jnp.int32)
                     | (cbf8c_u.astype(jnp.int32) << 1)
                     | (cbf8c_v.astype(jnp.int32) << 2))

    cbf_y_full = cbf_y if ax is None else allg_rows(cbf_y)
    if deblocking:
        # EFFECTIVE QP for the in-loop filter (spec 8.6.1, QG = CTB):
        # a CTU with no coded cbf never writes its cu_qp_delta, so the
        # decoder keeps the previous QP in decoding order; within a
        # delta-carrying CTU, CUs decoded BEFORE the delta's CU also
        # still use the predicted QP.  Replicate with (a) a forward-
        # fill scan over the CTU raster and (b) a per-granule split at
        # the z-scan start of the first cbf-carrying CU.  All maps here
        # are FULL-frame (the decoding-order chain crosses bands).
        cbf_any_g = (cbf_y_full | cbf_u | cbf_v)           # [BH, bw]
        has_cbf_ctu2 = cbf_any_g.reshape(
            ncy, r16, ncx, r16).any((1, 3))                # [ncy, ncx]
        if wpp_substreams:
            # WPP substreams: QpY_prev resets to the slice QP at
            # each CTU row (spec 8.6.1 with entropy_coding_sync; the
            # writer's encode_wpp does the same) — the forward-fill
            # chain runs PER ROW
            colc = jnp.arange(ncx, dtype=jnp.int32)[None, :]
            ffr = jax.lax.associative_scan(
                jnp.maximum,
                jnp.where(has_cbf_ctu2, colc, -1), axis=1)
            eff2 = jnp.where(
                ffr >= 0,
                jnp.take_along_axis(qp_map, jnp.maximum(ffr, 0), 1),
                qp)                                        # [ncy, ncx]
            prev2 = jnp.concatenate(
                [jnp.broadcast_to(qp, (ncy, 1)), eff2[:, :-1]], 1)
            eff = eff2.reshape(-1)
            prev_eff = prev2.reshape(-1)
        else:
            has_cbf_ctu = has_cbf_ctu2.reshape(-1)
            posc = jnp.arange(ncy * ncx, dtype=jnp.int32)
            ff = jax.lax.associative_scan(
                jnp.maximum, jnp.where(has_cbf_ctu, posc, -1))
            eff = jnp.where(ff >= 0,
                            qp_map.reshape(-1)[jnp.maximum(ff, 0)],
                            qp)
            # QP that PRECEDES each CTU (prediction for its leading
            # CUs)
            prev_eff = jnp.concatenate(
                [jnp.broadcast_to(qp, (1,)), eff[:-1]])
        z_np = tables.zscan_of_raster(r16)                 # [r16, r16]
        z_g = jnp.asarray(np.tile(z_np, (ncy, ncx)), jnp.int32)
        cstart = jnp.where(cu_depth == 2, z_g,
                           jnp.where(cu_depth == 1,
                                     z_g // 4 * 4, 0))    # [BH, bw]
        big = jnp.int32(r16 * r16)
        first = jnp.min(
            jnp.where(cbf_any_g, cstart, big).reshape(
                ncy, r16, ncx, r16).transpose(0, 2, 1, 3)
            .reshape(ncy, ncx, -1), -1)                    # [ncy, ncx]
        rep_c = lambda m: jnp.repeat(jnp.repeat(m, r16, 0), r16, 1)
        qp_g16 = jnp.where(
            cstart < rep_c(first),
            rep_c(prev_eff.reshape(ncy, ncx)),
            rep_c(qp_map))                                 # [BH, bw]

        # spec 8.7.2.4: the cbf term of the BS is the LUMA TB only
        ii = is_intra_blk.reshape(BH, bw) if intra_fallback else None
        tb2 = (tr_depth == 0) & (cu_depth == 1) | (cu_depth == 0)
        bs_v, bs_h = inter_boundary_strength(
            cbf_y_full.astype(jnp.int32), mv, s, h, w, is_intra=ii,
            tb2=tb2, ref=ref_sel,
            mv8=mv8_final.reshape(2 * BH, 2 * bw, 2) if inter_nxn
            else None,
            nxn=nxn16.reshape(BH, bw) if inter_nxn else None,
            cbf8=cbf8_y.reshape(2 * BH, 2 * bw) if inter_nxn else None)
        if cw8 is not None:
            # no edges at/past the coded picture bounds
            bs_v = bs_v.at[:, cw8 // 8:].set(0)
            bs_h = bs_h.at[ch8 // 8:, :].set(0)
        qp_v, qp_h = _edge_qp_maps(qp_g16, h, w, 16)
        # vertical pass: row-local -> band-local (slice the band's rows
        # of the full maps; identity single-device)
        out_y = deblock._luma_pass(
            out_y, band_rows(bs_v, hb // 4), band_rows(qp_v, hb // 4))
        out_y = out_y if ax is None else allg_rows(out_y)
        out_y = deblock._luma_pass(out_y.T, bs_h.T, qp_h.T).T
        if intra_fallback:
            # chroma filters only BS==2 edges (intra-adjacent)
            bs_vc, bs_hc = chroma_boundary_strength(ii, s, h // 2, w // 2)
            if cw8 is not None:
                bs_vc = bs_vc.at[:, cw8 // 16:].set(0)
                bs_hc = bs_hc.at[ch8 // 16:, :].set(0)
            qpcv, qpch = _edge_qp_maps_chroma(qp_g16, h, w, 16,
                                              chroma_qp_offset)
            out_u = deblock._chroma_pass(out_u, bs_vc, qpcv)
            out_u = deblock._chroma_pass(out_u.T, bs_hc.T, qpch.T).T
            out_v = deblock._chroma_pass(out_v, bs_vc, qpcv)
            out_v = deblock._chroma_pass(out_v.T, bs_hc.T, qpch.T).T
    elif ax is not None:
        out_y = allg_rows(out_y)

    sao_fields = None
    if sao_enabled:
        lam = tables.rd_lambda(qp, False)
        lam_c = tables.rd_lambda(qp_c, False)
        y_full = jnp.asarray(y, jnp.int32) if ax is None \
            else allg_rows(jnp.asarray(y, jnp.int32))
        out_y, out_u, out_v, sao_fields = sao.sao_frame(
            y_full, jnp.asarray(u, jnp.int32),
            jnp.asarray(v, jnp.int32), out_y, out_u, out_v,
            lam, lam_c, ctu,
            coded=None if cw8 is None else (ch8, cw8))

    out = dict(
        recon_y=out_y, recon_u=out_u, recon_v=out_v,
        coeff_y=_unblocks(level_y, h, w).astype(jnp.int16),
        coeff_cb=_unblocks(level_u, h // 2, w // 2).astype(jnp.int16),
        coeff_cr=_unblocks(level_v, h // 2, w // 2).astype(jnp.int16),
        mv=mv,
        cbf=jnp.stack([cbf_y_full, cbf_u, cbf_v]).astype(jnp.int32),
    )
    # single-transfer marshaling with nonzero-block compaction (the
    # device->host link is a high-latency, low-bandwidth tunnel).
    # Two tiers from ONE device-side sort: the small tier (sized for
    # measured density, p_caps_small) ships always; the full tier
    # stays in HBM and is pulled only when the small counts overflow.
    cap_y, cap_c, esc_y, esc_c = p_caps(NB)
    cap_ys, cap_cs, esc_ys, esc_cs = p_caps_small(NB)
    if multi_ref:
        out["ref_idx"] = ref_sel
    pk_y_s, pk_y_f = packing.compact_blocks_i8_tiers(
        level_y, [(cap_ys, esc_ys), (cap_y, esc_y)])
    pk_u_s, pk_u_f = packing.compact_blocks_i8_tiers(
        level_u, [(cap_cs, esc_cs), (cap_c, esc_c)])
    pk_v_s, pk_v_f = packing.compact_blocks_i8_tiers(
        level_v, [(cap_cs, esc_cs), (cap_c, esc_c)])
    # compact split-CU sidebands: per-8 MV deltas vs the CU MV packed
    # (dy | dx << 8) int8 pairs, and the 4 sub-CUs' 3-bit TB-cbf
    # fields packed into ONE int16 per 16-block (the link charges
    # ~45 ms/MB; full per-8 MVs would add 72 KB/frame at 720p)
    mvd8_pk_ = mv8_final - jnp.repeat(
        jnp.repeat(mv, 2, 0), 2, 1).reshape(-1, 2)
    mvd8_pk = ((mvd8_pk_[:, 0] & 0xFF)
               | ((mvd8_pk_[:, 1] & 0xFF) << 8)).astype(jnp.uint16) \
        .astype(jnp.int32)
    c8g = cbf8_bits.reshape(BH, 2, bw, 2)
    cbf8_blk = (c8g[:, 0, :, 0] | (c8g[:, 0, :, 1] << 3)
                | (c8g[:, 1, :, 0] << 6) | (c8g[:, 1, :, 1] << 9)) \
        .reshape(-1)
    parts = [
        mv.astype(jnp.int16).reshape(-1),            # per-16 CU MVs
        (ref_sel if multi_ref
         else jnp.zeros((BH, bw), jnp.int32)).astype(jnp.int16)
        .reshape(-1),
        out["cbf"].astype(jnp.int16).reshape(-1),
        is_intra_blk.astype(jnp.int16),
        intra_modes.astype(jnp.int16),
        cu_depth.astype(jnp.int16).reshape(-1),
        tr_depth.astype(jnp.int16).reshape(-1),
        jax.lax.bitcast_convert_type(
            mvd8_pk.astype(jnp.uint16), jnp.int16),  # per-8 MV deltas
        cbf8_blk.astype(jnp.int16),   # per-16: 4 sub-CUs x 3 cbf bits
        cand_count.astype(jnp.int16)[None],
        jnp.clip(dist16, 0, 32767).astype(jnp.int16)[None],
        pk_y_s, pk_u_s, pk_v_s]
    if sao_fields is not None:
        parts.append(sao.pack_sao_fields(sao_fields))
    out["packed"] = jnp.concatenate(parts)
    out["packed_full"] = jnp.concatenate([pk_y_f, pk_u_f, pk_v_f])
    return out


encode_p_frame_jit = jax.jit(
    encode_p_frame,
    static_argnames=("block", "sign_hiding", "deblocking",
                     "sao_enabled", "ctu", "intra_fallback",
                     "chroma_rd_scale", "chroma_qp_offset",
                     "me_precision", "scaling_lists", "me_subpel_r",
                     "vis_h", "vis_w", "merge_rounds",
                     "fallback_rounds", "fallback_serial",
                     "quadtree_majority", "inter_nxn",
                     "true_size", "wpp_substreams", "axis_name", "n_bands"))


def encode_p_chunk(ys, us, vs, ref_y, ref_u, ref_v, qp, qp_maps=None,
                   ref2_y=None, ref2_u=None, ref2_v=None, has_ref2=None,
                   **flags):
    # (vis_h/vis_w ride through **flags into encode_p_frame)
    """Encode K consecutive P frames in ONE device program (lax.scan
    over the inter-frame reference dependency).

    Amortizes the host<->device round trip over K frames: one dispatch,
    one packed transfer (role of the reference's frame pipeline at
    chunk granularity).  ys: uint8 [K, H, W]; qp scalar or [K] vector
    (per-frame closed-loop rate control, rc.project_chunk — traced, so
    changing values costs no recompilation).

    Multi-reference: ref2_* seeds list0 index 1 for the chunk's first
    frame (the frame BEFORE ref_*); the scan then carries the previous
    two reconstructions.  has_ref2 [K] bool masks frames whose second
    reference does not exist yet (first P after an IDR).

    Returns dict(recon_* = last frame's reconstruction, packed [K, L]).

    Row-band sharding: with `mesh` given, the WHOLE chunk program runs
    band-local under shard_map over mesh[row_axis] — current frames are
    banded on their row axis, references/QP replicated, and
    encode_p_frame's axis_name collectives keep the result bit-identical
    to the single-chip run (the WPP analogue wired through the chunk
    pipeline; ref wfpp threads, hmr_encoder_lib.c:2357).
    """
    multi = ref2_y is not None
    qp = jnp.asarray(qp, jnp.int32)
    if qp.ndim == 0:           # scalar QP -> uniform per-frame vector
        qp = jnp.broadcast_to(qp, (ys.shape[0],))

    mesh = flags.pop("mesh", None)
    row_axis = flags.pop("row_axis", "row")
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        n = mesh.shape[row_axis]
        assert (ys.shape[1] // n) % flags.get("ctu", 64) == 0, \
            "band height must be CTU-aligned"
        band = P(None, row_axis)
        rep = P()
        args = [jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs),
                jnp.asarray(ref_y, jnp.int32),
                jnp.asarray(ref_u, jnp.int32),
                jnp.asarray(ref_v, jnp.int32), qp]
        specs = [band, band, band, rep, rep, rep, rep]
        if qp_maps is not None:
            args.append(jnp.asarray(qp_maps, jnp.int32))
            specs.append(rep)
        if multi:
            args += [jnp.asarray(ref2_y, jnp.int32),
                     jnp.asarray(ref2_u, jnp.int32),
                     jnp.asarray(ref2_v, jnp.int32),
                     jnp.ones((ys.shape[0],), bool)
                     if has_ref2 is None else jnp.asarray(has_ref2)]
            specs += [rep, rep, rep, rep]
        keys = ["recon_y", "recon_u", "recon_v", "packed",
                "packed_full", "coeff_y", "coeff_cb", "coeff_cr"]
        if multi:
            keys += ["recon2_y", "recon2_u", "recon2_v"]

        def local(ys_b, us_b, vs_b, ry, ru, rv, qp_, *rest):
            i = 0
            qmaps = None
            if qp_maps is not None:
                qmaps = rest[0]
                i = 1
            r2 = (None, None, None)
            hr2 = None
            if multi:
                r2 = rest[i:i + 3]
                hr2 = rest[i + 3]
            return encode_p_chunk(
                ys_b, us_b, vs_b, ry, ru, rv, qp=qp_, qp_maps=qmaps,
                ref2_y=r2[0], ref2_u=r2[1], ref2_v=r2[2], has_ref2=hr2,
                axis_name=row_axis, n_bands=n, **flags)

        fn = shard_map(local, mesh=mesh, in_specs=tuple(specs),
                       out_specs={k: rep for k in keys},
                       check_vma=False)
        return fn(*args)

    def step(carry, xs):
        if multi:
            (ry, ru, rv), prev = carry
        else:
            ry, ru, rv = carry
            prev = None
        kw = {}
        if multi:
            kw = dict(ref2_y=prev[0], ref2_u=prev[1], ref2_v=prev[2],
                      has_ref2=xs["has_ref2"])
        out = encode_p_frame(xs["y"], xs["u"], xs["v"], ry, ru, rv,
                             qp=xs["qp"], qp_map=xs.get("qmap"),
                             **kw, **flags)
        per_frame = dict(packed=out["packed"],
                         packed_full=out["packed_full"],
                         coeff_y=out["coeff_y"],
                         coeff_cb=out["coeff_cb"],
                         coeff_cr=out["coeff_cr"])
        rec = (out["recon_y"], out["recon_u"], out["recon_v"])
        return ((rec, (ry, ru, rv)) if multi else rec, per_frame)

    xs = dict(y=ys, u=us, v=vs, qp=qp)
    if qp_maps is not None:
        xs["qmap"] = qp_maps
    r0 = (jnp.asarray(ref_y, jnp.int32), jnp.asarray(ref_u, jnp.int32),
          jnp.asarray(ref_v, jnp.int32))
    if multi:
        if has_ref2 is None:
            has_ref2 = jnp.ones((ys.shape[0],), bool)
        xs["has_ref2"] = has_ref2
        prev0 = (jnp.asarray(ref2_y, jnp.int32),
                 jnp.asarray(ref2_u, jnp.int32),
                 jnp.asarray(ref2_v, jnp.int32))
        ((ry, ru, rv), (p2y, p2u, p2v)), outs = jax.lax.scan(
            step, (r0, prev0), xs)
        return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                    recon2_y=p2y, recon2_u=p2u, recon2_v=p2v,
                    packed=outs["packed"],
                    packed_full=outs["packed_full"],
                    coeff_y=outs["coeff_y"],
                    coeff_cb=outs["coeff_cb"],
                    coeff_cr=outs["coeff_cr"])
    (ry, ru, rv), outs = jax.lax.scan(step, r0, xs)
    return dict(recon_y=ry, recon_u=ru, recon_v=rv,
                packed=outs["packed"], packed_full=outs["packed_full"],
                coeff_y=outs["coeff_y"],
                coeff_cb=outs["coeff_cb"], coeff_cr=outs["coeff_cr"])


encode_p_chunk_jit = jax.jit(
    encode_p_chunk,
    static_argnames=("block", "sign_hiding", "deblocking",
                     "sao_enabled", "ctu", "intra_fallback",
                     "chroma_rd_scale", "chroma_qp_offset",
                     "me_precision", "scaling_lists", "me_subpel_r",
                     "vis_h", "vis_w", "merge_rounds",
                     "fallback_rounds", "fallback_serial",
                     "quadtree_majority", "inter_nxn",
                     "true_size", "wpp_substreams", "mesh", "row_axis",
                     "axis_name", "n_bands"))


def encode_p_chunk_packed(buf, ref_y, ref_u, ref_v, *, k, vis_h,
                          vis_w, ctu, qp, qp_maps=None, ref2_y=None,
                          ref2_u=None, ref2_v=None, has_ref2=None,
                          **flags):
    """encode_p_chunk behind a SINGLE host->device buffer: `buf` is the
    K frames' raw (unpadded) Y|U|V planes raveled into one uint8 vector.
    The tunneled link pays ~29 ms fixed cost PER TRANSFER on top of
    ~12 ms/MB, so one buffer instead of three stacked plane arrays
    saves two fixed costs per chunk, and padding to the CTU multiple
    moves on-device (6.7%% fewer bytes at 720p)."""
    ny, nc = vis_h * vis_w, (vis_h // 2) * (vis_w // 2)
    ys = buf[:k * ny].reshape(k, vis_h, vis_w)
    us = buf[k * ny:k * (ny + nc)].reshape(k, vis_h // 2, vis_w // 2)
    vs = buf[k * (ny + nc):].reshape(k, vis_h // 2, vis_w // 2)

    def pad(p, m):
        hh, ww = p.shape[1:]
        return jnp.pad(p, ((0, 0), (0, -hh % m), (0, -ww % m)),
                       mode="edge")
    return encode_p_chunk(pad(ys, ctu), pad(us, ctu // 2),
                          pad(vs, ctu // 2), ref_y, ref_u, ref_v,
                          qp=qp, qp_maps=qp_maps, ref2_y=ref2_y,
                          ref2_u=ref2_u, ref2_v=ref2_v,
                          has_ref2=has_ref2, vis_h=vis_h, vis_w=vis_w,
                          ctu=ctu, **flags)


encode_p_chunk_packed_jit = jax.jit(
    encode_p_chunk_packed,
    static_argnames=("k", "block", "sign_hiding", "deblocking",
                     "sao_enabled", "ctu", "intra_fallback",
                     "chroma_rd_scale", "chroma_qp_offset",
                     "me_precision", "scaling_lists", "me_subpel_r",
                     "vis_h", "vis_w", "merge_rounds",
                     "fallback_rounds", "fallback_serial",
                     "quadtree_majority", "inter_nxn",
                     "true_size", "wpp_substreams", "mesh", "row_axis"))
