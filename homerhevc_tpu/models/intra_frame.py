"""Batched wavefront intra-frame encoder (the TPU compute path).

Re-designs the reference's sequential per-CTU intra loop
(ref: wfpp_encoder_thread hmr_encoder_lib.c:2357, motion_intra
hmr_motion_intra.c:1990) as a single jitted JAX program:

* a static dependency schedule (models/schedule.py) groups coding units
  into wavefront steps; all CUs of a step are encoded in one batched
  launch (vmap), honouring the spec's z-scan reconstruction dependency;
* per CU the full mode decision runs vectorized: all 35 intra
  predictions are generated in one gather/blend stack (ops/intra.py),
  costs = SAD + lambda * MPM-aware mode bits (Homer RD_FAST cost,
  ref hmr_motion_intra.c:1080-1177), argmin selects the mode;
* transform/quant/dequant/inverse run as batched int32 MXU matmuls
  (ops/transform.py, ops/quant.py), bit-exact per spec;
* chroma is encoded alongside at half resolution in DM mode.

The output is a FrameRecord tensor set (decisions + quantized
coefficients) that the native host entropy stage serializes to the
bitstream — the device/host split of SURVEY.md §7.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.models import schedule
from homerhevc_tpu.ops import deblock, intra, quant, sao, transform


def _segment_avail_layout(s: int) -> np.ndarray:
    """Map 5 segment-availability bools to the [4S+1] adi mask layout."""
    seg = np.zeros((5, 4 * s + 1), dtype=bool)
    seg[0, 0:s] = True                 # bottom-left
    seg[1, s:2 * s] = True             # left
    seg[2, 2 * s] = True               # corner
    seg[3, 2 * s + 1:3 * s + 1] = True  # top
    seg[4, 3 * s + 1:] = True          # top-right
    return seg



# ---- 8x8 split path helpers (z-order sub-blocks inside a 16x16 slot) --

_SUB_OFF = ((0, 0), (0, 8), (8, 0), (8, 8))     # z-order (dy, dx)


def _sub_avail(seg_av):
    """Per-sub-block 5-segment availability [4][nb, 5] derived from the
    slot's (bottomleft, left, corner, top, topright) availability plus
    z-scan order within the slot (spec 6.4.1)."""
    bl = seg_av[:, 0]
    le = seg_av[:, 1]
    co = seg_av[:, 2]
    to = seg_av[:, 3]
    tr = seg_av[:, 4]
    t = jnp.ones_like(bl)
    f = jnp.zeros_like(bl)
    k0 = jnp.stack([le, le, co, to, to], -1)
    k1 = jnp.stack([f, t, to, to, tr], -1)
    k2 = jnp.stack([bl, le, le, t, t], -1)
    k3 = jnp.stack([f, t, t, t, f], -1)
    return (k0, k1, k2, k3)


def _patch_adi(patch, oy: int, ox: int, size: int):
    """adi [nb, 4*size+1] of the sub-block at patch-relative origin
    (1+oy, 1+ox); patch covers one extra row/col of neighbors."""
    top = patch[:, oy, ox:ox + 2 * size + 1]
    left = patch[:, 1 + oy:1 + oy + 2 * size, ox]
    return jnp.concatenate([left[:, ::-1], top], -1)


def _sbh_by_mode(level, du, mode, size: int, sign_hiding: bool):
    """Sign-bit hiding in the block's ACTUAL coefficient scan (spec
    7.4.9.11 mode-dependent scans for intra 4x4/8x8): the writer hides
    the sign per coefficient group of its scan, so the parity fix must
    use the same order."""
    if not sign_hiding:
        return level
    outs = []
    for idx in (tables.SCAN_DIAG, tables.SCAN_HOR, tables.SCAN_VER):
        outs.append(quant.sign_bit_hide(
            level, du, tuple(tables.scan_order(size, idx)), size))
    ver = (mode >= 6) & (mode <= 14)
    hor = (mode >= 22) & (mode <= 30)
    return jnp.where(ver[:, None, None], outs[2],
                     jnp.where(hor[:, None, None], outs[1], outs[0]))


def _tq_mode_scan(orig, pred, size, qp, mode, lam, sign_hiding):
    """TQ/recon with mode-dependent-scan SBH (for 8x8 luma / 4x4)."""
    resid = orig.astype(jnp.int32) - pred
    coeff = transform.forward_transform(resid, size)
    level, du = quant.quantize(coeff, qp, size, is_intra=True)
    level = _sbh_by_mode(level, du, mode, size, sign_hiding)
    deq = quant.dequantize(level, qp, size)
    r = transform.inverse_transform(deq, size)
    recon = jnp.clip(pred + r, 0, 255)
    level, recon = _rd_zero_intra(level, recon, pred, orig, lam)
    return level, recon


def _bits_est(level):
    return jnp.sum(jnp.abs(level), (-1, -2)).astype(jnp.float32) * 3.0


@functools.lru_cache(maxsize=None)
def build_plan(width: int, height: int, cu: int, ctu: int = 64):
    """Static wavefront plan for a padded width x height frame."""
    bw, bh = width // cu, height // cu
    bpc = ctu // cu
    steps, n_steps, batches = schedule.wavefront_schedule(bw, bh, bpc)
    avail = schedule.availability(bw, bh, bpc)
    amask = np.stack([avail["bottomleft"], avail["left"], avail["corner"],
                      avail["top"], avail["topright"]], axis=-1)  # [bh,bw,5]
    nb = batches.shape[1]
    by = batches[..., 0]
    bx = batches[..., 1]
    valid = by >= 0
    by_c = np.where(valid, by, 0)
    bx_c = np.where(valid, bx, 0)
    seg_avail = amask[by_c, bx_c]                       # [n_steps, nb, 5]
    # "above PU in another CTU row -> treat as DC" flag for MPM (spec 8.4.2)
    top_other_ctu = (by_c * cu) % ctu == 0
    # numpy only: this plan is lru_cached across jit traces, and arrays
    # created inside a trace are tracers that must not escape it
    plan = dict(
        n_steps=n_steps, nb=nb,
        by=np.asarray(by_c, np.int32), bx=np.asarray(bx_c, np.int32),
        valid=np.asarray(valid),
        seg_avail=np.asarray(seg_avail),
        top_other_ctu=np.asarray(top_other_ctu),
        left_avail=np.asarray(avail["left"][by_c, bx_c]),
        top_avail=np.asarray(avail["top"][by_c, bx_c]),
    )
    return plan


def _gather_adi(buf: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray, s: int):
    """adi vector from a (1+H+S, 1+W+S) padded recon buffer.

    Buffer origin is (1, 1); reads the top row (corner..topright) and the
    left column (left+bottomleft), assembling the reference layout of
    ops/intra.py.
    """
    top = jax.lax.dynamic_slice(buf, (y0, x0), (1, 2 * s + 1))[0]
    left = jax.lax.dynamic_slice(buf, (y0 + 1, x0), (2 * s, 1))[:, 0]
    return jnp.concatenate([left[::-1], top])


def _mpm_candidates(left_m, top_m):
    """Vectorized 3-MPM derivation (spec 8.4.2); inputs int32 [...]."""
    a, b = left_m, top_m
    eq = a == b
    a_ang = a >= 2
    # equal & angular: {a, 2+((a+29)%32), 2+((a-1)%32)}
    c0_eq = jnp.where(a_ang, a, 0)
    c1_eq = jnp.where(a_ang, 2 + ((a + 29) % 32), 1)
    c2_eq = jnp.where(a_ang, 2 + ((a - 1) % 32), 26)
    # different: {a, b, planar | (26 if a+b<2 else DC)}
    c2_ne = jnp.where((a != 0) & (b != 0), 0,
                      jnp.where(a + b < 2, 26, 1))
    c0 = jnp.where(eq, c0_eq, a)
    c1 = jnp.where(eq, c1_eq, b)
    c2 = jnp.where(eq, c2_eq, c2_ne)
    return jnp.stack([c0, c1, c2], axis=-1)


@functools.lru_cache(maxsize=None)
def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def satd(resid: jnp.ndarray, size: int) -> jnp.ndarray:
    """Sum of absolute Hadamard-transformed differences (the HM/Homer
    mode-decision metric — a far better transform-rate proxy than SAD).
    resid: [..., S, S] -> [...]."""
    h = jnp.asarray(_hadamard(size))
    t = jnp.einsum("ij,...jk,kl->...il", h, resid.astype(jnp.float32), h)
    return jnp.sum(jnp.abs(t), (-1, -2)) / size


def _rd_zero_intra(level, recon, pred, orig, lam):
    """Zero-residual RD for intra blocks (same form as the inter pass)."""
    ssd_coded = jnp.sum((recon - orig) ** 2, (-1, -2)).astype(jnp.float32)
    ssd_zero = jnp.sum((pred - orig) ** 2, (-1, -2)).astype(jnp.float32)
    bits = 16.0 + 3.0 * jnp.sum(jnp.abs(level), (-1, -2)) \
        .astype(jnp.float32)
    zero = ssd_zero <= ssd_coded + lam * bits
    level = jnp.where(zero[..., None, None], 0, level)
    recon = jnp.where(zero[..., None, None],
                      jnp.clip(pred, 0, 255), recon)
    return level, recon


def _tq_recon(orig, pred, size, qp, lam=None, sbh_scan=None):
    """residual -> T -> Q -> IQ -> IT -> recon, batched (bit-exact)."""
    resid = orig.astype(jnp.int32) - pred
    coeff = transform.forward_transform(resid, size)
    level, du = quant.quantize(coeff, qp, size, is_intra=True)
    if sbh_scan is not None:
        level = quant.sign_bit_hide(level, du, sbh_scan, size)
    deq = quant.dequantize(level, qp, size)
    r = transform.inverse_transform(deq, size)
    recon = jnp.clip(pred + r, 0, 255)
    if lam is not None:
        level, recon = _rd_zero_intra(level, recon, pred, orig, lam)
    cbf = jnp.any(level != 0, axis=(-1, -2))
    return level, recon, cbf


def encode_frame(y, u, v, qp: int, cu: int = 16, ctu: int = 64,
                 sign_hiding: bool = False, rd_lambda_scale: float = 1.0,
                 deblocking: bool = False, sao_enabled: bool = False,
                 split_8x8: bool = True, chroma_qp_offset: int = 0):
    """Encode one all-intra frame; planes uint8, CTU-padded.

    Returns dict of device arrays (FrameRecord fields).
    """
    h, w = y.shape
    plan = build_plan(w, h, cu, ctu)
    s, cs = cu, cu // 2
    qp = jnp.asarray(qp, jnp.int32)   # traced: one program per shape,
    qp_c = jnp.asarray(tables.CHROMA_QP_TABLE)[
        jnp.clip(qp + chroma_qp_offset, 0, 57)]
    seg_layout = jnp.asarray(_segment_avail_layout(s))     # [5, 4S+1]
    seg_layout_c = jnp.asarray(_segment_avail_layout(cs))
    seg_layout8 = jnp.asarray(_segment_avail_layout(8))
    seg_layout4 = jnp.asarray(_segment_avail_layout(4))
    lam_rd = tables.rd_lambda(qp, True)
    lam_rd_c = tables.rd_lambda(qp_c, True)
    sqrt_lambda = jnp.sqrt(lam_rd) * rd_lambda_scale
    sbh_scan = tuple(tables.scan_order(s, tables.SCAN_DIAG)) \
        if sign_hiding else None
    sbh_scan_c = tuple(tables.scan_order(cs, tables.SCAN_DIAG)) \
        if sign_hiding else None

    y32 = jnp.asarray(y, jnp.int32)
    u32 = jnp.asarray(u, jnp.int32)
    v32 = jnp.asarray(v, jnp.int32)

    bw, bh = w // s, h // s
    recon_y0 = jnp.zeros((1 + h + s, 1 + w + s), jnp.int32)
    recon_u0 = jnp.zeros((1 + h // 2 + cs, 1 + w // 2 + cs), jnp.int32)
    recon_v0 = jnp.zeros_like(recon_u0)
    coeff_y0 = jnp.zeros((h, w), jnp.int32)
    coeff_u0 = jnp.zeros((h // 2, w // 2), jnp.int32)
    coeff_v0 = jnp.zeros_like(coeff_u0)
    modes0 = jnp.full((bh, bw), 1, jnp.int32)   # DC default for MPM derive
    modes8_0 = jnp.full((2 * bh, 2 * bw), 1, jnp.int32)
    cbf8_0 = jnp.zeros((3, 2 * bh, 2 * bw), jnp.int32)
    depth0 = jnp.zeros((bh, bw), jnp.int32)

    def step(carry, inp):
        (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, mode_map, modes8_map,
         cbf8_map, depth_map) = carry
        by, bx, valid, seg_av, top_other, left_av, top_av = inp
        nb = by.shape[0]
        y0 = by * s
        x0 = bx * s
        lamf = lam_rd.astype(jnp.float32)
        lamcf = lam_rd_c.astype(jnp.float32)

        # ---- 16x16 path: adi + 35 predictions + SATD mode cost
        adi_raw = jax.vmap(lambda yy, xx: _gather_adi(rec_y, yy, xx, s))(
            y0, x0)
        avail_mask = jnp.einsum("bk,kn->bn", seg_av.astype(jnp.int32),
                                seg_layout.astype(jnp.int32)) > 0
        adi = intra.substitute_refs(adi_raw, avail_mask)
        preds = intra.predict_all_modes(adi, s, True)      # [nb,35,S,S]
        orig = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            y32, (yy, xx), (s, s)))(y0, x0)
        dist = satd(preds - orig[:, None], s)

        left_m = jnp.where(left_av, mode_map[by, bx - 1], 1)
        top_m = jnp.where(top_av & ~top_other, mode_map[by - 1, bx], 1)
        cands = _mpm_candidates(left_m, top_m)             # [nb, 3]
        all_modes = jnp.arange(35, dtype=jnp.int32)
        in_mpm = (cands[:, :, None] == all_modes[None, None]).any(axis=1)
        # Homer RD_FAST mode-bit heuristic (ref hmr_motion_intra.c:1142)
        mode_bits = jnp.where(in_mpm, 1.0, 6.0)
        cost = dist + sqrt_lambda.astype(jnp.float32) * mode_bits
        best = jnp.argmin(cost, axis=-1).astype(jnp.int32)

        pred = jnp.take_along_axis(
            preds, best[:, None, None, None], axis=1)[:, 0]
        level16, recon16, _ = _tq_recon(orig, pred, s, qp, lam=lam_rd,
                                        sbh_scan=sbh_scan)
        ssd16 = jnp.sum((recon16 - orig) ** 2, (-1, -2)) \
            .astype(jnp.float32)
        cost16 = ssd16 + lamf * (22.0 + _bits_est(level16))

        # ---- 8x8 split path: 4 z-order sub-blocks (spec: each sub-CU
        # predicts from reconstructed neighbours incl. earlier subs)
        if split_8x8:
            patch = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                rec_y, (yy, xx), (25, 25)))(y0, x0)
            subs = _sub_avail(seg_av)
            lv8 = jnp.zeros((nb, s, s), jnp.int32)
            modes8 = []
            cbf8 = []
            cost8 = lamf * 5.0                       # split + part bins
            for k, (oy, ox) in enumerate(_SUB_OFF):
                am = jnp.einsum("bk,kn->bn", subs[k].astype(jnp.int32),
                                seg_layout8.astype(jnp.int32)) > 0
                adi8 = intra.substitute_refs(_patch_adi(patch, oy, ox, 8),
                                             am)
                p8 = intra.predict_all_modes(adi8, 8, True)
                o8 = orig[:, oy:oy + 8, ox:ox + 8]
                d8 = satd(p8 - o8[:, None], 8)
                c8 = d8 + sqrt_lambda.astype(jnp.float32) * 5.0
                b8 = jnp.argmin(c8, -1).astype(jnp.int32)
                pr8 = jnp.take_along_axis(
                    p8, b8[:, None, None, None], 1)[:, 0]
                l8, r8 = _tq_mode_scan(o8, pr8, 8, qp, b8, lam_rd,
                                       sign_hiding)
                patch = patch.at[:, 1 + oy:9 + oy, 1 + ox:9 + ox].set(r8)
                lv8 = lv8.at[:, oy:oy + 8, ox:ox + 8].set(l8)
                modes8.append(b8)
                cbf8.append(jnp.any(l8 != 0, (-1, -2)))
                ssd8 = jnp.sum((r8 - o8) ** 2, (-1, -2)) \
                    .astype(jnp.float32)
                cost8 = cost8 + ssd8 + lamf * (18.0 + _bits_est(l8))
            recon8 = patch[:, 1:1 + s, 1:1 + s]
            split = cost8 < cost16                    # [nb]
            sp = split[:, None, None]
            level = jnp.where(sp, lv8, level16)
            recon = jnp.where(sp, recon8, recon16)
            modes_q = jnp.where(split[:, None], jnp.stack(modes8, -1),
                                best[:, None])        # [nb, 4]
            cbf16 = jnp.any(level16 != 0, (-1, -2))
            cbf_q = jnp.where(split[:, None], jnp.stack(cbf8, -1),
                              cbf16[:, None])         # [nb, 4]
        else:
            level, recon = level16, recon16
            split = jnp.zeros((nb,), bool)
            modes_q = jnp.broadcast_to(best[:, None], (nb, 4))
            cbf_q = jnp.broadcast_to(
                jnp.any(level16 != 0, (-1, -2))[:, None], (nb, 4))

        # ---- chroma: unsplit 8x8 DM vs split 4x4 DMs
        cy0 = by * cs
        cx0 = bx * cs
        avail_mask_c = jnp.einsum("bk,kn->bn", seg_av.astype(jnp.int32),
                                  seg_layout_c.astype(jnp.int32)) > 0

        def chroma(rec_p, plane):
            adi_c_raw = jax.vmap(
                lambda yy, xx: _gather_adi(rec_p, yy, xx, cs))(cy0, cx0)
            adi_c = intra.substitute_refs(adi_c_raw, avail_mask_c)
            preds_c = intra.predict_all_modes(adi_c, cs, False)
            pred_c = jnp.take_along_axis(
                preds_c, best[:, None, None, None], axis=1)[:, 0]
            orig_c = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                plane, (yy, xx), (cs, cs)))(cy0, cx0)
            lvc, rc, _ = _tq_recon(orig_c, pred_c, cs, qp_c,
                                   lam=lam_rd_c, sbh_scan=sbh_scan_c)
            if not split_8x8:
                return lvc, rc, jnp.any(lvc != 0, (-1, -2))[:, None] \
                    .repeat(4, 1)
            # split path: four 4x4 chroma DMs in z-order
            cpatch = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                rec_p, (yy, xx), (13, 13)))(cy0, cx0)
            subs = _sub_avail(seg_av)
            lv4 = jnp.zeros((nb, cs, cs), jnp.int32)
            cbf4 = []
            for k in range(4):
                oy, ox = _SUB_OFF[k][0] // 2, _SUB_OFF[k][1] // 2
                am = jnp.einsum("bk,kn->bn", subs[k].astype(jnp.int32),
                                seg_layout4.astype(jnp.int32)) > 0
                adi4 = intra.substitute_refs(
                    _patch_adi(cpatch, oy, ox, 4), am)
                p4 = intra.predict_all_modes(adi4, 4, False)
                mk = modes_q[:, k]
                pr4 = jnp.take_along_axis(
                    p4, mk[:, None, None, None], 1)[:, 0]
                o4 = orig_c[:, oy:oy + 4, ox:ox + 4]
                l4, r4 = _tq_mode_scan(o4, pr4, 4, qp_c, mk, lam_rd_c,
                                       sign_hiding)
                cpatch = cpatch.at[:, 1 + oy:5 + oy, 1 + ox:5 + ox] \
                    .set(r4)
                lv4 = lv4.at[:, oy:oy + 4, ox:ox + 4].set(l4)
                cbf4.append(jnp.any(l4 != 0, (-1, -2)))
            rc4 = cpatch[:, 1:1 + cs, 1:1 + cs]
            spc = split[:, None, None]
            lv_out = jnp.where(spc, lv4, lvc)
            rc_out = jnp.where(spc, rc4, rc)
            cbfc16 = jnp.any(lvc != 0, (-1, -2))
            cbf_out = jnp.where(split[:, None], jnp.stack(cbf4, -1),
                                cbfc16[:, None])
            return lv_out, rc_out, cbf_out

        lv_u, rec_u_blk, cbf_u_q = chroma(rec_u, u32)
        lv_v, rec_v_blk, cbf_v_q = chroma(rec_v, v32)

        # ---- scatter (masked blocks dropped via OOB index)
        def scatter_plane(plane, blks, yy, xx, size, off):
            rows = yy[:, None, None] + off + \
                jnp.arange(size)[None, :, None]
            cols = xx[:, None, None] + off + \
                jnp.arange(size)[None, None, :]
            # masked (padding) blocks get a positive out-of-range row so
            # mode="drop" discards them (negative would wrap)
            rows = jnp.where(valid[:, None, None], rows, plane.shape[0])
            shp = (rows.shape[0], size, size)
            return plane.at[jnp.broadcast_to(rows, shp),
                            jnp.broadcast_to(cols, shp)].set(blks,
                                                             mode="drop")

        rec_y = scatter_plane(rec_y, recon, y0, x0, s, 1)
        rec_u = scatter_plane(rec_u, rec_u_blk, cy0, cx0, cs, 1)
        rec_v = scatter_plane(rec_v, rec_v_blk, cy0, cx0, cs, 1)
        cf_y = scatter_plane(cf_y, level, y0, x0, s, 0)
        cf_u = scatter_plane(cf_u, lv_u, cy0, cx0, cs, 0)
        cf_v = scatter_plane(cf_v, lv_v, cy0, cx0, cs, 0)

        bsafe = jnp.where(valid, by, jnp.int32(mode_map.shape[0]))
        # representative mode for the MPM cost heuristic of later slots
        mode_map = mode_map.at[bsafe, bx].set(modes_q[:, 0], mode="drop")
        depth_map = depth_map.at[bsafe, bx].set(split.astype(jnp.int32),
                                                mode="drop")
        # 8x8-granular maps (z-order subs -> raster quadrants)
        q_y = jnp.asarray([0, 0, 1, 1])
        q_x = jnp.asarray([0, 1, 0, 1])
        for k in range(4):
            modes8_map = modes8_map.at[2 * bsafe + q_y[k],
                                       2 * bx + q_x[k]].set(
                modes_q[:, k], mode="drop")
            cbf8_map = cbf8_map.at[0, 2 * bsafe + q_y[k],
                                   2 * bx + q_x[k]].set(
                cbf_q[:, k].astype(jnp.int32), mode="drop")
            cbf8_map = cbf8_map.at[1, 2 * bsafe + q_y[k],
                                   2 * bx + q_x[k]].set(
                cbf_u_q[:, k].astype(jnp.int32), mode="drop")
            cbf8_map = cbf8_map.at[2, 2 * bsafe + q_y[k],
                                   2 * bx + q_x[k]].set(
                cbf_v_q[:, k].astype(jnp.int32), mode="drop")
        return (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, mode_map,
                modes8_map, cbf8_map, depth_map), None

    xs = (plan["by"], plan["bx"], plan["valid"], plan["seg_avail"],
          plan["top_other_ctu"], plan["left_avail"], plan["top_avail"])
    carry0 = (recon_y0, recon_u0, recon_v0, coeff_y0, coeff_u0, coeff_v0,
              modes0, modes8_0, cbf8_0, depth0)
    carry, _ = jax.lax.scan(step, carry0, xs)
    (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, mode_map, modes8_map,
     cbf8_map, depth_map) = carry

    out_y = rec_y[1:1 + h, 1:1 + w]
    out_u = rec_u[1:1 + h // 2, 1:1 + w // 2]
    out_v = rec_v[1:1 + h // 2, 1:1 + w // 2]
    if deblocking:
        # decoder-side in-loop filter: recon must match (spec 8.7.2);
        # all-intra => BS=2 at every CU/TU boundary, which for split
        # slots includes the interior 8px edges
        bs_v_np, bs_h_np = deblock.uniform_intra_bs(h, w, s)
        bs_v = jnp.asarray(bs_v_np)
        bs_h = jnp.asarray(bs_h_np)
        split_m = depth_map > 0                      # [bh, bw]
        inner_v = jnp.repeat(split_m.astype(jnp.int32) * 2, s // 4, 0)
        bs_v = bs_v.at[:, 1::2].set(inner_v)
        inner_h = jnp.repeat(split_m.astype(jnp.int32) * 2, s // 4, 1)
        bs_h = bs_h.at[1::2, :].set(inner_h)
        bs_vc, bs_hc = deblock.uniform_intra_bs_chroma(h // 2, w // 2, cs)
        out_y = deblock.deblock_luma(out_y, bs_v, bs_h, qp)
        out_u = deblock.deblock_chroma(
            out_u, jnp.asarray(bs_vc), jnp.asarray(bs_hc), qp_c)
        out_v = deblock.deblock_chroma(
            out_v, jnp.asarray(bs_vc), jnp.asarray(bs_hc), qp_c)

    sao_fields = None
    if sao_enabled:
        lam = tables.rd_lambda(qp, True)
        lam_c = tables.rd_lambda(qp_c, True)
        out_y, out_u, out_v, sao_fields = sao.sao_frame(
            y32, u32, v32, out_y, out_u, out_v, lam, lam_c, ctu)

    out = dict(
        recon_y=out_y,
        recon_u=out_u,
        recon_v=out_v,
        coeff_y=cf_y.astype(jnp.int16),
        coeff_cb=cf_u.astype(jnp.int16),
        coeff_cr=cf_v.astype(jnp.int16),
        modes=modes8_map,
        cbf=cbf8_map,
        depth=depth_map,
    )
    parts = [
        out["coeff_y"].reshape(-1), out["coeff_cb"].reshape(-1),
        out["coeff_cr"].reshape(-1),
        modes8_map.astype(jnp.int16).reshape(-1),
        cbf8_map.astype(jnp.int16).reshape(-1),
        depth_map.astype(jnp.int16).reshape(-1)]
    if sao_fields is not None:
        parts.append(sao.pack_sao_fields(sao_fields))
    out["packed"] = jnp.concatenate(parts)
    return out


encode_frame_jit = jax.jit(
    encode_frame, static_argnames=("cu", "ctu", "sign_hiding",
                                   "rd_lambda_scale", "deblocking",
                                   "sao_enabled", "split_8x8",
                                   "chroma_qp_offset"))


def encode_i_chunk(ys, us, vs, qp, **flags):
    """K independent intra frames in ONE device program (vmap over the
    frame axis — all-intra streams have no cross-frame dependency, so
    the wavefront's serialized steps batch K frames of work each and
    the host pays one dispatch + one transfer per chunk)."""
    return jax.vmap(
        lambda y, u, v: encode_frame(y, u, v, qp=qp, **flags))(ys, us, vs)


encode_i_chunk_jit = jax.jit(
    encode_i_chunk, static_argnames=("cu", "ctu", "sign_hiding",
                                     "rd_lambda_scale", "deblocking",
                                     "sao_enabled", "split_8x8",
                                     "chroma_qp_offset"))
