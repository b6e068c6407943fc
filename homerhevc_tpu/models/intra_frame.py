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
                 deblocking: bool = False, sao_enabled: bool = False):
    """Encode one all-intra frame; planes uint8, CTU-padded.

    Returns dict of device arrays (FrameRecord fields).
    """
    h, w = y.shape
    plan = build_plan(w, h, cu, ctu)
    s, cs = cu, cu // 2
    qp = jnp.asarray(qp, jnp.int32)   # traced: one program per shape,
    qp_c = jnp.asarray(tables.CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]
    seg_layout = jnp.asarray(_segment_avail_layout(s))     # [5, 4S+1]
    seg_layout_c = jnp.asarray(_segment_avail_layout(cs))
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
    cbf0 = jnp.zeros((3, bh, bw), jnp.int32)

    rr = jnp.arange(s)
    rr_c = jnp.arange(cs)

    def step(carry, inp):
        (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, mode_map, cbfs) = carry
        by, bx, valid, seg_av, top_other, left_av, top_av = inp
        nb = by.shape[0]
        y0 = by * s
        x0 = bx * s

        # ---- luma adi + substitution
        adi_raw = jax.vmap(lambda yy, xx: _gather_adi(rec_y, yy, xx, s))(
            y0, x0)
        avail_mask = jnp.einsum("bk,kn->bn", seg_av.astype(jnp.int32),
                                seg_layout.astype(jnp.int32)) > 0
        adi = intra.substitute_refs(adi_raw, avail_mask)

        # ---- all 35 predictions + SATD mode cost
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
        level, recon, cbf_y = _tq_recon(orig, pred, s, qp, lam=lam_rd,
                                        sbh_scan=sbh_scan)

        # ---- chroma (DM mode)
        cy0 = by * cs
        cx0 = bx * cs
        avail_mask_c = jnp.einsum("bk,kn->bn", seg_av.astype(jnp.int32),
                                  seg_layout_c.astype(jnp.int32)) > 0

        def chroma(rec_p, plane, scan):
            adi_c_raw = jax.vmap(
                lambda yy, xx: _gather_adi(rec_p, yy, xx, cs))(cy0, cx0)
            adi_c = intra.substitute_refs(adi_c_raw, avail_mask_c)
            preds_c = intra.predict_all_modes(adi_c, cs, False)
            pred_c = jnp.take_along_axis(
                preds_c, best[:, None, None, None], axis=1)[:, 0]
            orig_c = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                plane, (yy, xx), (cs, cs)))(cy0, cx0)
            return _tq_recon(orig_c, pred_c, cs, qp_c, lam=lam_rd_c,
                             sbh_scan=scan)

        lv_u, rec_u_blk, cbf_u = chroma(rec_u, u32, sbh_scan_c)
        lv_v, rec_v_blk, cbf_v = chroma(rec_v, v32, sbh_scan_c)

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
        mode_map = mode_map.at[bsafe, bx].set(best, mode="drop")
        cbfs = cbfs.at[0, bsafe, bx].set(cbf_y.astype(jnp.int32),
                                         mode="drop")
        cbfs = cbfs.at[1, bsafe, bx].set(cbf_u.astype(jnp.int32),
                                         mode="drop")
        cbfs = cbfs.at[2, bsafe, bx].set(cbf_v.astype(jnp.int32),
                                         mode="drop")
        return (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, mode_map, cbfs), None

    xs = (plan["by"], plan["bx"], plan["valid"], plan["seg_avail"],
          plan["top_other_ctu"], plan["left_avail"], plan["top_avail"])
    carry0 = (recon_y0, recon_u0, recon_v0, coeff_y0, coeff_u0, coeff_v0,
              modes0, cbf0)
    carry, _ = jax.lax.scan(step, carry0, xs)
    rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, mode_map, cbfs = carry

    out_y = rec_y[1:1 + h, 1:1 + w]
    out_u = rec_u[1:1 + h // 2, 1:1 + w // 2]
    out_v = rec_v[1:1 + h // 2, 1:1 + w // 2]
    if deblocking:
        # decoder-side in-loop filter: recon must match (spec 8.7.2);
        # all-intra => BS=2 at every TU boundary
        bs_v, bs_h = deblock.uniform_intra_bs(h, w, s)
        bs_vc, bs_hc = deblock.uniform_intra_bs_chroma(h // 2, w // 2, cs)
        out_y = deblock.deblock_luma(
            out_y, jnp.asarray(bs_v), jnp.asarray(bs_h), qp)
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
        modes=mode_map,
        cbf=cbfs,
    )
    parts = [
        out["coeff_y"].reshape(-1), out["coeff_cb"].reshape(-1),
        out["coeff_cr"].reshape(-1),
        mode_map.astype(jnp.int16).reshape(-1),
        cbfs.astype(jnp.int16).reshape(-1)]
    if sao_fields is not None:
        parts.append(sao.pack_sao_fields(sao_fields))
    out["packed"] = jnp.concatenate(parts)
    return out


encode_frame_jit = jax.jit(
    encode_frame, static_argnames=("cu", "ctu", "sign_hiding",
                                   "rd_lambda_scale", "deblocking",
                                   "sao_enabled"))
