"""Sequential NumPy reference intra encoder (test oracle).

Encodes an all-intra frame at a uniform CU/TU size in strict HEVC
coding order with spec-exact scalar models, producing a FrameRecord for
the native syntax writer plus its own reconstruction.  Used by tests to
validate (a) the C++ CABAC/syntax layer against libde265 and (b) the
batched JAX frame encoder against this oracle.
"""
from __future__ import annotations

import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.entropy.binding import FrameRecord
from homerhevc_tpu.models import schedule
from tests import golden_model as gm


def pad_frame(y, u, v, ctu=64):
    """Edge-replicate padding to CTU multiples."""
    def pad(p, mult):
        h, w = p.shape
        ph = (h + mult - 1) // mult * mult
        pw = (w + mult - 1) // mult * mult
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    return pad(y, ctu), pad(u, ctu // 2), pad(v, ctu // 2)


def build_adi(recon, bx, by, size, avail):
    """adi vector for block (bx, by) of `size` from recon plane, with
    spec 8.4.4.2.2 substitution.  avail: dict of 5 segment bools."""
    s = size
    x0, y0 = bx * s, by * s
    h, w = recon.shape
    n = 4 * s + 1
    adi = np.zeros(n, dtype=np.int32)
    mask = np.zeros(n, dtype=bool)

    def put(k, yy, xx, ok):
        if ok and 0 <= yy < h and 0 <= xx < w:
            adi[k] = recon[yy, xx]
            mask[k] = True

    for i in range(2 * s):          # left col bottom -> top
        yy = y0 + 2 * s - 1 - i
        seg_ok = avail["bottomleft"] if i < s else avail["left"]
        put(i, yy, x0 - 1, seg_ok)
    put(2 * s, y0 - 1, x0 - 1, avail["corner"])
    for j in range(2 * s):          # top row left -> right
        seg_ok = avail["top"] if j < s else avail["topright"]
        put(2 * s + 1 + j, y0 - 1, x0 + j, seg_ok)

    if not mask.any():
        adi[:] = 128
        return adi
    # substitution: fill leading run from first available, then ffill
    first = int(np.argmax(mask))
    adi[:first] = adi[first]
    for k in range(first + 1, n):
        if not mask[k]:
            adi[k] = adi[k - 1]
    return adi


def encode_frame_intra(y, u, v, qp, cu_size=16, mode_fixed=None,
                       sign_hiding=False):
    """Returns (FrameRecord, recon_y, recon_u, recon_v). Planes must be
    CTU-padded uint8."""
    h, w = y.shape
    s = cu_size
    cs = s // 2
    bw, bh = w // s, h // s
    bpc = 64 // s
    avail = schedule.availability(bw, bh, bpc)
    order = schedule.coding_order(bw, bh, bpc)

    rec_y = np.zeros((h, w), np.int32)
    rec_u = np.zeros((h // 2, w // 2), np.int32)
    rec_v = np.zeros((h // 2, w // 2), np.int32)
    coeff_y = np.zeros((h, w), np.int16)
    coeff_cb = np.zeros((h // 2, w // 2), np.int16)
    coeff_cr = np.zeros((h // 2, w // 2), np.int16)
    h4, w4 = h // 4, w // 4
    luma_mode = np.zeros((h4, w4), np.uint8)
    chroma_mode = np.zeros((h4, w4), np.uint8)
    cbf_y = np.zeros((h4, w4), np.uint8)
    cbf_cb = np.zeros((h4, w4), np.uint8)
    cbf_cr = np.zeros((h4, w4), np.uint8)

    qp_c = int(tables.CHROMA_QP_TABLE[np.clip(qp, 0, 57)])
    is_dst = s == 4

    def tq_recon(orig, pred, size, qq, dst):
        resi = orig.astype(np.int32) - pred
        c = gm.fwd_transform(resi, is_dst=dst)
        lv, du = gm.quant(c, qq)
        if sign_hiding:
            from homerhevc_tpu.ops import quant as qops
            import jax.numpy as jnp
            scan = tables.scan_order(size, tables.SCAN_DIAG)
            lv = np.asarray(qops.sign_bit_hide(
                jnp.asarray(lv), jnp.asarray(du), tuple(scan), size))
        dq = gm.dequant(lv, qq)
        r = gm.inv_transform(dq, is_dst=dst)
        recon = np.clip(pred + r, 0, 255)
        return lv, recon, int((lv != 0).any())

    flat_order = np.argsort(order, axis=None)
    for f in flat_order:
        by, bx = divmod(int(f), bw)
        av = {k: bool(m[by, bx]) for k, m in avail.items()}
        x0, y0 = bx * s, by * s
        orig = y[y0:y0 + s, x0:x0 + s]
        adi = build_adi(rec_y, bx, by, s, av)
        if mode_fixed is None:
            best, best_sad = 0, None
            for m in range(35):
                p = gm.predict_intra(m, adi, s, True, strong=True)
                sad = int(np.abs(orig.astype(np.int32) - p).sum())
                if best_sad is None or sad < best_sad:
                    best, best_sad = m, sad
        else:
            best = mode_fixed
        pred = gm.predict_intra(best, adi, s, True, strong=True)
        lv, recon, cb = tq_recon(orig, pred, s, qp, is_dst)
        rec_y[y0:y0 + s, x0:x0 + s] = recon
        coeff_y[y0:y0 + s, x0:x0 + s] = lv
        b4 = s // 4
        luma_mode[by * b4:(by + 1) * b4, bx * b4:(bx + 1) * b4] = best
        chroma_mode[by * b4:(by + 1) * b4, bx * b4:(bx + 1) * b4] = best
        cbf_y[by * b4:(by + 1) * b4, bx * b4:(bx + 1) * b4] = cb

        # chroma (DM mode), half res
        cx0, cy0 = x0 // 2, y0 // 2
        for plane, rec_p, coeff_p, cbf_p in (
                (u, rec_u, coeff_cb, cbf_cb), (v, rec_v, coeff_cr, cbf_cr)):
            corig = plane[cy0:cy0 + cs, cx0:cx0 + cs]
            cadi = build_adi(rec_p, bx, by, cs, av)
            cpred = gm.predict_intra(best, cadi, cs, False)
            clv, crecon, ccb = tq_recon(corig, cpred, cs, qp_c, False)
            rec_p[cy0:cy0 + cs, cx0:cx0 + cs] = crecon
            coeff_p[cy0:cy0 + cs, cx0:cx0 + cs] = clv
            cbf_p[by * b4:(by + 1) * b4, bx * b4:(bx + 1) * b4] = ccb

    depth = {64: 0, 32: 1, 16: 2, 8: 3}[s]
    rec = FrameRecord(
        width=w, height=h, slice_type=2, slice_qp=qp, poc=0, is_idr=True,
        cu_depth=np.full((h4, w4), depth, np.uint8),
        intra_luma_mode=luma_mode, intra_chroma_mode=chroma_mode,
        cbf_y=cbf_y, cbf_cb=cbf_cb, cbf_cr=cbf_cr,
        coeff_y=coeff_y, coeff_cb=coeff_cb, coeff_cr=coeff_cr,
        pred_mode=np.ones((h4, w4), np.uint8),
    )
    return rec, rec_y, rec_u, rec_v
