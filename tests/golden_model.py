"""Independent scalar/NumPy golden models of the HEVC spec algorithms.

Deliberately written in plain-loop spec style (mirroring ITU-T H.265
pseudocode, NOT the vectorized production code in homerhevc_tpu/ops) so
that unit tests cross-check two independent derivations of the same
spec text.
"""
from __future__ import annotations

import numpy as np

from homerhevc_tpu import tables


# --- transforms ------------------------------------------------------------

def fwd_transform(x: np.ndarray, is_dst: bool = False, bd: int = 8):
    n = x.shape[0]
    log2 = int(np.log2(n))
    t = (tables.DST4 if is_dst else tables.dct_matrix(n)).astype(np.int64)
    s1 = log2 - 1 + bd - 8
    s2 = log2 + 6
    x = x.astype(np.int64)
    tmp = np.zeros((n, n), dtype=np.int64)
    # horizontal pass: each row of x against rows of T
    for i in range(n):
        for k in range(n):
            tmp[i, k] = (int(np.dot(t[k], x[i])) + (1 << (s1 - 1))) >> s1
    out = np.zeros((n, n), dtype=np.int64)
    for j in range(n):
        for k in range(n):
            out[k, j] = (int(np.dot(t[k], tmp[:, j])) + (1 << (s2 - 1))) >> s2
    return out.astype(np.int32)


def inv_transform(c: np.ndarray, is_dst: bool = False, bd: int = 8):
    n = c.shape[0]
    t = (tables.DST4 if is_dst else tables.dct_matrix(n)).astype(np.int64)
    c = c.astype(np.int64)
    tmp = np.zeros((n, n), dtype=np.int64)
    for j in range(n):
        for i in range(n):
            v = (int(np.dot(t[:, i], c[:, j])) + 64) >> 7
            tmp[i, j] = min(max(v, -32768), 32767)
    s2 = 12 - (bd - 8)
    out = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(n):
            v = (int(np.dot(tmp[i], t[:, j])) + (1 << (s2 - 1))) >> s2
            out[i, j] = min(max(v, -32768), 32767)
    return out.astype(np.int32)


# --- quant -----------------------------------------------------------------

def quant(c: np.ndarray, qp: int, is_intra=True, bd: int = 8):
    n = c.shape[0]
    log2 = int(np.log2(n))
    per, rem = qp // 6, qp % 6
    tshift = 15 - bd - log2
    qbits = 14 + per + tshift
    add = (171 if is_intra else 85) << (qbits - 9)
    q = int(tables.QUANT_SCALES[rem])
    out = np.zeros_like(c)
    du = np.zeros_like(c)
    for i in range(n):
        for j in range(n):
            a = abs(int(c[i, j])) * q
            lv = (a + add) >> qbits
            du[i, j] = (a - (lv << qbits)) >> (qbits - 8)
            out[i, j] = lv if c[i, j] >= 0 else -lv
    return out, du


def dequant(lv: np.ndarray, qp: int, bd: int = 8):
    n = lv.shape[0]
    log2 = int(np.log2(n))
    per, rem = qp // 6, qp % 6
    tshift = 15 - bd - log2
    shift = 20 - 14 - tshift + 4
    dq = int(tables.INV_QUANT_SCALES[rem]) * 16
    out = np.zeros_like(lv)
    for i in range(n):
        for j in range(n):
            if shift > per:
                v = (int(lv[i, j]) * dq + (1 << (shift - per - 1))) >> (shift - per)
            else:
                v = (int(lv[i, j]) * dq) << (per - shift)
            out[i, j] = min(max(v, -32768), 32767)
    return out


# --- intra prediction -------------------------------------------------------

def predict_intra(mode: int, adi: np.ndarray, size: int, is_luma: bool,
                  bd: int = 8, strong: bool = False) -> np.ndarray:
    """Spec-style scalar intra prediction from a substituted adi vector.

    adi layout as in homerhevc_tpu.ops.intra (left bottom->top, corner,
    top left->right).  strong: SPS strong_intra_smoothing (bilinear
    filter for 32x32 luma when the edges test near-linear, spec
    8.4.4.2.3).
    """
    s = size
    log2 = int(np.log2(s))

    def p(r, c):  # neighbour accessor, r/c in -1..2S-1
        a = adi_f if use_filtered else adi
        if r == -1:
            return int(a[2 * s + 1 + c]) if c >= 0 else int(a[2 * s])
        return int(a[2 * s - 1 - r])

    # filtering decision
    if not is_luma or s == 4 or mode == 1:
        use_filtered = False
    elif mode == 0:
        use_filtered = int(tables.INTRA_FILTER_THRESH[log2 - 2]) < 10
    else:
        mdist = min(abs(mode - 26), abs(mode - 10))
        use_filtered = mdist > int(tables.INTRA_FILTER_THRESH[log2 - 2])

    adi_f = adi.copy()
    for k in range(1, 4 * s):
        adi_f[k] = (int(adi[k - 1]) + 2 * int(adi[k]) + int(adi[k + 1]) + 2) >> 2
    if strong and is_luma and s == 32:
        corner = int(adi[2 * s])
        top_end = int(adi[4 * s])
        bl_end = int(adi[0])
        thr = 1 << (bd - 5)
        if (abs(corner + top_end - 2 * int(adi[3 * s])) < thr
                and abs(corner + bl_end - 2 * int(adi[s])) < thr):
            adi_f = adi.copy()
            for x in range(2 * s - 1):        # top row, x = 0..2S-2
                adi_f[2 * s + 1 + x] = (
                    (2 * s - 1 - x) * corner + (x + 1) * top_end
                    + s) >> 6
            for y in range(2 * s - 1):        # left col, y = 0..2S-2
                adi_f[2 * s - 1 - y] = (
                    (2 * s - 1 - y) * corner + (y + 1) * bl_end
                    + s) >> 6

    pred = np.zeros((s, s), dtype=np.int32)
    if mode == 0:  # planar
        for r in range(s):
            for c in range(s):
                pred[r, c] = ((s - 1 - c) * p(r, -1) + (c + 1) * p(-1, s)
                              + (s - 1 - r) * p(-1, c) + (r + 1) * p(s, -1)
                              + s) >> (log2 + 1)
    elif mode == 1:  # DC
        dc = (sum(p(-1, c) for c in range(s))
              + sum(p(r, -1) for r in range(s)) + s) >> (log2 + 1)
        pred[:, :] = dc
        if is_luma and s < 32:
            pred[0, 0] = (p(0, -1) + 2 * dc + p(-1, 0) + 2) >> 2
            for c in range(1, s):
                pred[0, c] = (p(-1, c) + 3 * dc + 2) >> 2
            for r in range(1, s):
                pred[r, 0] = (p(r, -1) + 3 * dc + 2) >> 2
    else:
        ang = tables.intra_pred_angle(mode)
        inv_ang = tables.intra_inv_angle(mode)
        is_ver = mode >= 18

        def main(k):  # refMain
            return p(-1, k - 1) if is_ver else p(k - 1, -1)

        def side(i):  # refSide
            return p(i - 1, -1) if is_ver else p(-1, i - 1)

        ref = {}
        for k in range(0, 2 * s + 1):
            ref[k] = main(k)
        if ang < 0:
            inv_sum = 128
            for j in range(1, -((s * ang) >> 5)):
                inv_sum += inv_ang
                ref[-j] = side(inv_sum >> 8)

        for rr in range(s):
            pos = (rr + 1) * ang
            ii, ff = pos >> 5, pos & 31
            for cc in range(s):
                if ff:
                    v = ((32 - ff) * ref[cc + ii + 1]
                         + ff * ref[cc + ii + 2] + 16) >> 5
                else:
                    v = ref[cc + ii + 1]
                if is_ver:
                    pred[rr, cc] = v
                else:
                    pred[cc, rr] = v
        maxv = (1 << bd) - 1
        if is_luma and s < 32 and mode == 26:
            for r in range(s):
                pred[r, 0] = min(max(
                    p(-1, 0) + ((p(r, -1) - p(-1, -1)) >> 1), 0), maxv)
        if is_luma and s < 32 and mode == 10:
            for c in range(s):
                pred[0, c] = min(max(
                    p(0, -1) + ((p(-1, c) - p(-1, -1)) >> 1), 0), maxv)
    return pred
