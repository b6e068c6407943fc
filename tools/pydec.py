"""Python HEVC intra decoder (debug/conformance oracle).

Decodes Main-profile all-intra streams within the feature envelope of
this framework (I slices, CTU<=64, no SAO/deblock/PCM/scaling lists,
no transform-skip).  It shares *rule implementations* with the encoder
(tables.py), so running it over streams from independent encoders
(x265) exposes any divergence of our syntax/context model from the
standard, bin by bin.
"""
from __future__ import annotations
import sys
sys.path.insert(0, '.')

import numpy as np

from homerhevc_tpu import tables
from tests import golden_model as gm

LPS = tables.CABAC_LPS_TABLE
NLPS = tables.CABAC_NEXT_STATE_LPS


def remove_ebsp(b: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(b):
        if zeros >= 2 and b[i] == 3:
            zeros = 0
            i += 1
            continue
        out.append(b[i])
        zeros = zeros + 1 if b[i] == 0 else 0
        i += 1
    return bytes(out)


def split_nals(data: bytes):
    pos = []
    i = 0
    while i < len(data) - 3:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            pos.append(i + 3)
            i += 3
        else:
            i += 1
    nals = []
    for k, p in enumerate(pos):
        end = (pos[k + 1] - 3) if k + 1 < len(pos) else len(data)
        while end > p and data[end - 1] == 0:
            end -= 1
        nals.append((data[p] >> 1, remove_ebsp(data[p:end])))
    return nals


class BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def bit(self):
        byte = self.d[self.pos >> 3] if (self.pos >> 3) < len(self.d) else 0
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self):
        z = 0
        while self.bit() == 0 and z < 64:
            z += 1
        return (1 << z) - 1 + (self.bits(z) if z else 0)

    def se(self):
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def parse_ptl(r):
    r.bits(8 + 32 + 4 + 44)
    r.bits(8)  # level


def parse_sps(rbsp):
    r = BitReader(rbsp[2:])  # skip NAL header
    s = {}
    r.bits(4)
    r.bits(3)
    r.bits(1)
    parse_ptl(r)
    s['sps_id'] = r.ue()
    s['chroma'] = r.ue()
    s['w'] = r.ue()
    s['h'] = r.ue()
    if r.bit():
        for _ in range(4):
            r.ue()
    s['bd_l'] = r.ue() + 8
    s['bd_c'] = r.ue() + 8
    s['log2_max_poc'] = r.ue() + 4
    sub = r.bit()
    for _ in range(1 if not sub else 1):
        r.ue(), r.ue(), r.ue()
    s['log2_min_cb'] = r.ue() + 3
    s['log2_ctb'] = s['log2_min_cb'] + r.ue()
    s['log2_min_tb'] = r.ue() + 2
    s['log2_max_tb'] = s['log2_min_tb'] + r.ue()
    s['max_tr_inter'] = r.ue()
    s['max_tr_intra'] = r.ue()
    s['scaling'] = r.bit()
    if s['scaling']:
        # default lists only (no explicit scaling_list_data)
        assert not r.bit(), "explicit scaling list data unsupported"
    s['amp'] = r.bit()
    s['sao'] = r.bit()
    s['pcm'] = r.bit()
    assert not s['pcm']
    n_rps = r.ue()
    for i in range(n_rps):
        # st_ref_pic_set(i) with no inter-rps prediction (i==0 only safe)
        if i != 0 and r.bit():
            raise NotImplementedError("inter RPS prediction")
        nn = r.ue()
        np_ = r.ue()
        for _ in range(nn):
            r.ue(), r.bit()
        for _ in range(np_):
            r.ue(), r.bit()
    if r.bit():
        raise NotImplementedError("long term ref pics")
    s['tmvp'] = r.bit()
    s['strong_intra'] = r.bit()
    return s


def parse_pps(rbsp):
    r = BitReader(rbsp[2:])
    p = {}
    p['pps_id'] = r.ue()
    p['sps_id'] = r.ue()
    p['dep_slice'] = r.bit()
    p['output_flag'] = r.bit()
    p['extra_bits'] = r.bits(3)
    p['sign_hide'] = r.bit()
    p['cabac_init'] = r.bit()
    p['nri_l0'] = r.ue()
    p['nri_l1'] = r.ue()
    p['init_qp'] = 26 + r.se()
    p['constrained_intra'] = r.bit()
    p['tskip'] = r.bit()
    assert not p['tskip']
    p['cu_qp_delta'] = r.bit()
    if p['cu_qp_delta']:
        p['diff_cu_qp_depth'] = r.ue()
    p['cb_qp_off'] = r.se()
    p['cr_qp_off'] = r.se()
    p['slice_chroma_qp'] = r.bit()
    p['wpred'] = r.bit()
    p['wbipred'] = r.bit()
    p['tq_bypass'] = r.bit()
    p['tiles'] = r.bit()
    p['wpp'] = r.bit()
    assert not p['tiles']
    p['lf_across'] = r.bit()
    if r.bit():  # deblocking_filter_control_present
        p['db_override'] = r.bit()
        p['db_disabled'] = r.bit()
        if not p['db_disabled']:
            r.se(), r.se()
    else:
        p['db_override'] = 0
        p['db_disabled'] = 0
    return p


class Cabac:
    def __init__(self, data, bitpos):
        self.d = data
        self.pos = bitpos
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self.bit()

    def bit(self):
        byte = self.d[self.pos >> 3] if (self.pos >> 3) < len(self.d) else 0
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def decode(self, ctx, i):
        st = ctx[i]
        state, mps = st >> 1, st & 1
        lps = int(LPS[state][(self.range >> 6) & 3])
        self.range -= lps
        if self.offset >= self.range:
            binv = 1 - mps
            self.offset -= self.range
            self.range = lps
            if state == 0:
                mps ^= 1
            ctx[i] = (int(NLPS[state]) << 1) | mps
        else:
            binv = mps
            ctx[i] = (min(state + 1, 62) << 1) | mps
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.bit()
        return binv

    def bypass(self):
        self.offset = (self.offset << 1) | self.bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def bypass_n(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bypass()
        return v

    def terminate(self):
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.bit()
        return 0


# context layout mirrors native/cabac.h
OFF = dict(SPLIT=0, PART=8, INTRA=13, CHROMA=14, CBF_L=28, CBF_C=32,
           LAST_X=37, LAST_Y=67, SIG_CG=97, SIG=101, ONE=143, ABS=167,
           MVP=173, SAO_M=174, SAO_T=175, TSUB=176)

_INIT = {
    0: [139, 141, 157], 8: [184, 154, 154, 154], 13: [184],
    14: [63, 139],
    28: [111, 141, 154, 154], 32: [94, 138, 182, 154],
    37: [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143,
         127, 111, 79, 108, 123, 63] + [154] * 12,
    97: [91, 171, 134, 141],
    101: [111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141,
          179, 153, 125, 107, 125, 141, 179, 153, 125, 107, 125, 141,
          179, 153, 125, 140, 139, 182, 182, 152, 136, 152, 136, 153,
          136, 139, 111, 136, 139, 111],
    143: [140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92,
          139, 107, 122, 152, 140, 179, 166, 182, 140, 227, 122, 197],
    167: [138, 153, 136, 167, 152, 152],
    176: [153, 138, 138],
}


def init_ctx_i_slice(qp):
    ctx = [0] * 180
    for off, lst in _INIT.items():
        for i, iv in enumerate(lst):
            ctx[off + i] = tables.ctx_init_state(iv, qp)
    for i in range(30):
        ctx[67 + i] = ctx[37 + i]
    return ctx


MIN_IN_GROUP = [0, 1, 2, 3, 4, 6, 8, 12, 16, 24]
GROUP_IDX = [0, 1, 2, 3, 4, 4, 5, 5] + [6] * 4 + [7] * 4 + [8] * 8 + [9] * 8
CTX_IND_MAP_4x4 = [0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8]


class IntraDecoder:
    """Decodes one I slice and reconstructs; trace records syntax."""

    def __init__(self, sps, pps, rbsp, verbose=False):
        self.sps, self.pps = sps, pps
        self.v = verbose
        self.w, self.h = sps['w'], sps['h']
        self.ctb = 1 << sps['log2_ctb']
        self.rec_y = np.zeros((self.h, self.w), np.int32)
        self.rec_u = np.zeros((self.h // 2, self.w // 2), np.int32)
        self.rec_v = np.zeros((self.h // 2, self.w // 2), np.int32)
        self.mode_map = np.full((self.h // 4, self.w // 4), -1, np.int32)
        self.trace = []
        self._parse_slice_header(rbsp)

    def _parse_slice_header(self, rbsp):
        r = BitReader(rbsp[2:])
        first = r.bit()
        assert first
        r.bit()  # no_output (IRAP)
        r.ue()   # pps id
        st = r.ue()
        assert st == 2, "I slice only"
        if self.sps['sao']:
            self.sao_l = r.bit()
            self.sao_c = r.bit()
            assert not self.sao_l and not self.sao_c, "SAO decode TBD"
        self.qp = self.pps['init_qp'] + r.se()
        if self.pps['lf_across'] and (not self.pps['db_disabled']):
            r.bit()
        # byte alignment
        r.bit()
        while r.pos % 8:
            r.bit()
        self.cabac = Cabac(rbsp[2:], r.pos)
        self.ctx = init_ctx_i_slice(self.qp)
        self.qp_c_cb = int(tables.CHROMA_QP_TABLE[
            np.clip(self.qp + self.pps['cb_qp_off'], 0, 57)])
        self.qp_c_cr = int(tables.CHROMA_QP_TABLE[
            np.clip(self.qp + self.pps['cr_qp_off'], 0, 57)])

    def decode_slice(self):
        nx = (self.w + self.ctb - 1) // self.ctb
        ny = (self.h + self.ctb - 1) // self.ctb
        for cy in range(ny):
            for cx in range(nx):
                self.quadtree(cx * self.ctb, cy * self.ctb,
                              self.sps['log2_ctb'], 0)
                end = self.cabac.terminate()
                last = (cx == nx - 1 and cy == ny - 1)
                assert end == (1 if last else 0), \
                    f"end_of_slice mismatch at CTU {cx},{cy}"
        return self.rec_y, self.rec_u, self.rec_v

    def quadtree(self, x0, y0, log2, depth):
        if log2 > self.sps['log2_min_cb']:
            # split flag (availability: within picture)
            ctxi = 0
            if x0 > 0 and self.depth_gt(x0 - 1, y0, depth):
                ctxi += 1
            if y0 > 0 and self.depth_gt(x0, y0 - 1, depth):
                ctxi += 1
            split = self.cabac.decode(self.ctx, OFF['SPLIT'] + ctxi)
        else:
            split = 0
        if split:
            h = 1 << (log2 - 1)
            self._set_depth(x0, y0, 1 << log2, depth + 1, partial=True)
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                if x0 + dx < self.w and y0 + dy < self.h:
                    self.quadtree(x0 + dx, y0 + dy, log2 - 1, depth + 1)
        else:
            self._set_depth(x0, y0, 1 << log2, depth)
            self.coding_unit(x0, y0, log2)

    def depth_gt(self, x, y, d):
        return self.depth_map.get((x >> 3, y >> 3), 99) > d \
            if hasattr(self, 'depth_map') else self._dm[y >> 2, x >> 2] > d

    def _set_depth(self, x0, y0, size, d, partial=False):
        if not hasattr(self, '_dm'):
            self._dm = np.zeros((self.h // 4, self.w // 4), np.int32)
        self._dm[y0 >> 2:(y0 + size) >> 2, x0 >> 2:(x0 + size) >> 2] = d

    # ---- CU ----
    def coding_unit(self, x0, y0, log2):
        size = 1 << log2
        part_nxn = False
        if log2 == self.sps['log2_min_cb']:
            part_nxn = self.cabac.decode(self.ctx, OFF['PART']) == 0
        n_pu = 4 if part_nxn else 1
        half = size >> 1
        pus = [(x0, y0)] if not part_nxn else [
            (x0, y0), (x0 + half, y0), (x0, y0 + half), (x0 + half, y0 + half)]
        flags = []
        for (px, py) in pus:
            flags.append(self.cabac.decode(self.ctx, OFF['INTRA']))
        modes = []
        for i, (px, py) in enumerate(pus):
            cand = self.mpm(px, py, x0, y0)
            if flags[i]:
                idx = 0
                if self.cabac.bypass():
                    idx = 1 + self.cabac.bypass()
                mode = cand[idx]
            else:
                c = sorted(cand)
                mode = self.cabac.bypass_n(5)
                for k in range(3):
                    if mode >= c[k]:
                        mode += 1
                # spec: compare ascending with >= after each increment
            modes.append(mode)
            ps = half if part_nxn else size
            self.mode_map[py >> 2:(py + ps) >> 2, px >> 2:(px + ps) >> 2] = mode
        # chroma mode
        if self.cabac.decode(self.ctx, OFF['CHROMA']):
            idx = self.cabac.bypass_n(2)
            lst = [0, 26, 10, 1]
            lm = modes[0]
            lst = [34 if m == lm else m for m in lst]
            cmode = lst[idx]
        else:
            cmode = modes[0]  # DM
        self.trace.append(('cu', x0, y0, size, part_nxn, modes, cmode))
        max_depth = self.sps['max_tr_intra'] + (1 if part_nxn else 0)
        self.transform_tree(x0, y0, x0, y0, log2, 0, 0, max_depth,
                            part_nxn, modes, cmode, [True, True])

    def mpm(self, px, py, cu_x0, cu_y0):
        def get(x, y):
            if x < 0 or y < 0:
                return 1
            # above outside this CTU row -> DC
            if y < py and (y >> self.sps['log2_ctb']) != (py >> self.sps['log2_ctb']):
                return 1
            m = self.mode_map[y >> 2, x >> 2]
            return 1 if m < 0 else int(m)
        a = get(px - 1, py)
        b = get(px, py - 1)
        if a == b:
            if a < 2:
                return [0, 1, 26]
            return [a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]
        c = 0 if (a != 0 and b != 0) else (26 if a + b < 2 else 1)
        return [a, b, c]

    # ---- TU ----
    def transform_tree(self, x0, y0, xb, yb, log2, trd, blk, max_depth,
                       intra_split, modes, cmode, parent_cbf_c):
        forced_split = (log2 > self.sps['log2_max_tb']) or \
                       (intra_split and trd == 0)
        forced_leaf = (log2 == self.sps['log2_min_tb']) or (trd >= max_depth)
        if forced_split:
            split = 1
        elif forced_leaf:
            split = 0
        else:
            split = self.cabac.decode(self.ctx, OFF['TSUB'] + 5 - log2)
        cb, cr = parent_cbf_c
        if log2 > 2:
            if parent_cbf_c[0]:
                cb = self.cabac.decode(self.ctx, OFF['CBF_C'] + trd)
            if parent_cbf_c[1]:
                cr = self.cabac.decode(self.ctx, OFF['CBF_C'] + trd)
        if split:
            h = 1 << (log2 - 1)
            for i, (dx, dy) in enumerate(((0, 0), (h, 0), (0, h), (h, h))):
                self.transform_tree(x0 + dx, y0 + dy, x0, y0, log2 - 1,
                                    trd + 1, i, max_depth, intra_split,
                                    modes, cmode, [cb, cr])
            return
        cbf_l = self.cabac.decode(self.ctx, OFF['CBF_L'] +
                                  (1 if trd == 0 else 0))
        # reconstruct luma TU; intra prediction mode of the PU covering it
        size = 1 << log2
        mode = int(self.mode_map[y0 >> 2, x0 >> 2])
        coeff = None
        if cbf_l:
            coeff = self.residual(x0, y0, log2, 0, mode)
        self.recon_tu(self.rec_y, x0, y0, size, mode, coeff, self.qp, True)
        # chroma
        if log2 > 2:
            csize = size >> 1
            ccoeff_b = self.residual(x0, y0, log2 - 1, 1, cmode) if cb else None
            ccoeff_r = self.residual(x0, y0, log2 - 1, 2, cmode) if cr else None
            self.recon_tu(self.rec_u, x0 >> 1, y0 >> 1, csize, cmode,
                          ccoeff_b, self.qp_c_cb, False)
            self.recon_tu(self.rec_v, x0 >> 1, y0 >> 1, csize, cmode,
                          ccoeff_r, self.qp_c_cr, False)
        elif blk == 3:
            ccoeff_b = self.residual(xb, yb, 2, 1, cmode) if cb else None
            ccoeff_r = self.residual(xb, yb, 2, 2, cmode) if cr else None
            self.recon_tu(self.rec_u, xb >> 1, yb >> 1, 4, cmode,
                          ccoeff_b, self.qp_c_cb, False)
            self.recon_tu(self.rec_v, xb >> 1, yb >> 1, 4, cmode,
                          ccoeff_r, self.qp_c_cr, False)

    def recon_tu(self, plane, x0, y0, size, mode, coeff, qp, is_luma):
        adi = self.build_adi(plane, x0, y0, size)
        pred = gm.predict_intra(int(mode), adi, size, is_luma)
        if coeff is not None:
            dq = gm.dequant(coeff, qp)
            res = gm.inv_transform(dq, is_dst=(is_luma and size == 4))
            out = np.clip(pred + res, 0, 255)
        else:
            out = pred
        plane[y0:y0 + size, x0:x0 + size] = out

    def build_adi(self, plane, x0, y0, size):
        h, w = plane.shape
        s = size
        n = 4 * s + 1
        adi = np.zeros(n, np.int32)
        mask = np.zeros(n, bool)
        # availability: decoded = raster-scan z-order precedence; since we
        # decode sequentially, "already written" == available.  We track
        # via a written map at 4x4 granularity (luma) / 2x2 (chroma).
        written = self.written_y if plane is self.rec_y else (
            self.written_u if plane is self.rec_u else self.written_v)
        g = 2 if plane is self.rec_y else 1  # log2 granularity (4 or 2)
        def avail(yy, xx):
            if yy < 0 or xx < 0 or yy >= h or xx >= w:
                return False
            return written[yy >> g, xx >> g]
        for i in range(2 * s):
            yy = y0 + 2 * s - 1 - i
            if avail(yy, x0 - 1):
                adi[i] = plane[yy, x0 - 1]
                mask[i] = True
        if avail(y0 - 1, x0 - 1):
            adi[2 * s] = plane[y0 - 1, x0 - 1]
            mask[2 * s] = True
        for j in range(2 * s):
            if avail(y0 - 1, x0 + j):
                adi[2 * s + 1 + j] = plane[y0 - 1, x0 + j]
                mask[2 * s + 1 + j] = True
        if not mask.any():
            adi[:] = 128
        else:
            first = int(np.argmax(mask))
            adi[:first] = adi[first]
            for k in range(first + 1, n):
                if not mask[k]:
                    adi[k] = adi[k - 1]
        # mark written
        written[y0 >> g:(y0 + s) >> g, x0 >> g:(x0 + s) >> g] = True
        return adi

    # ---- residual ----
    def scan_idx_for(self, log2, c_idx, mode):
        if log2 == 2 or (log2 == 3 and c_idx == 0):
            if 6 <= mode <= 14:
                return 2
            if 22 <= mode <= 30:
                return 1
        return 0

    def residual(self, x0, y0, log2, c_idx, mode):
        cab, ctx = self.cabac, self.ctx
        n = 1 << log2
        scan_idx = self.scan_idx_for(log2, c_idx, int(mode))
        scan = tables.scan_order(n, scan_idx)
        # last position
        if c_idx == 0:
            off = 3 * (log2 - 2) + ((log2 - 1) >> 2)
            shift = (log2 + 1) >> 2
        else:
            off = 15
            shift = log2 - 2
        cmax = (log2 << 1) - 1
        gx = 0
        while gx < cmax and cab.decode(ctx, OFF['LAST_X'] + off + (gx >> shift)):
            gx += 1
        gy = 0
        while gy < cmax and cab.decode(ctx, OFF['LAST_Y'] + off + (gy >> shift)):
            gy += 1
        lx, ly = gx, gy
        if gx > 3:
            lx = MIN_IN_GROUP[gx] + cab.bypass_n((gx - 2) >> 1)
        if gy > 3:
            ly = MIN_IN_GROUP[gy] + cab.bypass_n((gy - 2) >> 1)
        if scan_idx == 2:
            lx, ly = ly, lx
        last = int(np.nonzero(scan == ly * n + lx)[0][0])
        blk = np.zeros((n, n), np.int32)
        ncg = max(n >> 2, 1)
        cg_of = {}
        for cg in range(ncg * ncg):
            p = int(scan[cg * 16])
            cg_of[((p % n) >> 2, (p // n) >> 2)] = cg
        last_cg = last >> 4
        cg_flags = np.zeros(ncg * ncg, np.int32)
        cg_flags[last_cg] = 1
        cg_flags[0] = 1
        c1_prev = 1
        for cg in range(last_cg, -1, -1):
            p = int(scan[cg * 16])
            cg_x, cg_y = (p % n) >> 2, (p // n) >> 2
            right = cg_flags[cg_of[(cg_x + 1, cg_y)]] if cg_x + 1 < ncg else 0
            below = cg_flags[cg_of[(cg_x, cg_y + 1)]] if cg_y + 1 < ncg else 0
            infer = False
            if 0 < cg < last_cg:
                cctx = (2 if c_idx else 0) + min(right + below, 1)
                cg_flags[cg] = cab.decode(ctx, OFF['SIG_CG'] + cctx)
                infer = True
                if not cg_flags[cg]:
                    continue
            pattern = right + 2 * below
            sigs = []
            if cg == last_cg:
                sigs.append(last)
            start = last - 1 if cg == last_cg else cg * 16 + 15
            for i in range(start, cg * 16 - 1, -1):
                pos = int(scan[i])
                x, y = pos % n, pos // n
                if infer and i == cg * 16 and not sigs:
                    sigs.append(i)
                    continue
                s = self.sig_ctx(x, y, log2, c_idx, pattern, cg_x + cg_y,
                                 scan_idx)
                if cab.decode(ctx, OFF['SIG'] + s):
                    sigs.append(i)
            if not sigs:
                continue
            cs = 2 if (cg > 0 and c_idx == 0) else 0
            if c1_prev == 0:
                cs += 1
            c1 = 1
            g1 = {}
            fc2 = -1
            for k, i in enumerate(sigs[:8]):
                b = cab.decode(ctx, OFF['ONE'] + (16 if c_idx else 0)
                               + 4 * cs + c1)
                g1[i] = b
                if b:
                    c1 = 0
                    if fc2 < 0:
                        fc2 = k
                elif 0 < c1 < 3:
                    c1 += 1
            c1_prev = c1
            g2 = 0
            if fc2 >= 0:
                g2 = cab.decode(ctx, OFF['ABS'] + (4 if c_idx else 0) + cs)
            sign_hidden = self.pps['sign_hide'] and \
                (sigs[0] - sigs[-1]) >= 4
            nsig = len(sigs)
            signs = [cab.bypass() for _ in range(nsig - (1 if sign_hidden
                                                         else 0))]
            rice = 0
            first2 = 1
            levels = []
            for k, i in enumerate(sigs):
                lvl = 1 + g1.get(i, 0) + (g2 if k == fc2 else 0)
                basel = (2 + first2) if k < 8 else 1
                if lvl >= basel:
                    pref = 0
                    while cab.bypass():
                        pref += 1
                    if pref <= 3:
                        v = (pref << rice) + cab.bypass_n(rice)
                    else:
                        v = (((1 << (pref - 3)) + 3 - 1) << rice) \
                            + cab.bypass_n(pref - 3 + rice)
                    lvl = basel + v
                if lvl > (3 << rice):
                    rice = min(rice + 1, 4)
                if lvl >= 2:
                    first2 = 0
                levels.append(lvl)
            total = sum(levels)
            for k, i in enumerate(sigs):
                if sign_hidden and k == nsig - 1:
                    sgn = total & 1
                else:
                    sgn = signs[k]
                pos = int(scan[i])
                blk[pos // n, pos % n] = -levels[k] if sgn else levels[k]
        return blk

    def sig_ctx(self, x, y, log2, c_idx, pattern, cg_sum, scan_idx):
        if log2 == 2:
            s = CTX_IND_MAP_4x4[4 * y + x]
            return s if c_idx == 0 else 27 + s
        if x == 0 and y == 0:
            return 0 if c_idx == 0 else 27
        xp, yp = x & 3, y & 3
        if pattern == 0:
            s = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
        elif pattern == 1:
            s = 2 if yp == 0 else (1 if yp == 1 else 0)
        elif pattern == 2:
            s = 2 if xp == 0 else (1 if xp == 1 else 0)
        else:
            s = 2
        if c_idx == 0:
            if cg_sum > 0:
                s += 3
            s += (9 if scan_idx == 0 else 15) if log2 == 3 else 21
            return s
        s += 9 if log2 == 3 else 12
        return 27 + s


def decode_stream(data: bytes, verbose=False):
    nals = split_nals(data)
    sps = pps = None
    for t, rbsp in nals:
        if t == 33:
            sps = parse_sps(rbsp)
        elif t == 34:
            pps = parse_pps(rbsp)
        elif t in (19, 20, 21):  # IDR / CRA
            dec = IntraDecoder(sps, pps, rbsp, verbose)
            dec.written_y = np.zeros((sps['h'] // 4, sps['w'] // 4), bool)
            dec.written_u = np.zeros((sps['h'] // 4, sps['w'] // 4), bool)
            dec.written_v = np.zeros((sps['h'] // 4, sps['w'] // 4), bool)
            return dec
    raise ValueError("no slice")


if __name__ == "__main__":
    data = open(sys.argv[1], 'rb').read()
    dec = decode_stream(data)
    y, u, v = dec.decode_slice()
    ref = np.load('/tmp/x265_recon_y.npy')
    d = np.abs(y - ref.astype(np.int32))
    print("maxdiff vs libde265:", d.max())
    if d.max():
        ys, xs = np.nonzero(d)
        print("first diffs at:", sorted(zip(ys, xs))[:5])
