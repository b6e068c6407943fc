"""Bin-flip bisection against libde265 to locate syntax divergence.

Encodes the test slice bin-by-bin with a spec CABAC encoder (mirroring
the C writer's intended bin/ctx sequence), verifies byte-identity with
the C writer, then flips single bins and compares libde265's decode
with our mirror's prediction to find the first bin where the real
decoder's interpretation differs from ours.
"""
import sys
sys.path.insert(0, '.')
import numpy as np
from homerhevc_tpu import tables
import tools.dbg_parse as P

LPS = tables.CABAC_LPS_TABLE
NLPS = tables.CABAC_NEXT_STATE_LPS


class SpecEnc:
    def __init__(self):
        self.low = 0
        self.range = 510
        self.first = True
        self.outstanding = 0
        self.bits = []

    def putbit(self, b):
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        while self.outstanding > 0:
            self.bits.append(1 - b)
            self.outstanding -= 1

    def renorm(self):
        while self.range < 256:
            if self.low < 256:
                self.putbit(0)
            elif self.low >= 512:
                self.low -= 512
                self.putbit(1)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def bin(self, ctx, i, b):
        st = ctx[i]
        state, mps = st >> 1, st & 1
        lps = int(LPS[state][(self.range >> 6) & 3])
        self.range -= lps
        if b != mps:
            self.low += self.range
            self.range = lps
            if state == 0:
                mps ^= 1
            ctx[i] = (int(NLPS[state]) << 1) | mps
        else:
            ctx[i] = (min(state + 1, 62) << 1) | mps
        self.renorm()

    def bypass(self, b):
        self.low <<= 1
        if b:
            self.low += self.range
        if self.low >= 1024:
            self.low -= 1024
            self.putbit(1)
        elif self.low < 512:
            self.putbit(0)
        else:
            self.low -= 512
            self.outstanding += 1

    def term(self, b):
        self.range -= 2
        if b:
            self.low += self.range
            self.range = 2
            self.renorm()
            self.putbit((self.low >> 9) & 1)
            v = ((self.low >> 7) & 3) | 1
            self.bits.append((v >> 1) & 1)
            self.bits.append(v & 1)
        else:
            self.renorm()

    def bytes_(self):
        bits = self.bits[:] + [1]  # rbsp stop bit
        while len(bits) % 8:
            bits.append(0)
        return bytes(int(''.join(map(str, bits[i:i + 8])), 2)
                     for i in range(0, len(bits), 8))


def bin_sequence_16x16(coeffs):
    """Generate the (kind, ctx, value) sequence for the fixed test
    structure: 64x64 frame, all 16x16 DC CUs, block0 has `coeffs`
    (dict (r,c)->v), all other CUs zero.  kind: 0 = ctx bin, 1 = bypass.
    Mirrors the C writer exactly."""
    seq = []

    def cbin(ctx, v):
        seq.append((0, ctx, int(v)))

    def byp(v):
        seq.append((1, 0, int(v)))

    scan = tables.scan_order(16, 0)
    blk = np.zeros((16, 16), np.int32)
    for (r, c), v in coeffs.items():
        blk[r, c] = v

    def tu16(has_coeffs):
        # transform tree: split flag, cbf_cb, cbf_cr, cbf_luma
        cbin(177, 0)
        cbin(32, 0)
        cbin(32, 0)
        cbin(29, 1 if has_coeffs else 0)
        if not has_coeffs:
            return
        # residual
        flat = blk.reshape(-1)
        last = -1
        for i in range(255, -1, -1):
            if flat[scan[i]]:
                last = i
                break
        lx, ly = int(scan[last] % 16), int(scan[last] // 16)
        gx, gy = int(P.kGroupIdx[lx]) if False else None, None
        GI = [0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7]
        GI = GI + [8] * 8 + [9] * 8
        MIN = [0, 1, 2, 3, 4, 6, 8, 12, 16, 24]
        gx, gy = GI[lx], GI[ly]
        off, shift, cmax = 6, 1, 7
        for b in range(gx):
            cbin(37 + off + (b >> shift), 1)
        if gx < cmax:
            cbin(37 + off + (gx >> shift), 0)
        for b in range(gy):
            cbin(67 + off + (b >> shift), 1)
        if gy < cmax:
            cbin(67 + off + (gy >> shift), 0)
        if gx > 3:
            nb = (gx - 2) >> 1
            v = lx - MIN[gx]
            for i in range(nb - 1, -1, -1):
                byp((v >> i) & 1)
        if gy > 3:
            nb = (gy - 2) >> 1
            v = ly - MIN[gy]
            for i in range(nb - 1, -1, -1):
                byp((v >> i) & 1)
        cg_scan = [(int(scan[cg * 16] % 16) >> 2, int(scan[cg * 16] // 16) >> 2)
                   for cg in range(16)]
        last_cg = last >> 4
        cg_flags = [0] * 16
        for i in range(last + 1):
            if flat[scan[i]]:
                cg_flags[i >> 4] = 1
        c1_prev = 1
        for cg in range(last_cg, -1, -1):
            cgx, cgy = cg_scan[cg]
            right = below = 0
            for c2 in range(16):
                if cg_scan[c2] == (cgx + 1, cgy):
                    right = cg_flags[c2]
                if cg_scan[c2] == (cgx, cgy + 1):
                    below = cg_flags[c2]
            infer = False
            if 0 < cg < last_cg:
                cbin(97 + min(right + below, 1), cg_flags[cg])
                infer = True
                if not cg_flags[cg]:
                    continue
            pattern = right + 2 * below
            sigs = []
            abs_l = []
            sgn = []
            if cg == last_cg:
                sigs.append(last)
                abs_l.append(abs(int(flat[scan[last]])))
                sgn.append(int(flat[scan[last]]) < 0)
            start = last - 1 if cg == last_cg else cg * 16 + 15
            for i in range(start, cg * 16 - 1, -1):
                pos = scan[i]
                x, y = int(pos % 16), int(pos // 16)
                v = int(flat[pos])
                sig = v != 0
                if infer and i == cg * 16 and not sigs:
                    sigs.append(i)
                    abs_l.append(abs(v))
                    sgn.append(v < 0)
                    continue
                if x == 0 and y == 0:
                    s = 0
                else:
                    xp, yp = x & 3, y & 3
                    if pattern == 0:
                        s = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
                    elif pattern == 1:
                        s = 2 if yp == 0 else (1 if yp == 1 else 0)
                    elif pattern == 2:
                        s = 2 if xp == 0 else (1 if xp == 1 else 0)
                    else:
                        s = 2
                    if cgx + cgy > 0:
                        s += 3
                    s += 21
                cbin(101 + s, sig)
                if sig:
                    sigs.append(i)
                    abs_l.append(abs(v))
                    sgn.append(v < 0)
            if not sigs:
                continue
            cs = 2 if cg > 0 else 0
            if c1_prev == 0:
                cs += 1
            c1 = 1
            fc2 = -1
            for k in range(min(len(sigs), 8)):
                g1 = abs_l[k] > 1
                cbin(143 + 4 * cs + c1, g1)
                if g1:
                    c1 = 0
                    if fc2 < 0:
                        fc2 = k
                elif 0 < c1 < 3:
                    c1 += 1
            c1_prev = c1
            if fc2 >= 0:
                cbin(167 + cs, abs_l[fc2] > 2)
            for k in range(len(sigs)):
                byp(sgn[k])
            rice = 0
            first2 = 1
            for k in range(len(sigs)):
                base = (2 + first2) if k < 8 else 1
                if abs_l[k] >= base:
                    v = abs_l[k] - base
                    if v < (3 << rice):
                        ln = v >> rice
                        for _ in range(ln):
                            byp(1)
                        byp(0)
                        for i in range(rice - 1, -1, -1):
                            byp((v >> i) & 1)
                    else:
                        ln = rice
                        v -= 3 << rice
                        while v >= (1 << ln):
                            v -= 1 << ln
                            ln += 1
                        pfx = 3 + ln + 1 - rice
                        for _ in range(pfx - 1):
                            byp(1)
                        byp(0)
                        for i in range(ln - 1, -1, -1):
                            byp((v >> i) & 1)
                    if abs_l[k] > (3 << rice):
                        rice = min(rice + 1, 4)
                if abs_l[k] >= 2:
                    first2 = 0
            # end CG
        return

    # 16 CUs in z-order over the CTU; block0 first; then 15 empty CTUs
    first = True
    for cu in range(16):
        cbin(0, 1)  # split d0 (only first CU in each CTU... handled below)
    return seq


def build_slice_bins(coeffs):
    """Full bin list for 64x64 frame: 1 CTU, 16 CUs 16x16 DC."""
    seq = []

    def cbin(ctx, v):
        seq.append((0, int(ctx), int(v)))

    def byp(v):
        seq.append((1, 0, int(v)))

    scan = tables.scan_order(16, 0)
    GI = [0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7] + [8] * 8 + [9] * 8
    MIN = [0, 1, 2, 3, 4, 6, 8, 12, 16, 24]
    cg_scan = [(int(scan[cg * 16] % 16) >> 2, int(scan[cg * 16] // 16) >> 2)
               for cg in range(16)]

    def residual16(blk):
        flat = blk.reshape(-1)
        last = -1
        for i in range(255, -1, -1):
            if flat[scan[i]]:
                last = i
                break
        lx, ly = int(scan[last] % 16), int(scan[last] // 16)
        gx, gy = GI[lx], GI[ly]
        off, shift, cmax = 6, 1, 7
        for b in range(gx):
            cbin(37 + off + (b >> shift), 1)
        if gx < cmax:
            cbin(37 + off + (gx >> shift), 0)
        for b in range(gy):
            cbin(67 + off + (b >> shift), 1)
        if gy < cmax:
            cbin(67 + off + (gy >> shift), 0)
        if gx > 3:
            nb = (gx - 2) >> 1
            v = lx - MIN[gx]
            for i in range(nb - 1, -1, -1):
                byp((v >> i) & 1)
        if gy > 3:
            nb = (gy - 2) >> 1
            v = ly - MIN[gy]
            for i in range(nb - 1, -1, -1):
                byp((v >> i) & 1)
        last_cg = last >> 4
        cg_flags = [0] * 16
        for i in range(last + 1):
            if flat[scan[i]]:
                cg_flags[i >> 4] = 1
        c1_prev = 1
        for cg in range(last_cg, -1, -1):
            cgx, cgy = cg_scan[cg]
            right = below = 0
            for c2 in range(16):
                if cg_scan[c2] == (cgx + 1, cgy):
                    right = cg_flags[c2]
                if cg_scan[c2] == (cgx, cgy + 1):
                    below = cg_flags[c2]
            infer = False
            if 0 < cg < last_cg:
                cbin(97 + min(right + below, 1), cg_flags[cg])
                infer = True
                if not cg_flags[cg]:
                    continue
            pattern = right + 2 * below
            sigs, abs_l, sgn = [], [], []
            if cg == last_cg:
                sigs.append(last)
                abs_l.append(abs(int(flat[scan[last]])))
                sgn.append(int(flat[scan[last]]) < 0)
            start = last - 1 if cg == last_cg else cg * 16 + 15
            for i in range(start, cg * 16 - 1, -1):
                pos = scan[i]
                x, y = int(pos % 16), int(pos // 16)
                v = int(flat[pos])
                sig = v != 0
                if infer and i == cg * 16 and not sigs:
                    sigs.append(i)
                    abs_l.append(abs(v))
                    sgn.append(v < 0)
                    continue
                if x == 0 and y == 0:
                    s = 0
                else:
                    xp, yp = x & 3, y & 3
                    if pattern == 0:
                        s = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
                    elif pattern == 1:
                        s = 2 if yp == 0 else (1 if yp == 1 else 0)
                    elif pattern == 2:
                        s = 2 if xp == 0 else (1 if xp == 1 else 0)
                    else:
                        s = 2
                    if cgx + cgy > 0:
                        s += 3
                    s += 21
                cbin(101 + s, sig)
                if sig:
                    sigs.append(i)
                    abs_l.append(abs(v))
                    sgn.append(v < 0)
            if not sigs:
                continue
            cs = 2 if cg > 0 else 0
            if c1_prev == 0:
                cs += 1
            c1 = 1
            fc2 = -1
            for k in range(min(len(sigs), 8)):
                g1 = abs_l[k] > 1
                cbin(143 + 4 * cs + c1, g1)
                if g1:
                    c1 = 0
                    if fc2 < 0:
                        fc2 = k
                elif 0 < c1 < 3:
                    c1 += 1
            c1_prev = c1
            if fc2 >= 0:
                cbin(167 + cs, abs_l[fc2] > 2)
            for k in range(len(sigs)):
                byp(sgn[k])
            rice = 0
            first2 = 1
            for k in range(len(sigs)):
                base = (2 + first2) if k < 8 else 1
                if abs_l[k] >= base:
                    v = abs_l[k] - base
                    if v < (3 << rice):
                        ln = v >> rice
                        for _ in range(ln):
                            byp(1)
                        byp(0)
                        for i in range(rice - 1, -1, -1):
                            byp((v >> i) & 1)
                    else:
                        ln = rice
                        v -= 3 << rice
                        while v >= (1 << ln):
                            v -= 1 << ln
                            ln += 1
                        pfx = 3 + ln + 1 - rice
                        for _ in range(pfx - 1):
                            byp(1)
                        byp(0)
                        for i in range(ln - 1, -1, -1):
                            byp((v >> i) & 1)
                    if abs_l[k] > (3 << rice):
                        rice = min(rice + 1, 4)
                if abs_l[k] >= 2:
                    first2 = 0

    blk0 = np.zeros((16, 16), np.int32)
    for (r, c), v in coeffs.items():
        blk0[r, c] = v

    # quadtree: depth0 split=1, then 4 quadrants each split=1 -> CUs
    cbin(0, 1)
    for quad in range(4):
        cbin(0, 1)
        for cu in range(4):
            cu_idx = quad * 4 + cu
            cbin(0, 0)  # depth2 stop
            cbin(13, 1)  # mpm flag (DC is always in cands here)
            # mpm idx: DC index in cand list: first CU: {0,1,26} -> 1;
            # with left/top DC: a==b==DC<2 -> {0,1,26} -> idx 1 always
            byp(1)
            byp(0)
            cbin(14, 0)  # chroma DM
            has = cu_idx == 0 and blk0.any()
            cbin(177, 0)
            cbin(32, 0)
            cbin(32, 0)
            cbin(29, 1 if has else 0)
            if has:
                residual16(blk0)
    return seq


def encode_bins(seq, qp=32, flip=None):
    e = SpecEnc()
    ctx = P.init_ctx(qp)
    for idx, (kind, c, v) in enumerate(seq):
        if flip is not None and idx == flip:
            v ^= 1
        if kind:
            e.bypass(v)
        else:
            e.bin(ctx, c, v)
    e.term(1)  # end_of_slice for single-CTU frame
    return e.bytes_()


def make_stream(payload_rbsp, header=bytes([0x26, 0x01]),
                hdr_bits=b""):
    # slice header for I IDR qp=32 (delta 0), deblock off, sao off:
    # bits: first_slice(1) no_output(0) pps ue(0)->1 slice_type ue(2)->011
    # qp_delta se(0)->1 align(1) -> 10101111? compute: 1 0 1 011 1 1 -> pad
    hdr = int('10101111', 2).to_bytes(1, 'big')
    rbsp = hdr + payload_rbsp
    out = bytearray(b"\x00\x00\x00\x01\x26\x01")
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)
