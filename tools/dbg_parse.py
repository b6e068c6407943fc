"""Debug: parse our own slice's first-CU residual with a Python CABAC
decoder, with switchable context-derivation hypotheses, to find where
libde265 disagrees with the C++ writer."""
import sys
sys.path.insert(0, '.')
import numpy as np
from homerhevc_tpu import tables

LPS = tables.CABAC_LPS_TABLE
NLPS = tables.CABAC_NEXT_STATE_LPS


class CabacDec:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self.bit()

    def bit(self):
        byte = self.data[self.pos >> 3] if (self.pos >> 3) < len(self.data) else 0
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


# context offsets mirroring native/cabac.h
OFF = dict(SPLIT=0, INTRA_LUMA=13, CHROMA=14, CBF_LUMA=28, CBF_CHROMA=32,
           LAST_X=37, LAST_Y=67, SIG_CG=97, SIG=101, ONE=143, ABS=167,
           TRANS_SUBDIV=176)

MIN_IN_GROUP = [0, 1, 2, 3, 4, 6, 8, 12, 16, 24]
CTX_IND_MAP = [0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8]


def init_ctx(qp):
    import ctypes
    # replicate ContextSet::init via the python table + same layout
    from homerhevc_tpu import tables as T
    CNU = 154
    vals = {}
    I = 2
    init = {
        0: [139, 141, 157],        # split
        13: [184], 14: [63, 139],
        28: [111, 141, CNU, CNU], 32: [94, 138, 182, 154],
        37: [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143,
             127, 111, 79, 108, 123, 63] + [CNU] * 12,
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
    ctx = [0] * 180
    for off, lst in init.items():
        for i, iv in enumerate(lst):
            ctx[off + i] = T.ctx_init_state(iv, qp)
    for i in range(30):
        ctx[67 + i] = ctx[37 + i]
    return ctx


def scan_tables(n, idx):
    import homerhevc_tpu.tables as T
    return T.scan_order(n, idx)


def parse_residual(d, ctx, n, hyp):
    """decode residual_coding for luma TB size n, diag scan; returns
    coeff block."""
    log2 = int(np.log2(n))
    scan = scan_tables(n, 0)
    # last xy
    off = 3 * (log2 - 2) + ((log2 - 1) >> 2)
    shift = (log2 + 1) >> 2
    cmax = (log2 << 1) - 1

    def last_prefix(base):
        g = 0
        while g < cmax and d.decode(ctx, base + off + (g >> shift)):
            g += 1
        return g

    gx = last_prefix(OFF['LAST_X'])
    gy = last_prefix(OFF['LAST_Y'])
    lx, ly = gx, gy
    if gx > 3:
        lx = MIN_IN_GROUP[gx] + d.bypass_n((gx - 2) >> 1)
    if gy > 3:
        ly = MIN_IN_GROUP[gy] + d.bypass_n((gy - 2) >> 1)
    # find scan pos of (lx, ly)
    last = int(np.nonzero(scan == ly * n + lx)[0][0])
    blk = np.zeros((n, n), np.int32)
    last_cg = last >> 4
    ncg = n >> 2
    cg_of = {}
    for cg in range(ncg * ncg):
        p = scan[cg * 16]
        cg_of[((p % n) >> 2, (p // n) >> 2)] = cg
    cg_flags = np.zeros(ncg * ncg, np.int32)
    cg_flags[last_cg] = 1
    cg_flags[0] = 1
    c1_prev = 1
    for cg in range(last_cg, -1, -1):
        p = scan[cg * 16]
        cg_x, cg_y = (p % n) >> 2, (p // n) >> 2
        right = cg_flags[cg_of[(cg_x + 1, cg_y)]] if cg_x + 1 < ncg else 0
        below = cg_flags[cg_of[(cg_x, cg_y + 1)]] if cg_y + 1 < ncg else 0
        infer_dc = False
        if cg < last_cg and cg > 0:
            cctx = min(right + below, 1)
            cg_flags[cg] = d.decode(ctx, OFF['SIG_CG'] + cctx)
            infer_dc = True
            if not cg_flags[cg]:
                continue
        pattern = right + 2 * below
        sigs = []
        if cg == last_cg:
            sigs.append(last)
        start = last - 1 if cg == last_cg else cg * 16 + 15
        for i in range(start, cg * 16 - 1, -1):
            pos = scan[i]
            x, y = pos % n, pos // n
            if infer_dc and i == cg * 16 and not sigs:
                sigs.append(i)
                continue
            # sig ctx
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
                if cg_x + cg_y > 0:
                    s += 3
                s += 21 if log2 > 3 else (9 if True else 15)
            if d.decode(ctx, OFF['SIG'] + s):
                sigs.append(i)
        if not sigs:
            continue
        # greater1
        ctx_set = 2 if cg > 0 else 0
        if hyp.get('c1prev', True) and c1_prev == 0:
            ctx_set += 1
        c1 = 1
        abs_lv = {}
        g1 = {}
        first_c2 = -1
        for k, i in enumerate(sigs[:8]):
            b = d.decode(ctx, OFF['ONE'] + 4 * ctx_set + c1)
            g1[i] = b
            if b:
                c1 = 0
                if first_c2 < 0:
                    first_c2 = k
            elif 0 < c1 < 3:
                c1 += 1
        c1_prev = c1
        g2 = 0
        if first_c2 >= 0:
            g2 = d.decode(ctx, OFF['ABS'] + ctx_set)
        signs = [d.bypass() for _ in sigs]
        rice = 0
        first2 = 1
        for k, i in enumerate(sigs):
            base = (2 + (1 if (k == first_c2 and g2) else 0)) if k < 8 else 1
            lvl = 1 + (g1.get(i, 0))
            if k == first_c2:
                lvl += g2
            # remaining present?
            basel = (2 + first2) if k < 8 else 1
            if lvl >= basel:
                # decode remaining
                pref = 0
                while d.bypass():
                    pref += 1
                if pref <= 3:
                    v = (pref << rice) + d.bypass_n(rice)
                else:
                    v = ((1 << (pref - 3)) + 3 - 1 << rice) + d.bypass_n(
                        pref - 3 + rice)
                lvl = basel + v
            if lvl > (3 << rice):
                rice = min(rice + 1, 4)
            if lvl >= 2:
                first2 = 0
            pos = scan[i]
            blk[pos // n, pos % n] = -lvl if signs[k] else lvl
        # NOTE: remaining-presence logic above is approximate; see writer
    return blk


def main():
    from homerhevc_tpu.config import EncoderConfig
    from homerhevc_tpu.entropy import binding
    w = h = 64
    qp = 32
    cfg = EncoderConfig(width=w, height=h, qp=qp, sao=False,
                        deblocking=False, sign_hiding=False)
    ccfg = binding.make_cfg(cfg)
    cp = np.zeros((64, 64), np.int16)
    for r, c, v in [(10, 12, 7), (12, 7, 3), (14, 12, 3), (15, 2, -2),
                    (15, 3, -3)]:
        cp[r, c] = v
    rec = binding.FrameRecord(
        width=w, height=h, slice_type=2, slice_qp=qp,
        cu_depth=np.full((16, 16), 2, np.uint8),
        intra_luma_mode=np.ones((16, 16), np.uint8),
        intra_chroma_mode=np.ones((16, 16), np.uint8),
        pred_mode=np.ones((16, 16), np.uint8))
    rec._fill_defaults()
    rec.coeff_y[:] = cp
    rec.cbf_y[0:4, 0:4] = 1
    sl = binding.encode_slice(ccfg, rec)
    # strip startcode + NAL header; un-EBSP
    assert sl[:5] == b"\x00\x00\x00\x01\x26" or sl[4] == 0x26, sl[:6].hex()
    payload = sl[6:]
    rbsp = bytearray()
    zeros = 0
    for b in payload:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        rbsp.append(b)
        zeros = zeros + 1 if b == 0 else 0
    # slice header for I IDR: first_slice(1), no_output(0), pps_id ue(0)=1,
    # slice_type ue(2)=011, slice_qp_delta se(qp-26... init_qp=32 -> delta 0)=1,
    # byte align: 1 + zeros
    # header bits: 1 0 1 011 1 then alignment '1' + pad -> compute: bits =
    # [1,0,1,0,1,1,1,(align 1)...] -> find alignment: count = 1+1+1+3+1 = 7
    # bits, then align bit 1 -> total 8 -> 1 byte: 0b10101111?? let's just
    # locate: slice data starts at next byte boundary after header.
    # first_slice=1, no_output=0, ue(0)='1', ue(2)='011', se(0)='1',
    # loop_filter_across: NOT present (sao off, deblock disabled ->
    # condition false)... deblock_disabled=1, sao=0 -> absent.
    hdr_bits = 1 + 1 + 1 + 3 + 1
    hdr_bytes = (hdr_bits + 1 + 7) // 8  # + alignment '1'
    data = bytes(rbsp[hdr_bytes:])
    d = CabacDec(data)
    ctx = init_ctx(qp)
    # prelude: split(1,ctx0), split(1,ctx0), split(0,ctx0) [depth2 stop]
    b1 = d.decode(ctx, OFF['SPLIT'] + 0)
    b2 = d.decode(ctx, OFF['SPLIT'] + 0)
    b3 = d.decode(ctx, OFF['SPLIT'] + 0)
    # intra: prev_intra_luma_pred_flag, mpm idx bypass (1,0)
    f = d.decode(ctx, OFF['INTRA_LUMA'])
    m1 = d.bypass()
    m2 = d.bypass()
    ch = d.decode(ctx, OFF['CHROMA'])
    ts = d.decode(ctx, OFF['TRANS_SUBDIV'] + 1)
    cb = d.decode(ctx, OFF['CBF_CHROMA'] + 0)
    cr = d.decode(ctx, OFF['CBF_CHROMA'] + 0)
    cl = d.decode(ctx, OFF['CBF_LUMA'] + 1)
    print("prelude:", b1, b2, b3, f, m1, m2, ch, ts, cb, cr, cl)
    blk = parse_residual(d, ctx, 16, {})
    nz = np.nonzero(blk)
    print("parsed coeffs:")
    for r, c in zip(*nz):
        print(f"  [{r},{c}] = {blk[r, c]}")


if __name__ == "__main__":
    main()
