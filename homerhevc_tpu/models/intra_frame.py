"""Batched intra-frame encoder: dense decision + wavefront recon.

TPU redesign of the reference's sequential per-CTU intra loop
(ref: wfpp_encoder_thread hmr_encoder_lib.c:2357, motion_intra
hmr_motion_intra.c:1990) in TWO passes:

1. **Dense mode + quadtree decision** (no wavefront): intra modes and
   the CU tree (32 -> 16 -> 8) are decided from SOURCE-pixel reference
   samples for every block of the frame in a handful of giant batched
   launches — all 35 predictions, SATD, MPM-aware mode bits, and the
   split decisions are pure dense tensor ops.  This is the TPU shape of
   the reference's ufast decoupling (analyse_recursive_info_cu
   hmr_motion_intra.c:1657 pre-decides splits from variance before any
   reconstruction); source-based decision is an encoder choice and
   keeps the stream conformant.
2. **Wavefront reconstruction** (the only serial part): a static
   schedule (models/schedule.py) over 32x32 slots; each step
   reconstructs all slots of an anti-diagonal in one batched launch.
   With modes fixed, the step body is a single prediction + T/Q/IQ/IT
   per tree level — an order of magnitude lighter than deciding modes
   in-loop, which is what makes all-intra throughput scale.

CU/TU tree: 32x32 CUs carry 32x32 TBs (chroma 16), 16x16 CUs carry
16x16 TBs (chroma 8), and 16x16 slots may split into four 8x8 CUs with
8x8 TBs (chroma 4x4, coded at the 4th child per spec).  The host
entropy stage serializes the resulting FrameRecord (decisions +
quantized coefficients) — the device/host split of SURVEY.md §7.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables
from homerhevc_tpu.models import schedule
from homerhevc_tpu.ops import deblock, intra, quant, rdbits, sao, transform


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _segment_avail_layout(s: int) -> np.ndarray:
    """Map 5 segment-availability bools to the [4S+1] adi mask layout."""
    seg = np.zeros((5, 4 * s + 1), dtype=bool)
    seg[0, 0:s] = True                 # bottom-left
    seg[1, s:2 * s] = True             # left
    seg[2, 2 * s] = True               # corner
    seg[3, 2 * s + 1:3 * s + 1] = True  # top
    seg[4, 3 * s + 1:] = True          # top-right
    return seg


def _pix_masks_np(av5, px, py, s: int, cw: int, ch: int,
                  chroma: bool = False) -> np.ndarray:
    """Per-PIXEL ADI availability [..., 4S+1]: z-order segment
    availability (av5 [..., 5]) clipped at the CODED picture bounds
    (cw, ch) — the decoder substitutes reference samples outside the
    coded picture (spec 8.4.4.2.2), which matters once the coded size
    is smaller than the padded compute planes (code_true_size).
    px/py: the block's LUMA pixel coords; chroma masks halve them.
    s: block size in the TARGET plane."""
    seg = _segment_avail_layout(s)
    base = (av5.astype(np.int32) @ seg.astype(np.int32)) > 0
    if chroma:
        px, py, cw, ch = px // 2, py // 2, cw // 2, ch // 2
    px = np.asarray(px)[..., None]
    py = np.asarray(py)[..., None]
    j = np.arange(4 * s + 1)
    row = np.where(j < 2 * s, py + 2 * s - 1 - j, py - 1)
    col = np.where(j <= 2 * s, px - 1, px + (j - 2 * s - 1))
    return base & (row < ch) & (col < cw)


def _avail_mask(seg_av, s: int):
    """[..., 5] segment availability -> [..., 4S+1] pixel mask."""
    layout = jnp.asarray(_segment_avail_layout(s), jnp.int32)
    return jnp.einsum("...k,kn->...n", seg_av.astype(jnp.int32),
                      layout) > 0


def _mpm_candidates(left_m, top_m):
    """Vectorized 3-MPM derivation (spec 8.4.2); inputs int32 [...]."""
    a, b = left_m, top_m
    eq = a == b
    a_ang = a >= 2
    c0_eq = jnp.where(a_ang, a, 0)
    c1_eq = jnp.where(a_ang, 2 + ((a + 29) % 32), 1)
    c2_eq = jnp.where(a_ang, 2 + ((a - 1) % 32), 26)
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
    mode-decision metric).  resid: [..., S, S] -> [...]."""
    h = jnp.asarray(_hadamard(size))
    # HIGH precision: the +/-1 Hadamard operand is bf16-exact, so the
    # 3-pass bf16 split reproduces the exact integer result (1-pass
    # bf16 would round the intermediate and make mode decisions
    # platform-dependent; device-gated by me.pallas_selftest)
    t = jnp.einsum("ij,...jk,kl->...il", h, resid.astype(jnp.float32), h,
                   precision=jax.lax.Precision.HIGH)
    return jnp.sum(jnp.abs(t), (-1, -2)) / size


def _rd_zero_intra(level, recon, pred, orig, lam, qp=None):
    """Zero-residual RD with CABAC-LUT bit pricing."""
    ssd_coded = jnp.sum((recon - orig) ** 2, (-1, -2)).astype(jnp.float32)
    ssd_zero = jnp.sum((pred - orig) ** 2, (-1, -2)).astype(jnp.float32)
    bits = rdbits.residual_bits(level, level.shape[-1], qp=qp) + 2.0
    zero = ssd_zero <= ssd_coded + lam * bits
    level = jnp.where(zero[..., None, None], 0, level)
    recon = jnp.where(zero[..., None, None],
                      jnp.clip(pred, 0, 255), recon)
    return level, recon


def _sbh_by_mode(level, du, mode, size: int, sign_hiding: bool):
    """Sign-bit hiding in the block's ACTUAL coefficient scan (spec
    7.4.9.11: intra 4x4/8x8 luma and 4x4 chroma use mode-dependent
    scans).

    ONE SBH pass with per-block permutation matrices (one-hot scan
    select + batched permutation matmuls) instead of three full passes
    + select."""
    if not sign_hiding:
        return level
    n = size * size
    perms = jnp.asarray(np.stack(
        [quant._perm_matrix_np(tuple(tables.scan_order(size, idx)), n)
         for idx in (tables.SCAN_DIAG, tables.SCAN_HOR,
                     tables.SCAN_VER)]))
    ver = (mode >= 6) & (mode <= 14)
    hor = (mode >= 22) & (mode <= 30)
    sel = jnp.where(ver, 2, jnp.where(hor, 1, 0))
    # one-hot / 0-1 permutation contractions: 3-pass bf16 exact
    hp = jax.lax.Precision.HIGH
    oh = jax.nn.one_hot(sel, 3, dtype=jnp.float32)
    m_n = jnp.einsum("...k,kij->...ij", oh, perms, precision=hp)
    shp = level.shape
    flat = level.reshape(*shp[:-2], n).astype(jnp.float32)
    duf = du.reshape(*shp[:-2], n).astype(jnp.float32)
    sl = jnp.einsum("...i,...ij->...j", flat, m_n, precision=hp) \
        .astype(jnp.int32)
    sdu = jnp.einsum("...i,...ij->...j", duf, m_n, precision=hp) \
        .astype(jnp.int32)
    ident = tuple(range(n))
    fixed = quant.sign_bit_hide(sl.reshape(shp), sdu.reshape(shp),
                                ident, size)
    back = jnp.einsum("...j,...ij->...i",
                      fixed.reshape(*shp[:-2], n).astype(jnp.float32),
                      m_n, precision=hp).astype(jnp.int32)
    return back.reshape(shp)


def _tq_recon(orig, pred, size, qp, lam, mode=None, sign_hiding=False,
              scaling=False, is_dst=False):
    """residual -> T -> Q(-SBH) -> IQ -> IT -> recon + zero-RD.

    mode-dependent-scan SBH applies when `mode` is given (sizes 4/8);
    otherwise the diagonal scan is used.  is_dst: DST-VII (intra luma
    4x4 TBs, spec 8.6.4.2).
    Returns (level, recon, cbf)."""
    resid = orig.astype(jnp.int32) - pred
    coeff = transform.forward_transform(resid, size, is_dst=is_dst)
    level, du = quant.quantize(coeff, qp, size, is_intra=True,
                               scaling=scaling)
    if sign_hiding:
        if mode is not None and size in (4, 8):
            level = _sbh_by_mode(level, du, mode, size, True)
        else:
            level = quant.sign_bit_hide(
                level, du, tuple(tables.scan_order(
                    size, tables.SCAN_DIAG)), size)
    deq = quant.dequantize(level, qp, size, is_intra=True,
                           scaling=scaling)
    r = transform.inverse_transform(deq, size, is_dst=is_dst)
    recon = jnp.clip(pred + r, 0, 255)
    level, recon = _rd_zero_intra(level, recon, pred, orig, lam,
                                  qp=qp)
    cbf = jnp.any(level != 0, axis=(-1, -2))
    return level, recon, cbf


# ---------------------------------------------------------------------------
# pass 1: dense mode + quadtree decision (source-pixel references)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _avail_np(w: int, h: int, s: int, ctu: int,
              tiles=None) -> np.ndarray:
    """[h//s, w//s, 5] neighbour-segment availability at block size s
    (exact per z-scan coding order incl. tile constraints; spec
    6.4.1)."""
    av = schedule.availability(w // s, h // s, ctu // s, tiles)
    return np.stack([av["bottomleft"], av["left"], av["corner"],
                     av["top"], av["topright"]], axis=-1)


def _blocks(plane: jnp.ndarray, b: int):
    h, w = plane.shape
    return plane.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3) \
        .reshape(-1, b, b)


def _dense_best(y32, s: int, ctu: int, sqrt_lam, adi_plane=None,
                tiles=None, topk: int = 1):
    """Best intra mode + cost for every s x s block, from source-pixel
    reference samples with exact availability.

    Evaluates the full 35-mode stack with STATIC per-mode gathers
    (predict_all_modes) — on TPU this beats the staged seed+refine
    search (ref search_points hmr_motion_intra.c:1072-1177), whose
    per-block mode-dependent gathers have tiny trailing dims and
    dominate the dense pass (~13x measured) — then re-argmins with
    MPM-aware mode bits.  Returns (mode [bh,bw] int32, cost f32)."""
    h, w = y32.shape
    bh, bw = h // s, w // s
    nb = bh * bw
    buf = jnp.zeros((1 + h + s, 1 + w + s), jnp.int32)
    buf = buf.at[1:1 + h, 1:1 + w].set(
        y32 if adi_plane is None else adi_plane)
    pos_y = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * s, bw)
    pos_x = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * s, bh)

    def gather(yy, xx):
        top = jax.lax.dynamic_slice(buf, (yy, xx), (1, 2 * s + 1))[0]
        left = jax.lax.dynamic_slice(buf, (yy + 1, xx), (2 * s, 1))[:, 0]
        return jnp.concatenate([left[::-1], top])

    adi_raw = jax.vmap(gather)(pos_y, pos_x)
    amask = jnp.asarray(_avail_np(w, h, s, ctu, tiles).reshape(nb, 5))
    adi = intra.substitute_refs(adi_raw, _avail_mask(amask, s))
    orig = _blocks(y32, s)

    preds = intra.predict_all_modes(adi, s, True, strong=True)
    all_s = satd(preds - orig[:, None], s)          # [nb, 35]
    all_m = jnp.broadcast_to(
        jnp.arange(35, dtype=jnp.int32), (nb, 35))

    # MPM-aware mode bits from a first-round argmin of the neighbours
    # (unavailable neighbours — frame/tile boundary — count as DC,
    # spec 8.4.2)
    best0 = jnp.argmin(all_s, -1).astype(jnp.int32).reshape(bh, bw)
    left_m = jnp.concatenate([jnp.ones((bh, 1), jnp.int32),
                              best0[:, :-1]], 1)
    top_m = jnp.concatenate([jnp.ones((1, bw), jnp.int32),
                             best0[:-1]], 0)
    left_m = jnp.where(amask[:, 1].reshape(bh, bw), left_m, 1)
    top_m = jnp.where(amask[:, 3].reshape(bh, bw), top_m, 1)
    cands = _mpm_candidates(left_m.reshape(-1), top_m.reshape(-1))
    in_mpm = (all_m[..., None] == cands[:, None, :]).any(-1)
    mbits = rdbits.intra_mode_bits(in_mpm)
    cost = all_s + sqrt_lam.astype(jnp.float32) * mbits
    if topk > 1:
        # SATD-preselected candidate list for the wavefront's full-RD
        # mode refinement (role of the reference's loop-3 candidate
        # evaluation, hmr_motion_intra.c:1226): modes + their estimated
        # mode-signalling bits, best first
        _, idx = jax.lax.top_k(-cost, topk)           # [nb, K]
        mk = jnp.take_along_axis(all_m, idx, -1)
        mb = jnp.take_along_axis(mbits, idx, -1)
        return (jnp.moveaxis(mk, -1, 0).reshape(topk, bh, bw),
                jnp.moveaxis(mb, -1, 0).reshape(topk, bh, bw))
    best = jnp.argmin(cost, -1).astype(jnp.int32)
    return best.reshape(bh, bw), jnp.min(cost, -1).reshape(bh, bw)


_CU_HDR_BITS = 6.0
_SPLIT_BITS = 1.5


def _dense_best_chroma(u32, v32, lm_grid, s_l: int, ctu: int,
                       sqrt_lam_c, tiles=None):
    """Best chroma mode per luma-s_l CU (chroma block s = s_l//2) from
    SOURCE-pixel reference samples — the dense reshape of the
    reference's 5-candidate chroma search (create_chroma_dir_list /
    encode_intra_chroma, hmr_motion_intra_chroma.c:88-110).

    Candidates: {planar 0, ver 26, hor 10, DC 1} with a luma-mode
    duplicate replaced by 34, plus DM (the luma mode itself).  Cost =
    SATD(Cb) + SATD(Cr) + sqrt_lambda_c * mode bits (DM: 1 ctx bin;
    others: 1 ctx bin + 2 bypass).  Returns [h/s_l, w/s_l] int32."""
    s = s_l // 2
    hc, wc = u32.shape
    bh, bw = hc // s, wc // s
    nb = bh * bw
    lmf = lm_grid.reshape(nb)

    def adi_of(plane):
        buf = jnp.zeros((1 + hc + s, 1 + wc + s), jnp.int32)
        buf = buf.at[1:1 + hc, 1:1 + wc].set(plane)
        py = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * s, bw)
        px = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * s, bh)

        def g(yy, xx):
            top = jax.lax.dynamic_slice(buf, (yy, xx), (1, 2 * s + 1))[0]
            left = jax.lax.dynamic_slice(
                buf, (yy + 1, xx), (2 * s, 1))[:, 0]
            return jnp.concatenate([left[::-1], top])

        raw = jax.vmap(g)(py, px)
        am = jnp.asarray(
            _avail_np(wc, hc, s, ctu // 2, tiles).reshape(nb, 5))
        return intra.substitute_refs(raw, _avail_mask(am, s))

    adi2 = jnp.stack([adi_of(u32), adi_of(v32)])         # [2, nb, 4S+1]
    orig2 = jnp.stack([_blocks(u32, s), _blocks(v32, s)])
    base = jnp.asarray([0, 26, 10, 1], jnp.int32)
    cand = jnp.where(base[None, :] == lmf[:, None], 34, base[None, :])
    cand = jnp.concatenate([cand, lmf[:, None]], 1)      # [nb, 5]
    costs = []
    for k in range(5):
        m = cand[:, k]
        p2 = jax.vmap(lambda a: intra.predict_single_mode(a, m, s,
                                                          False))(adi2)
        sd = satd(p2 - orig2, s).sum(0)                  # [nb]
        bits = 1.0 if k == 4 else 3.0
        costs.append(sd + sqrt_lam_c.astype(jnp.float32) * bits)
    k = jnp.argmin(jnp.stack(costs, -1), -1)
    best = jnp.take_along_axis(cand, k[:, None], 1)[:, 0]
    return best.reshape(bh, bw)


def dense_decision(y32, ctu: int, sqrt_lam, search_8x8: bool = True,
                   u32=None, v32=None, sqrt_lam_c=None,
                   adi_y=None, search_nxn: bool = False, tiles=None,
                   refine_k: int = 1):
    """Dense MODE decision for the whole frame (one best mode per block
    at each tree level).  The CU-tree split decisions happen in the
    reconstruction pass with true SSD + lambda*bits RD (both paths are
    computed there anyway, ref consolidation hmr_motion_intra.c:1440).
    When chroma planes are given, also decides the chroma mode per CU
    at each level (5-candidate search)."""
    extra = {}
    if refine_k > 1:
        with jax.named_scope("intra.dense32"):
            m32k, mb32k = _dense_best(y32, 32, ctu, sqrt_lam, adi_y,
                                      tiles, topk=refine_k)
        with jax.named_scope("intra.dense16"):
            m16k, mb16k = _dense_best(y32, 16, ctu, sqrt_lam, adi_y,
                                      tiles, topk=refine_k)
        mode32, mode16 = m32k[0], m16k[0]
        extra = dict(mode32k=m32k, mbits32k=mb32k,
                     mode16k=m16k, mbits16k=mb16k)
    else:
        with jax.named_scope("intra.dense32"):
            mode32, _ = _dense_best(y32, 32, ctu, sqrt_lam, adi_y,
                                    tiles)
        with jax.named_scope("intra.dense16"):
            mode16, _ = _dense_best(y32, 16, ctu, sqrt_lam, adi_y,
                                    tiles)
    if search_8x8:
        with jax.named_scope("intra.dense8"):
            mode8, _ = _dense_best(y32, 8, ctu, sqrt_lam, adi_y, tiles)
    else:
        mode8 = jnp.repeat(jnp.repeat(mode16, 2, 0), 2, 1)
    out = dict(mode32=mode32, mode16=mode16, mode8=mode8, **extra)
    if search_nxn:
        with jax.named_scope("intra.dense4"):
            mode4, _ = _dense_best(y32, 4, ctu, sqrt_lam, adi_y, tiles)
        out["mode4"] = mode4
    if u32 is not None:
        with jax.named_scope("intra.dense_chroma"):
            out["cmode32"] = _dense_best_chroma(u32, v32, mode32, 32,
                                                ctu, sqrt_lam_c, tiles)
            out["cmode16"] = _dense_best_chroma(u32, v32, mode16, 16,
                                                ctu, sqrt_lam_c, tiles)
            out["cmode8"] = _dense_best_chroma(u32, v32, mode8, 8,
                                               ctu, sqrt_lam_c, tiles)
    return out


# ---------------------------------------------------------------------------
# pass 2: wavefront reconstruction (32x32 slots)
# ---------------------------------------------------------------------------

_SUB_OFF = ((0, 0), (0, 1), (1, 0), (1, 1))     # z-order (qy, qx)


@functools.lru_cache(maxsize=None)
def build_plan(width: int, height: int, ctu: int = 64, tiles=None,
               coded=None):
    """Static wavefront plan over 32x32 slots, with per-slot
    sub-16 / sub-8 availability baked in (numpy; jit constants).
    With a (cols, rows) tile grid the dependency chains break at tile
    boundaries, so the wavefront shortens ~(cols+rows)/2-fold and the
    per-step batches widen — the structural throughput lever for
    all-intra."""
    s = 32
    bw, bh = width // s, height // s
    bpc = ctu // s
    steps, n_steps, batches = schedule.wavefront_schedule(bw, bh, bpc,
                                                          tiles)
    nb = batches.shape[1]
    by = batches[..., 0]
    bx = batches[..., 1]
    valid = by >= 0
    by_c = np.where(valid, by, 0)
    bx_c = np.where(valid, bx, 0)
    cw, ch = coded if coded is not None else (width, height)
    av32s = _avail_np(width, height, 32, ctu, tiles)[by_c, bx_c]
    av16_g = _avail_np(width, height, 16, ctu, tiles)
    av8_g = _avail_np(width, height, 8, ctu, tiles)
    av4_g = _avail_np(width, height, 4, ctu, tiles)
    px32, py32 = 32 * bx_c, 32 * by_c
    av32 = _pix_masks_np(av32s, px32, py32, 32, cw, ch)
    av32c = _pix_masks_np(av32s, px32, py32, 16, cw, ch, chroma=True)
    # z-ordered sub-block PER-PIXEL availability per slot
    av16 = np.zeros((n_steps, nb, 4, 65), dtype=bool)
    av16c = np.zeros((n_steps, nb, 4, 33), dtype=bool)
    av8 = np.zeros((n_steps, nb, 4, 4, 33), dtype=bool)
    av8c = np.zeros((n_steps, nb, 4, 4, 17), dtype=bool)
    av4 = np.zeros((n_steps, nb, 4, 4, 4, 17), dtype=bool)
    for k16, (qy, qx) in enumerate(_SUB_OFF):
        p16x, p16y = px32 + 16 * qx, py32 + 16 * qy
        a = av16_g[2 * by_c + qy, 2 * bx_c + qx]
        av16[:, :, k16] = _pix_masks_np(a, p16x, p16y, 16, cw, ch)
        av16c[:, :, k16] = _pix_masks_np(a, p16x, p16y, 8, cw, ch,
                                         chroma=True)
        for k8, (ry, rx) in enumerate(_SUB_OFF):
            p8x, p8y = p16x + 8 * rx, p16y + 8 * ry
            a = av8_g[4 * by_c + 2 * qy + ry, 4 * bx_c + 2 * qx + rx]
            av8[:, :, k16, k8] = _pix_masks_np(a, p8x, p8y, 8, cw, ch)
            av8c[:, :, k16, k8] = _pix_masks_np(a, p8x, p8y, 4, cw,
                                                ch, chroma=True)
            for k4, (ty, tx) in enumerate(_SUB_OFF):
                a = av4_g[8 * by_c + 4 * qy + 2 * ry + ty,
                          8 * bx_c + 4 * qx + 2 * rx + tx]
                av4[:, :, k16, k8, k4] = _pix_masks_np(
                    a, p8x + 4 * tx, p8y + 4 * ty, 4, cw, ch)
    # 32-slots that straddle the coded bounds cannot be committed as
    # 32-CUs (a straddling CU's TB32 does not decompose into the
    # implicit-split children's TB16s) — the wavefront forces the
    # children there
    force32 = (px32 + 32 > cw) | (py32 + 32 > ch)
    return dict(
        n_steps=n_steps, nb=nb,
        by=np.asarray(by_c, np.int32), bx=np.asarray(bx_c, np.int32),
        valid=np.asarray(valid), av32=np.asarray(av32), av32c=av32c,
        av16=av16, av16c=av16c, av8=av8, av8c=av8c, av4=av4,
        force32=force32,
    )


def _patch_adi(patch, oy, ox, size: int):
    """adi [nb, 4*size+1] of the sub-block at patch-relative origin
    (1+oy, 1+ox); patch row/col 0 hold the slot's neighbours.  oy/ox
    may be traced scalars (the z-order loops run as lax.scan)."""
    n = patch.shape[0]
    top = jax.lax.dynamic_slice(
        patch, (0, oy, ox), (n, 1, 2 * size + 1))[:, 0]
    left = jax.lax.dynamic_slice(
        patch, (0, oy + 1, ox), (n, 2 * size, 1))[:, :, 0]
    return jnp.concatenate([left[:, ::-1], top], -1)


def _gather_map(m, by, bx, maxv):
    """Per-slot gather from a decision grid (clamped; slots are valid)."""
    return m[jnp.minimum(by, m.shape[0] - 1),
             jnp.minimum(bx, m.shape[1] - 1)]


def encode_frame(y, u, v, qp: int, ctu: int = 64,
                 sign_hiding: bool = False, rd_lambda_scale: float = 1.0,
                 deblocking: bool = False, sao_enabled: bool = False,
                 search_8x8: bool = True, chroma_qp_offset: int = 0,
                 scaling_lists: bool = False,
                 cu: int = None, split_8x8: bool = None,
                 dec_y=None, dec_u=None, dec_v=None,
                 search_nxn: bool = False, tiles=None,
                 rd_refine: bool = False, tu_split: bool = False,
                 vis_h: int = None, vis_w: int = None,
                 true_size: bool = False):
    """Encode one all-intra frame; planes uint8, CTU-padded.

    Returns dict of device arrays (FrameRecord fields).  `cu` and
    `split_8x8` are accepted for backward compatibility (`split_8x8`
    maps to search_8x8).  dec_y/u/v optionally supply DECISION
    reference planes (e.g. a first pass's reconstruction) for the dense
    mode pass; prediction in the wavefront always uses the true
    reconstruction."""
    if split_8x8 is not None:
        search_8x8 = split_8x8
    h, w = y.shape
    # coded picture bounds (true-size coding: the decoder treats
    # samples beyond them as unavailable; identity when the coded
    # pic equals the padded planes)
    if true_size and vis_w is not None:
        cw8 = (vis_w + 15) // 16 * 16
        ch8 = (vis_h + 15) // 16 * 16
    else:
        cw8, ch8 = w, h
    plan = build_plan(w, h, ctu, tiles, coded=(cw8, ch8))
    qp = jnp.asarray(qp, jnp.int32)   # traced (per-frame rate control)
    qp_c = jnp.asarray(tables.CHROMA_QP_TABLE)[
        jnp.clip(qp + chroma_qp_offset, 0, 57)]
    lam_rd = tables.rd_lambda(qp, True)
    lam_rd_c = tables.rd_lambda(qp_c, True)
    lamf = lam_rd.astype(jnp.float32)
    lamcf = lam_rd_c.astype(jnp.float32)
    sqrt_lambda = jnp.sqrt(lam_rd) * rd_lambda_scale

    y32 = jnp.asarray(y, jnp.int32)
    u32 = jnp.asarray(u, jnp.int32)
    v32 = jnp.asarray(v, jnp.int32)

    # ---- pass 1: dense decision (luma modes + chroma 5-candidate);
    # dec_* planes (when given) replace the ADI source only — SATD is
    # always against the true source pixels
    ady = None if dec_y is None else jnp.asarray(dec_y, jnp.int32)
    K = 3 if rd_refine else 1      # rd=full: top-3 full-RD refinement
    dec = dense_decision(y32, ctu, sqrt_lambda, search_8x8,
                         u32=u32, v32=v32,
                         sqrt_lam_c=jnp.sqrt(lam_rd_c), adi_y=ady,
                         search_nxn=search_nxn, tiles=tiles,
                         refine_k=K)

    bh, bw = h // 16, w // 16            # 16-granule grid (record maps)
    b32h, b32w = h // 32, w // 32

    recon_y0 = jnp.zeros((1 + h + 32, 1 + w + 32), jnp.int32)
    recon_u0 = jnp.zeros((1 + h // 2 + 16, 1 + w // 2 + 16), jnp.int32)
    recon_v0 = jnp.zeros_like(recon_u0)
    coeff_y0 = jnp.zeros((h, w), jnp.int32)
    coeff_u0 = jnp.zeros((h // 2, w // 2), jnp.int32)
    coeff_v0 = jnp.zeros_like(coeff_u0)
    modes8_0 = jnp.full((2 * bh, 2 * bw), 1, jnp.int32)
    cmodes8_0 = jnp.full((2 * bh, 2 * bw), 1, jnp.int32)
    cbf8_0 = jnp.zeros((3, 2 * bh, 2 * bw), jnp.int32)
    depth0 = jnp.full((bh, bw), 2, jnp.int32)
    nxn8_0 = jnp.zeros((2 * bh, 2 * bw), jnp.int32)
    pu4_0 = jnp.zeros((4 * bh, 4 * bw), jnp.int32)  # mode | cbf<<8

    # ---- pass 2: wavefront reconstruction over 32x32 slots
    def step(carry, inp):
        (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, modes8_map,
         cmodes8_map, cbf8_map, depth_map, nxn8_map, pu4_map) = carry
        (by, bx, valid, av32, av32c, av16, av16c, av8, av8c,
         av4, force32) = inp
        nb = by.shape[0]
        y0 = by * 32
        x0 = bx * 32

        m32 = _gather_map(dec["mode32"], by, bx, 0)        # [nb]
        orig32 = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            y32, (yy, xx), (32, 32)))(y0, x0)

        # ===== luma 32 path (one 32x32 TB)
        def g_adi(buf, yy, xx, s):
            top = jax.lax.dynamic_slice(buf, (yy, xx), (1, 2 * s + 1))[0]
            left = jax.lax.dynamic_slice(
                buf, (yy + 1, xx), (2 * s, 1))[:, 0]
            return jnp.concatenate([left[::-1], top])

        adi32 = intra.substitute_refs(
            jax.vmap(lambda yy, xx: g_adi(rec_y, yy, xx, 32))(y0, x0),
            av32)
        if rd_refine:
            # full-RD mode refinement over the SATD top-K (role of the
            # reference's loop-3 candidate RD, hmr_motion_intra.c:1226):
            # reconstruct each candidate from the TRUE recon ADI and
            # pick by SSD + lambda*(residual + mode bits)
            m32k = jnp.stack([_gather_map(dec["mode32k"][k], by, bx, 0)
                              for k in range(K)], 0)       # [K, nb]
            mb32k = jnp.stack(
                [_gather_map(dec["mbits32k"][k], by, bx, 0)
                 for k in range(K)], 0).astype(jnp.float32)
            origK = jnp.tile(orig32, (K, 1, 1))
            predK = intra.predict_single_mode(
                jnp.tile(adi32, (K, 1)), m32k.reshape(-1), 32, True,
                strong=True)
            lvlK, recK, cbfK = _tq_recon(origK, predK, 32, qp, lam_rd,
                                         sign_hiding=sign_hiding,
                                         scaling=scaling_lists)
            costK = (jnp.sum((recK - origK) ** 2, (-1, -2))
                     .astype(jnp.float32)
                     + lamf * rdbits.residual_bits(lvlK, 32, qp=qp)) \
                .reshape(K, nb) + lamf * mb32k
            kb = jnp.argmin(costK, 0)                      # [nb]

            def _pickK(a, k):
                a = a.reshape(K, nb, *a.shape[1:])
                idx = k.reshape((1, nb) + (1,) * (a.ndim - 2))
                return jnp.take_along_axis(a, idx, 0)[0]

            lvl32 = _pickK(lvlK, kb)
            rec32 = _pickK(recK, kb)
            cbf32 = _pickK(cbfK, kb)
            m32_old = m32k[0]
            m32 = jnp.take_along_axis(m32k, kb[None], 0)[0]
        else:
            pred32 = intra.predict_single_mode(adi32, m32, 32, True,
                                               strong=True)
            lvl32, rec32, cbf32 = _tq_recon(orig32, pred32, 32, qp,
                                            lam_rd,
                                            sign_hiding=sign_hiding,
                                            scaling=scaling_lists)

        # ===== luma 16/8 path (patch covers slot + 16 right/below
        # ext); the four z-order sub-16s run as a lax.scan (and the
        # 8x8 sub-path as a nested scan) so the compiled body holds ONE
        # instance of each leaf instead of 16 — compile time, not
        # runtime, is what this buys
        patch = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
            rec_y, (yy, xx), (49, 49)))(y0, x0)
        lvl_ch = jnp.zeros((nb, 32, 32), jnp.int32)
        offs = jnp.asarray([[16 * q[0], 16 * q[1]] for q in _SUB_OFF],
                           jnp.int32)
        m16_all = jnp.stack([_gather_map(dec["mode16"], 2 * by + q[0],
                                         2 * bx + q[1], 0)
                             for q in _SUB_OFF], 0)      # [4, nb]
        if rd_refine:
            m16k_all = jnp.stack(
                [jnp.stack([_gather_map(dec["mode16k"][k],
                                        2 * by + q[0], 2 * bx + q[1],
                                        0) for k in range(K)], 0)
                 for q in _SUB_OFF], 0)                  # [4, K, nb]
            mb16k_all = jnp.stack(
                [jnp.stack([_gather_map(dec["mbits16k"][k],
                                        2 * by + q[0], 2 * bx + q[1],
                                        0) for k in range(K)], 0)
                 for q in _SUB_OFF], 0).astype(jnp.float32)
        else:
            m16k_all = m16_all[:, None]
            mb16k_all = jnp.zeros(m16k_all.shape, jnp.float32)
        m8_all = jnp.stack(
            [jnp.stack([_gather_map(dec["mode8"],
                                    4 * by + 2 * q[0] + r[0],
                                    4 * bx + 2 * q[1] + r[1], 0)
                        for r in _SUB_OFF], 0)
             for q in _SUB_OFF], 0)                       # [4, 4, nb]
        cm32 = _gather_map(dec["cmode32"], by, bx, 0)
        if rd_refine:
            # chroma DM follows the refined luma mode (the signalled
            # chroma candidate list derives from the final luma mode)
            cm32 = jnp.where(cm32 == m32_old, m32, cm32)
        cm16_all = jnp.stack([_gather_map(dec["cmode16"], 2 * by + q[0],
                                          2 * bx + q[1], 0)
                              for q in _SUB_OFF], 0)     # [4, nb]
        cm8_all = jnp.stack(
            [jnp.stack([_gather_map(dec["cmode8"],
                                    4 * by + 2 * q[0] + r[0],
                                    4 * bx + 2 * q[1] + r[1], 0)
                        for r in _SUB_OFF], 0)
             for q in _SUB_OFF], 0)                       # [4, 4, nb]
        if search_nxn:
            m4_all = jnp.stack(
                [jnp.stack(
                    [jnp.stack([_gather_map(
                        dec["mode4"],
                        8 * by + 4 * q[0] + 2 * r[0] + t[0],
                        8 * bx + 4 * q[1] + 2 * r[1] + t[1], 0)
                        for t in _SUB_OFF], 0)
                     for r in _SUB_OFF], 0)
                 for q in _SUB_OFF], 0)             # [4, 4, 4, nb]
        else:
            m4_all = jnp.zeros((4, 4, 4, nb), jnp.int32)

        def sub16_body(carry, xk):
            patch, lvl_ch, cost_children = carry
            (off, av16_k, av8_k, av4_k, m16, m8_k, m4_k,
             m16k, mb16k, cm8_k) = xk
            oy, ox = off[0], off[1]
            adi16 = intra.substitute_refs(
                _patch_adi(patch, oy, ox, 16), av16_k)
            o16 = jax.lax.dynamic_slice(orig32, (0, oy, ox),
                                        (nb, 16, 16))
            if rd_refine:
                # full-RD refinement over the SATD top-K (mode bits
                # price the SELECTION; the exposed cost16 stays on the
                # children's scale, which carries _CU_HDR_BITS only)
                o16K = jnp.tile(o16, (K, 1, 1))
                pr16K = intra.predict_single_mode(
                    jnp.tile(adi16, (K, 1)), m16k.reshape(-1), 16,
                    True)
                l16K, r16K, c16K = _tq_recon(o16K, pr16K, 16, qp,
                                             lam_rd,
                                             sign_hiding=sign_hiding,
                                             scaling=scaling_lists)
                base = (jnp.sum((r16K - o16K) ** 2, (-1, -2))
                        .astype(jnp.float32)
                        + lamf * rdbits.residual_bits(l16K, 16,
                                                      qp=qp)) \
                    .reshape(K, nb)
                kb16 = jnp.argmin(base + lamf * mb16k, 0)   # [nb]

                def pick(a):
                    a = a.reshape(K, nb, *a.shape[1:])
                    idx = kb16.reshape((1, nb) + (1,) * (a.ndim - 2))
                    return jnp.take_along_axis(a, idx, 0)[0]

                l16, r16, c16 = pick(l16K), pick(r16K), pick(c16K)
                m16 = jnp.take_along_axis(m16k, kb16[None], 0)[0]
                cost16 = jnp.take_along_axis(base, kb16[None], 0)[0] \
                    + lamf * _CU_HDR_BITS
            else:
                pr16 = intra.predict_single_mode(adi16, m16, 16, True)
                l16, r16, c16 = _tq_recon(o16, pr16, 16, qp, lam_rd,
                                          sign_hiding=sign_hiding,
                                          scaling=scaling_lists)
                cost16 = jnp.sum((r16 - o16) ** 2, (-1, -2)) \
                    .astype(jnp.float32) + lamf * (
                        rdbits.residual_bits(l16, 16, qp=qp)
                        + _CU_HDR_BITS)
            if search_8x8:
                offs8 = jnp.asarray(
                    [[8 * r[0], 8 * r[1]] for r in _SUB_OFF], jnp.int32)

                def sub8_body(c8carry, x8):
                    patch8, l8s, cost8 = c8carry
                    off8, av8_kk, av4_kk, m8, m4s, cm8 = x8
                    o8y, o8x = oy + off8[0], ox + off8[1]
                    adi8 = intra.substitute_refs(
                        _patch_adi(patch8, o8y, o8x, 8), av8_kk)
                    o8 = jax.lax.dynamic_slice(orig32, (0, o8y, o8x),
                                               (nb, 8, 8))
                    if tu_split:
                        # free-standing TU-split candidate (VERDICT
                        # r4 item 5; ref loop 3 hmr_motion_intra.c:
                        # 1440): ALSO evaluate this sub-8 at the
                        # PARENT 16's mode — when all four take it,
                        # the record stage folds the quartet into ONE
                        # 16 CU with split_transform_flag=1 (mode
                        # paid once): the exact shared-mode 4-TB
                        # candidate.  1-bit discount ~ MPM/fold
                        # saving.  Veto when the sub's chroma mode 34
                        # would leave the new DM list (not codeable).
                        m2 = jnp.concatenate([m8, m16])
                        pr2 = intra.predict_single_mode(
                            jnp.tile(adi8, (2, 1)), m2, 8, True)
                        l2, r2, c2 = _tq_recon(
                            jnp.tile(o8, (2, 1, 1)), pr2, 8, qp,
                            lam_rd, mode=m2,
                            sign_hiding=sign_hiding,
                            scaling=scaling_lists)
                        cost2 = jnp.sum(
                            (r2 - jnp.tile(o8, (2, 1, 1))) ** 2,
                            (-1, -2)).astype(jnp.float32) + lamf * (
                                rdbits.residual_bits(l2, 8, qp=qp)
                                + _CU_HDR_BITS)
                        m16_in_def = (m16 == 0) | (m16 == 26) \
                            | (m16 == 10) | (m16 == 1)
                        chroma_ok = (cm8 != 34) | m16_in_def
                        take_p = (cost2[nb:] - lamf * 1.0
                                  < cost2[:nb]) & (m16 != m8) \
                            & chroma_ok
                        tp = take_p[:, None, None]
                        l8 = jnp.where(tp, l2[nb:], l2[:nb])
                        r8 = jnp.where(tp, r2[nb:], r2[:nb])
                        c8 = jnp.where(take_p, c2[nb:], c2[:nb])
                        m8 = jnp.where(take_p, m16, m8)
                        cost_2n = jnp.where(take_p, cost2[nb:],
                                            cost2[:nb])
                    else:
                        pr8 = intra.predict_single_mode(adi8, m8, 8,
                                                        True)
                        l8, r8, c8 = _tq_recon(o8, pr8, 8, qp,
                                               lam_rd, mode=m8,
                                               sign_hiding=sign_hiding,
                                               scaling=scaling_lists)
                        cost_2n = jnp.sum((r8 - o8) ** 2, (-1, -2)) \
                            .astype(jnp.float32) + lamf * (
                                rdbits.residual_bits(l8, 8, qp=qp)
                                + _CU_HDR_BITS)
                    if search_nxn:
                        # NxN: four 4x4 PUs in z-order with own modes,
                        # DST TBs and intra-CU recon feedback (ref NxN
                        # at max depth, part-size syntax 7.3.8.5)
                        p4 = patch8
                        l4s = jnp.zeros((nb, 8, 8), jnp.int32)
                        cost_n = jnp.broadcast_to(
                            lamf * (_CU_HDR_BITS + 10.0), (nb,))
                        pu_m, pu_c = [], []
                        for k4, (ty, tx) in enumerate(_SUB_OFF):
                            o4y = o8y + 4 * ty
                            o4x = o8x + 4 * tx
                            adi4 = intra.substitute_refs(
                                _patch_adi(p4, o4y, o4x, 4),
                                av4_kk[:, k4])
                            m4v = m4s[k4]
                            pr4 = intra.predict_single_mode(
                                adi4, m4v, 4, True)
                            o4 = jax.lax.dynamic_slice(
                                orig32, (0, o4y, o4x), (nb, 4, 4))
                            l4, r4, c4 = _tq_recon(
                                o4, pr4, 4, qp, lam_rd, mode=m4v,
                                sign_hiding=sign_hiding,
                                scaling=scaling_lists, is_dst=True)
                            cost_n = cost_n + jnp.sum(
                                (r4 - o4) ** 2, (-1, -2)) \
                                .astype(jnp.float32) + lamf * \
                                rdbits.residual_bits(l4, 4, qp=qp)
                            p4 = jax.lax.dynamic_update_slice(
                                p4, r4, (0, o4y + 1, o4x + 1))
                            l4s = jax.lax.dynamic_update_slice(
                                l4s, l4, (0, 4 * ty, 4 * tx))
                            pu_m.append(m4v)
                            pu_c.append(c4)
                        rec_n = jax.lax.dynamic_slice(
                            p4, (0, o8y + 1, o8x + 1), (nb, 8, 8))
                        take_n = cost_n < cost_2n
                        tn = take_n[:, None, None]
                        l8 = jnp.where(tn, l4s, l8)
                        r8 = jnp.where(tn, rec_n, r8)
                        leaf_cost = jnp.minimum(cost_n, cost_2n)
                        eff_lm = jnp.where(take_n, pu_m[0], m8)
                        nxn_o = take_n
                        pu4_o = jnp.stack(pu_m, 0)        # [4, nb]
                        cbf4_o = jnp.stack(pu_c, 0)
                    else:
                        leaf_cost = cost_2n
                        eff_lm = m8
                        nxn_o = jnp.zeros((nb,), bool)
                        pu4_o = jnp.broadcast_to(m8[None], (4, nb))
                        cbf4_o = jnp.broadcast_to(c8[None], (4, nb))
                    cost8 = cost8 + leaf_cost
                    patch8 = jax.lax.dynamic_update_slice(
                        patch8, r8, (0, o8y + 1, o8x + 1))
                    l8s = jax.lax.dynamic_update_slice(
                        l8s, l8, (0, off8[0], off8[1]))
                    return (patch8, l8s, cost8), \
                        (eff_lm, jnp.any(l8 != 0, (-1, -2)), nxn_o,
                         pu4_o, cbf4_o)

                (patch8, l8s, cost8), \
                    (m8_y, cbf8_y, nxn_y, pu4_y, cbf4_y) = jax.lax.scan(
                        sub8_body,
                        (patch, jnp.zeros((nb, 16, 16), jnp.int32),
                         jnp.broadcast_to(lamf * _SPLIT_BITS, (nb,))),
                        (offs8, av8_k, jnp.moveaxis(av4_k, 1, 0),
                         m8_k, m4_k, cm8_k))
                rec8 = jax.lax.dynamic_slice(patch8, (0, oy + 1, ox + 1),
                                             (nb, 16, 16))
                sp16 = cost8 < cost16
                cost_children = cost_children + jnp.minimum(cost8,
                                                            cost16)
                spm = sp16[:, None, None]
                sel16 = jnp.where(spm, rec8, r16)
                lsel16 = jnp.where(spm, l8s, l16)
                m8_out = jnp.where(sp16[None, :], m8_y, m16[None, :])
                cbf_out = jnp.where(sp16[None, :], cbf8_y, c16[None, :])
                nxn_out = nxn_y & sp16[None, :]           # [4, nb]
                pu4_out = jnp.where(sp16[None, None, :], pu4_y,
                                    m16[None, None, :])   # [4, 4, nb]
                cbf4_out = jnp.where(sp16[None, None, :], cbf4_y,
                                     c16[None, None, :])
            else:
                sel16, lsel16 = r16, l16
                sp16 = jnp.zeros((nb,), bool)
                cost_children = cost_children + cost16
                m8_out = jnp.broadcast_to(m16[None, :], (4, nb))
                cbf_out = jnp.broadcast_to(c16[None, :], (4, nb))
                nxn_out = jnp.zeros((4, nb), bool)
                pu4_out = jnp.broadcast_to(m16[None, None, :],
                                           (4, 4, nb))
                cbf4_out = jnp.broadcast_to(c16[None, None, :],
                                            (4, 4, nb))
            patch = jax.lax.dynamic_update_slice(
                patch, sel16, (0, oy + 1, ox + 1))
            lvl_ch = jax.lax.dynamic_update_slice(
                lvl_ch, lsel16, (0, oy, ox))
            return (patch, lvl_ch, cost_children), \
                (m16, sp16, m8_out, cbf_out, nxn_out, pu4_out,
                 cbf4_out)

        (patch, lvl_ch, cost_children), \
            (m16_y, sp16_y, m8_y2, cbf_y2, nxn_y2, pu4_y2, cbf4_y2) = \
            jax.lax.scan(
                sub16_body,
                (patch, lvl_ch,
                 jnp.broadcast_to(lamf * _SPLIT_BITS, (nb,))),
                (offs, jnp.moveaxis(av16, 1, 0),
                 jnp.moveaxis(av8, 1, 0).swapaxes(1, 2),
                 jnp.moveaxis(av4, 1, 0),
                 m16_all, m8_all, m4_all, m16k_all, mb16k_all,
                 cm8_all))
        rec_children = patch[:, 1:33, 1:33]
        m16_sel = m16_y                            # [4, nb]
        sp16_sel = sp16_y                          # [4, nb]
        if rd_refine:
            # chroma DM follows the refined per-quadrant luma mode
            cm16_all = jnp.where(cm16_all == m16_all, m16_sel,
                                 cm16_all)
        if tu_split:
            # DM chroma picks follow the parent-mode winners (the
            # chroma pass below predicts with the UPDATED map, so
            # the stream stays self-consistent; same rule as the
            # rd_refine DM follow-up)
            cm8_all = jnp.where((cm8_all == m8_all)
                                & (m8_y2 != m8_all), m8_y2,
                                cm8_all)
        modes_q8 = jnp.moveaxis(m8_y2, 2, 0)       # [nb, 4, 4]
        cbf_q8 = jnp.moveaxis(cbf_y2, 2, 0)
        nxn_q8 = jnp.moveaxis(nxn_y2, 2, 0)        # [nb, 4, 4]
        pu4_q = jnp.moveaxis(pu4_y2, 3, 0)         # [nb, 4, 4, 4]
        cbf4_q = jnp.moveaxis(cbf4_y2, 3, 0)

        # in-loop RD decision: one 32x32 CU vs the four children
        cost32 = jnp.sum((rec32 - orig32) ** 2, (-1, -2)) \
            .astype(jnp.float32) + lamf * (
                rdbits.residual_bits(lvl32, 32, qp=qp)
                + _CU_HDR_BITS)
        sp32 = (cost_children < cost32) | force32
        sp32m = sp32[:, None, None]
        recon = jnp.where(sp32m, rec_children, rec32)
        level = jnp.where(sp32m, lvl_ch, lvl32)

        # per-8 modes / cbf / depth maps [nb, 4(sub16), 4(sub8)]
        modes_q = jnp.where(sp32[:, None, None], modes_q8,
                            m32[:, None, None])
        cbf_q = jnp.where(sp32[:, None, None], cbf_q8,
                          cbf32[:, None, None])
        sp16_q = jnp.moveaxis(sp16_sel, 1, 0) & sp32[:, None]  # [nb, 4]
        depth_q = jnp.where(sp32[:, None],
                            jnp.where(sp16_q, 3, 2), 1)   # [nb, 4]

        # ===== chroma (DM): 16 TB for CU32, 8 TB for CU16, 4x4 for CU8
        # NxN CUs force chroma DM = PU0's luma mode (the signalled list
        # derives from PU0, spec 7.4.9.5; m8_y2 already carries it)
        cm8_eff = jnp.where(nxn_y2, m8_y2, cm8_all)
        # committed chroma modes per 8-granule (the RECORD must carry
        # the wavefront's DM adjustments — rd_refine/tu_split follows,
        # NxN PU0 — not the raw decision maps)
        cm8_e_q = jnp.moveaxis(cm8_eff, 2, 0)         # [nb, 4, 4]
        cm16_q = jnp.moveaxis(cm16_all, 1, 0)[:, :, None]
        cmodes_q = jnp.where(
            sp32[:, None, None],
            jnp.where(sp16_q[:, :, None], cm8_e_q,
                      jnp.broadcast_to(cm16_q, cm8_e_q.shape)),
            cm32[:, None, None])
        cy0 = y0 // 2
        cx0 = x0 // 2

        def chroma(rec_p, plane):
            orig_c = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                plane, (yy, xx), (16, 16)))(cy0, cx0)
            adi_c = intra.substitute_refs(
                jax.vmap(lambda yy, xx: g_adi(rec_p, yy, xx, 16))(
                    cy0, cx0),
                av32c)
            pr_c16 = intra.predict_single_mode(adi_c, cm32, 16, False)
            lc16, rc16, cc16 = _tq_recon(orig_c, pr_c16, 16, qp_c,
                                         lam_rd_c,
                                         sign_hiding=sign_hiding,
                                         scaling=scaling_lists)
            # children: 8 TB per sub16 (or 4x4 z-quads when split to 8)
            cpatch = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                rec_p, (yy, xx), (25, 25)))(cy0, cx0)
            lv_ch0 = jnp.zeros((nb, 16, 16), jnp.int32)
            coffs = jnp.asarray([[8 * q[0], 8 * q[1]]
                                 for q in _SUB_OFF], jnp.int32)

            def csub16_body(carry, xk):
                cpatch, lv_ch = carry
                off, av16c_k, av8c_k, m16, m8_k, sp16 = xk
                oy, ox = off[0], off[1]
                adi8 = intra.substitute_refs(
                    _patch_adi(cpatch, oy, ox, 8), av16c_k)
                pr8 = intra.predict_single_mode(adi8, m16, 8, False)
                o8 = jax.lax.dynamic_slice(orig_c, (0, oy, ox),
                                           (nb, 8, 8))
                l8, r8, c8 = _tq_recon(o8, pr8, 8, qp_c, lam_rd_c,
                                       sign_hiding=sign_hiding,
                                       scaling=scaling_lists)
                if search_8x8:
                    coffs4 = jnp.asarray([[4 * r[0], 4 * r[1]]
                                          for r in _SUB_OFF], jnp.int32)

                    def csub8_body(c4carry, x4):
                        cpatch4, l4s = c4carry
                        off4, av8_kk, m8 = x4
                        o4y, o4x = oy + off4[0], ox + off4[1]
                        adi4 = intra.substitute_refs(
                            _patch_adi(cpatch4, o4y, o4x, 4),
                            av8_kk)
                        pr4 = intra.predict_single_mode(adi4, m8, 4,
                                                        False)
                        o4 = jax.lax.dynamic_slice(
                            orig_c, (0, o4y, o4x), (nb, 4, 4))
                        l4, r4, c4 = _tq_recon(o4, pr4, 4, qp_c,
                                               lam_rd_c, mode=m8,
                                               sign_hiding=sign_hiding,
                                               scaling=scaling_lists)
                        cpatch4 = jax.lax.dynamic_update_slice(
                            cpatch4, r4, (0, o4y + 1, o4x + 1))
                        l4s = jax.lax.dynamic_update_slice(
                            l4s, l4, (0, off4[0], off4[1]))
                        return (cpatch4, l4s), c4

                    (cpatch4, l4s), cbf4_y = jax.lax.scan(
                        csub8_body,
                        (cpatch, jnp.zeros((nb, 8, 8), jnp.int32)),
                        (coffs4, av8c_k, m8_k))
                    r4q = jax.lax.dynamic_slice(
                        cpatch4, (0, oy + 1, ox + 1), (nb, 8, 8))
                    spm = sp16[:, None, None]
                    r_sel = jnp.where(spm, r4q, r8)
                    l_sel = jnp.where(spm, l4s, l8)
                    cbf_sel = jnp.where(sp16[None, :], cbf4_y,
                                        c8[None, :])       # [4, nb]
                else:
                    r_sel, l_sel = r8, l8
                    cbf_sel = jnp.broadcast_to(c8[None, :], (4, nb))
                cpatch = jax.lax.dynamic_update_slice(
                    cpatch, r_sel, (0, oy + 1, ox + 1))
                lv_ch = jax.lax.dynamic_update_slice(
                    lv_ch, l_sel, (0, oy, ox))
                return (cpatch, lv_ch), cbf_sel

            (cpatch, lv_ch), cbf_y4 = jax.lax.scan(
                csub16_body, (cpatch, lv_ch0),
                (coffs, jnp.moveaxis(av16c, 1, 0),
                 jnp.moveaxis(av8c, 1, 0).swapaxes(1, 2),
                 cm16_all, cm8_eff, sp16_sel))
            rc_children = cpatch[:, 1:17, 1:17]
            spm32 = sp32[:, None, None]
            rc = jnp.where(spm32, rc_children, rc16)
            lc = jnp.where(spm32, lv_ch, lc16)
            cbf_c = jnp.where(sp32[:, None, None],
                              jnp.moveaxis(cbf_y4, 2, 0),
                              cc16[:, None, None])    # [nb, 4, 4]
            return lc, rc, cbf_c

        # Cb and Cr share every shape/table: one vmapped call halves
        # the wavefront step's sequential chroma op count
        lv_c2, rec_c2, cbf_c2 = jax.vmap(chroma)(
            jnp.stack([rec_u, rec_v]), jnp.stack([u32, v32]))
        lv_u, rec_u_blk, cbf_u_q = lv_c2[0], rec_c2[0], cbf_c2[0]
        lv_v, rec_v_blk, cbf_v_q = lv_c2[1], rec_c2[1], cbf_c2[1]

        # ===== scatter (masked slots dropped via OOB row index)
        def scatter_plane(plane, blks, yy, xx, size, off):
            rows = yy[:, None, None] + off + \
                jnp.arange(size)[None, :, None]
            cols = xx[:, None, None] + off + \
                jnp.arange(size)[None, None, :]
            rows = jnp.where(valid[:, None, None], rows, plane.shape[0])
            shp = (rows.shape[0], size, size)
            return plane.at[jnp.broadcast_to(rows, shp),
                            jnp.broadcast_to(cols, shp)].set(blks,
                                                             mode="drop")

        rec_y = scatter_plane(rec_y, recon, y0, x0, 32, 1)
        rec_u = scatter_plane(rec_u, rec_u_blk, cy0, cx0, 16, 1)
        rec_v = scatter_plane(rec_v, rec_v_blk, cy0, cx0, 16, 1)
        cf_y = scatter_plane(cf_y, level, y0, x0, 32, 0)
        cf_u = scatter_plane(cf_u, lv_u, cy0, cx0, 16, 0)
        cf_v = scatter_plane(cf_v, lv_v, cy0, cx0, 16, 0)

        bsafe = jnp.where(valid, by, jnp.int32(10 ** 6))
        qy = jnp.asarray([o[0] for o in _SUB_OFF], jnp.int32)
        qx = jnp.asarray([o[1] for o in _SUB_OFF], jnp.int32)
        depth_map = depth_map.at[
            2 * bsafe[:, None] + qy[None, :],
            2 * bx[:, None] + qx[None, :]].set(depth_q, mode="drop")
        r8y = (4 * bsafe[:, None, None] + 2 * qy[None, :, None]
               + qy[None, None, :])
        r8x = (4 * bx[:, None, None] + 2 * qx[None, :, None]
               + qx[None, None, :])
        modes8_map = modes8_map.at[r8y, r8x].set(modes_q, mode="drop")
        cmodes8_map = cmodes8_map.at[r8y, r8x].set(cmodes_q,
                                                   mode="drop")
        cbf8_map = cbf8_map.at[0, r8y, r8x].set(
            cbf_q.astype(jnp.int32), mode="drop")
        cbf8_map = cbf8_map.at[1, r8y, r8x].set(
            cbf_u_q.astype(jnp.int32), mode="drop")
        cbf8_map = cbf8_map.at[2, r8y, r8x].set(
            cbf_v_q.astype(jnp.int32), mode="drop")
        if search_nxn:
            nxn_fin = (nxn_q8 & sp32[:, None, None]).astype(jnp.int32)
            nxn8_map = nxn8_map.at[r8y, r8x].set(nxn_fin, mode="drop")
            # 4-granule PU map: mode | cbf << 8
            r4y = (8 * bsafe[:, None, None, None]
                   + 4 * qy[None, :, None, None]
                   + 2 * qy[None, None, :, None]
                   + qy[None, None, None, :])
            r4x = (8 * bx[:, None, None, None]
                   + 4 * qx[None, :, None, None]
                   + 2 * qx[None, None, :, None]
                   + qx[None, None, None, :])
            pu4_map = pu4_map.at[r4y, r4x].set(
                pu4_q + (cbf4_q.astype(jnp.int32) << 8), mode="drop")
        return (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, modes8_map,
                cmodes8_map, cbf8_map, depth_map, nxn8_map,
                pu4_map), None

    xs = (jnp.asarray(plan["by"]), jnp.asarray(plan["bx"]),
          jnp.asarray(plan["valid"]), jnp.asarray(plan["av32"]),
          jnp.asarray(plan["av32c"]), jnp.asarray(plan["av16"]),
          jnp.asarray(plan["av16c"]), jnp.asarray(plan["av8"]),
          jnp.asarray(plan["av8c"]), jnp.asarray(plan["av4"]),
          jnp.asarray(plan["force32"]))
    carry0 = (recon_y0, recon_u0, recon_v0, coeff_y0, coeff_u0,
              coeff_v0, modes8_0, cmodes8_0, cbf8_0, depth0, nxn8_0,
              pu4_0)
    carry, _ = jax.lax.scan(step, carry0, xs)
    (rec_y, rec_u, rec_v, cf_y, cf_u, cf_v, modes8_map, cmodes8_map,
     cbf8_map, depth_map, nxn8_map, pu4_map) = carry

    out_y = rec_y[1:1 + h, 1:1 + w]
    out_u = rec_u[1:1 + h // 2, 1:1 + w // 2]
    out_v = rec_v[1:1 + h // 2, 1:1 + w // 2]

    # chroma-mode granule map: carried out of the wavefront scan (the
    # committed modes incl. DM follow-ups; a dec-map rebuild here once
    # desynced record vs prediction when modes changed in-loop)
    rep2 = lambda g, k: jnp.repeat(jnp.repeat(g, k, 0), k, 1)
    # RC distortion signal: mean per-16x16-block luma SAD (pre-filter)
    dist16 = jnp.sum(jnp.abs(out_y - y32)) // (bh * bw)

    if deblocking:
        # all-intra: BS=2 at every CU/TU boundary on the 8-pel grid;
        # boundaries follow the chosen tree (32 TBs switch interior
        # edges OFF, 8x8 splits switch them on)
        bs_v, bs_h = _intra_bs_from_tree(depth_map, h, w)
        if cw8 < w or ch8 < h:
            # no edges at/past the coded picture bounds (the decoder
            # has no Q side there; filtering would touch visible P
            # pixels)
            bs_v = bs_v.at[:, cw8 // 8:].set(0)
            bs_h = bs_h.at[ch8 // 8:, :].set(0)
        out_y = deblock.deblock_luma(out_y, bs_v, bs_h, qp)
        bs_vc, bs_hc = _intra_bs_chroma_from_tree(depth_map, h // 2,
                                                  w // 2)
        if cw8 < w or ch8 < h:
            bs_vc = bs_vc.at[:, cw8 // 16:].set(0)
            bs_hc = bs_hc.at[ch8 // 16:, :].set(0)
        out_u = deblock.deblock_chroma(out_u, bs_vc, bs_hc, qp_c)
        out_v = deblock.deblock_chroma(out_v, bs_vc, bs_hc, qp_c)

    sao_fields = None
    if sao_enabled:
        out_y, out_u, out_v, sao_fields = sao.sao_frame(
            y32, u32, v32, out_y, out_u, out_v, lamf, lamcf, ctu,
            tiles=tiles,
            coded=(ch8, cw8) if (cw8 < w or ch8 < h) else None)

    out = dict(
        recon_y=out_y,
        recon_u=out_u,
        recon_v=out_v,
        coeff_y=cf_y.astype(jnp.int16),
        coeff_cb=cf_u.astype(jnp.int16),
        coeff_cr=cf_v.astype(jnp.int16),
        modes=modes8_map,
        cmodes=cmodes8_map,
        cbf=cbf8_map,
        depth=depth_map,
    )
    parts = [
        out["coeff_y"].reshape(-1), out["coeff_cb"].reshape(-1),
        out["coeff_cr"].reshape(-1),
        modes8_map.astype(jnp.int16).reshape(-1),
        cmodes8_map.astype(jnp.int16).reshape(-1),
        cbf8_map.astype(jnp.int16).reshape(-1),
        depth_map.astype(jnp.int16).reshape(-1),
        jnp.clip(dist16, 0, 32767).astype(jnp.int16)[None]]
    if search_nxn:
        parts.append(nxn8_map.astype(jnp.int16).reshape(-1))
        parts.append(pu4_map.astype(jnp.int16).reshape(-1))
        out["nxn"] = nxn8_map
        out["pu4"] = pu4_map
    if sao_fields is not None:
        parts.append(sao.pack_sao_fields(sao_fields))
    out["packed"] = jnp.concatenate(parts)
    return out


def _intra_bs_from_tree(depth_map, h: int, w: int):
    """Luma BS maps from the CU-depth granule map (1=32, 2=16, 3=8x8).

    Vertical-edge map [h/4, w/8]: column e sits at luma x = 8e (edges
    every 8 px); BS=2 iff that x is a TB boundary for the block row.
    """
    bh, bw = depth_map.shape                  # 16-granules
    # per-granule "has 16-edge" (depth >= 2) and "has 8-edge" (== 3)
    d = depth_map
    e16 = d >= 2
    e8 = d >= 3
    bs_v = jnp.zeros((h // 4, w // 8), jnp.int32)
    # edge columns: e = x/8; x multiple of 32 -> always on (CU bound);
    # x ≡ 16 (mod 32) -> on if the granule left of x has depth>=2
    # (16-CU boundary; granule size 16 means granule index x//16 - 1);
    # x ≡ 8 (mod 16) -> on if containing granule has depth 3
    ecols = jnp.arange(w // 8)
    x = ecols * 8
    # map each edge to its governing granule (the one to the LEFT for
    # interior-16 edges, the CONTAINING one for 8-edges)
    g16 = jnp.clip(x // 16 - jnp.where(x % 16 == 0, 1, 0), 0, bw - 1)
    on_32 = (x % 32) == 0
    on_16 = ((x % 32) == 16)
    on_8 = ((x % 16) == 8)
    rows16 = jnp.repeat(e16, 4, axis=0)       # [h/4, bw] per 4-row
    rows8 = jnp.repeat(e8, 4, axis=0)
    col_on = (on_32[None, :]
              | (on_16[None, :] & rows16[:, g16])
              | (on_8[None, :] & rows8[:, g16]))
    bs_v = col_on.astype(jnp.int32) * 2
    bs_v = bs_v.at[:, 0].set(0)               # frame edge not filtered
    # horizontal edges: transpose-symmetric
    erows = jnp.arange(h // 8)
    yy = erows * 8
    gy16 = jnp.clip(yy // 16 - jnp.where(yy % 16 == 0, 1, 0), 0, bh - 1)
    on_32h = (yy % 32) == 0
    on_16h = ((yy % 32) == 16)
    on_8h = ((yy % 16) == 8)
    cols16 = jnp.repeat(e16, 4, axis=1)       # [bh, w/4]
    cols8 = jnp.repeat(e8, 4, axis=1)
    row_on = (on_32h[:, None]
              | (on_16h[:, None] & cols16[gy16, :])
              | (on_8h[:, None] & cols8[gy16, :]))
    bs_h = row_on.astype(jnp.int32) * 2
    bs_h = bs_h.at[0, :].set(0)
    return bs_v, bs_h


def _intra_bs_chroma_from_tree(depth_map, hc: int, wc: int):
    """Chroma BS (edges on the 8-chroma-px grid = 16-luma grid): on at
    32-luma boundaries always, and at interior 16-luma boundaries when
    the 32-slot is split."""
    bh, bw = depth_map.shape
    e16 = depth_map >= 2
    ecols = jnp.arange(wc // 8)
    x = ecols * 16                            # luma x of the edge
    g16 = jnp.clip(x // 16 - 1, 0, bw - 1)
    on_32 = (x % 32) == 0
    on_16 = (x % 32) == 16
    rows16 = jnp.repeat(e16, 4, axis=0)       # [hc/2, bw] per 2-chroma
    col_on = on_32[None, :] | (on_16[None, :] & rows16[:, g16])
    bs_v = col_on.astype(jnp.int32) * 2
    bs_v = bs_v.at[:, 0].set(0)
    erows = jnp.arange(hc // 8)
    yy = erows * 16
    gy16 = jnp.clip(yy // 16 - 1, 0, bh - 1)
    on_32h = (yy % 32) == 0
    on_16h = (yy % 32) == 16
    cols16 = jnp.repeat(e16, 4, axis=1)
    row_on = on_32h[:, None] | (on_16h[:, None] & cols16[gy16, :])
    bs_h = row_on.astype(jnp.int32) * 2
    bs_h = bs_h.at[0, :].set(0)
    return bs_v, bs_h


encode_frame_jit = jax.jit(
    encode_frame, static_argnames=("ctu", "sign_hiding",
                                   "rd_lambda_scale", "deblocking",
                                   "sao_enabled", "search_8x8",
                                   "chroma_qp_offset", "scaling_lists",
                                   "cu", "split_8x8", "search_nxn",
                                   "tiles", "rd_refine", "tu_split",
                                   "vis_h", "vis_w", "true_size"))


def encode_i_chunk(ys, us, vs, qp, **flags):
    """K independent intra frames in ONE device program (vmap over the
    frame axis — all-intra streams have no cross-frame dependency, so
    the wavefront's serialized steps batch K frames of work each and
    the host pays one dispatch + one transfer per chunk)."""
    return jax.vmap(
        lambda y, u, v: encode_frame(y, u, v, qp=qp, **flags))(ys, us, vs)


encode_i_chunk_jit = jax.jit(
    encode_i_chunk, static_argnames=("ctu", "sign_hiding",
                                     "rd_lambda_scale", "deblocking",
                                     "sao_enabled", "search_8x8",
                                     "chroma_qp_offset",
                                     "scaling_lists", "cu", "split_8x8",
                                     "search_nxn", "tiles",
                                     "rd_refine", "tu_split",
                                     "vis_h", "vis_w",
                                     "true_size"))


def encode_i_chunk_sharded(ys, us, vs, qp, *, mesh, axis="gop",
                           **flags):
    """encode_i_chunk with the frame axis sharded over `mesh[axis]`
    (cfg.num_chips consumption: all-intra frames are independent, so
    chip parallelism is bit-transparent data parallelism — the TPU
    reshape of the reference's n_enc_engines, hmr_encoder_lib.c:2640)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(axis)
    fn = shard_map(
        lambda y, u, v, q: encode_i_chunk(y, u, v, q, **flags),
        mesh=mesh, in_specs=(spec, spec, spec, P()), out_specs=spec,
        check_vma=False)
    return fn(ys, us, vs, jnp.asarray(qp))


encode_i_chunk_sharded_jit = jax.jit(
    encode_i_chunk_sharded,
    static_argnames=("mesh", "axis", "ctu", "sign_hiding",
                     "rd_lambda_scale", "deblocking", "sao_enabled",
                     "search_8x8", "chroma_qp_offset", "scaling_lists",
                     "cu", "split_8x8", "search_nxn", "tiles",
                     "rd_refine", "tu_split", "vis_h", "vis_w",
                     "true_size"))
