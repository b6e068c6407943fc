"""Sample-adaptive offset (SAO) — frame-batched encoder side.

Re-design of the reference's per-CTU trailing SAO stage (ref:
hmr_sao.c: stats :75, offset derivation :440-587, mode RDO :663,
apply :960-1208) as dense whole-frame tensor passes:

* classification maps (4 EO types + 32 bands) are computed once for the
  whole (deblocked) plane with shifted-plane compares;
* per-CTU class statistics (sum of org-rec diffs + counts) are masked
  block-reductions;
* offset derivation follows the reference's iterate-toward-zero rule
  with cost = count*o^2 - 2*diff*o + lambda*rate (encoder choice);
* mode decision picks min-cost of {OFF, 4 EO types, BO} per CTU (luma)
  and jointly over Cb+Cr for chroma (shared type idx per spec syntax);
  merge-left/above RDO adopts a neighbour's params when RD-cheaper
  (raster scan below; flags emitted by the host coincidence pass);
* apply is the spec 8.7.3 decoding process, bit-exact: the decoder's
  reconstruction must equal ours (validated against libde265).

MERGE/SKIP NOTE: classification always reads the deblocked pre-SAO
picture, so apply is a pure function — no CTU sequencing anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# neighbor offsets (dy, dx) per EO class 0..3 (spec table: hor, ver,
# 135 diag, 45 diag)
_EO_NEIGHBORS = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1),
                 (-1, 1, 1, -1))


def _shift(p, dy, dx):
    """Shifted copy of plane p (edge values are masked out anyway)."""
    return jnp.roll(p, (-dy, -dx), (0, 1))


def eo_class_maps(rec: jnp.ndarray, bounds=None):
    """Per-pixel mapped edge categories for the 4 EO types.

    Returns (cls [4, H, W] int32 in 0..4 (0 = no offset), valid
    [4, H, W] bool — False where a needed neighbor is outside the
    picture; those pixels are never modified (spec 8.7.3)).
    `bounds` (bh, bw): the CODED picture bounds when smaller than
    the compute plane (code_true_size)."""
    h, w = rec.shape
    bh, bw = bounds if bounds is not None else (h, w)
    yy, xx = jnp.mgrid[0:h, 0:w]
    cls_all, valid_all = [], []
    for (ady, adx, bdy, bdx) in _EO_NEIGHBORS:
        a = _shift(rec, ady, adx)
        b = _shift(rec, bdy, bdx)
        raw = 2 + jnp.sign(rec - a) + jnp.sign(rec - b)
        mapped = jnp.where(raw == 2, 0,
                           jnp.where(raw < 2, raw + 1, raw))
        ok = ((yy + ady >= 0) & (yy + ady < bh) & (xx + adx >= 0)
              & (xx + adx < bw) & (yy + bdy >= 0) & (yy + bdy < bh)
              & (xx + bdx >= 0) & (xx + bdx < bw))
        cls_all.append(mapped.astype(jnp.int32))
        valid_all.append(ok)
    return jnp.stack(cls_all), jnp.stack(valid_all)


@functools.lru_cache(maxsize=None)
def _pool_mat_np(n: int, ctb: int) -> np.ndarray:
    """[n, n//ctb] 0/1 block-sum pooling matrix."""
    m = np.zeros((n, n // ctb), np.float32)
    m[np.arange(n), np.arange(n) // ctb] = 1.0
    return m


def _ctu_sum(x: jnp.ndarray, ctb: int):
    """CTU block sums [..., H, W] -> [..., H/ctb, W/ctb] as two GEMMs
    (the reshape-sum form lowered to slow strided sublane reductions —
    measured 2.3 ms/frame in the P path).  Exact: per-pixel |values|
    <= 255 and per-CTU sums < 2^24; HIGHEST precision keeps the second
    contraction's f32 inputs unrounded."""
    h, w = x.shape[-2:]
    # |x| <= 255 (bf16-exact) x 0/1 pools -> 1-pass exact; second
    # stage inputs <= 2^14 -> 3-pass exact (device-gated by
    # me.pallas_selftest)
    t = jnp.einsum("...hw,wx->...hx", x.astype(jnp.float32),
                   jnp.asarray(_pool_mat_np(w, ctb)),
                   precision=jax.lax.Precision.DEFAULT)
    return jnp.einsum("...hx,hy->...yx", t,
                      jnp.asarray(_pool_mat_np(h, ctb)),
                      precision=jax.lax.Precision.HIGH).astype(jnp.int32)


def sao_stats(org: jnp.ndarray, rec: jnp.ndarray, ctb: int,
              bounds=None):
    """Per-CTU statistics. Returns (eo_diff, eo_cnt [4, 5, by, bx],
    bo_diff, bo_cnt [32, by, bx]) plus the cached class maps.

    One-hot batched with the category/band axis LEADING (a trailing
    one-hot axis put the tiny channel dim in lanes — slow), reduced by
    the GEMM pooling of _ctu_sum."""
    cls, valid = eo_class_maps(rec, bounds)
    diff = (org - rec).astype(jnp.int32)
    cats = jnp.arange(5, dtype=jnp.int32)
    oh = ((cls[None] == cats[:, None, None, None]) & valid[None]) \
        .astype(jnp.int32)                           # [5, 4, H, W]
    stats = _ctu_sum(jnp.stack([diff[None, None] * oh, oh]),
                     ctb)                            # [2, 5, 4, by, bx]
    eo_diff = stats[0].swapaxes(0, 1)                # [4, 5, by, bx]
    eo_cnt = stats[1].swapaxes(0, 1)
    bands = jnp.arange(32, dtype=jnp.int32)
    ohb = ((rec >> 3)[None] == bands[:, None, None]) \
        .astype(jnp.int32)                           # [32, H, W]
    bstats = _ctu_sum(jnp.stack([diff[None] * ohb, ohb]),
                      ctb)                           # [2, 32, by, bx]
    return (eo_diff, eo_cnt, bstats[0], bstats[1], cls, valid)


def _best_offset(diff, cnt, lam, sign):
    """Iterate-toward-zero offset choice (ref est_iter_offset
    hmr_sao.c:445). diff/cnt: [...]; sign: +1 (cats 1,2), -1 (3,4),
    0 (BO: free sign — prices the extra sign bypass bin for nonzero
    offsets, spec 7.3.8.3 sao_offset_sign). Returns (offset, cost)."""
    init = jnp.where(cnt > 0,
                     (diff + jnp.sign(diff) * (cnt // 2))
                     // jnp.maximum(cnt, 1), 0)
    init = jnp.clip(init, -7, 7)
    if sign > 0:
        init = jnp.clip(init, 0, 7)
    elif sign < 0:
        init = jnp.clip(init, -7, 0)
    best_o = jnp.zeros_like(init)
    best_c = jnp.zeros_like(diff, dtype=jnp.float32)   # cost of o=0
    for mag in range(1, 8):
        o = jnp.sign(init) * mag
        dist = (cnt * o * o - 2 * diff * o).astype(jnp.float32)
        rate = mag + 1.0 - (mag == 7) + (1.0 if sign == 0 else 0.0)
        cost = dist + lam * rate
        take = (mag <= jnp.abs(init)) & (cost < best_c)
        best_o = jnp.where(take, o, best_o)
        best_c = jnp.where(take, cost, best_c)
    return best_o, best_c


def _best_offset_signed(diff, cnt, lam, sign):
    """_best_offset with a broadcastable SIGN TENSOR (+1 clip to [0,7],
    -1 clip to [-7,0]) so all 4 EO categories evaluate in one pass."""
    init = jnp.where(cnt > 0,
                     (diff + jnp.sign(diff) * (cnt // 2))
                     // jnp.maximum(cnt, 1), 0)
    init = jnp.clip(init, -7, 7)
    init = jnp.where(sign > 0, jnp.clip(init, 0, 7),
                     jnp.clip(init, -7, 0))
    best_o = jnp.zeros_like(init)
    best_c = jnp.zeros_like(diff, dtype=jnp.float32)
    for mag in range(1, 8):
        o = jnp.sign(init) * mag
        dist = (cnt * o * o - 2 * diff * o).astype(jnp.float32)
        rate = mag + 1.0 - (mag == 7)
        cost = dist + lam * rate
        take = (mag <= jnp.abs(init)) & (cost < best_c)
        best_o = jnp.where(take, o, best_o)
        best_c = jnp.where(take, cost, best_c)
    return best_o, best_c


def derive_params(stats, lam, secondary: bool = False):
    """Per-CTU mode decision for one component's stats.

    Returns dict(type [by,bx] int32 (0 off, 1 BO, 2+cls EO),
    offsets [by,bx,4] int32 signed, band_pos [by,bx] int32,
    eo_cost [4,by,bx], bo_cost, off_cost) — costs exposed so chroma can
    be decided jointly.

    Rates follow the binarization (spec 7.3.8.3): type = 1 ctx bin +
    1 bypass, eo_class = 2 bits, band_pos = 5 bits, offsets TU(7) (+
    sign for BO, priced in _best_offset).  `secondary` = Cr: the type/
    eo_class are signaled once for the chroma pair (on Cb), so Cr
    carries only its own offsets + band_pos."""
    eo_diff, eo_cnt, bo_diff, bo_cnt = stats
    # EO: categories 1..4 (skip 0); valley/edge >= 0, peak/edge <= 0 —
    # one vectorized _best_offset over the stacked category axis
    o4, c4 = _best_offset_signed(
        jnp.moveaxis(eo_diff[:, 1:5], 1, 0),
        jnp.moveaxis(eo_cnt[:, 1:5], 1, 0), lam,
        jnp.asarray([1, 1, -1, -1], jnp.int32)[:, None, None, None])
    eo_off = jnp.moveaxis(o4, 0, -1)                 # [4, by, bx, 4]
    eo_rate = 0.0 if secondary else 4.0              # type + eo_class
    eo_cost = jnp.sum(c4, 0) + lam * eo_rate
    # BO: best offset per band, then best 4 consecutive bands
    bo_o, bo_c = _best_offset(bo_diff, bo_cnt, lam, 0)   # [32, by, bx]
    cs = jnp.cumsum(jnp.concatenate([jnp.zeros_like(bo_c[:1]), bo_c]),
                    0)
    win = cs[4:33] - cs[0:29]                        # [29, by, bx]
    band_pos = jnp.argmin(win, 0).astype(jnp.int32)      # [by, bx]
    bo_rate = 5.0 if secondary else 7.0              # [type +] band_pos
    bo_cost = jnp.min(win, 0) + lam * bo_rate
    bo_off = jnp.stack(
        [jnp.take_along_axis(bo_o, (band_pos + k)[None], 0)[0]
         for k in range(4)], -1)                     # [by, bx, 4]
    off_rate = 0.0 if secondary else 1.0             # type ctx bin
    return dict(eo_off=eo_off, eo_cost=eo_cost, bo_off=bo_off,
                bo_cost=bo_cost, band_pos=band_pos,
                off_cost=jnp.full(band_pos.shape, lam * off_rate))


def select_luma(p):
    """Pick min-cost mode for luma.
    Returns (type, offsets, band_pos, cost)."""
    all_costs = jnp.concatenate([
        p["off_cost"][None], p["bo_cost"][None], p["eo_cost"]])  # [6,..]
    best = jnp.argmin(all_costs, 0)                  # 0 off, 1 bo, 2+t
    offsets = jnp.where((best == 1)[..., None], p["bo_off"],
                        jnp.zeros_like(p["bo_off"]))
    for t in range(4):
        offsets = jnp.where((best == t + 2)[..., None],
                            p["eo_off"][t], offsets)
    return (best.astype(jnp.int32), offsets, p["band_pos"],
            jnp.min(all_costs, 0))


def select_chroma(pcb, pcr):
    """Joint Cb/Cr type selection (shared type idx per spec syntax)."""
    all_costs = jnp.concatenate([
        (pcb["off_cost"] + pcr["off_cost"])[None],
        (pcb["bo_cost"] + pcr["bo_cost"])[None],
        pcb["eo_cost"] + pcr["eo_cost"]])
    best = jnp.argmin(all_costs, 0).astype(jnp.int32)

    def offs(p):
        o = jnp.where((best == 1)[..., None], p["bo_off"],
                      jnp.zeros_like(p["bo_off"]))
        for t in range(4):
            o = jnp.where((best == t + 2)[..., None], p["eo_off"][t], o)
        return o
    return (best, offs(pcb), offs(pcr), pcb["band_pos"],
            pcr["band_pos"], jnp.min(all_costs, 0))


# ---------------------------------------------------------------------------
# Merge-left/up RDO (ref sao_derive_mode_merge_rdo, hmr_sao.c:854-959).
#
# TPU redesign: the reference walks CTUs serially and lets a CTU adopt
# its LEFT or ABOVE neighbour's FINAL params when RD-cheaper.  A raster
# scan over all CTUs is a by*bx-deep sequential chain (measured: it
# dominated the whole SAO stage), so adoption runs in TWO passes:
#
#   1. LEFT chains: a lax.scan over columns only (bx steps), all rows
#      decided in parallel — each CTU may adopt the final params of its
#      left neighbour (exactly the reference's greedy restricted to
#      merge-left chains);
#   2. UP adoption: one batched pass — each CTU may adopt the pass-1
#      final of the CTU above when that beats its pass-1 outcome.
#
# A pass-2 adoption can break a left chain below it (the host emits
# merge flags from final-param coincidence, so the stream stays
# conformant either way); the RD loss vs the exact raster greedy is the
# rare case where an up-adoption would have enabled a cheaper left
# chain.  The adopted distortion is exact, from the per-CTU class
# statistics (the cnt*o^2 - 2*diff*o identity of the explicit search).
# ---------------------------------------------------------------------------

_MERGE_FLAG_BITS = 0.9     # ctx-coded sao_merge_*_flag, either value


def _adopt_dist(stats, typ, off, bp):
    """Exact SSD change of applying params (typ, off [..., 4], bp) to
    CTUs with statistics `stats` = (eo_diff [4, 5, ...], eo_cnt,
    bo_diff [32, ...], bo_cnt); typ/bp [...] int32."""
    eo_d, eo_c, bo_d, bo_c = stats
    of = jnp.moveaxis(off.astype(jnp.int32), -1, 0)           # [4, ...]
    # EO dist for each of the 4 types -> select by typ-2
    d_eo = jnp.sum(eo_c[:, 1:5] * (of ** 2)[None]
                   - 2 * eo_d[:, 1:5] * of[None], axis=1)     # [4, ...]
    sel_eo = jnp.take_along_axis(
        d_eo, jnp.clip(typ - 2, 0, 3)[None], 0)[0]
    # BO dist over the 4 bands at band_pos
    shape = (4,) + (1,) * bp.ndim
    bands = (bp[None] + jnp.arange(4, dtype=jnp.int32)
             .reshape(shape)) & 31
    bd = jnp.take_along_axis(bo_d, bands, 0)                  # [4, ...]
    bc = jnp.take_along_axis(bo_c, bands, 0)
    d_bo = jnp.sum(bc * (of ** 2) - 2 * bd * of, axis=0)
    return jnp.where(typ == 0, 0.0,
                     jnp.where(typ == 1, d_bo, sel_eo)
                     .astype(jnp.float32))


def merge_adopt_rdo(stats_y, stats_cb, stats_cr, expl, expl_cost,
                    lam_y, avail_l, avail_u):
    """Two-pass left-chain / up adoption (see module comment above).

    expl: dict of explicit per-CTU params (t_y, off_y, bp_y, t_c,
    off_cb, bp_cb, off_cr, bp_cr), each [by, bx, ...];
    expl_cost [by, bx] = explicit D + lam*R (all comps);
    avail_l / avail_u [by, bx] bool = neighbour exists and is in the
    same tile.  Rates: merge-left = 1 ctx bin, merge-up = 2 (left flag
    coded 0 first), explicit pays its present flags as 0s (spec
    7.3.8.3).  Returns final adopted params (same structure)."""
    by, bx = expl_cost.shape
    keys = ("t_y", "off_y", "bp_y", "t_c", "off_cb", "bp_cb",
            "off_cr", "bp_cr")
    fbits = lam_y * _MERGE_FLAG_BITS
    big = jnp.float32(3e38)

    def col(s, x):
        # stats of column x: [..., by]
        return tuple(a[..., x] for a in s)

    def cand_cost(sts, c):
        sy_x, scb_x, scr_x = sts
        return (_adopt_dist(sy_x, c["t_y"], c["off_y"], c["bp_y"])
                + _adopt_dist(scb_x, c["t_c"], c["off_cb"], c["bp_cb"])
                + _adopt_dist(scr_x, c["t_c"], c["off_cr"], c["bp_cr"]))

    # ---- pass 1: left chains (scan over columns, rows in parallel)
    def step(carry, x):
        prev = carry              # finals of column x-1: {k: [by, ...]}
        sts = (col(stats_y, x), col(stats_cb, x), col(stats_cr, x))
        ex = {k: expl[k][:, x] for k in keys}
        has_l = avail_l[:, x]
        has_u = avail_u[:, x]
        c_l = jnp.where(has_l, cand_cost(sts, prev) + fbits, big)
        c_e = expl_cost[:, x] + fbits * (has_l.astype(jnp.float32)
                                         + has_u.astype(jnp.float32))
        take_l = c_l < c_e
        new = {}
        for k in keys:
            tl = take_l.reshape((by,) + (1,) * (ex[k].ndim - 1))
            new[k] = jnp.where(tl, prev[k], ex[k])
        out = dict(new)
        out["cost"] = jnp.minimum(c_l, c_e)
        return new, out

    init = {k: jnp.zeros((by,) + expl[k].shape[2:], expl[k].dtype)
            for k in keys}
    _, outs = jax.lax.scan(step, init, jnp.arange(bx, dtype=jnp.int32))
    # outs[k]: [bx, by, ...] -> [by, bx, ...]
    p1 = {k: jnp.moveaxis(outs[k], 0, 1) for k in keys}
    cost1 = jnp.moveaxis(outs["cost"], 0, 1)             # [by, bx]

    # ---- pass 2: up adoption vs the pass-1 outcome (fully batched)
    upc = {k: jnp.concatenate([p1[k][:1], p1[k][:-1]], 0) for k in keys}
    sts_all = (stats_y, stats_cb, stats_cr)
    c_u = jnp.where(avail_u, cand_cost(sts_all, upc) + 2.0 * fbits, big)
    take_u = c_u < cost1
    fin = {}
    for k in keys:
        tu = take_u.reshape((by, bx) + (1,) * (p1[k].ndim - 2))
        fin[k] = jnp.where(tu, upc[k], p1[k])
    return fin


def sao_component(org, rec, ctb: int, lam, secondary: bool = False,
                  bounds=None):
    """Stats -> params for one plane;
    returns (params, stats, cls, valid)."""
    eo_d, eo_c, bo_d, bo_c, cls, valid = sao_stats(org, rec, ctb,
                                                   bounds)
    st = (eo_d, eo_c, bo_d, bo_c)
    return derive_params(st, lam, secondary), st, cls, valid


@functools.lru_cache(maxsize=None)
def _avail_lu_np(by: int, bx: int, tiles):
    """([by, bx], [by, bx]) bool: left / above CTU exists and is in the
    same tile (spec 7.3.8.3 leftCtbInTile / upCtbInTile)."""
    av_l = np.ones((by, bx), bool)
    av_l[:, 0] = False
    av_u = np.ones((by, bx), bool)
    av_u[0, :] = False
    if tiles is not None:
        from homerhevc_tpu.models.schedule import tile_bounds
        for b in tile_bounds(bx, tiles[0])[1:-1]:
            av_l[:, b] = False
        for b in tile_bounds(by, tiles[1])[1:-1]:
            av_u[b, :] = False
    return av_l, av_u


def sao_frame(org_y, org_u, org_v, rec_y, rec_u, rec_v,
              lam_y: float, lam_c: float, ctu: int = 64,
              tiles=None, merge_rdo: bool = True, coded=None):
    """Full-frame SAO encode: decide + apply for Y/Cb/Cr.

    Returns (new_y, new_u, new_v, sao_fields) where sao_fields is a
    dict(type [3, by, bx], offsets [3, by, bx, 4], band_pos [3, by, bx])
    in the native writer's conventions (type: 0 off, 1 BO, 2+cls EO;
    chroma shares its type idx between Cb and Cr).  With merge_rdo a
    CTU may adopt its left neighbour's params when RD-cheaper (merge
    flags are then emitted by the host coincidence pass)."""
    by = bc = None
    if coded is not None:
        by = (coded[0], coded[1])
        bc = (coded[0] // 2, coded[1] // 2)
    py, sy, cy, vy = sao_component(org_y.astype(jnp.int32), rec_y, ctu,
                                   jnp.float32(lam_y), bounds=by)
    pcb, scb, ccb, vcb = sao_component(org_u.astype(jnp.int32), rec_u,
                                       ctu // 2, jnp.float32(lam_c),
                                       bounds=bc)
    pcr, scr, ccr, vcr = sao_component(org_v.astype(jnp.int32), rec_v,
                                       ctu // 2, jnp.float32(lam_c),
                                       secondary=True, bounds=bc)
    t_y, off_y, bp_y, cost_y = select_luma(py)
    t_c, off_cb, off_cr, bp_cb, bp_cr, cost_c = select_chroma(pcb, pcr)
    if merge_rdo and t_y.size > 1:
        expl = dict(t_y=t_y, off_y=off_y, bp_y=bp_y, t_c=t_c,
                    off_cb=off_cb, bp_cb=bp_cb, off_cr=off_cr,
                    bp_cr=bp_cr)
        av_l, av_u = _avail_lu_np(t_y.shape[0], t_y.shape[1], tiles)
        fin = merge_adopt_rdo(
            sy, scb, scr, expl, cost_y + cost_c,
            jnp.float32(lam_y), jnp.asarray(av_l), jnp.asarray(av_u))
        t_y, off_y, bp_y = fin["t_y"], fin["off_y"], fin["bp_y"]
        t_c, off_cb, bp_cb = fin["t_c"], fin["off_cb"], fin["bp_cb"]
        off_cr, bp_cr = fin["off_cr"], fin["bp_cr"]
    new_y = apply_sao(rec_y, cy, vy, t_y, off_y, bp_y, ctu)
    new_u = apply_sao(rec_u, ccb, vcb, t_c, off_cb, bp_cb, ctu // 2)
    new_v = apply_sao(rec_v, ccr, vcr, t_c, off_cr, bp_cr, ctu // 2)
    fields = dict(
        type=jnp.stack([t_y, t_c, t_c]),
        offsets=jnp.stack([off_y, off_cb, off_cr]),
        band_pos=jnp.stack([bp_y, bp_cb, bp_cr]),
    )
    return new_y, new_u, new_v, fields


def pack_sao_fields(fields) -> jnp.ndarray:
    """Flatten SAO decision maps into the int16 transfer buffer."""
    return jnp.concatenate([
        fields["type"].astype(jnp.int16).reshape(-1),
        fields["offsets"].astype(jnp.int16).reshape(-1),
        fields["band_pos"].astype(jnp.int16).reshape(-1)])


def sao_fields_size(by: int, bx: int) -> int:
    return 3 * by * bx * 6


def unpack_sao_fields(vec, by: int, bx: int):
    """Host inverse of pack_sao_fields -> (type, offsets, band_pos)."""
    n = 3 * by * bx
    t = vec[:n].reshape(3, by, bx)
    off = vec[n:n * 5].reshape(3, by, bx, 4)
    bp = vec[n * 5:n * 6].reshape(3, by, bx)
    return t, off, bp


def apply_sao(rec, cls, valid, type_map, offsets, band_pos, ctb: int):
    """Spec 8.7.3 SAO application (bit-exact decoder behavior).

    rec [H, W]; cls/valid [4, H, W] (from eo_class_maps of THIS plane);
    type_map [by, bx]; offsets [by, bx, 4]; band_pos [by, bx]."""
    rep = lambda m: jnp.repeat(jnp.repeat(m, ctb, 0), ctb, 1)
    t_pix = rep(type_map)
    add = jnp.zeros_like(rec)
    # EO
    for t in range(4):
        sel = t_pix == t + 2
        off_k = jnp.zeros_like(rec)
        for k in range(4):
            off_k = off_k + jnp.where(cls[t] == k + 1,
                                      rep(offsets[..., k]), 0)
        add = add + jnp.where(sel & valid[t], off_k, 0)
    # BO
    band = rec >> 3
    sel = t_pix == 1
    pos_pix = rep(band_pos)
    off_b = jnp.zeros_like(rec)
    for k in range(4):
        off_b = off_b + jnp.where(band == ((pos_pix + k) & 31),
                                  rep(offsets[..., k]), 0)
    add = add + jnp.where(sel, off_b, 0)
    return jnp.clip(rec + add, 0, 255)
