"""HEVC intra prediction: reference substitution, smoothing, 35 modes.

TPU-native re-design of the reference's per-block scalar generators
(ref: fill_reference_samples hmr_motion_intra.c:246-404, adi_filter
:189-244, planar/DC/angular :408-625).  All 35 predictions for a block
are produced in ONE batched gather+blend — every index that depends on
the mode/angle is a compile-time constant, so XLA sees static gathers
and fuses the whole mode stack.

Reference sample layout ("adi", matching the reference's ADI buffer,
hmr_common.h:221): a [4S+1] vector
    adi[0 .. 2S-1]  = left column bottom -> top   (adi[k] = p(2S-1-k, -1))
    adi[2S]         = corner p(-1, -1)
    adi[2S+1+j]     = top row left -> right        (p(-1, j)), j = 0..2S-1
where the block occupies rows/cols 0..S-1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables

PLANAR, DC = 0, 1


def substitute_refs(adi: jnp.ndarray, avail: jnp.ndarray,
                    bit_depth: int = 8) -> jnp.ndarray:
    """Reference sample substitution (spec 8.4.4.2.2).

    adi: int32 [..., 4S+1]; avail: bool [..., 4S+1].
    Scan from adi[0] upward/rightward: each unavailable sample takes the
    previous (filled) one; a leading unavailable run takes the first
    available value; all-unavailable yields 1 << (bd-1).
    """
    n = adi.shape[-1]
    pos = jnp.arange(n, dtype=jnp.int32)
    avail_i = avail.astype(jnp.int32)
    # forward-fill index: last available position <= k (or -1)
    ff = jax.lax.associative_scan(
        jnp.maximum, jnp.where(avail, pos, -1), axis=-1)
    first_avail = jnp.argmax(avail_i, axis=-1).astype(jnp.int32)
    any_avail = jnp.any(avail, axis=-1)
    idx = jnp.where(ff >= 0, ff, first_avail[..., None])
    filled = jnp.take_along_axis(adi, idx, axis=-1)
    default = jnp.int32(1 << (bit_depth - 1))
    return jnp.where(any_avail[..., None], filled, default)


def filter_refs(adi: jnp.ndarray, size: int,
                strong: bool = False) -> jnp.ndarray:
    """Reference-sample smoothing (spec 8.4.4.2.3): [1,2,1], with the
    STRONG bilinear filter for 32x32 luma when `strong` and the edges
    test near-linear (the reference signals SPS
    strong_intra_smooth_enabled_flag=1, hmr_encoder_lib.c:1289 — a
    large prediction win on smooth gradients).

    End samples adi[0] and adi[4S] are kept unfiltered.
    """
    left = jnp.concatenate([adi[..., :1], adi[..., :-1]], axis=-1)
    right = jnp.concatenate([adi[..., 1:], adi[..., -1:]], axis=-1)
    f = (left + 2 * adi + right + 2) >> 2
    n = adi.shape[-1]
    keep = jnp.zeros((n,), dtype=bool).at[0].set(True).at[n - 1].set(True)
    f = jnp.where(keep, adi, f)
    if not strong or size != 32:
        return f
    s = size
    corner = adi[..., 2 * s]
    top_end = adi[..., 4 * s]
    bl_end = adi[..., 0]
    thr = 1 << (8 - 5)
    bi = ((jnp.abs(corner + top_end - 2 * adi[..., 3 * s]) < thr)
          & (jnp.abs(corner + bl_end - 2 * adi[..., s]) < thr))
    k = jnp.arange(n)
    # top row x=0..2S-1 at indices 2S+1+x:
    #   ((63-x)*corner + (x+1)*top_end + 32) >> 6
    x = k - (2 * s + 1)
    top_lin = ((2 * s - 1 - x) * corner[..., None]
               + (x + 1) * top_end[..., None] + s) >> 6
    # left col y=0..2S-1 at indices 2S-1-y:
    y = 2 * s - 1 - k
    left_lin = ((2 * s - 1 - y) * corner[..., None]
                + (y + 1) * bl_end[..., None] + s) >> 6
    lin = jnp.where(k > 2 * s, top_lin,
                    jnp.where(k < 2 * s, left_lin, adi))
    lin = jnp.where(keep, adi, lin)
    return jnp.where(bi[..., None], lin, f)


@functools.lru_cache(maxsize=None)
def _angular_tables(size: int):
    """Static per-(mode,row/col) gather tables for the 33 angular modes.

    Returns (src_idx, fact) with src_idx int32 [33, S, S, 2] indexing the
    adi vector for the two blended taps, and fact int32 [33, S] blend
    weights.  Horizontal modes (2..17) are generated transposed; the
    caller transposes their predictions back.
    """
    s = size
    n_adi = 4 * s + 1
    corner = 2 * s

    def main_adi_index(k: int, is_ver: bool) -> int:
        # refMain[k]: k=0 -> corner; k>=1 -> main row/col sample k-1.
        if k == 0:
            return corner
        return corner + k if is_ver else corner - k

    def side_adi_index(i: int, is_ver: bool) -> int:
        # refSide[i]: i=0 -> corner; i>=1 -> side sample at offset i-1.
        if i == 0:
            return corner
        return corner - i if is_ver else corner + i

    src = np.zeros((33, s, s, 2), dtype=np.int32)
    fact = np.zeros((33, s), dtype=np.int32)
    for mode in range(2, 35):
        m = mode - 2
        is_ver = mode >= 18
        ang = tables.intra_pred_angle(mode)
        inv_ang = tables.intra_inv_angle(mode)
        # refMain over k = -S .. 2S as adi indices
        ref_main = np.zeros(3 * s + 1, dtype=np.int32)
        for k in range(0, 2 * s + 1):
            ref_main[s + k] = main_adi_index(k, is_ver)
        if ang < 0:
            # extend refMain[-1 .. (S*ang>>5)+1] by projecting the side
            # array (HM's invAngleSum loop)
            inv_sum = 128
            for j in range(1, -((s * ang) >> 5)):
                inv_sum += inv_ang
                ref_main[s - j] = side_adi_index(inv_sum >> 8, is_ver)
        for r in range(s):
            pos = (r + 1) * ang
            i_idx = pos >> 5
            fact[m, r] = pos & 31
            for c in range(s):
                src[m, r, c, 0] = ref_main[s + c + i_idx + 1]
                src[m, r, c, 1] = ref_main[min(s + c + i_idx + 2, 3 * s)]
    return src, fact


@functools.lru_cache(maxsize=None)
def _angular_selection_matrix(size: int, is_luma: bool) -> np.ndarray:
    """The 33 angular modes' tap gathers as ONE 0/1 selection matrix
    [2*(4S+1), 33*S*S*2] over the stacked (unfiltered|filtered) adi.

    take_along_axis over the tiny adi trailing dim lowers to one
    dynamic-slice per (block, mode) on TPU (measured 295k ~0.2 us ops
    per P chunk); a GEMM against this constant puts the same selection
    on the MXU.  Exact for 8-bit video even at default matmul
    precision: samples <= 255 are exact bf16 values and every output
    column has exactly one nonzero addend.
    """
    src_idx, _ = _angular_tables(size)
    flags = _filter_flags(size, is_luma)
    s = size
    n_adi = 4 * s + 1
    sel = flags[2:].astype(np.int32)                     # [33]
    m2 = np.zeros((2 * n_adi, 33 * s * s * 2), np.float32)
    for m in range(33):
        idx = sel[m] * n_adi + src_idx[m].reshape(-1)    # [S*S*2]
        m2[idx, np.arange(m * s * s * 2, (m + 1) * s * s * 2)] = 1.0
    return m2


def _angular_taps_matmul(adi, adi_f, size: int, is_luma: bool):
    """taps [..., 33, S, S, 2] via the selection GEMM."""
    s = size
    m2 = jnp.asarray(_angular_selection_matrix(s, is_luma))
    flat = jnp.concatenate([adi, adi_f], axis=-1) \
        .reshape((-1, 2 * (4 * s + 1))).astype(jnp.float32)
    taps = (flat @ m2).astype(jnp.int32)
    return taps.reshape(adi.shape[:-1] + (33, s, s, 2))


def _matmul_taps_ok(n: int, size: int) -> bool:
    """Use the GEMM path when the [n, 33, S, S, 2] f32 intermediate
    stays well inside HBM working-set budget."""
    return n * 33 * size * size * 2 * 4 <= 96 * 2 ** 20


@functools.lru_cache(maxsize=None)
def _filter_flags(size: int, is_luma: bool) -> np.ndarray:
    """Per-mode reference smoothing selection (spec 8.4.4.2.3;
    ref intra_filter table hmr_motion_intra.c:148-155)."""
    flags = np.zeros(35, dtype=bool)
    if not is_luma or size == 4:
        return flags
    log2 = int(np.log2(size))
    thresh = int(tables.INTRA_FILTER_THRESH[log2 - 2])
    for mode in range(35):
        if mode == DC:
            continue
        if mode == PLANAR:
            min_dist = 10  # convention: planar filtered when thresh < 10
        else:
            min_dist = min(abs(mode - 26), abs(mode - 10))
        flags[mode] = min_dist > thresh
    return flags


def predict_single_mode(adi: jnp.ndarray, mode: jnp.ndarray, size: int,
                        is_luma: bool, bit_depth: int = 8,
                        strong: bool = False) -> jnp.ndarray:
    """Prediction for ONE (traced) mode per block — the cheap path for
    reconstruction once modes are already decided (the dense decision
    pass uses predict_all_modes; re-generating all 35 stacks per
    wavefront leaf would waste ~30x the prediction work).

    adi: int32 [n, 4S+1]; mode: int32 [n].  Returns int32 [n, S, S].
    Bit-exact vs predict_all_modes + take (asserted in tests).
    """
    s = size
    log2 = int(np.log2(s))
    corner = 2 * s
    n = adi.shape[0]
    adi_f = filter_refs(adi, s, strong and is_luma)

    top = adi[..., corner + 1: corner + 1 + s]
    # contiguous slice + flip (the fancy-index form lowered to one
    # tiny gather per element on TPU — ~1.3k ops/frame in the fallback)
    left = jnp.flip(adi[..., s:2 * s], -1)
    top_f = adi_f[..., corner + 1: corner + 1 + s]
    left_f = jnp.flip(adi_f[..., s:2 * s], -1)
    col = jnp.arange(s, dtype=jnp.int32)
    row = col[:, None]

    # --- planar
    use_f = bool(_filter_flags(s, is_luma)[PLANAR])
    t = top_f if use_f else top
    l = left_f if use_f else left
    tr = (adi_f if use_f else adi)[..., corner + 1 + s]
    bl = (adi_f if use_f else adi)[..., s - 1]
    planar = ((s - 1 - col)[None, :] * l[..., :, None]
              + (col + 1)[None, :] * tr[..., None, None]
              + (s - 1 - col)[:, None] * t[..., None, :]
              + (row + 1) * bl[..., None, None]
              + s) >> (log2 + 1)

    # --- DC
    dc_val = (jnp.sum(top, -1) + jnp.sum(left, -1) + s) >> (log2 + 1)
    dc = jnp.broadcast_to(dc_val[..., None, None], (n, s, s))
    if is_luma and s < 32:
        dc_row0 = (top + 3 * dc_val[..., None] + 2) >> 2
        dc_col0 = (left + 3 * dc_val[..., None] + 2) >> 2
        dc_corner = (left[..., 0] + 2 * dc_val + top[..., 0] + 2) >> 2
        dc = dc.at[..., 0, :].set(dc_row0)
        dc = dc.at[..., :, 0].set(dc_col0)
        dc = dc.at[..., 0, 0].set(dc_corner)

    # --- angular (one mode per block)
    src_idx, fact_np = _angular_tables(s)
    flags = _filter_flags(s, is_luma)
    m = jnp.clip(mode - 2, 0, 32)                       # [n]
    oh_m = jax.nn.one_hot(m, 33, dtype=jnp.float32)     # [n, 33]
    # one-hot row select (facts <= 31, bf16-exact); the row-gather
    # form lowered to ~1.3k tiny per-element ops per frame
    fact = jnp.einsum("nm,ms->ns", oh_m,
                      jnp.asarray(fact_np, jnp.float32),
                      precision=jax.lax.Precision.DEFAULT) \
        .astype(jnp.int32)[:, :, None]                  # [n, S, 1]
    if _matmul_taps_ok(n, s):
        # all 33 modes' taps on the MXU, then a tiny one-hot
        # contraction picks each block's mode (the per-block gather
        # over the small adi dim was dispatch-bound, see
        # _angular_selection_matrix)
        t_all = _angular_taps_matmul(adi, adi_f, s, is_luma) \
            .reshape(n, 33, s * s * 2).astype(jnp.float32)
        oh = jax.nn.one_hot(m, 33, dtype=jnp.float32)
        taps = jnp.einsum("bmo,bm->bo", t_all, oh) \
            .astype(jnp.int32).reshape(n, s, s, 2)
    else:
        src = jnp.asarray(src_idx)[m]                    # [n, S, S, 2]
        use_filt = jnp.asarray(flags[2:].astype(np.int32))[m]  # [n]
        adi_m = jnp.where(use_filt[:, None] > 0, adi_f, adi)
        taps = jnp.take_along_axis(
            adi_m, src.reshape(n, -1), axis=-1).reshape(n, s, s, 2)
    ang = ((32 - fact) * taps[..., 0] + fact * taps[..., 1] + 16) >> 5

    # pure hor/ver edge filter (luma, size < 32): in the generation
    # domain the filter writes column 0
    if is_luma and s < 32:
        maxv = (1 << bit_depth) - 1
        cor = adi[..., corner]
        v26 = jnp.clip(top[..., 0][..., None]
                       + ((left - cor[..., None]) >> 1), 0, maxv)
        v10 = jnp.clip(left[..., 0][..., None]
                       + ((top - cor[..., None]) >> 1), 0, maxv)
        edge = jnp.where((mode == 26)[:, None], v26,
                         jnp.where((mode == 10)[:, None], v10,
                                   ang[..., :, 0]))
        ang = ang.at[..., :, 0].set(edge)

    # horizontal modes (2..17) are generated transposed; swap back
    ang = jnp.where((mode < 18)[:, None, None],
                    jnp.swapaxes(ang, -1, -2), ang)

    return jnp.where((mode == PLANAR)[:, None, None], planar,
                     jnp.where((mode == DC)[:, None, None], dc, ang))


def predict_all_modes(adi: jnp.ndarray, size: int, is_luma: bool,
                      bit_depth: int = 8,
                      strong: bool = False) -> jnp.ndarray:
    """All 35 intra predictions from a substituted adi vector.

    adi: int32 [..., 4S+1] (unfiltered; smoothing applied internally
    per-mode).  Returns int32 [..., 35, S, S].
    """
    s = size
    log2 = int(np.log2(s))
    corner = 2 * s
    adi_f = filter_refs(adi, s, strong and is_luma)

    top = adi[..., corner + 1: corner + 1 + s]          # p(-1, 0..S-1)
    left = jnp.flip(adi[..., s:2 * s], -1)               # p(0..S-1, -1)
    top_f = adi_f[..., corner + 1: corner + 1 + s]
    left_f = jnp.flip(adi_f[..., s:2 * s], -1)

    batch = adi.shape[:-1]
    col = jnp.arange(s, dtype=jnp.int32)
    row = col[:, None]

    # --- Planar (spec 8.4.4.2.4) — uses filtered refs for sizes >= 8.
    use_f = bool(_filter_flags(s, is_luma)[PLANAR])
    t = top_f if use_f else top
    l = left_f if use_f else left
    tr = (adi_f if use_f else adi)[..., corner + 1 + s]     # p(-1, S)
    bl = (adi_f if use_f else adi)[..., s - 1]              # p(S, -1)
    planar = ((s - 1 - col)[None, :] * l[..., :, None]
              + (col + 1)[None, :] * tr[..., None, None]
              + (s - 1 - col)[:, None] * t[..., None, :]
              + (row + 1) * bl[..., None, None]
              + s) >> (log2 + 1)

    # --- DC (spec 8.4.4.2.5) — always unfiltered refs.
    dc_val = (jnp.sum(top, axis=-1) + jnp.sum(left, axis=-1) + s) >> (log2 + 1)
    dc = jnp.broadcast_to(dc_val[..., None, None], batch + (s, s))
    if is_luma and s < 32:
        dc_row0 = (top + 3 * dc_val[..., None] + 2) >> 2
        dc_col0 = (left + 3 * dc_val[..., None] + 2) >> 2
        dc_corner = (left[..., 0] + 2 * dc_val + top[..., 0] + 2) >> 2
        dc = dc.at[..., 0, :].set(dc_row0)
        dc = dc.at[..., :, 0].set(dc_col0)
        dc = dc.at[..., 0, 0].set(dc_corner)

    # --- Angular 2..34 (spec 8.4.4.2.6) — the per-mode tap selection
    # (incl. the filtered/unfiltered choice) is a compile-time 0/1
    # matrix; one GEMM replaces 33*S*S*2 tiny dynamic-slices per block
    # (see _angular_selection_matrix).
    src_idx, fact_np = _angular_tables(s)
    flags = _filter_flags(s, is_luma)
    fact = jnp.asarray(fact_np)[:, :, None]               # [33,S,1]
    n_batch = int(np.prod(batch)) if batch else 1
    if _matmul_taps_ok(n_batch, s):
        taps = _angular_taps_matmul(adi, adi_f, s, is_luma) \
            .reshape(batch + (33, s, s, 2))
    else:
        adi_stack = jnp.stack([adi, adi_f], axis=-2)     # [...,2,4S+1]
        sel = jnp.asarray(flags[2:].astype(np.int32))     # [33]
        src = jnp.asarray(src_idx)                        # [33,S,S,2]

        def gather_mode(adi2):
            # adi2: [2, 4S+1] -> taps [33, S, S, 2]
            per_mode = adi2[sel]                          # [33, 4S+1]
            return jnp.take_along_axis(
                per_mode, src.reshape(33, -1),
                axis=-1).reshape(33, s, s, 2)

        flat = adi_stack.reshape((-1, 2, 4 * s + 1))
        taps = jax.vmap(gather_mode)(flat)
        taps = taps.reshape(batch + (33, s, s, 2))
    ang = ((32 - fact) * taps[..., 0] + fact * taps[..., 1] + 16) >> 5

    # Pure horizontal/vertical edge filter (luma, size < 32, spec
    # 8.4.4.2.6 final clause).  In each mode's generation domain the
    # filter lands on column 0:  pred[r][0] = main[0] + (side[r]-cor)>>1,
    # with (main, side) = (top, left) for mode 26 and swapped for the
    # transposed mode 10.
    if is_luma and s < 32:
        maxv = (1 << bit_depth) - 1
        cor = adi[..., corner]
        v26 = jnp.clip(top[..., 0][..., None]
                       + ((left - cor[..., None]) >> 1), 0, maxv)
        ang = ang.at[..., 26 - 2, :, 0].set(v26)
        v10 = jnp.clip(left[..., 0][..., None]
                       + ((top - cor[..., None]) >> 1), 0, maxv)
        ang = ang.at[..., 10 - 2, :, 0].set(v10)

    # Horizontal modes (2..17) were generated transposed; swap back.
    hor = jnp.swapaxes(ang[..., :16, :, :], -1, -2)
    ver = ang[..., 16:, :, :]
    ang_all = jnp.concatenate([hor, ver], axis=-3)

    return jnp.concatenate(
        [planar[..., None, :, :], dc[..., None, :, :], ang_all], axis=-3)
