"""Vectorized HEVC deblocking filter (spec 8.7.2).

TPU-native re-design of the reference's per-CTU trailing deblock pass
(ref: hmr_deblocking_filter.c:274-627, frame-level order :802): because
edges of one direction are 8 px apart and the filter touches at most 4
px per side, every edge of a direction is independent — so each pass is
one dense tensor program over the whole (padded) frame:

  * vertical pass: view the plane as [rows, n_edges, 8] windows around
    every 8-px column, compute all segment decisions and filtered
    samples at once, write back;
  * horizontal pass: same kernel on the transpose.

Boundary strengths arrive as dense per-segment tensors (computed by the
model from mode/cbf/MV maps, ref get_boundary_strength_single
hmr_deblocking_filter.c:138) — bs=0 disables an edge, so picture/slice
boundaries are simply bs=0 columns.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TC_TABLE = jnp.asarray(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10,
     11, 13, 14, 16, 18, 20, 22, 24], dtype=jnp.int32)
BETA_TABLE = jnp.asarray(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11,
     12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38,
     40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], dtype=jnp.int32)


def _lut(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Small-table lookup as a one-hot matmul (table values <= 64 are
    bf16-exact, one-hot is 0/1 -> 1-pass exact).  The gather form
    lowered to ~1.3k tiny per-element device ops per frame."""
    n = table.shape[0]
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)) \
        .astype(jnp.float32)
    return jnp.einsum("...n,n->...", oh, table.astype(jnp.float32),
                      precision=jax.lax.Precision.DEFAULT) \
        .astype(jnp.int32)


def _luma_pass(y: jnp.ndarray, bs: jnp.ndarray, qp) -> jnp.ndarray:
    """One direction of luma deblocking over vertical edges.

    y: [H, W] int32 (H % 4 == 0, W % 8 == 0).
    bs: [H//4, W//8] int32 per-4-line-segment boundary strength; column
      j is the edge at x = 8j (column 0 = picture edge, keep 0).
    qp: scalar or [H//4, W//8] per-segment average QP.
    """
    h, w = y.shape
    ne = w // 8 - 1
    g = h // 4
    bs = bs[:, 1:]                                     # drop picture edge
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (g, w // 8))[:, 1:]

    # windows [G, 4, nE, 8]: samples x = 8(j+1)-4 .. 8(j+1)+3
    win = y[:, 4:w - 4].reshape(g, 4, ne, 8)
    p = win[..., 3::-1]                                # p0..p3 = idx 0..3
    q = win[..., 4:]                                   # q0..q3

    beta = _lut(BETA_TABLE, jnp.clip(qp, 0, 51))       # [G, nE]
    tc = _lut(TC_TABLE, jnp.clip(qp + 2 * (bs - 1), 0, 53))

    def d2(v, line):
        return jnp.abs(v[:, line, :, 2] - 2 * v[:, line, :, 1]
                       + v[:, line, :, 0])

    dp0, dp3 = d2(p, 0), d2(p, 3)
    dq0, dq3 = d2(q, 0), d2(q, 3)
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    d = dpq0 + dpq3                                    # [G, nE]
    filt = (d < beta) & (bs > 0)

    def dsam(line, dpq):
        return ((2 * dpq < (beta >> 2))
                & (jnp.abs(p[:, line, :, 3] - p[:, line, :, 0])
                   + jnp.abs(q[:, line, :, 0] - q[:, line, :, 3])
                   < (beta >> 3))
                & (jnp.abs(p[:, line, :, 0] - q[:, line, :, 0])
                   < ((5 * tc + 1) >> 1)))

    strong = dsam(0, dpq0) & dsam(3, dpq3)             # [G, nE]
    side = (beta + (beta >> 1)) >> 3
    dep1 = (dp0 + dp3) < side
    deq1 = (dq0 + dq3) < side

    tc_l = tc[:, None, :]                              # per line [G,1,nE]
    p0, p1, p2, p3 = (p[..., 0], p[..., 1], p[..., 2], p[..., 3])
    q0, q1, q2, q3 = (q[..., 0], q[..., 1], q[..., 2], q[..., 3])

    # ---- strong filter (spec 8.7.2.5.7, nDp = nDq = 3)
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - 2 * tc_l, p0 + 2 * tc_l)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2,
                   p1 - 2 * tc_l, p1 + 2 * tc_l)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - 2 * tc_l, p2 + 2 * tc_l)
    sq0 = jnp.clip((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
                   q0 - 2 * tc_l, q0 + 2 * tc_l)
    sq1 = jnp.clip((p0 + q0 + q1 + q2 + 2) >> 2,
                   q1 - 2 * tc_l, q1 + 2 * tc_l)
    sq2 = jnp.clip((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3,
                   q2 - 2 * tc_l, q2 + 2 * tc_l)

    # ---- weak filter
    delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    wk_on = jnp.abs(delta0) < 10 * tc_l                # per line
    delta = jnp.clip(delta0, -tc_l, tc_l)
    wp0 = jnp.clip(p0 + delta, 0, 255)
    wq0 = jnp.clip(q0 - delta, 0, 255)
    tch = tc_l >> 1
    dp1v = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1, -tch, tch)
    wp1 = jnp.clip(p1 + dp1v, 0, 255)
    dq1v = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1, -tch, tch)
    wq1 = jnp.clip(q1 - (-dq1v), 0, 255)

    st = strong[:, None, :]
    fl = filt[:, None, :]
    w_on = fl & ~st & wk_on
    np0 = jnp.where(fl & st, sp0, jnp.where(w_on, wp0, p0))
    nq0 = jnp.where(fl & st, sq0, jnp.where(w_on, wq0, q0))
    np1 = jnp.where(fl & st, sp1,
                    jnp.where(w_on & dep1[:, None, :], wp1, p1))
    nq1 = jnp.where(fl & st, sq1,
                    jnp.where(w_on & deq1[:, None, :], wq1, q1))
    np2 = jnp.where(fl & st, sp2, p2)
    nq2 = jnp.where(fl & st, sq2, q2)

    new_win = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)
    return y.at[:, 4:w - 4].set(new_win.reshape(h, ne * 8))


def _chroma_pass(c: jnp.ndarray, bs: jnp.ndarray, qp_c) -> jnp.ndarray:
    """One direction of chroma deblocking (spec 8.7.2.5.5).

    c: [H, W] int32 (H % 2 == 0, W % 8 == 0).
    bs: [H//2, W//8] per-2-line-segment strength; only bs==2 filters.
    qp_c: scalar or per-segment chroma QP (already chroma-mapped).
    """
    h, w = c.shape
    ne = w // 8 - 1
    bs = bs[:, 1:]
    qp_c = jnp.broadcast_to(jnp.asarray(qp_c, jnp.int32),
                            (h // 2, w // 8))[:, 1:]
    tc = _lut(TC_TABLE, jnp.clip(qp_c + 2, 0, 53))     # [H/2, nE]
    tc_l = jnp.repeat(tc, 2, axis=0)                   # per line [H, nE]
    on = jnp.repeat(bs >= 2, 2, axis=0)

    win = c[:, 4:w - 4].reshape(h, ne, 8)
    p1, p0, q0, q1 = (win[..., 2], win[..., 3], win[..., 4], win[..., 5])
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc_l, tc_l)
    np0 = jnp.where(on, jnp.clip(p0 + delta, 0, 255), p0)
    nq0 = jnp.where(on, jnp.clip(q0 - delta, 0, 255), q0)
    new_win = win.at[..., 3].set(np0).at[..., 4].set(nq0)
    return c.at[:, 4:w - 4].set(new_win.reshape(h, ne * 8))


def deblock_luma(y, bs_v, bs_h, qp):
    """Full luma deblock: all vertical edges, then all horizontal."""
    y = _luma_pass(y, bs_v, qp)
    return _luma_pass(y.T, bs_h.T, jnp.asarray(qp, jnp.int32).T
                      if jnp.ndim(qp) == 2 else qp).T


def deblock_chroma(c, bs_v, bs_h, qp_c):
    c = _chroma_pass(c, bs_v, qp_c)
    return _chroma_pass(c.T, bs_h.T, jnp.asarray(qp_c, jnp.int32).T
                        if jnp.ndim(qp_c) == 2 else qp_c).T


def uniform_intra_bs(h: int, w: int, tu: int):
    """Boundary-strength maps for an all-intra frame with uniform TU
    size (BS=2 at every TU boundary, ref hmr_deblocking_filter.c:166).

    Returns (bs_v [h//4, w//8], bs_h [h//8, w//4]) numpy int32.
    """
    bs_v = np.zeros((h // 4, w // 8), np.int32)
    step = tu // 8
    bs_v[:, step::step] = 2
    bs_h = np.zeros((h // 8, w // 4), np.int32)
    bs_h[step::step, :] = 2
    return bs_v, bs_h


def uniform_intra_bs_chroma(hc: int, wc: int, tu_c: int):
    """Chroma BS maps ([hc//2, wc//8], [hc//8, wc//2])."""
    bs_v = np.zeros((hc // 2, wc // 8), np.int32)
    step = tu_c // 8
    if step >= 1:
        bs_v[:, step::step] = 2
    bs_h = np.zeros((hc // 8, wc // 2), np.int32)
    if step >= 1:
        bs_h[step::step, :] = 2
    return bs_v, bs_h
