"""Scalar golden model of the HEVC deblocking filter (spec 8.7.2).

Straight line-by-line transcription of the decoding-process text (the
same process the reference implements in hmr_deblocking_filter.c:274-627),
used as the oracle for the vectorized JAX kernel in ops/deblock.py.
Operates on one picture: all vertical edges first, then all horizontal
edges (spec edge-order; reference frame-level variant
hmr_deblocking_filter.c:802).
"""
from __future__ import annotations

import numpy as np

TC_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10,
     11, 13, 14, 16, 18, 20, 22, 24], dtype=np.int32)
BETA_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11,
     12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38,
     40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64], dtype=np.int32)


def _clip3(lo, hi, v):
    return max(lo, min(hi, v))


def _clip1(v):
    return max(0, min(255, v))


def _filter_luma_vertical_edge(y, x0, y0, bs, qp, beta_off=0, tc_off=0):
    """Filter one 4-line luma segment at vertical edge column x0,
    rows y0..y0+3 (spec 8.7.2.5.3 decision + 8.7.2.5.7 filtering)."""
    if bs <= 0:
        return
    q_idx = _clip3(0, 51, qp + (beta_off << 1))
    beta = int(BETA_TABLE[q_idx])
    t_idx = _clip3(0, 53, qp + 2 * (bs - 1) + (tc_off << 1))
    tc = int(TC_TABLE[t_idx])

    def p(i, line):
        return int(y[y0 + line, x0 - 1 - i])

    def q(i, line):
        return int(y[y0 + line, x0 + i])

    dp0 = abs(p(2, 0) - 2 * p(1, 0) + p(0, 0))
    dp3 = abs(p(2, 3) - 2 * p(1, 3) + p(0, 3))
    dq0 = abs(q(2, 0) - 2 * q(1, 0) + q(0, 0))
    dq3 = abs(q(2, 3) - 2 * q(1, 3) + q(0, 3))
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    dp = dp0 + dp3
    dq = dq0 + dq3
    d = dpq0 + dpq3
    if d >= beta:
        return

    def dsam(line, dpq):
        return (2 * dpq < (beta >> 2)
                and abs(p(3, line) - p(0, line))
                + abs(q(0, line) - q(3, line)) < (beta >> 3)
                and abs(p(0, line) - q(0, line)) < ((5 * tc + 1) >> 1))

    strong = dsam(0, dpq0) and dsam(3, dpq3)
    side_thresh = (beta + (beta >> 1)) >> 3
    dep1 = dp < side_thresh
    deq1 = dq < side_thresh

    for line in range(4):
        p3, p2, p1, p0 = p(3, line), p(2, line), p(1, line), p(0, line)
        q0, q1, q2, q3 = q(0, line), q(1, line), q(2, line), q(3, line)
        if strong:
            y[y0 + line, x0 - 1] = _clip3(
                p0 - 2 * tc, p0 + 2 * tc,
                (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
            y[y0 + line, x0 - 2] = _clip3(
                p1 - 2 * tc, p1 + 2 * tc, (p2 + p1 + p0 + q0 + 2) >> 2)
            y[y0 + line, x0 - 3] = _clip3(
                p2 - 2 * tc, p2 + 2 * tc,
                (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
            y[y0 + line, x0] = _clip3(
                q0 - 2 * tc, q0 + 2 * tc,
                (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
            y[y0 + line, x0 + 1] = _clip3(
                q1 - 2 * tc, q1 + 2 * tc, (p0 + q0 + q1 + q2 + 2) >> 2)
            y[y0 + line, x0 + 2] = _clip3(
                q2 - 2 * tc, q2 + 2 * tc,
                (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3)
        else:
            delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
            if abs(delta) < 10 * tc:
                delta = _clip3(-tc, tc, delta)
                y[y0 + line, x0 - 1] = _clip1(p0 + delta)
                y[y0 + line, x0] = _clip1(q0 - delta)
                if dep1:
                    dp1 = _clip3(-(tc >> 1), tc >> 1,
                                 (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1)
                    y[y0 + line, x0 - 2] = _clip1(p1 + dp1)
                if deq1:
                    dq1 = _clip3(-(tc >> 1), tc >> 1,
                                 (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1)
                    y[y0 + line, x0 + 1] = _clip1(q1 + dq1)


def _filter_chroma_vertical_edge(c, x0, y0, n_lines, bs, qp_c, tc_off=0):
    """Chroma filter (spec 8.7.2.5.5): bs==2 edges only, p0/q0 updated."""
    if bs < 2:
        return
    t_idx = _clip3(0, 53, qp_c + 2 + (tc_off << 1))
    tc = int(TC_TABLE[t_idx])
    for line in range(n_lines):
        p1 = int(c[y0 + line, x0 - 2])
        p0 = int(c[y0 + line, x0 - 1])
        q0 = int(c[y0 + line, x0])
        q1 = int(c[y0 + line, x0 + 1])
        delta = _clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
        c[y0 + line, x0] = _clip1(q0 - delta)
        c[y0 + line, x0 - 1] = _clip1(p0 + delta)


def deblock_luma(y, bs_v, bs_h, qp):
    """Filter a luma plane. bs_v: [H//4, W//8] boundary strengths for
    vertical edges (column j => edge at x=8j; j=0 is the picture edge
    and must be 0). bs_h: [H//8, W//4] for horizontal edges."""
    y = y.astype(np.int32).copy()
    h, w = y.shape
    for j in range(1, w // 8):
        for i in range(h // 4):
            _filter_luma_vertical_edge(y, 8 * j, 4 * i,
                                       int(bs_v[i, j]), qp)
    yt = np.ascontiguousarray(y.T)
    for j in range(1, h // 8):
        for i in range(w // 4):
            _filter_luma_vertical_edge(yt, 8 * j, 4 * i,
                                       int(bs_h[j, i]), qp)
    return np.ascontiguousarray(yt.T)


def deblock_chroma(c, bs_v, bs_h, qp_c):
    """Filter one chroma plane. bs_v: [Hc//2, Wc//8] (2-line segments,
    edge at xc=8j); bs_h: [Hc//8, Wc//2]."""
    c = c.astype(np.int32).copy()
    h, w = c.shape
    for j in range(1, w // 8):
        for i in range(h // 2):
            _filter_chroma_vertical_edge(c, 8 * j, 2 * i, 2,
                                         int(bs_v[i, j]), qp_c)
    ct = np.ascontiguousarray(c.T)
    for j in range(1, h // 8):
        for i in range(w // 2):
            _filter_chroma_vertical_edge(ct, 8 * j, 2 * i, 2,
                                         int(bs_h[j, i]), qp_c)
    return np.ascontiguousarray(ct.T)
