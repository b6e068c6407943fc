"""Scalar golden model of HEVC fractional interpolation + uni-prediction
(spec 8.5.4.2.2.1/8.5.4.2.2.2 and 8.5.4.2.3, 8-bit)."""
from __future__ import annotations

import numpy as np

from homerhevc_tpu.ops.interp import CHROMA_FILTERS, LUMA_FILTERS


def mc_luma_golden(ref: np.ndarray, x0: int, y0: int, mv_x: int, mv_y: int,
                   size: int) -> np.ndarray:
    """ref: padded int plane; (x0, y0) block origin in ref coords;
    mv in quarter-pel."""
    ix, fx = x0 + (mv_x >> 2), mv_x & 3
    iy, fy = y0 + (mv_y >> 2), mv_y & 3
    ch = LUMA_FILTERS[fx]
    cv = LUMA_FILTERS[fy]
    tmp = np.zeros((size + 7, size), np.int64)
    for y in range(size + 7):
        for x in range(size):
            tmp[y, x] = sum(int(ch[k]) * int(ref[iy + y - 3, ix + x - 3 + k])
                            for k in range(8))
    out = np.zeros((size, size), np.int64)
    for y in range(size):
        for x in range(size):
            acc = sum(int(cv[k]) * int(tmp[y + k, x]) for k in range(8))
            out[y, x] = acc >> 6
    return np.clip((out + 32) >> 6, 0, 255).astype(np.int32)


def mc_chroma_golden(ref: np.ndarray, x0: int, y0: int, mv_x: int, mv_y: int,
                     size: int) -> np.ndarray:
    """mv in eighth-pel (chroma units: luma quarter-pel value used
    directly since chroma coords are half of luma)."""
    ix, fx = x0 + (mv_x >> 3), mv_x & 7
    iy, fy = y0 + (mv_y >> 3), mv_y & 7
    ch = CHROMA_FILTERS[fx]
    cv = CHROMA_FILTERS[fy]
    tmp = np.zeros((size + 3, size), np.int64)
    for y in range(size + 3):
        for x in range(size):
            tmp[y, x] = sum(int(ch[k]) * int(ref[iy + y - 1, ix + x - 1 + k])
                            for k in range(4))
    out = np.zeros((size, size), np.int64)
    for y in range(size):
        for x in range(size):
            acc = sum(int(cv[k]) * int(tmp[y + k, x]) for k in range(4))
            out[y, x] = acc >> 6
    return np.clip((out + 32) >> 6, 0, 255).astype(np.int32)
