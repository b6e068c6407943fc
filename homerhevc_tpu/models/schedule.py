"""Static dependency scheduling for intra reconstruction wavefronts.

HEVC decodes CTUs in raster order and blocks within a CTU in z-order;
intra prediction of a block may reference reconstructed samples of its
left / top-left / top / top-right / bottom-left neighbours whenever
those precede it in coding order (spec 6.4.1).  The reference resolves
this with sequential WPP threads (ref: wfpp_encoder_thread,
hmr_encoder_lib.c:2357); the TPU-native design instead precomputes a
static parallel schedule: step[b] = longest dependency chain to block b,
then reconstructs all blocks of equal step in one batched kernel launch
(lax.scan over steps).

All functions are pure numpy executed once per (resolution, block size)
and cached; their outputs are compile-time constants of the jitted
frame program.
"""
from __future__ import annotations

import functools

import numpy as np

from homerhevc_tpu import tables


@functools.lru_cache(maxsize=None)
def coding_order(blocks_w: int, blocks_h: int, bpc: int) -> np.ndarray:
    """coding index of each block; bpc = blocks per CTU side."""
    z = tables.zscan_of_raster(bpc)
    by, bx = np.mgrid[0:blocks_h, 0:blocks_w]
    ctu_y, ctu_x = by // bpc, bx // bpc
    ctus_x = (blocks_w + bpc - 1) // bpc
    ctu_idx = ctu_y * ctus_x + ctu_x
    return ctu_idx * (bpc * bpc) + z[by % bpc, bx % bpc]


_NEIGHBORS = {
    "left": (-1, 0),
    "corner": (-1, -1),
    "top": (0, -1),
    "topright": (1, -1),
    "bottomleft": (-1, 1),
}


@functools.lru_cache(maxsize=None)
def availability(blocks_w: int, blocks_h: int, bpc: int):
    """Per-block availability of the 5 neighbour segments (bool maps)."""
    order = coding_order(blocks_w, blocks_h, bpc)
    out = {}
    for name, (dx, dy) in _NEIGHBORS.items():
        m = np.zeros((blocks_h, blocks_w), dtype=bool)
        for y in range(blocks_h):
            for x in range(blocks_w):
                nx, ny = x + dx, y + dy
                if 0 <= nx < blocks_w and 0 <= ny < blocks_h:
                    m[y, x] = order[ny, nx] < order[y, x]
        out[name] = m
    return out


@functools.lru_cache(maxsize=None)
def wavefront_schedule(blocks_w: int, blocks_h: int, bpc: int):
    """Longest-path levels over the intra dependency DAG.

    Returns (steps[bh, bw] int32, n_steps, batches) where batches is an
    int32 array [n_steps, max_batch, 2] of (by, bx) per step, padded
    with -1.
    """
    avail = availability(blocks_w, blocks_h, bpc)
    order = coding_order(blocks_w, blocks_h, bpc)
    # process blocks in coding order; deps guaranteed to precede
    idx_sorted = np.argsort(order, axis=None)
    steps = np.zeros((blocks_h, blocks_w), dtype=np.int32)
    for flat in idx_sorted:
        y, x = divmod(int(flat), blocks_w)
        s = 0
        for name, (dx, dy) in _NEIGHBORS.items():
            if avail[name][y, x]:
                s = max(s, steps[y + dy, x + dx] + 1)
        steps[y, x] = s
    n_steps = int(steps.max()) + 1
    max_batch = max(int((steps == s).sum()) for s in range(n_steps))
    batches = np.full((n_steps, max_batch, 2), -1, dtype=np.int32)
    for s in range(n_steps):
        ys, xs = np.nonzero(steps == s)
        batches[s, : len(ys), 0] = ys
        batches[s, : len(ys), 1] = xs
    return steps, n_steps, batches
