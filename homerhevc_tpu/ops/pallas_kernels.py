"""Pallas TPU kernels for hot encoder ops.

First resident: the quarter-resolution full-search SAD of the coarse
motion-estimation stage (ops/me._slab_search).  The XLA formulation
re-streams the downsampled planes from HBM for each of the 289 offsets;
this kernel pins both planes in VMEM once and runs the whole
offset loop (abs-diff -> MXU pooling matmul -> running argmin) on-chip.

The kernel is bit-equivalent to the jnp path (same visit order, strict
`<`, exact f32 integer sums) — asserted by tests/test_pallas.py in
interpreter mode, so CI needs no TPU.  The jnp path remains the CPU
fallback (interpret mode is too slow for per-frame use).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _pool_np(n: int, bs: int) -> np.ndarray:
    m = np.zeros((n, n // bs), np.float32)
    for i in range(n):
        m[i, i // bs] = 1.0
    return m


def _search_kernel(cur_ref, slab_ref, pr_ref, pc_ref, out_ref, *,
                   h: int, w: int, r: int):
    cur = cur_ref[0:h, 0:w].astype(jnp.float32)
    pr = pr_ref[:]                       # [h, bh]
    pc = pc_ref[:]                       # [w, bw]
    side = 2 * r + 1
    bh = pr.shape[1]
    bw = pc.shape[1]

    slab = slab_ref[:].astype(jnp.float32)

    def body(k, carry):
        best, besti = carry
        dy = k // side
        dx = k % side
        # dynamic unaligned slices are not expressible on the TPU tile
        # grid; a circular roll + static crop reads slab[dy:dy+h,
        # dx:dx+w] exactly (no wraparound reaches the crop)
        rolled = pltpu.roll(pltpu.roll(slab, -dy, 0), -dx, 1)
        sh = rolled[0:h, 0:w]
        d = jnp.abs(sh - cur)
        pooled = jnp.dot(pr.T, jnp.dot(d, pc,
                                       preferred_element_type=jnp.float32),
                         preferred_element_type=jnp.float32)
        pen = (jnp.abs(dy - r) + jnp.abs(dx - r)).astype(jnp.float32)
        sad = pooled + pen
        take = sad < best
        return (jnp.where(take, sad, best),
                jnp.where(take, k, besti))

    best0 = jnp.full((bh, bw), 3.0e38, jnp.float32)
    besti0 = jnp.zeros((bh, bw), jnp.int32)
    _, besti = jax.lax.fori_loop(0, side * side, body, (best0, besti0))
    out_ref[:] = besti


def slab_search_pallas(cur_s: jnp.ndarray, slab: jnp.ndarray, bs: int,
                       r: int, interpret: bool = False) -> jnp.ndarray:
    """Full-search best-offset indices for cur_s (int32 [h, w], blocks
    of bs) against slab (int32 [h+2r, w+2r]).  Returns [h//bs, w//bs]
    int32 flat offset indices (dy*(2r+1)+dx, both in 0..2r)."""
    h, w = cur_s.shape

    def up(n, m):
        return (n + m - 1) // m * m

    # Mosaic roll needs tile-aligned shapes: pad sublanes to 8, lanes
    # to 128 (padding never reaches the [0:h, 0:w] crop)
    sh_p = (up(slab.shape[0], 8), up(slab.shape[1], 128))
    slab_p = jnp.pad(slab, ((0, sh_p[0] - slab.shape[0]),
                            (0, sh_p[1] - slab.shape[1])))
    cur_p = jnp.pad(cur_s, ((0, up(h, 8) - h), (0, up(w, 128) - w)))
    pr = jnp.asarray(_pool_np(h, bs))
    pc = jnp.asarray(_pool_np(w, bs))
    kern = functools.partial(_search_kernel, h=h, w=w, r=r)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h // bs, w // bs), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cur_p, slab_p, pr, pc)
