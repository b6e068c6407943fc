"""Pallas TPU kernels for hot encoder ops.

Residents:

* gather_windows_pallas — per-block window gather (the encoder's
  universal primitive: ME refine/subpel windows, MC windows, chroma MC
  windows all read a [size, size] patch of a padded reference plane at
  per-block dynamic offsets).  The XLA lowering of
  vmap(dynamic_slice) costs ~5.5 ms per 3.6k-block call at 720p
  REGARDLESS of window size (it is gather-op-count-bound); this kernel
  issues the patches as batched async HBM->VMEM DMAs, which the DMA
  engines pipeline.  Replaces ops/me._gather_windows on TPU.

* slab_search_pallas — the quarter-resolution full-search SAD of the
  coarse motion-estimation stage (ops/me._slab_search).  The XLA
  formulation re-streams the downsampled planes from HBM for each of
  the 289 offsets; this kernel pins both planes in VMEM once and runs
  the whole offset loop (abs-diff -> MXU pooling matmul -> running
  argmin) on-chip.  (Parked on a Mosaic miscompile; see ops/me.py.)

Kernels are bit-equivalent to the jnp paths — asserted by
tests/test_pallas.py in interpreter mode, so CI needs no TPU.  The jnp
paths remain the CPU fallback (interpret mode is too slow for
per-frame use).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# blocks gathered per grid step (one DMA semaphore each; the step's
# DMAs are all in flight together before the first wait)
_GATHER_CHUNK = 64
_LANES = 256      # superwindow lanes: 128-aligned origin + size<=128


def _gsizes(size: int):
    """(aligned output size S, superwindow rows) for a window size.
    DMA slices must be tile-aligned in BOTH offset and shape (Mosaic
    tiling (8, 128)), so the kernel copies rows [y&~7, y&~7+ROWS) and
    lanes [x&~127, x&~127+256): ROWS covers the 0..7 row phase plus
    the window; 256 lanes cover the 0..127 lane phase plus size<=128.
    ROWS is padded to a POWER OF TWO: the dynamic sublane roll the
    kernel extracts phases with miscompiles on this toolchain for
    non-power-of-2 sublane counts (verified 2026-08: 24/40/80/88 roll
    wrong on hardware, 16/32/64/128 correct; caught by
    me.pallas_selftest)."""
    s_out = (size + 7) // 8 * 8
    need = size + 7
    rows = 8
    while rows < need:
        rows *= 2
    return s_out, rows


def _gather_kernel(by_ref, bx_ref, ref_hbm, out_ref, scratch, sems, *,
                   chunk: int, rows: int, s_out: int, nsteps: int):
    i = pl.program_id(0)

    def dma(j):
        k = i * chunk + j
        y0 = by_ref[k] // 8 * 8
        x0 = bx_ref[k] // 128 * 128
        return pltpu.make_async_copy(
            ref_hbm.at[pl.ds(y0, rows), pl.ds(x0, _LANES)],
            scratch.at[j], sems.at[j])

    for j in range(chunk):
        dma(j).start()
    for j in range(chunk):
        dma(j).wait()
    # phase extraction via dynamic VPU rolls (1.8x the one-hot-matmul
    # extract this replaced: the f32-HIGHEST dot_generals paid the
    # multi-pass MXU emulation for what is a pure lane/sublane shift)
    for j in range(chunk):
        k = i * chunk + j
        r = pltpu.roll(pltpu.roll(scratch[j], -(by_ref[k] % 8), 0),
                       -(bx_ref[k] % 128), 1)
        out_ref[j] = r[:s_out, :s_out]


def gather_windows_pallas(ref_pad: jnp.ndarray, base_y: jnp.ndarray,
                          base_x: jnp.ndarray, size: int,
                          interpret: bool = False) -> jnp.ndarray:
    """[n, size, size] windows of ref_pad (int32 [Hp, Wp]) at int32
    per-window origins (base_y, base_x) [n].  Origins are clamped to
    the plane (the jnp path's dynamic_slice semantics)."""
    assert size <= 128
    n = base_y.shape[0]
    hp, wp = ref_pad.shape
    chunk = _GATHER_CHUNK
    s_out, rows = _gsizes(size)
    n_pad = (n + chunk - 1) // chunk * chunk
    by = jnp.pad(jnp.clip(base_y, 0, hp - size), (0, n_pad - n))
    bx = jnp.pad(jnp.clip(base_x, 0, wp - size), (0, n_pad - n))
    # superwindows read past the clamped origin; zero-pad the plane so
    # the overhang exists (the junk lands in lanes/rows >= size, which
    # the final slice drops)
    refp = jnp.pad(ref_pad, ((0, rows), (0, _LANES)))
    nsteps = n_pad // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (chunk, s_out, s_out), lambda i, by, bx: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, rows, _LANES),
                                   ref_pad.dtype),
                        pltpu.SemaphoreType.DMA((chunk,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, chunk=chunk, rows=rows,
                          s_out=s_out, nsteps=nsteps),
        out_shape=jax.ShapeDtypeStruct((n_pad, s_out, s_out),
                                       ref_pad.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(by, bx, refp)
    return out[:n, :size, :size]


def _gather_ref_kernel(ri_ref, by_ref, bx_ref, ref_hbm, out_ref,
                       scratch, sems, *, chunk: int, rows: int,
                       s_out: int, nsteps: int):
    i = pl.program_id(0)

    def dma(j):
        k = i * chunk + j
        y0 = by_ref[k] // 8 * 8
        x0 = bx_ref[k] // 128 * 128
        return pltpu.make_async_copy(
            ref_hbm.at[ri_ref[k], pl.ds(y0, rows), pl.ds(x0, _LANES)],
            scratch.at[j], sems.at[j])

    for j in range(chunk):
        dma(j).start()
    for j in range(chunk):
        dma(j).wait()
    for j in range(chunk):
        k = i * chunk + j
        r = pltpu.roll(pltpu.roll(scratch[j], -(by_ref[k] % 8), 0),
                       -(bx_ref[k] % 128), 1)
        out_ref[j] = r[:s_out, :s_out]


def gather_windows_ref_pallas(ref_pads: jnp.ndarray,
                              ref_idx: jnp.ndarray,
                              base_y: jnp.ndarray, base_x: jnp.ndarray,
                              size: int,
                              interpret: bool = False) -> jnp.ndarray:
    """Multi-reference variant: ref_pads [R, Hp, Wp]; ref_idx [n] picks
    the plane per window (spec ref_idx_l0)."""
    assert size <= 128
    n = base_y.shape[0]
    _, hp, wp = ref_pads.shape
    chunk = _GATHER_CHUNK
    s_out, rows = _gsizes(size)
    n_pad = (n + chunk - 1) // chunk * chunk
    ri = jnp.pad(jnp.clip(ref_idx, 0, ref_pads.shape[0] - 1),
                 (0, n_pad - n))
    by = jnp.pad(jnp.clip(base_y, 0, hp - size), (0, n_pad - n))
    bx = jnp.pad(jnp.clip(base_x, 0, wp - size), (0, n_pad - n))
    refp = jnp.pad(ref_pads, ((0, 0), (0, rows), (0, _LANES)))
    nsteps = n_pad // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (chunk, s_out, s_out), lambda i, ri, by, bx: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, rows, _LANES),
                                   ref_pads.dtype),
                        pltpu.SemaphoreType.DMA((chunk,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_ref_kernel, chunk=chunk, rows=rows,
                          s_out=s_out, nsteps=nsteps),
        out_shape=jax.ShapeDtypeStruct((n_pad, s_out, s_out),
                                       ref_pads.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ri, by, bx, refp)
    return out[:n, :size, :size]


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
