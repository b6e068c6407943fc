"""HEVC fractional-sample interpolation (spec 8.5.4.2.2) — batched JAX.

The reference computes 8-tap luma / 4-tap chroma separable filters per
block with SSE kernels (ref: hmr_motion_inter.c:241-950,
hmr_sse42_functions_inter_prediction.c); here each filter stage is a
dense matmul against a static band matrix, so both stages ride the MXU:

    out = B_v^T @ win @ B_h      (per block, batched over all blocks)

Bit-exactness: every intermediate of the 8-bit interpolation fits in
f32's exact-integer range (horizontal stage |sum| < 2^18, vertical
stage |sum| < 2^23), and the matmuls run at Precision.HIGHEST, so the
f32 pipeline reproduces the integer spec exactly (validated against
the scalar golden model in tests/test_interp.py).  Final shifts/rounds
are done in int32.

Dynamic per-block phases are handled by evaluating the static phases
and mask-accumulating — no gathers, no per-block control flow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# spec table 8-11 (luma, quarter phases) / 8-13 (chroma, eighth phases)
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int32)
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], dtype=np.int32)

# Matmul precision tiers (TPU: DEFAULT = 1-pass bf16, HIGH = 3-pass
# bf16 splitting, HIGHEST = 6-pass).  The 1-pass product of two values
# that are EXACT in bf16 (ints |v| <= 256, all filter taps) is exact;
# the 3-pass form is exact whenever ONE operand is bf16-exact and the
# other an int within f32 range (v = hi+lo splits exactly, and the
# dropped lo*lo term is zero).  So the 8-bit first filter stage runs
# 1-pass and the 18-bit second stage 3-pass, both bit-exact — verified
# ON DEVICE by me.pallas_selftest against the scalar int path.
_P8 = jax.lax.Precision.DEFAULT      # both operands bf16-exact
_P = jax.lax.Precision.HIGH          # one operand bf16-exact


@functools.lru_cache(maxsize=None)
def _band_np(phase: int, luma: bool, size: int, rows: int, off: int):
    """[rows, size] band matrix: column o carries the phase's taps at
    rows off+o .. off+o+taps-1."""
    coefs = LUMA_FILTERS[phase] if luma else CHROMA_FILTERS[phase]
    taps = len(coefs)
    assert off + size - 1 + taps <= rows, (off, size, taps, rows)
    m = np.zeros((rows, size), np.float32)
    for o in range(size):
        m[off + o:off + o + taps, o] = coefs
    return m


def fir_h(win: jnp.ndarray, fx: int, size: int, luma: bool,
          ox: int = 0) -> jnp.ndarray:
    """Horizontal stage only: [..., H, W] -> [..., H, size] (f32)."""
    w = win.shape[-1]
    mv = jnp.asarray(_band_np(fx, luma, size, w, ox))
    return jnp.einsum("...yx,xo->...yo", win.astype(jnp.float32), mv,
                      precision=_P8)


def fir_v(t: jnp.ndarray, fy: int, size: int, luma: bool,
          oy: int = 0) -> jnp.ndarray:
    """Vertical stage on the horizontal output: [..., H, size] ->
    [..., size, size] (f32, 64*64-scaled)."""
    h = t.shape[-2]
    mh = jnp.asarray(_band_np(fy, luma, size, h, oy))
    return jnp.einsum("...yo,yz->...zo", t, mh, precision=_P)


def fir2d(win: jnp.ndarray, fy: int, fx: int, size: int, luma: bool,
          oy: int = 0, ox: int = 0) -> jnp.ndarray:
    """Static-phase 2-D interpolation core (64*64-scaled, exact int in
    f32).  win: [..., H, W]; the filter support for output (0, 0) starts
    at window row oy / column ox."""
    return fir_v(fir_h(win, fx, size, luma, ox), fy, size, luma, oy)


def mc_separable_phases(win, fy_idx, fx_idx, size: int, luma: bool):
    """MC with per-block dynamic phases: each block's band matrix is
    assembled by a one-hot phase-select matmul, then the filtering is
    two MXU batched matmuls — instead of 2P masked static stages
    (dispatch-latency-bound on small tensors).

    win: [n, size+taps-1, size+taps-1] with the phase-0 support at
    (0, 0); fy_idx/fx_idx: [n] in 0..P-1."""
    phases = 4 if luma else 8
    wsz = win.shape[-1]
    b_all = jnp.asarray(np.stack([_band_np(p, luma, size, wsz, 0)
                                  for p in range(phases)]))  # [P, wsz, S]
    oh_x = jax.nn.one_hot(fx_idx, phases, dtype=jnp.float32)
    oh_y = jax.nn.one_hot(fy_idx, phases, dtype=jnp.float32)
    bh_n = jnp.einsum("np,pxo->nxo", oh_x, b_all, precision=_P8)
    bv_n = jnp.einsum("np,pyz->nyz", oh_y, b_all, precision=_P8)
    t = jnp.einsum("nyx,nxo->nyo", win.astype(jnp.float32), bh_n,
                   precision=_P8)
    return finish_uni(jnp.einsum("nyo,nyz->nzo", t, bv_n, precision=_P))


def finish_uni(pred64: jnp.ndarray) -> jnp.ndarray:
    """int32 (>>6) then spec 8.5.4.2.3 uni-prediction rounding."""
    p = pred64.astype(jnp.int32) >> 6
    return jnp.clip((p + 32) >> 6, 0, 255)


def mc_luma_static(win, fy: int, fx: int, size: int, oy=0, ox=0):
    return finish_uni(fir2d(win, fy, fx, size, True, oy, ox))


def mc_chroma_static(win, fy: int, fx: int, size: int, oy=0, ox=0):
    return finish_uni(fir2d(win, fy, fx, size, False, oy, ox))


def mc_chroma_phases(win3: jnp.ndarray, fy8: jnp.ndarray,
                     fx8: jnp.ndarray, size: int):
    """Chroma MC with per-block non-negative eighth-pel phases (the
    integer part already folded into the window base).

    win3: [n, size+3, size+3] whose (1, 1) sample is the integer
    position; fy8/fx8: [n] in 0..7."""
    return mc_separable_phases(win3, fy8, fx8, size, False)


def pad_reference(plane: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-replicate padding (reference picture border extension,
    ref hmr_encoder_lib.c:1420)."""
    return jnp.pad(plane, ((pad, pad), (pad, pad)), mode="edge")


# ---- per-block dynamic-phase scalar-style path (golden-test oracle
# cross-check; not used in the production pipeline) ----

def _hfilter(win, coef, taps, out_w):
    acc = coef[..., 0, None, None] * win[..., :, 0:out_w]
    for k in range(1, taps):
        acc = acc + coef[..., k, None, None] * win[..., :, k:k + out_w]
    return acc


def _vfilter(win, coef, taps, out_h):
    acc = coef[..., 0, None, None] * win[..., 0:out_h, :]
    for k in range(1, taps):
        acc = acc + coef[..., k, None, None] * win[..., k:k + out_h, :]
    return acc


def mc_luma(win, fx, fy, size):
    ch = jnp.asarray(LUMA_FILTERS)[fx]
    cv = jnp.asarray(LUMA_FILTERS)[fy]
    tmp = _hfilter(win, ch, 8, size)
    pred = _vfilter(tmp, cv, 8, size) >> 6
    return jnp.clip((pred + 32) >> 6, 0, 255)


def mc_chroma(win, fx, fy, size):
    ch = jnp.asarray(CHROMA_FILTERS)[fx]
    cv = jnp.asarray(CHROMA_FILTERS)[fy]
    tmp = _hfilter(win, ch, 4, size)
    pred = _vfilter(tmp, cv, 4, size) >> 6
    return jnp.clip((pred + 32) >> 6, 0, 255)
