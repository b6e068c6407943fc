"""HEVC fractional-sample interpolation (spec 8.5.4.2.2) — batched JAX.

The reference computes 8-tap luma / 4-tap chroma separable filters per
block with SSE kernels (ref: hmr_motion_inter.c:241-950,
hmr_sse42_functions_inter_prediction.c); here each phase pair is a pair
of static 8-wide dot products over a gathered (S+7)x(S+7) window,
batched over all blocks of a frame — MXU/VPU-friendly dense math.

Bit-exactness (8-bit): shift1 = 0 (horizontal stage, 14-bit
intermediate), shift2 = 6 (vertical stage), final uni-prediction
rounding (spec 8.5.4.2.3) (pred + 32) >> 6 with Clip1.
"""
from __future__ import annotations

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

_LUMA_F = jnp.asarray(LUMA_FILTERS)
_CHROMA_F = jnp.asarray(CHROMA_FILTERS)


def _hfilter(win: jnp.ndarray, coef: jnp.ndarray, taps: int, out_w: int):
    """Horizontal FIR: win [..., H, out_w+taps-1] -> [..., H, out_w]."""
    acc = coef[..., 0, None, None] * win[..., :, 0:out_w]
    for k in range(1, taps):
        acc = acc + coef[..., k, None, None] * win[..., :, k:k + out_w]
    return acc


def _vfilter(win: jnp.ndarray, coef: jnp.ndarray, taps: int, out_h: int):
    acc = coef[..., 0, None, None] * win[..., 0:out_h, :]
    for k in range(1, taps):
        acc = acc + coef[..., k, None, None] * win[..., k:k + out_h, :]
    return acc


def mc_luma(win: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray, size: int):
    """Motion-compensate one (batch of) luma block(s).

    win: [..., size+7, size+7] int32 window whose (3, 3) sample is the
      integer-MV block origin; fx, fy: [...] quarter-pel phases 0..3.
    Returns uint8-range int32 [..., size, size] prediction.
    """
    ch = _LUMA_F[fx]                        # [..., 8]
    cv = _LUMA_F[fy]
    tmp = _hfilter(win, ch, 8, size)        # [..., size+7, size]
    pred = _vfilter(tmp, cv, 8, size)       # shift1=0, shift2 applied below
    # horizontal stage keeps 14-bit; vertical output needs >>6 only when
    # both stages ran — but with phase-0 coefficient rows ([...,64,...])
    # the unused stage contributes a clean x64, so the combined scaling
    # is uniformly 64*64 and one >>6 + final >>6 rounding is exact.
    pred = pred >> 6
    return jnp.clip((pred + 32) >> 6, 0, 255)


def mc_chroma(win: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
              size: int):
    """win: [..., size+3, size+3], origin at (1, 1); fx, fy eighth-pel
    phases 0..7."""
    ch = _CHROMA_F[fx]
    cv = _CHROMA_F[fy]
    tmp = _hfilter(win, ch, 4, size)
    pred = _vfilter(tmp, cv, 4, size) >> 6
    return jnp.clip((pred + 32) >> 6, 0, 255)


def pad_reference(plane: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-replicate padding (reference picture border extension,
    ref hmr_encoder_lib.c:1420)."""
    return jnp.pad(plane, ((pad, pad), (pad, pad)), mode="edge")
