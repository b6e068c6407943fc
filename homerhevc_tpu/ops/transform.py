"""Bit-exact HEVC forward/inverse transforms as batched int32 matmuls.

TPU-native re-design of the reference's partial-butterfly transforms
(ref: hmr_transform.c:515-588).  The partial butterfly is just a fast CPU
factorization of the full matrix product; on TPU the full product
``T @ X @ T^T`` (with the spec's two-stage rounding shifts) maps directly
onto the MXU, batched over many transform blocks at once.

All functions take/return int32 arrays shaped [..., N, N] and are exact
per spec 8.6 (same rounding, shifts and int16 clamping as the scalar
reference code).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables

_CLIP_MIN = -32768
_CLIP_MAX = 32767


def _rshift_round(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return (x + (1 << (shift - 1))) >> shift


def _matrices(size: int, is_dst: bool) -> jnp.ndarray:
    t = tables.DST4 if is_dst else tables.dct_matrix(size)
    return jnp.asarray(t, dtype=jnp.int32)


def forward_transform(block: jnp.ndarray, size: int, is_dst: bool = False,
                      bit_depth: int = 8) -> jnp.ndarray:
    """Forward core transform, batched over leading dims.

    block: int32 [..., size, size] residual.
    Returns int32 [..., size, size] coefficients (vertical freq first axis),
    matching the reference's two-stage shifts: horizontal pass with
    shift1 = log2(size) - 1 + bd - 8, vertical pass with shift2 = log2 + 6.
    """
    log2 = int(np.log2(size))
    shift1 = log2 - 1 + bit_depth - 8
    shift2 = log2 + 6
    t = _matrices(size, is_dst)
    x = block.astype(jnp.int32)
    # Horizontal pass: rows of X against T rows -> X @ T^T.
    s1 = _rshift_round(
        jax.lax.dot_general(x, t.T, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32),
        shift1)
    # Vertical pass: T @ S1 over the row axis.
    s2 = _rshift_round(
        jnp.einsum("ki,...ij->...kj", t, s1,
                   preferred_element_type=jnp.int32),
        shift2)
    return s2


def inverse_transform(coeff: jnp.ndarray, size: int, is_dst: bool = False,
                      bit_depth: int = 8) -> jnp.ndarray:
    """Inverse core transform, batched; exact int16 clamping per stage."""
    t = _matrices(size, is_dst)
    c = coeff.astype(jnp.int32)
    shift1 = 7
    shift2 = 12 - (bit_depth - 8)
    # Vertical pass first: T^T @ C, clip to int16.
    s1 = jnp.clip(
        _rshift_round(
            jnp.einsum("ui,...uj->...ij", t, c,
                       preferred_element_type=jnp.int32),
            shift1),
        _CLIP_MIN, _CLIP_MAX)
    # Horizontal pass: S1 @ T, clip to int16.
    s2 = jnp.clip(
        _rshift_round(
            jax.lax.dot_general(s1, t, (((s1.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32),
            shift2),
        _CLIP_MIN, _CLIP_MAX)
    return s2
