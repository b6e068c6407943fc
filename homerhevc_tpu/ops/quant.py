"""Bit-exact HEVC quantization / dequantization (flat scaling lists).

TPU-native equivalent of the reference's scalar quant loops
(ref: hmr_quant.c:172-258).  Operates on batched int32 blocks
[..., N, N]; all shifts/rounds/clips match the spec with
scaling_list_enabled_flag = 0 (flat lists), which this framework signals
in its SPS.

Sign-bit hiding (ref: hmr_quant.c:61-169) is implemented as a vectorized
per-coefficient-group parity fix over scan-ordered coefficients.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from homerhevc_tpu import tables

_CLIP_MIN = -32768
_CLIP_MAX = 32767


def quant_params(qp, size: int, bit_depth: int = 8):
    """(per, rem, qbits, transform_shift) for a size x size TB.

    qp may be a Python int, a traced int32 scalar, or a PER-BLOCK
    tensor [...] (cu_qp_delta / per-CTU rate control) — all downstream
    arithmetic stays tensor-friendly, broadcasting against [..., N, N]
    coefficient blocks."""
    log2 = int(np.log2(size))
    qp = jnp.asarray(qp, jnp.int32)
    if qp.ndim > 0:
        qp = qp.reshape(qp.shape + (1, 1))    # broadcast over the TB
    per, rem = qp // 6, qp % 6
    transform_shift = tables.MAX_TR_DYNAMIC_RANGE - bit_depth - log2
    qbits = tables.QUANT_SHIFT + per + transform_shift
    return per, rem, qbits, transform_shift


@functools.lru_cache(maxsize=None)
def _q_matrices(size: int, is_intra: bool):
    """Per-rem quantization factor stacks [(6, N, N)] for the default
    scaling lists: Q = (quant_scale[rem] << 4) / m (integer division,
    ref init_quant_pyramids hmr_tables.c:222-251); flat m=16 reduces to
    the plain quant_scale."""
    m = tables.scaling_matrix(size, is_intra)
    q = (tables.QUANT_SCALES[:, None, None] << 4) // m[None]
    dq = tables.INV_QUANT_SCALES[:, None, None] * m[None]
    return q.astype(np.int32), dq.astype(np.int32)


def quantize(coeff: jnp.ndarray, qp, size: int, is_intra: bool = True,
             bit_depth: int = 8, scaling: bool = False):
    """Quantize coefficients; returns (levels int32 [..., N, N], delta_u).

    Rounding offset 171/512 for intra, 85/512 for inter (HM convention;
    the reference uses 171 unconditionally, hmr_quant.c:185 — an encoder
    choice, both conformant).  delta_u is the sign-bit-hiding residue.
    scaling=True applies the default scaling lists (ref signals them in
    its SPS, hmr_encoder_lib.c:1281).
    """
    per, rem, qbits, _ = quant_params(qp, size, bit_depth)
    if scaling:
        qmat = jnp.asarray(_q_matrices(size, is_intra)[0])
        q = qmat[rem[..., 0, 0]] if rem.ndim > 0 else qmat[rem]
    else:
        q = jnp.asarray(tables.QUANT_SCALES)[rem]
    add = jnp.int32(171 if is_intra else 85) << (qbits - 9)
    c = coeff.astype(jnp.int32)
    absc = jnp.abs(c)
    scaled = absc * q
    level = (scaled + add) >> qbits
    delta_u = (scaled - (level << qbits)) >> (qbits - 8)
    level = jnp.clip(jnp.sign(c) * level, _CLIP_MIN, _CLIP_MAX)
    return level, delta_u


def dequantize(level: jnp.ndarray, qp, size: int,
               bit_depth: int = 8, is_intra: bool = True,
               scaling: bool = False) -> jnp.ndarray:
    """Inverse quantization (spec 8.6.3), flat or default-list scaled."""
    per, rem, _, transform_shift = quant_params(qp, size, bit_depth)
    iq_shift = (tables.QUANT_IQUANT_SHIFT - tables.QUANT_SHIFT
                - transform_shift + 4)
    if scaling:
        dqm = jnp.asarray(_q_matrices(size, is_intra)[1])
        dq = dqm[rem[..., 0, 0]] if rem.ndim > 0 else dqm[rem]
    else:
        dq = jnp.asarray(tables.INV_QUANT_SCALES)[rem] * 16
    lv = level.astype(jnp.int32)
    # per is data-dependent under rate control: evaluate both the
    # rounded-downshift and upshift forms and select
    sh = jnp.maximum(iq_shift - per, 1)
    down = (lv * dq + (jnp.int32(1) << (sh - 1))) >> sh
    up = (lv * dq) << jnp.maximum(per - iq_shift, 0)
    out = jnp.where(per < iq_shift, down, up)
    return jnp.clip(out, _CLIP_MIN, _CLIP_MAX)


def sign_bit_hide(level: jnp.ndarray, delta_u: jnp.ndarray,
                  scan: np.ndarray, size: int) -> jnp.ndarray:
    """Sign-bit hiding over 4x4 coefficient groups (spec 8.6.3 encoder
    side; ref hmr_quant.c:61-169).

    level/delta_u: int32 [..., N, N]; scan: raster index per scan pos
    (tables.scan_order).  For each CG whose (last_nz - first_nz) >= 4 in
    scan order, if the parity of the absolute-level sum mismatches the
    sign of the first nonzero, adjust the coefficient with best delta_u
    cost by +/-1 (never the first-nz when decrementing it to zero would
    move first_nz, per the reference's exclusions).
    """
    n = size * size
    flat = level.reshape(level.shape[:-2] + (n,))
    du = delta_u.reshape(flat.shape)
    identity = tuple(scan) == tuple(range(n))
    if identity:
        # caller pre-permuted (e.g. per-block dynamic scans); skip the
        # permutation matmuls entirely
        sl, sdu = flat, du
    else:
        # scan reorder as a permutation matmul (values < 2^24, exact in
        # f32 at Precision.HIGHEST): gathers on tiny trailing dims are
        # the single most expensive op on TPU otherwise
        m = _perm_matrix(tuple(scan), n)
        sl = _permute(flat, m)
        sdu = _permute(du, m)
    ncg = n // 16
    slg = sl.reshape(sl.shape[:-1] + (ncg, 16))
    sdug = sdu.reshape(slg.shape)

    nz = slg != 0
    pos = jnp.arange(16, dtype=jnp.int32)
    big = jnp.int32(100)
    first = jnp.min(jnp.where(nz, pos, big), axis=-1)
    last = jnp.max(jnp.where(nz, pos, -1), axis=-1)
    any_nz = last >= 0
    hide_ok = any_nz & ((last - first) >= 4)

    abs_sum = jnp.sum(jnp.abs(slg), axis=-1)
    at_first = pos == jnp.minimum(first, 15)[..., None]
    first_level = jnp.sum(slg * at_first, axis=-1)
    sign_first = (first_level < 0).astype(jnp.int32)
    parity = (abs_sum & 1).astype(jnp.int32)
    need_fix = hide_ok & (parity != sign_first)

    # Candidate selection: MAXIMUM |delta_u| among positions in
    # [first, last] — the most under/over-quantized coefficient, where
    # the +/-1 magnitude change moves the value TOWARD the true
    # coefficient (minimum added distortion; HM xSignBitHidingHDQ
    # picks by the same residue criterion).  Magnitude-decrements that
    # would zero the first or last nonzero are excluded (they would
    # move the hiding window and could desync the decoder's hide
    # condition).
    in_range = (pos[None] >= first[..., None]) & (pos[None] <= last[..., None])
    is_edge = (pos[None] == first[..., None]) | (pos[None] == last[..., None])
    abs_lv = jnp.abs(slg)
    would_decrement = sdug <= 0
    illegal = is_edge & (abs_lv == 1) & would_decrement
    cost = jnp.where(in_range & ~illegal, jnp.abs(sdug), -big * 1000)
    best_pos = jnp.argmax(cost, axis=-1).astype(jnp.int32)

    # Apply a +/-1 magnitude change at best_pos: grow magnitude when the
    # quantization residue delta_u is positive, shrink otherwise, keeping
    # the coefficient's sign (zero levels become +1).
    at_best = pos == best_pos[..., None]
    best_du = jnp.sum(sdug * at_best, axis=-1)
    best_lv = jnp.sum(slg * at_best, axis=-1)
    mag_change = jnp.where(best_du > 0, 1, -1)
    signed_dir = jnp.where(best_lv >= 0, mag_change, -mag_change)
    delta = jnp.where(need_fix, signed_dir, 0)
    slg = slg + jnp.where(at_best, delta[..., None], 0)

    out_scan = slg.reshape(sl.shape)
    if identity:
        return out_scan.reshape(level.shape)
    return _permute(out_scan, m.T).reshape(level.shape)


@functools.lru_cache(maxsize=None)
def _perm_matrix_np(scan: tuple, n: int) -> np.ndarray:
    m = np.zeros((n, n), np.float32)
    for j, src in enumerate(scan):
        m[src, j] = 1.0
    return m


def _perm_matrix(scan: tuple, n: int) -> jnp.ndarray:
    return jnp.asarray(_perm_matrix_np(scan, n))


def _permute(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    # 0/1 permutation matrix (bf16-exact) x int levels -> the 3-pass
    # bf16 split is exact (device-gated by me.pallas_selftest)
    y = jnp.einsum("...i,ij->...j", x.astype(jnp.float32), m,
                   precision=jax.lax.Precision.HIGH)
    return y.astype(jnp.int32)
