"""Intra-frame row-band sharding across chips (the WPP replacement).

The reference's WPP threads own interleaved CTU rows with a 2-CTU
diagonal lag (ref: wfpp_encoder_thread hmr_encoder_lib.c:2357); on TPU
the P-frame pipeline has NO intra-frame sequencing, so CTU-row bands
shard cleanly over the chip mesh.  The band-local body IS
`models.inter_frame.encode_p_frame` itself (axis_name mode): each chip
encodes a contiguous band against the replicated reference; the few
cross-band points (global ME median, merge neighbour fields, the intra
fallback, effective-QP chain, deblock H, SAO, packing) use ICI
all_gathers or replicated compute.

Bit-transparency: the sharded program produces exactly the
single-device `encode_p_frame` outputs (asserted in
tests/test_sharding.py) — sharding never changes the bitstream.

This module is a thin shard_map wrapper; the production Encoder routes
through `inter_frame.encode_p_chunk(mesh=...)` (api._dispatch_p_chunk),
which uses the same axis_name body per scanned frame.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from homerhevc_tpu.models import inter_frame


@functools.partial(
    jax.jit, static_argnames=("mesh", "row_axis", "block", "sign_hiding",
                              "deblocking", "sao_enabled", "ctu",
                              "chroma_rd_scale", "chroma_qp_offset",
                              "scaling_lists", "vis_h", "vis_w",
                              "intra_fallback", "me_precision",
                              "me_subpel_r", "merge_rounds",
                              "fallback_rounds", "quadtree_majority",
                              "inter_nxn"))
def encode_p_frame_rowsharded(y, u, v, ref_y, ref_u, ref_v, *, qp,
                              mesh: Mesh, row_axis: str = "row",
                              block: int = 16, sign_hiding: bool = True,
                              deblocking: bool = True,
                              sao_enabled: bool = True, ctu: int = 64,
                              chroma_rd_scale: float = 1.0,
                              chroma_qp_offset: int = 0,
                              scaling_lists: bool = False,
                              vis_h: int = None, vis_w: int = None,
                              intra_fallback: bool = False,
                              me_precision: int = 2,
                              me_subpel_r: int = 2,
                              merge_rounds: int = 2,
                              fallback_rounds: int = 2,
                              quadtree_majority: bool = True,
                              inter_nxn: bool = False,
                              ref2_y=None, ref2_u=None, ref2_v=None,
                              has_ref2=None):
    """P-frame encode with CTU-row bands sharded over mesh[row_axis];
    supports intra fallback and multi-reference (ref2_*), matching the
    single-device encode_p_frame bit-for-bit."""
    h, w = y.shape
    n = mesh.shape[row_axis]
    assert (h // n) % ctu == 0, "band height must be CTU-aligned"
    multi = ref2_y is not None
    kw = dict(block=block, sign_hiding=sign_hiding,
              deblocking=deblocking, sao_enabled=sao_enabled, ctu=ctu,
              chroma_rd_scale=chroma_rd_scale,
              chroma_qp_offset=chroma_qp_offset,
              scaling_lists=scaling_lists, vis_h=vis_h, vis_w=vis_w,
              intra_fallback=intra_fallback, me_precision=me_precision,
              me_subpel_r=me_subpel_r, merge_rounds=merge_rounds,
              fallback_rounds=fallback_rounds,
              quadtree_majority=quadtree_majority,
              inter_nxn=inter_nxn,
              axis_name=row_axis, n_bands=n)

    args = [jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            jnp.asarray(ref_y, jnp.int32), jnp.asarray(ref_u, jnp.int32),
            jnp.asarray(ref_v, jnp.int32), jnp.asarray(qp, jnp.int32)]
    band = P(row_axis)
    rep = P()
    specs = [band, band, band, rep, rep, rep, rep]
    if multi:
        args += [jnp.asarray(ref2_y, jnp.int32),
                 jnp.asarray(ref2_u, jnp.int32),
                 jnp.asarray(ref2_v, jnp.int32),
                 jnp.bool_(True) if has_ref2 is None
                 else jnp.asarray(has_ref2)]
        specs += [rep, rep, rep, rep]
    keys = ["recon_y", "recon_u", "recon_v", "mv", "packed",
            "packed_full", "coeff_y", "coeff_cb", "coeff_cr"]
    if multi:
        keys.append("ref_idx")

    def local(y_b, u_b, v_b, ry, ru, rv, qp_, *rest):
        kw2 = dict(kw)
        if multi:
            kw2.update(ref2_y=rest[0], ref2_u=rest[1], ref2_v=rest[2],
                       has_ref2=rest[3])
        out = inter_frame.encode_p_frame(y_b, u_b, v_b, ry, ru, rv,
                                         qp=qp_, **kw2)
        return {k: out[k] for k in keys}

    fn = shard_map(local, mesh=mesh, in_specs=tuple(specs),
                   out_specs={k: rep for k in keys},
                   check_vma=False)
    return fn(*args)
