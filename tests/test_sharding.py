"""Sharding must be bit-transparent (SURVEY.md §4): the same records
and reconstructions as the single-device path, for both parallel axes:

* GOP/frame sharding (parallel/gop.py — the n_enc_engines analogue)
* intra-frame CTU-row-band sharding (parallel/wpp.py — the WPP
  analogue), incl. its ICI all_gather assembly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from homerhevc_tpu.models import inter_frame, intra_frame
from homerhevc_tpu.parallel import gop, wpp


def _need8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def test_gop_sharding_bit_transparent():
    _need8()
    n = 8
    ys = np.stack([((np.mgrid[0:64, 0:64][0] * 3 + 11 * i) % 256)
                   .astype(np.uint8) for i in range(n)])
    us = np.stack([np.full((32, 32), 64 + i, np.uint8) for i in range(n)])
    vs = np.stack([np.full((32, 32), 190 - i, np.uint8)
                   for i in range(n)])
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("gop",))
    recs, avg = gop.encode_gop_jit(jnp.asarray(ys), jnp.asarray(us),
                                   jnp.asarray(vs), qp=32, mesh=mesh)
    for i in range(n):
        ref = intra_frame.encode_frame_jit(ys[i], us[i], vs[i], qp=32,
                                           cu=16, ctu=64,
                                           sign_hiding=True)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(recs[k][i]),
                                          np.asarray(ref[k]),
                                          err_msg=f"frame {i} field {k}")
    assert np.isfinite(float(avg))


def test_ippp_gop_sharding_bit_transparent():
    """Frame-parallel engines (IPPP closed-GOP shards) must byte-match
    the sequential per-GOP encode."""
    _need8()
    rng = np.random.default_rng(9)
    n_gops, g, h, w = 4, 3, 64, 128
    m = 16
    grid = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((grid[1] * 3 + grid[0] * 2) % 235)
                   + rng.integers(0, 16, grid[0].shape), 0, 255) \
        .astype(np.uint8)
    ys = np.stack([np.stack([base[k:k + h, 3 * k + i:3 * k + i + w]
                             for k in range(g)])
                   for i in range(n_gops)])
    us = np.stack([np.stack([base[0:h // 2, i + k:i + k + w // 2]
                             for k in range(g)])
                   for i in range(n_gops)])
    vs = np.stack([np.stack([base[2:2 + h // 2, i + k:i + k + w // 2]
                             for k in range(g)])
                   for i in range(n_gops)])

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gop",))
    recs, avg = jax.jit(
        lambda y, u, v: gop.encode_ippp_gops(
            y, u, v, qp=30, mesh=mesh, sign_hiding=True,
            deblocking=True, sao_enabled=True, intra_fallback=False))(
        jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs))

    for i in range(n_gops):
        i_ref = intra_frame.encode_frame_jit(
            ys[i, 0], us[i, 0], vs[i, 0], qp=30, ctu=64,
            sign_hiding=True, deblocking=True, sao_enabled=True)
        p_ref = inter_frame.encode_p_chunk_jit(
            ys[i, 1:], us[i, 1:], vs[i, 1:], i_ref["recon_y"],
            i_ref["recon_u"], i_ref["recon_v"], qp=30, block=16,
            sign_hiding=True, deblocking=True, sao_enabled=True,
            ctu=64, intra_fallback=False)
        np.testing.assert_array_equal(np.asarray(recs["i_packed"][i]),
                                      np.asarray(i_ref["packed"]),
                                      err_msg=f"gop {i} intra")
        np.testing.assert_array_equal(
            np.asarray(recs["p_packed"][i]),
            np.asarray(p_ref["packed"]), err_msg=f"gop {i} P")
    assert np.isfinite(float(avg))


def test_row_sharding_bit_transparent():
    _need8()
    rng = np.random.default_rng(3)
    h, w, m = 512, 128, 16          # 8 bands of 64 rows
    g = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 16, g[0].shape), 0, 255) \
        .astype(np.uint8)
    y0, u0 = base[:h, :w], base[:h // 2:, :w // 2][:h // 2]
    u0 = np.ascontiguousarray(base[0:h // 2, 0:w // 2])
    v0 = np.ascontiguousarray(base[4:4 + h // 2, 4:4 + w // 2])
    y1 = base[1:1 + h, 2:2 + w]
    u1 = np.ascontiguousarray(base[0:h // 2, 1:1 + w // 2])
    v1 = np.ascontiguousarray(base[4:4 + h // 2, 5:5 + w // 2])

    # reference = intra frame recon (deblocked)
    iframe = intra_frame.encode_frame_jit(
        y0, u0, v0, qp=30, cu=16, ctu=64, sign_hiding=True,
        deblocking=True)
    refs = (iframe["recon_y"], iframe["recon_u"], iframe["recon_v"])

    # vis_h/vis_w exercise the conformance-window padding weight on
    # both paths (the bottom band carries padded rows, every band a
    # padded block column)
    single = inter_frame.encode_p_frame_jit(
        y1, u1, v1, *refs, qp=30, block=16, sign_hiding=True,
        deblocking=True, sao_enabled=True, intra_fallback=False,
        vis_h=496, vis_w=112)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("row",))
    sharded = wpp.encode_p_frame_rowsharded(
        jnp.asarray(y1), jnp.asarray(u1), jnp.asarray(v1),
        *[jnp.asarray(r, jnp.int32) for r in refs], qp=30, mesh=mesh,
        block=16, sign_hiding=True, deblocking=True, sao_enabled=True,
        vis_h=496, vis_w=112)

    np.testing.assert_array_equal(np.asarray(sharded["recon_y"]),
                                  np.asarray(single["recon_y"]))
    np.testing.assert_array_equal(np.asarray(sharded["recon_u"]),
                                  np.asarray(single["recon_u"]))
    np.testing.assert_array_equal(np.asarray(sharded["recon_v"]),
                                  np.asarray(single["recon_v"]))
    np.testing.assert_array_equal(np.asarray(sharded["mv"]),
                                  np.asarray(single["mv"]))
    np.testing.assert_array_equal(np.asarray(sharded["packed"]),
                                  np.asarray(single["packed"]))


def test_row_sharding_fallback_multiref_bit_transparent():
    """Row sharding with intra fallback AND 2 references enabled must
    still match the single-device run bit-for-bit (VERDICT r3 item 5:
    fallback/multiref on the sharded path)."""
    _need8()
    rng = np.random.default_rng(9)
    h, w, m = 256, 128, 16          # 4 bands of 64 rows
    g = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 16, g[0].shape), 0, 255) \
        .astype(np.uint8)
    y0 = base[:h, :w]
    u0 = np.ascontiguousarray(base[0:h // 2, 0:w // 2])
    v0 = np.ascontiguousarray(base[4:4 + h // 2, 4:4 + w // 2])
    y1 = base[1:1 + h, 2:2 + w].copy()
    # an occluding patch the references don't contain -> fallback fires
    y1[96:160, 32:96] = rng.integers(0, 256, (64, 64), np.uint8)
    u1 = np.ascontiguousarray(base[0:h // 2, 1:1 + w // 2])
    v1 = np.ascontiguousarray(base[4:4 + h // 2, 5:5 + w // 2])

    iframe = intra_frame.encode_frame_jit(
        y0, u0, v0, qp=30, ctu=64, sign_hiding=True, deblocking=True)
    refs = (iframe["recon_y"], iframe["recon_u"], iframe["recon_v"])
    # second reference: a shifted copy of the intra recon
    ref2 = tuple(jnp.roll(r, 1, axis=1) for r in refs)

    kw = dict(qp=30, block=16, sign_hiding=True, deblocking=True,
              sao_enabled=True, intra_fallback=True,
              vis_h=240, vis_w=112)
    single = inter_frame.encode_p_frame_jit(
        y1, u1, v1, *refs, ref2_y=ref2[0], ref2_u=ref2[1],
        ref2_v=ref2[2], has_ref2=jnp.bool_(True), **kw)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("row",))
    sharded = wpp.encode_p_frame_rowsharded(
        jnp.asarray(y1), jnp.asarray(u1), jnp.asarray(v1),
        *[jnp.asarray(r, jnp.int32) for r in refs], mesh=mesh,
        ref2_y=ref2[0], ref2_u=ref2[1], ref2_v=ref2[2],
        has_ref2=jnp.bool_(True), **kw)

    for k in ("recon_y", "recon_u", "recon_v", "mv", "ref_idx",
              "packed", "packed_full"):
        np.testing.assert_array_equal(np.asarray(sharded[k]),
                                      np.asarray(single[k]), err_msg=k)
    # the occlusion must actually exercise the fallback (is_intra part
    # of the packed record: blocks 6*nb..7*nb)
    nb = (h // 16) * (w // 16)
    assert np.asarray(single["packed"])[6 * nb:7 * nb].sum() > 0
