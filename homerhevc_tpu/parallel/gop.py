"""GOP/frame-level sharding (TPU-native replacement for n_enc_engines).

The reference pipelines whole frames across N encoder-engine threads
(ref: encoder_engine_thread hmr_encoder_lib.c:2640, MAX_NUM_ENCODER_ENGINES
hmr_private.h:1187) and exchanges rate-control state between engines
(hmr_encoder_lib.c:2773-2784).  The TPU-native design shards a batch of
frames (a GOP, or several closed GOPs) over the device mesh with
`shard_map`; per-frame encoding runs the batched wavefront program
locally, and the engines' RC-state exchange becomes a `psum` of frame
distortions/bit estimates over the mesh axis.

For all-intra GOPs the frames are truly independent, so this sharding is
bit-transparent: the concatenated bitstream is identical to a 1-device
run (asserted in tests/test_sharding.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from homerhevc_tpu.models import intra_frame


def encode_gop(y, u, v, *, qp: int, mesh: Mesh, axis: str = "gop",
               cu: int = 16, ctu: int = 64, sign_hiding: bool = True):
    """Encode a stack of frames sharded over `mesh[axis]`.

    Args:
      y: uint8 [N, H, W]; u, v: uint8 [N, H/2, W/2]; N divisible by the
        mesh axis size.
    Returns:
      (records, stats): records is the FrameRecord dict with a leading
      frame axis (sharded over the mesh); stats carries the psum'd
      average distortion used as the engines' shared RC signal.
    """
    n = y.shape[0]
    nshard = mesh.shape[axis]
    assert n % nshard == 0, (n, nshard)

    def local(y_l, u_l, v_l):
        def one(args):
            yy, uu, vv = args
            out = intra_frame.encode_frame(
                yy, uu, vv, qp=qp, cu=cu, ctu=ctu, sign_hiding=sign_hiding)
            dist = jnp.sum(
                (out["recon_y"].astype(jnp.int32) - yy.astype(jnp.int32))
                ** 2)
            return out, dist

        outs, dists = jax.lax.map(one, (y_l, u_l, v_l))
        # engines' RC-state exchange (ref hmr_encoder_lib.c:2773) ->
        # collective average distortion over the mesh axis
        avg_dist = jax.lax.psum(jnp.sum(dists), axis) / jnp.float32(n)
        return outs, avg_dist

    spec = P(axis)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(
            jax.tree_util.tree_map(lambda _: spec, _out_struct()),
            P(),
        ),
        check_vma=False,
    )
    return fn(y, u, v)


def _out_struct():
    """Pytree skeleton matching intra_frame.encode_frame's output dict."""
    return dict(recon_y=0, recon_u=0, recon_v=0, coeff_y=0, coeff_cb=0,
                coeff_cr=0, modes=0, cmodes=0, cbf=0, depth=0, packed=0)


@functools.partial(jax.jit, static_argnames=("qp", "mesh", "axis", "cu",
                                             "ctu", "sign_hiding"))
def encode_gop_jit(y, u, v, *, qp, mesh, axis="gop", cu=16, ctu=64,
                   sign_hiding=True):
    return encode_gop(y, u, v, qp=qp, mesh=mesh, axis=axis, cu=cu, ctu=ctu,
                      sign_hiding=sign_hiding)


def encode_ippp_gops(y, u, v, *, qp: int, mesh: Mesh, axis: str = "gop",
                     ctu: int = 64, sign_hiding: bool = True,
                     deblocking: bool = True, sao_enabled: bool = True,
                     intra_fallback: bool = True,
                     chroma_qp_offset: int = 0, me_precision: int = 2):
    """Frame-parallel engines for the IPPP pipeline: each mesh shard
    encodes one CLOSED GOP (IDR + P...P) independently.

    This is the TPU reshape of the reference's n_enc_engines frame
    pipelining (ref encoder_engine_thread hmr_encoder_lib.c:2640-2896):
    closing the GOP at each shard boundary removes the cross-engine
    reference dependency entirely (SURVEY.md §7 "closed GOPs per host
    remove the inter-host reference dependency"), so N engines give N x
    throughput with zero reference traffic; the engines' RC-state
    exchange (ref :2773-2784) becomes a psum of per-GOP distortion.

    y: uint8 [n_gops, g, H, W] (CTU-padded), u/v chroma halves;
    n_gops divisible by the mesh axis size.  Returns (records, stats):
    records = dict(i_packed [n_gops, Li], p_packed [n_gops, g-1, Lp]),
    stats = psum'd mean distortion (the shared RC signal).
    """
    from homerhevc_tpu.models import inter_frame

    n_gops, g = y.shape[:2]
    nshard = mesh.shape[axis]
    assert n_gops % nshard == 0, (n_gops, nshard)

    def local(y_l, u_l, v_l):
        def one_gop(args):
            yy, uu, vv = args          # [g, H, W] one closed GOP
            i_out = intra_frame.encode_frame(
                yy[0], uu[0], vv[0], qp=qp, ctu=ctu,
                sign_hiding=sign_hiding, deblocking=deblocking,
                sao_enabled=sao_enabled,
                chroma_qp_offset=chroma_qp_offset)
            p_out = inter_frame.encode_p_chunk(
                yy[1:], uu[1:], vv[1:], i_out["recon_y"],
                i_out["recon_u"], i_out["recon_v"], qp=qp, block=16,
                sign_hiding=sign_hiding, deblocking=deblocking,
                sao_enabled=sao_enabled, ctu=ctu,
                intra_fallback=intra_fallback,
                chroma_qp_offset=chroma_qp_offset,
                me_precision=me_precision)
            dist = jnp.sum(
                (p_out["recon_y"] - yy[-1].astype(jnp.int32)) ** 2)
            return dict(i_packed=i_out["packed"],
                        p_packed=p_out["packed"]), dist

        outs, dists = jax.lax.map(one_gop, (y_l, u_l, v_l))
        avg_dist = jax.lax.psum(jnp.sum(dists), axis) \
            / jnp.float32(n_gops)
        return outs, avg_dist

    spec = P(axis)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(dict(i_packed=spec, p_packed=spec), P()),
        check_vma=False,
    )
    return fn(y, u, v)
