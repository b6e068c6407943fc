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
