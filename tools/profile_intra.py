"""Decompose the all-intra 416x240 frame time: dense decision,
wavefront scan, SAO, device->host transfer, host entropy stage.

Run:  python tools/profile_intra.py [K]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                             # noqa: E402
import jax.numpy as jnp                                # noqa: E402

from bench import synthetic_video                      # noqa: E402
from homerhevc_tpu.api import Encoder                  # noqa: E402
from homerhevc_tpu.config import EncoderConfig         # noqa: E402
from homerhevc_tpu.models import intra_frame           # noqa: E402
from homerhevc_tpu import tables                       # noqa: E402


def sync(x):
    return float(np.asarray(jnp.sum(
        x if not isinstance(x, dict) else x["packed"])))


def timeit(label, fn, n=3):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:34s} {min(ts) * 1e3:8.1f} ms (min of {n})")
    return min(ts)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    h, w = 240, 416
    hp, wp = 256, 448        # CTU-padded
    ys, us, vs = synthetic_video(k, h, w)
    yb = np.zeros((k, hp, wp), np.uint8)
    ub = np.zeros((k, hp // 2, wp // 2), np.uint8)
    vb = np.zeros((k, hp // 2, wp // 2), np.uint8)
    for i in range(k):
        yb[i, :h, :w] = ys[i]
        ub[i, :h // 2, :w // 2] = us[i]
        vb[i, :h // 2, :w // 2] = vs[i]
    yj = jnp.asarray(yb)
    uj = jnp.asarray(ub)
    vj = jnp.asarray(vb)
    flags = dict(ctu=64, sign_hiding=True, deblocking=True,
                 sao_enabled=True, search_8x8=True, search_nxn=True)

    # full chunk
    f_full = jax.jit(lambda y, u, v: intra_frame.encode_i_chunk(
        y, u, v, qp=32, **flags))
    t_full = timeit("full chunk (K frames)", lambda: sync(f_full(yj, uj, vj)))

    # dense decision only
    def dense_only(y, u, v):
        def one(y1, u1, v1):
            qp = jnp.asarray(32, jnp.int32)
            lam = tables.rd_lambda(qp, True)
            qc = jnp.asarray(tables.CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]
            lamc = tables.rd_lambda(qc, True)
            d = intra_frame.dense_decision(
                y1.astype(jnp.int32), 64, jnp.sqrt(lam), True,
                u32=u1.astype(jnp.int32), v32=v1.astype(jnp.int32),
                sqrt_lam_c=jnp.sqrt(lamc), search_nxn=True)
            return sum(jnp.sum(x) for x in d.values())
        return jax.vmap(one)(y, u, v)
    f_dense = jax.jit(dense_only)
    timeit("dense decision only", lambda: sync(f_dense(yj, uj, vj)))

    # no SAO / no deblock
    f_nosao = jax.jit(lambda y, u, v: intra_frame.encode_i_chunk(
        y, u, v, qp=32, **{**flags, "sao_enabled": False,
                           "deblocking": False}))
    timeit("chunk w/o sao+deblock", lambda: sync(f_nosao(yj, uj, vj)))

    # no NxN
    f_nonxn = jax.jit(lambda y, u, v: intra_frame.encode_i_chunk(
        y, u, v, qp=32, **{**flags, "search_nxn": False}))
    timeit("chunk w/o NxN", lambda: sync(f_nonxn(yj, uj, vj)))

    # no 8x8 + no NxN
    f_no8 = jax.jit(lambda y, u, v: intra_frame.encode_i_chunk(
        y, u, v, qp=32, **{**flags, "search_nxn": False,
                           "search_8x8": False}))
    timeit("chunk w/o 8x8+NxN", lambda: sync(f_no8(yj, uj, vj)))

    # transfer cost: pull packed to host
    out = f_full(yj, uj, vj)
    sync(out)
    pk = out["packed"]
    print(f"packed bytes/frame: {pk.nbytes // k}")
    t0 = time.perf_counter()
    np.asarray(pk)
    t_tr = time.perf_counter() - t0
    print(f"{'transfer packed':34s} {t_tr * 1e3:8.1f} ms")

    # end-to-end through the API (incl. host entropy)
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=1,
                        sign_hiding=True, deblocking=True)
    enc = Encoder(cfg)
    for i in range(min(k, 4)):
        enc.encode_async(ys[i], us[i], vs[i])
    enc.flush()
    t0 = time.perf_counter()
    nbits = 0
    for i in range(k):
        for f in enc.encode_async(ys[i], us[i], vs[i]):
            nbits += f.bits
    for f in enc.flush():
        nbits += f.bits
    dt = time.perf_counter() - t0
    print(f"{'API end-to-end':34s} {dt * 1e3:8.1f} ms "
          f"({k / dt:.1f} fps, {nbits / k / 1000:.0f} kbit/frame)")
    print(f"device-only fps at K={k}: {k / t_full:.1f}")


if __name__ == "__main__":
    main()
