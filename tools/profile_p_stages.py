"""Per-stage timing of the P path on the real device.

The tunneled device has a ~23 ms host sync floor and a non-blocking
block_until_ready, so each stage is timed as K queued dispatches
followed by ONE tiny readback; the floor is subtracted.

Run: python tools/profile_p_stages.py
"""
from __future__ import annotations

import sys
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import synthetic_video  # noqa: E402
from homerhevc_tpu.ops import me, packing  # noqa: E402
from homerhevc_tpu.models import inter_frame as pf  # noqa: E402
from homerhevc_tpu import tables  # noqa: E402

FLOOR = None


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure_floor():
    x = jnp.zeros((8, 8), jnp.int32)
    f = jax.jit(lambda a: a + 1)
    _sync(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(f, *args, k=8):
    global FLOOR
    if FLOOR is None:
        FLOOR = measure_floor()
    out = f(*args)
    _sync(out)                      # compile + settle
    t0 = time.perf_counter()
    for _ in range(k):
        out = f(*args)
    _sync(out)
    dt = time.perf_counter() - t0 - FLOOR
    return dt / k * 1000


def main():
    h, w = 768, 1280
    ys, us, vs = synthetic_video(2, 720, 1280)

    def pad(p, m=64):
        hh, ww = p.shape
        ph = (hh + m - 1) // m * m
        pw = (ww + m - 1) // m * m
        return np.pad(p, ((0, ph - hh), (0, pw - ww)), mode="edge")

    cur = jnp.asarray(pad(ys[1]), jnp.int32)
    ref = jnp.asarray(pad(ys[0]), jnp.int32)
    s = 16
    bh, bw = h // s, w // s
    sq = jnp.float32(5.0)

    print(f"sync floor: {FLOOR or measure_floor()*1000:.1f}", flush=True)
    t = timeit(jax.jit(lambda c, r: me.motion_estimate(
        c, r, sqrt_lam=sq)[0]), cur, ref)
    print(f"ME full:          {t:7.1f} ms", flush=True)
    t = timeit(jax.jit(lambda c, r: me.coarse_search(c, r, 16)),
               cur, ref)
    print(f"  coarse:         {t:7.1f} ms", flush=True)

    ref_pad = jnp.pad(ref, me.REF_PAD, mode="edge")
    pos_y = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * s, bw)
    pos_x = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * s, bh)
    cur_b = cur.reshape(bh, s, bw, s).transpose(0, 2, 1, 3) \
        .reshape(-1, s, s)
    mv0 = jnp.zeros((bh * bw, 2), jnp.int32)

    t = timeit(jax.jit(lambda cb, rp, mv: me.refine_search(
        cb, rp, pos_y, pos_x, mv, s)), cur_b, ref_pad, mv0)
    print(f"  refine(one):    {t:7.1f} ms", flush=True)
    t = timeit(jax.jit(lambda cb, rp, mv: me.subpel_search(
        cb, rp, pos_y, pos_x, mv, s, 2, 2,
        anchor=jnp.zeros((2,), jnp.int32), sqrt_lam=sq)[0]),
        cur_b, ref_pad, mv0)
    print(f"  subpel r2:      {t:7.1f} ms", flush=True)

    qp = jnp.full((bh * bw,), 32, jnp.int32)
    lam = tables.rd_lambda(qp, False).astype(jnp.float32)
    sbh = tuple(tables.scan_order(s, tables.SCAN_DIAG))
    mvg = jnp.zeros((bh, bw, 2), jnp.int32)
    pred = cur_b

    def mrd(cb, rp, mvg, pred):
        return pf._merge_skip_rd(cb, rp, pos_y, pos_x, mvg, pred,
                                 qp, lam, s, sbh)[1]
    t = timeit(jax.jit(mrd), cur_b, ref_pad, mvg, pred)
    print(f"merge RD round1:  {t:7.1f} ms", flush=True)

    def mrd2(cb, rp, mvg, pred):
        carry = None
        mv = mvg
        for _ in range(2):
            cands = pf.merge_candidate_fields(mv)
            mvf, lv, rc, ps, c16, carry = pf._merge_skip_rd(
                cb, rp, pos_y, pos_x, mvg, pred, qp, lam, s, sbh,
                cand_fields=cands, carry_in=carry)
            mv = mvf.reshape(bh, bw, 2)
        return lv
    t = timeit(jax.jit(mrd2), cur_b, ref_pad, mvg, pred)
    print(f"merge RD 2rnds:   {t:7.1f} ms", flush=True)

    lvl = jnp.zeros((bh * bw, s, s), jnp.int32)
    cost16 = jnp.zeros((bh * bw,), jnp.float32)
    ii = jnp.zeros((bh * bw,), jnp.int32)

    def qt(cb, ps, mv, lv, rc):
        return pf.quadtree_consolidate(cb, ps, mv, lv, rc, cost16, ii,
                                       qp, lam, bh, bw, True,
                                       ref_pad=ref_pad)[1]
    t = timeit(jax.jit(qt), cur_b, pred, mvg, lvl, cur_b)
    print(f"quadtree (maj):   {t:7.1f} ms", flush=True)

    def qt0(cb, ps, mv, lv, rc):
        return pf.quadtree_consolidate(cb, ps, mv, lv, rc, cost16, ii,
                                       qp, lam, bh, bw, True,
                                       ref_pad=None)[1]
    t = timeit(jax.jit(qt0), cur_b, pred, mvg, lvl, cur_b)
    print(f"quadtree (unif):  {t:7.1f} ms", flush=True)

    # packing
    t = timeit(jax.jit(lambda lv: packing.compact_blocks_i8(
        lv, *pf.p_caps(bh * bw)[0::2][:1], pf.p_caps(bh * bw)[2])),
        lvl)
    print(f"pack luma:        {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
