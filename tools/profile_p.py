"""Ablation profile of the P-frame chunk on the real device.

Times encode_p_chunk under feature toggles to attribute per-stage cost
(VERDICT round-3 item 1).  Run: python tools/profile_p.py
"""
from __future__ import annotations

import time

import jax
import numpy as np

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import synthetic_video  # noqa: E402
from homerhevc_tpu.models import inter_frame  # noqa: E402


def timeit(fn, *args, n=4, **kw):
    """Queued-dispatch timing: block_until_ready does not actually block
    on the tunneled device, so queue n dispatches and force ONE scalar
    readback at the end (23 ms sync floor subtracted)."""
    out = fn(*args, **kw)
    np.asarray(out["packed"].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    np.asarray(out["packed"].ravel()[0])
    return (time.perf_counter() - t0 - 0.024) / n


def main():
    h, w = 720, 1280
    k = 4
    ys, us, vs = synthetic_video(k + 1, h, w)

    def pad(p, m):
        hh, ww = p.shape
        ph = (hh + m - 1) // m * m
        pw = (ww + m - 1) // m * m
        return np.pad(p, ((0, ph - hh), (0, pw - ww)), mode="edge")

    yps = np.stack([pad(y, 64) for y in ys[1:]])
    ups = np.stack([pad(u, 32) for u in us[1:]])
    vps = np.stack([pad(v, 32) for v in vs[1:]])
    ry = pad(ys[0], 64).astype(np.int32)
    ru = pad(us[0], 32).astype(np.int32)
    rv = pad(vs[0], 32).astype(np.int32)

    base = dict(qp=32, block=16, vis_h=h, vis_w=w, sign_hiding=True,
                deblocking=True, sao_enabled=True, ctu=64,
                intra_fallback=True, chroma_rd_scale=1.0,
                chroma_qp_offset=2, me_precision=2, scaling_lists=False,
                me_subpel_r=2)

    def run(**over):
        kw = dict(base, **over)
        t = timeit(inter_frame.encode_p_chunk_jit, yps, ups, vps,
                   ry, ru, rv, **kw)
        return k / t, t

    fps, t = run()
    print(f"full pipeline:        {t*1000:7.1f} ms/chunk  {fps:6.2f} fps")
    for name, over in [
            ("no intra_fallback", dict(intra_fallback=False)),
            ("no sao", dict(sao_enabled=False)),
            ("no deblock", dict(deblocking=False)),
            ("no sbh", dict(sign_hiding=False)),
            ("merge_rounds=1", dict(merge_rounds=1)),
            ("quadtree_maj=False", dict(quadtree_majority=False)),
            ("fallback_rounds=1", dict(fallback_rounds=1)),
            ("no fb, no sao, no db", dict(intra_fallback=False,
                                          sao_enabled=False,
                                          deblocking=False)),
    ]:
        fps, t = run(**over)
        print(f"{name:21s} {t*1000:7.1f} ms/chunk  {fps:6.2f} fps")


if __name__ == "__main__":
    main()
