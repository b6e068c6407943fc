"""Capture a jax.profiler trace of the P-chunk device program.

Writes a TensorBoard trace under /tmp/hevc_trace; the .xplane.pb is
parsed with tensorflow's profiler tooling if available, otherwise use
tools/xplane_top.py to list the top ops by self-time.

Run: python tools/trace_p.py [k]
"""
from __future__ import annotations

import sys
import pathlib
import time

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import synthetic_video  # noqa: E402
from homerhevc_tpu.models import inter_frame  # noqa: E402

TRACE_DIR = "/tmp/hevc_trace"


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w = 720, 1280
    ys, us, vs = synthetic_video(k + 1, h, w)

    def pad(p, m):
        hh, ww = p.shape
        return np.pad(p, ((0, -hh % m), (0, -ww % m)), mode="edge")

    buf = np.concatenate(
        [np.asarray(p, np.uint8).ravel()
         for ps in (ys[1:], us[1:], vs[1:]) for p in ps])
    ry = pad(ys[0], 64).astype(np.int32)
    ru = pad(us[0], 32).astype(np.int32)
    rv = pad(vs[0], 32).astype(np.int32)

    kw = dict(k=k, qp=32, block=16, vis_h=h, vis_w=w, ctu=64,
              sign_hiding=True, deblocking=True, sao_enabled=True,
              intra_fallback=True, chroma_rd_scale=1.0,
              chroma_qp_offset=2, me_precision=2, scaling_lists=False,
              me_subpel_r=2, true_size=True)
    out = inter_frame.encode_p_chunk_packed_jit(buf, ry, ru, rv, **kw)
    np.asarray(out["packed"].ravel()[0])   # compile + settle

    with jax.profiler.trace(TRACE_DIR):
        t0 = time.perf_counter()
        for _ in range(4):
            out = inter_frame.encode_p_chunk_packed_jit(
                buf, ry, ru, rv, **kw)
        np.asarray(out["packed"].ravel()[0])
        dt = (time.perf_counter() - t0) / 4
    print(f"chunk k={k}: {dt*1000:.1f} ms -> {k/dt:.2f} fps (device)")
    print(f"trace in {TRACE_DIR}")


if __name__ == "__main__":
    main()
