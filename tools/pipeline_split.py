"""Attribute wall time per 4-frame P chunk: device compute vs host
(transfer + unpack + entropy).  Run: python tools/pipeline_split.py
"""
from __future__ import annotations

import sys
import pathlib
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import synthetic_video  # noqa: E402
from homerhevc_tpu.api import Encoder  # noqa: E402
from homerhevc_tpu.config import EncoderConfig  # noqa: E402


def main():
    h, w = 720, 1280
    k = 4
    ys, us, vs = synthetic_video(k + 2, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=100,
                        sign_hiding=True, deblocking=True)
    enc = Encoder(cfg)
    # warmup: I frame + one P chunk
    for i in range(1 + k):
        enc.encode_async(ys[i], us[i], vs[i])
    enc.flush()

    frames = [(ys[1 + j], us[1 + j], vs[1 + j]) for j in range(k)]

    # device-only: dispatch M chunks back-to-back, one readback at end
    M = 6
    pend = enc._dispatch_p_chunk(frames)
    np.asarray(pend["out"]["packed"].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(M):
        pend = enc._dispatch_p_chunk(frames)
    np.asarray(pend["out"]["packed"].ravel()[0])
    dev = (time.perf_counter() - t0) / M
    print(f"device compute / chunk: {dev*1000:7.1f} ms "
          f"({dev/k*1000:5.1f} ms/frame)", flush=True)

    # host-only: transfer + unpack + entropy on a ready pend
    pend = enc._dispatch_p_chunk(frames)
    np.asarray(pend["out"]["packed"].ravel()[0])
    t0 = time.perf_counter()
    enc._finalize(pend)
    host = time.perf_counter() - t0
    print(f"host finalize / chunk:  {host*1000:7.1f} ms "
          f"({host/k*1000:5.1f} ms/frame)", flush=True)

    # split host: transfer vs records vs entropy
    pend = enc._dispatch_p_chunk(frames)
    np.asarray(pend["out"]["packed"].ravel()[0])
    t0 = time.perf_counter()
    packed = np.asarray(pend["out"]["packed"])
    t1 = time.perf_counter()
    from homerhevc_tpu.entropy import binding
    recs = [rec for _, rec, _ in enc._records(packed, pend)]
    t2 = time.perf_counter()
    for rec in recs:
        binding.encode_slice(enc.ccfg, rec)
    t3 = time.perf_counter()
    print(f"  D2H pull:    {(t1-t0)*1000:7.1f} ms", flush=True)
    print(f"  records:     {(t2-t1)*1000:7.1f} ms", flush=True)
    print(f"  entropy:     {(t3-t2)*1000:7.1f} ms", flush=True)

    # dispatch-side host cost (main thread, serial with everything)
    t0 = time.perf_counter()
    for _ in range(3):
        enc._dispatch_p_chunk(frames)
    disp = (time.perf_counter() - t0) / 3
    print(f"dispatch host side:     {disp*1000:7.1f} ms "
          f"(np concat + put + trace)", flush=True)


if __name__ == "__main__":
    main()
