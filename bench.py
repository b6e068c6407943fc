"""Headline benchmark: frames/s on the flagship config (720p all-intra
for now; switches to IPPP once the inter path lands).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is fps relative to the measured HomerHEVC reference fps
(tools/measure_baseline.py writes BASELINE_MEASURED.json); falls back to
the north-star proxy (4x target => vs_baseline = ours/4x_target) when no
measurement exists yet.
"""
from __future__ import annotations

import json
import os
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent


def synthetic_video(n, h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    ys, us, vs = [], [], []
    for i in range(n):
        noise = rng.integers(0, 24, size=(h, w), dtype=np.uint8)
        ys.append((base + noise + 5 * i).astype(np.uint8))
        us.append(np.full((h // 2, w // 2), 100 + 3 * i, np.uint8))
        vs.append(np.full((h // 2, w // 2), 140 - 2 * i, np.uint8))
    return ys, us, vs


def main():
    import jax
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig

    h, w = 720, 1280
    n_frames = int(os.environ.get("BENCH_FRAMES", "16"))
    ys, us, vs = synthetic_video(n_frames, h, w)

    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=1,
                        sign_hiding=True)
    enc = Encoder(cfg)

    # warmup / compile
    enc.encode(ys[0], us[0], vs[0], compute_recon=False)

    t0 = time.perf_counter()
    total_bits = 0
    for i in range(n_frames):
        f = enc.encode(ys[i], us[i], vs[i], compute_recon=False)
        total_bits += f.bits
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    measured = ROOT / "BASELINE_MEASURED.json"
    if measured.exists():
        ref = json.loads(measured.read_text())
        ref_fps = ref.get("homer_fps_720p_allintra") or \
            ref.get("homer_fps_720p_ippp")
        vs = fps / ref_fps if ref_fps else None
    else:
        vs = None
    if vs is None:
        vs = round(fps / 100.0, 4)  # proxy until reference fps is measured

    print(json.dumps({
        "metric": "frames_per_sec_720p_allintra_qp32",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
