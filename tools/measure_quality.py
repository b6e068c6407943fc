"""Measure bitrate + PSNR on the BASELINE_MEASURED content/operating
point (720p IPPP QP32, bench.synthetic_video) — tracks the north-star
"bits at equal PSNR" axis against the reference's measured numbers
(BASELINE_MEASURED.json: 491 kbps @ 32.48 dB Y).

Run:  python tools/measure_quality.py [n_frames]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import synthetic_video                     # noqa: E402
from homerhevc_tpu.api import Encoder                 # noqa: E402
from homerhevc_tpu.config import EncoderConfig        # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    h, w = (720, 1280) if len(sys.argv) <= 2 else \
        (int(sys.argv[3]), int(sys.argv[2]))
    ys, us, vs = synthetic_video(n, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=100)
    enc = Encoder(cfg)
    bits = 0
    psnr_y = []
    psnr_u = []
    for i in range(n):
        fr = enc.encode(ys[i], us[i], vs[i], compute_recon=True)
        bits += fr.bits
        psnr_y.append(fr.psnr[0])
        psnr_u.append(fr.psnr[1])
    kbps = bits * cfg.frame_rate / n / 1000.0
    print(f"frames={n} kbps={kbps:.0f} "
          f"psnr_y={np.mean(psnr_y):.2f} psnr_u={np.mean(psnr_u):.2f} "
          f"(ref: 491 kbps, 32.48 dB Y, 43.14 dB U)")


if __name__ == "__main__":
    main()
