"""RD-curve comparison vs the measured HomerHEVC reference.

The equal-QP bit comparison in BASELINE_MEASURED.json is misleading:
the reference signals default (non-flat) scaling lists, so at the same
QP it operates at a coarser point (measured: its 720p QP32 I frame is
234 kbits @ 29.05 dB Y vs ours 462 kbits @ 31.93 dB Y).  The honest
north-star measurement is bits at EQUAL PSNR, interpolated from RD
curves sweeping QP on both encoders over the same content.

Run:  python tools/rd_sweep.py [w] [h] [n_frames] [all_intra]
      (defaults 416 240 12 0; the reference binary must exist at
      /tmp/homer_build/build/Linux/homer_app/Release/homer_app)
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

if os.environ.get("RD_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import synthetic_video                     # noqa: E402

REF_BIN = "/tmp/homer_build/build/Linux/homer_app/Release/homer_app"
# 41 brackets the reference's low-end PSNR points against our curve
# (intra_qp_offset raises our PSNR per QP, shifting the overlap window)
QPS = (26, 29, 32, 35, 38, 41)


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64)
                   - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


def write_yuv(path, ys, us, vs):
    with open(path, "wb") as f:
        for y, u, v in zip(ys, us, vs):
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def run_ref(yuv, w, h, n, qp, intra_period):
    out = f"/tmp/rdsweep_ref_q{qp}.265"
    subprocess.run(
        [REF_BIN, "-i", yuv, "-o", out, "-widthxheight", f"{w}x{h}",
         "-intra_period", str(intra_period), "-qp", str(qp),
         "-n_frames", str(n), "-performance_mode", "2", "-rd", "2",
         # the app DEFAULTS to VBR@1250kbps and ignores -qp otherwise
         "-bitrate_mode", "0"],
        check=True, capture_output=True)
    from tools import de265
    dec = de265.decode(open(out, "rb").read())
    return os.path.getsize(out) * 8, dec


def run_ours(ys, us, vs, w, h, qp, intra_period):
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    cfg = EncoderConfig(width=w, height=h, qp=qp,
                        intra_period=intra_period)
    enc = Encoder(cfg)
    bits = 0
    rec = []
    for y, u, v in zip(ys, us, vs):
        f = enc.encode(y, u, v)
        bits += f.bits
        rec.append(f.recon)
    return bits, rec


def mean_psnr(ys, recs):
    return float(np.mean([psnr(y, r[0]) for y, r in zip(ys, recs)]))


def interp_bits_at(curve, target_db):
    """log-bits linear interpolation of bits at a target PSNR."""
    curve = sorted(curve)                 # by psnr
    for (p0, b0), (p1, b1) in zip(curve, curve[1:]):
        if p0 <= target_db <= p1:
            t = (target_db - p0) / (p1 - p0)
            return float(np.exp(np.log(b0) + t * (np.log(b1)
                                                  - np.log(b0))))
    return None


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 416
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    all_intra = len(sys.argv) > 4 and sys.argv[4] == "1"
    ip = 1 if all_intra else 100
    ys, us, vs = synthetic_video(n, h, w)
    yuv = "/tmp/rdsweep.yuv"
    write_yuv(yuv, ys, us, vs)

    ref_curve = []
    for qp in QPS:
        bits, dec = run_ref(yuv, w, h, n, qp, ip)
        p = mean_psnr(ys, dec)
        ref_curve.append((p, bits))
        print(f"ref  qp{qp}: {bits / 1000:8.0f} kbits  Y {p:.2f}",
              flush=True)
    ours_curve = []
    for qp in QPS:
        bits, rec = run_ours(ys, us, vs, w, h, qp, ip)
        p = mean_psnr(ys, rec)
        ours_curve.append((p, bits))
        print(f"ours qp{qp}: {bits / 1000:8.0f} kbits  Y {p:.2f}",
              flush=True)

    # bits at equal PSNR, evaluated at the reference's operating points
    ratios = []
    for p_ref, b_ref in ref_curve:
        b_ours = interp_bits_at(ours_curve, p_ref)
        if b_ours:
            ratios.append(b_ours / b_ref)
            print(f"@ {p_ref:.2f} dB: ours/ref bits = "
                  f"{b_ours / b_ref:.3f}")
    if ratios:
        print(f"\nmean bits ratio at equal PSNR: "
              f"{np.exp(np.mean(np.log(ratios))):.3f} "
              f"(<1 = we beat the reference)")


if __name__ == "__main__":
    main()
