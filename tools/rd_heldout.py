"""Held-out RD validation (VERDICT r3 item 2 / r2 item 8).

The bench `synthetic_video` family also calibrated ops/rdbits.py and
tuned _PAD_DIST_W / intra_qp_offset, so sweeps on it are
self-referential.  This tool sweeps three content families the tuning
never saw — noise texture, high motion, static — and reports the
per-family equal-PSNR bits geomean vs the reference binary.

Run: python tools/rd_heldout.py [n_frames] [family ...]
Families: noise, motion, static (default: all).  Results append to
/tmp/rd_heldout.log style stdout; record them in STATUS.md.
"""
from __future__ import annotations

import sys
import os

import numpy as np

if os.environ.get("RD_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.rd_sweep import (write_yuv, run_ref, run_ours, mean_psnr,  # noqa: E402
                            interp_bits_at)

QPS = (26, 29, 32, 35, 38, 41)
W, H = 416, 240


def fam_noise(n):
    """Heavy dynamic noise over a static backdrop: stresses the
    zero-residual folding and rate control, defeats clean ME."""
    rng = np.random.default_rng(101)
    yy, xx = np.mgrid[0:H, 0:W]
    back = ((xx // 16 + yy // 16) % 2 * 60 + 90).astype(np.uint8)
    ys, us, vs = [], [], []
    for i in range(n):
        ys.append(np.clip(back + rng.integers(-25, 26, back.shape),
                          0, 255).astype(np.uint8))
        us.append(np.clip(128 + rng.integers(-8, 9, (H // 2, W // 2)),
                          0, 255).astype(np.uint8))
        vs.append(np.clip(128 + rng.integers(-8, 9, (H // 2, W // 2)),
                          0, 255).astype(np.uint8))
    return ys, us, vs


def fam_motion(n):
    """Fast pan + independently moving object: stresses ME range,
    divergent-motion splits and uncovered-area intra fallback."""
    rng = np.random.default_rng(202)
    m = 8 * n + 80
    g = np.mgrid[0:H + m, 0:W + m]
    base = np.clip(((g[1] * 5) ^ (g[0] * 3)) % 220
                   + rng.integers(0, 12, g[0].shape), 0, 255) \
        .astype(np.uint8)
    cb = (128 + 30 * np.sin(g[1][:m // 2 + H // 2, :m // 2 + W // 2]
                            / 23.0)).astype(np.uint8)
    ys, us, vs = [], [], []
    for i in range(n):
        dx, dy = 7 * i, 2 * i
        y = base[dy:dy + H, dx:dx + W].copy()
        # object moving against the pan
        ox = (W - 40) - 5 * i % max(W - 48, 1)
        oy = 60 + (3 * i) % 100
        y[oy:oy + 32, max(ox, 0):max(ox, 0) + 32] = \
            base[8:40, 8:40]
        ys.append(y)
        us.append(cb[dy // 2:dy // 2 + H // 2,
                     dx // 2:dx // 2 + W // 2].copy())
        vs.append(cb[dy // 2 + 4:dy // 2 + 4 + H // 2,
                     dx // 2 + 2:dx // 2 + 2 + W // 2].copy())
    return ys, us, vs


def fam_static(n):
    """Near-static detailed scene with slow illumination drift:
    stresses skip coding and the I-frame anchor quality."""
    rng = np.random.default_rng(303)
    g = np.mgrid[0:H, 0:W]
    y0 = np.clip(((g[1] * 7) ^ (g[0] * 11)) % 190 + 30
                 + rng.integers(0, 8, g[0].shape), 0, 255)
    u0 = (110 + (g[0][::2, ::2] // 8) % 30).astype(np.uint8)
    v0 = (120 + (g[1][::2, ::2] // 8) % 25).astype(np.uint8)
    ys, us, vs = [], [], []
    for i in range(n):
        gain = 1.0 + 0.002 * i
        ys.append(np.clip(y0 * gain, 0, 255).astype(np.uint8))
        us.append(u0.copy())
        vs.append(v0.copy())
    return ys, us, vs


FAMILIES = dict(noise=fam_noise, motion=fam_motion, static=fam_static)


def sweep(name, n):
    ys, us, vs = FAMILIES[name](n)
    yuv = f"/tmp/rd_heldout_{name}.yuv"
    write_yuv(yuv, ys, us, vs)
    ref_curve, ours_curve = [], []
    for qp in QPS:
        bits, dec = run_ref(yuv, W, H, n, qp, 100)
        p = mean_psnr(ys, dec)
        ref_curve.append((p, bits))
        print(f"[{name}] ref  qp{qp}: {bits / 1000:8.0f} kbits  "
              f"Y {p:.2f}", flush=True)
    for qp in QPS:
        bits, rec = run_ours(ys, us, vs, W, H, qp, 100)
        p = mean_psnr(ys, rec)
        ours_curve.append((p, bits))
        print(f"[{name}] ours qp{qp}: {bits / 1000:8.0f} kbits  "
              f"Y {p:.2f}", flush=True)
    ratios = []
    for p_ref, b_ref in ref_curve:
        b_ours = interp_bits_at(ours_curve, p_ref)
        if b_ours:
            ratios.append(b_ours / b_ref)
            print(f"[{name}] @ {p_ref:.2f} dB: ours/ref = "
                  f"{b_ours / b_ref:.3f}", flush=True)
    if ratios:
        gm = float(np.exp(np.mean(np.log(ratios))))
        print(f"[{name}] GEOMEAN bits at equal PSNR: {gm:.3f} "
              f"(<1 = fewer bits than the reference)", flush=True)
        return gm
    return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    fams = sys.argv[2:] or list(FAMILIES)
    out = {}
    for name in fams:
        out[name] = sweep(name, n)
    print("summary:", out, flush=True)


if __name__ == "__main__":
    main()
