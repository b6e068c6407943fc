"""Fit the QP-conditioned correction of the device rdbits estimator.

Ground truth: the native writer's live-context fractional CABAC bits
spent inside residual_coding() (binding.encode_slice_stats — the
reference's g_bc_entropy_bits counter, hmr_binary_encoding.c:280,
running on the REAL adaptive contexts).  For each QP and content
family this encodes I+P frames, rebuilds the device-side estimate from
the records (same TB tiling the writer walks) and reports
true/estimate — the factor rdbits.qp_scale() must reproduce.

Run:  RD_FORCE_CPU=1 python tools/rdbits_fit.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

if os.environ.get("RD_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import synthetic_video                      # noqa: E402
from homerhevc_tpu.api import Encoder                  # noqa: E402
from homerhevc_tpu.config import EncoderConfig         # noqa: E402
from homerhevc_tpu.entropy import binding              # noqa: E402
from homerhevc_tpu.ops import rdbits                   # noqa: E402
from tools.rdbits_check import tb_est, luma_tb_map     # noqa: E402


def frame_estimate(rec, w, h, qp=None):
    """Device-style residual-bit estimate for one record (luma per the
    cu/tr-depth TB map + fixed 8x8 chroma TBs; fallback intra TBs are
    16 like the inter path)."""
    est = 0.0
    tbmap = luma_tb_map(rec) if rec.slice_type != 2 else None
    cy = np.frombuffer(rec.coeff_y, np.int16).reshape(h, w) \
        if isinstance(rec.coeff_y, bytes) else rec.coeff_y
    if tbmap is None:
        # I slice: approximate with the 16x16 tiling
        est += tb_est(cy, np.full((h // 4, w // 4), 16), 16, qp)
    else:
        for size in (8, 16, 32):
            est += tb_est(cy, tbmap, size, qp)
    for pl in (rec.coeff_cb, rec.coeff_cr):
        p = np.frombuffer(pl, np.int16).reshape(h // 2, w // 2) \
            if isinstance(pl, bytes) else pl
        est += tb_est(p, np.full((h // 8, w // 8), 8), 8, qp)
    return est


def main():
    h, w = 240, 416
    fams = {
        "bench": synthetic_video(6, h, w),
    }
    # high-motion family (the round-4 RD regression content)
    from tools.rd_heldout import fam_motion, fam_noise
    ys, us, vs = fam_motion(6)
    fams["motion"] = (ys, us, vs)
    ys, us, vs = fam_noise(6)
    fams["noise"] = (ys, us, vs)

    print(f"{'family':>8} {'qp':>4} {'true_resid':>11} {'est':>11} "
          f"{'true/est':>8}")
    ratios = {}
    for name, (ys, us, vs) in fams.items():
        for qp in (22, 27, 32, 37, 42):
            cfg = EncoderConfig(width=w, height=h, qp=qp,
                                intra_period=100, sign_hiding=True,
                                deblocking=True, sao=True)
            enc = Encoder(cfg)
            true_b = est_b = 0.0
            recs = []
            orig_emit = enc._emit

            def emit_spy(rec, pend, is_idr):
                recs.append((rec, pend))
                return orig_emit(rec, pend, is_idr)
            enc._emit = emit_spy
            for i in range(len(ys)):
                enc.encode_async(ys[i], us[i], vs[i])
            enc.flush()
            for rec, pend in recs:
                _, rb = binding.encode_slice_stats(enc.ccfg, rec)
                true_b += rb[0]
                q = pend["qps"][pend["k"]] if "qps" in pend \
                    else pend["qp"]
                est_b += frame_estimate(rec, rec.width, rec.height,
                                        qp=int(q))
            r = true_b / max(est_b, 1.0)
            ratios.setdefault(qp, []).append(r)
            print(f"{name:>8} {qp:>4} {true_b:11.0f} {est_b:11.0f} "
                  f"{r:8.3f}", flush=True)
    print("\nper-QP geomean true/est (the qp_scale target):")
    for qp in sorted(ratios):
        gm = float(np.exp(np.mean(np.log(ratios[qp]))))
        print(f"  qp {qp}: {gm:.3f}")


if __name__ == "__main__":
    main()
