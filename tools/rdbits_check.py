"""Measure ops/rdbits estimator accuracy on the CURRENT pipeline.

Encodes I+P frames through the public Encoder, rebuilds the per-TB
residual-bit ESTIMATE from each frame's record (coefficients + the
cu/tr-depth maps give the actual TB tiling) and compares with the real
slice bits from the native CABAC stage.  The RATIO's stability across
QP is what the RD decisions consume (supersedes the stale
calibrate_rdbits.py, which targeted the round-1 device API).

Run:  RD_FORCE_CPU=1 python tools/rdbits_check.py
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
from homerhevc_tpu.ops import rdbits                   # noqa: E402


def tb_est(plane, tb_size_map4, size, qp=None):
    """Sum residual_bits over TBs of `size` whose map cell says so."""
    h, w = plane.shape
    n = size
    blocks = plane.reshape(h // n, n, w // n, n) \
        .transpose(0, 2, 1, 3).reshape(-1, n, n).astype(np.int32)
    kw = {} if qp is None else dict(qp=qp)
    r = np.asarray(rdbits.residual_bits(blocks, n, **kw)) \
        .reshape(h // n, w // n)
    sel = tb_size_map4[::n // 4, ::n // 4] == size
    return float(r[sel].sum())


def luma_tb_map(rec):
    """Per-4x4 luma TB size from cu_depth/tr_depth (P records)."""
    d = rec.cu_depth
    t = rec.tr_depth
    size = np.where(d >= 3, 8,
                    np.where(d == 2, 16,
                             np.where((d == 1) & (t == 0), 32, 16)))
    # depth 0 (64 CU) -> four 32 TBs
    size = np.where(d == 0, 32, size)
    return size


def main():
    h, w = 240, 416
    ys, us, vs = synthetic_video(6, h, w)
    print(f"{'qp':>4} {'slice':>9} {'est':>9} {'ratio':>6}")
    for qp in (22, 27, 32, 37):
        cfg = EncoderConfig(width=w, height=h, qp=qp, intra_period=100)
        enc = Encoder(cfg)
        tot_act = tot_est = 0.0
        for i in range(6):
            pend = enc._dispatch(ys[i], us[i], vs[i], False)
            packed = np.asarray(pend["out"]["packed"])
            for pk, rec, is_idr in enc._records(packed, pend):
                fr = enc._emit(rec, pk, is_idr)
                enc._account(fr)
                tot_act += fr.bits
                sizes = luma_tb_map(rec)
                for s in (8, 16, 32):
                    tot_est += tb_est(rec.coeff_y, sizes, s)
                # chroma TBs: half the luma TB size, floor 4
                cs = np.maximum(sizes[::2, ::2] // 2, 4)
                for s in (4, 8, 16):
                    tot_est += tb_est(rec.coeff_cb, cs, s)
                    tot_est += tb_est(rec.coeff_cr, cs, s)
        print(f"{qp:>4} {tot_act:>9.0f} {tot_est:>9.0f} "
              f"{tot_est / max(tot_act, 1):>6.3f}")


if __name__ == "__main__":
    main()
