"""Decompose where the P-frame bits go vs the reference operating point.

Encodes the bench content and reports, for a representative P frame:
CU-size histogram after host consolidation, skip/merge fraction, MVD
magnitudes, and estimated residual vs header bit shares (by re-encoding
the slice with selectively-zeroed fields through the native writer).

Run:  python tools/analyze_bits.py
"""
from __future__ import annotations

import copy
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import synthetic_video                     # noqa: E402
from homerhevc_tpu.api import Encoder                 # noqa: E402
from homerhevc_tpu.config import EncoderConfig        # noqa: E402
from homerhevc_tpu.entropy import binding             # noqa: E402


def main():
    h, w = 720, 1280
    n = 6
    ys, us, vs = synthetic_video(n, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=100)
    enc = Encoder(cfg)

    recs = []
    orig_emit = enc._emit

    def spy(rec, pend, is_idr):
        recs.append((rec, is_idr))
        return orig_emit(rec, pend, is_idr)

    enc._emit = spy
    for i in range(n):
        enc.encode(ys[i], us[i], vs[i], compute_recon=False)

    rec, _ = recs[-1]   # last P frame
    full = len(binding.encode_slice(enc.ccfg, rec)) * 8

    def bits_without(**zero):
        r = copy.copy(rec)
        for name in zero:
            arr = getattr(r, name)
            setattr(r, name, np.zeros_like(arr))
        return len(binding.encode_slice(enc.ccfg, r)) * 8

    no_resid = bits_without(coeff_y=1, coeff_cb=1, coeff_cr=1,
                            cbf_y=1, cbf_cb=1, cbf_cr=1)
    no_luma = bits_without(coeff_y=1, cbf_y=1)

    # CU structure stats (per-4x4 maps)
    d = rec.cu_depth[::4, ::4]          # per-16 granule
    mvx = rec.mv_x[::4, ::4].astype(np.int32)
    mvy = rec.mv_y[::4, ::4].astype(np.int32)
    cbf_any = (rec.cbf_y[::4, ::4] | rec.cbf_cb[::4, ::4]
               | rec.cbf_cr[::4, ::4]) > 0
    print(f"slice bits: {full}  (frame kbps "
          f"{full * 25 / 1000.0:.0f})")
    print(f"  residual share : {(full - no_resid) / full:.2%} "
          f"(luma {(full - no_luma) / full:.2%})")
    print(f"  header/mv share: {no_resid / full:.2%} ({no_resid} bits)")
    hist = {k: int((d == k).sum()) for k in range(4)}
    print(f"  cu_depth hist (16x16 granules): {hist}")
    print(f"  cbf-any fraction: {cbf_any.mean():.2%}")
    # mvd field coherence at 16-granularity
    dx = np.abs(np.diff(mvx, axis=1)).mean()
    dy = np.abs(np.diff(mvy, axis=1)).mean()
    print(f"  mean |mv grad| qpel: x={dx:.2f} y={dy:.2f}")
    vals, cnts = np.unique(np.stack([mvy, mvx]).reshape(2, -1), axis=1,
                           return_counts=True)
    top = np.argsort(-cnts)[:4]
    print(f"  top MVs (y,x qpel): "
          f"{[ (tuple(vals[:, i]), int(cnts[i])) for i in top ]}")


if __name__ == "__main__":
    main()
