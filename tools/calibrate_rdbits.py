"""Calibrate ops/rdbits constants against the real CABAC writer.

Encodes synthetic content through the full pipeline at several QPs and
compares the device-side residual-bit estimates (summed over every coded
TB) with the actual slice sizes produced by the native entropy stage.
The per-bin-type constants in ops/rdbits.py are tuned so the estimate
tracks reality across QPs (relative accuracy is what the RD decisions
consume; a stable absolute ratio near 1.0 keeps lambda calibrated).

Run:  JAX_PLATFORMS=cpu python tools/calibrate_rdbits.py
"""
from __future__ import annotations

import numpy as np

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from homerhevc_tpu import tables                      # noqa: E402
from homerhevc_tpu.api import Encoder                 # noqa: E402
from homerhevc_tpu.config import EncoderConfig        # noqa: E402
from homerhevc_tpu.ops import rdbits                  # noqa: E402


def synthetic(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 40 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
         + rng.normal(0, 12, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 20 * np.sin(xx[::2, ::2] / 15.0)).clip(0, 255) \
        .astype(np.uint8)
    v = (128 + 20 * np.cos(yy[::2, ::2] / 13.0)).clip(0, 255) \
        .astype(np.uint8)
    return y, u, v


def tb_bits(plane: np.ndarray, size: int) -> float:
    h, w = plane.shape
    blocks = plane.reshape(h // size, size, w // size, size) \
        .transpose(0, 2, 1, 3).reshape(-1, size, size)
    return float(np.sum(np.asarray(
        rdbits.residual_bits(blocks.astype(np.int32), size))))


def main():
    y, u, v = synthetic(240, 416)
    print(f"{'qp':>4} {'actual':>9} {'est_resid':>10} {'ratio':>6}")
    for qp in (22, 27, 32, 37):
        cfg = EncoderConfig(width=416, height=240, qp=qp, intra_period=1,
                            sao=False, deblocking=False)
        enc = Encoder(cfg)
        fr = enc.encode(y, u, v)
        # estimate over the TU sizes the device actually chose: depth
        # map is per-16 slot (0 = 16x16 TB, 1 = 8x8 split); re-run the
        # device program to get coeffs + depth
        from homerhevc_tpu.models import intra_frame
        out = intra_frame.encode_frame_jit(
            np.asarray(y), np.asarray(u), np.asarray(v),
            qp=qp, cu=16, ctu=64, sign_hiding=cfg.sign_hiding,
            deblocking=False, sao_enabled=False, split_8x8=True,
            chroma_qp_offset=cfg.chroma_qp_offset)
        cy = np.asarray(out["coeff_y"], np.int32)
        cb = np.asarray(out["coeff_cb"], np.int32)
        cr = np.asarray(out["coeff_cr"], np.int32)
        depth = np.asarray(out["depth"])
        # luma: per-slot 16 or 8x8x4 depending on split
        h, w = cy.shape
        est = 0.0
        b16 = cy.reshape(h // 16, 16, w // 16, 16) \
            .transpose(0, 2, 1, 3).reshape(-1, 16, 16)
        r16 = np.asarray(rdbits.residual_bits(b16, 16)).reshape(
            h // 16, w // 16)
        b8 = cy.reshape(h // 8, 8, w // 8, 8) \
            .transpose(0, 2, 1, 3).reshape(h // 8, w // 8, 8, 8)
        r8 = np.asarray(rdbits.residual_bits(
            b8.reshape(-1, 8, 8), 8)).reshape(h // 8, w // 8)
        r8s = r8.reshape(h // 16, 2, w // 16, 2).sum((1, 3))
        est += float(np.sum(np.where(depth > 0, r8s, r16)))
        # chroma 8x8 / 4x4
        hc, wc = cb.shape
        for c in (cb, cr):
            c8 = c.reshape(hc // 8, 8, wc // 8, 8) \
                .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            rc8 = np.asarray(rdbits.residual_bits(c8, 8)).reshape(
                hc // 8, wc // 8)
            c4 = c.reshape(hc // 4, 4, wc // 4, 4) \
                .transpose(0, 2, 1, 3).reshape(hc // 4, wc // 4, 4, 4)
            rc4 = np.asarray(rdbits.residual_bits(
                c4.reshape(-1, 4, 4), 4)).reshape(hc // 4, wc // 4)
            rc4s = rc4.reshape(hc // 8, 2, wc // 8, 2).sum((1, 3))
            est += float(np.sum(np.where(depth > 0, rc4s, rc8)))
        print(f"{qp:>4} {fr.bits:>9} {est:>10.0f} {est / fr.bits:>6.2f}")


if __name__ == "__main__":
    main()
