"""Quick end-to-end check: refenc -> native writer -> libde265 -> compare."""
import sys

import numpy as np

sys.path.insert(0, ".")
from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.entropy import binding
from tools import refenc, de265


def run(w=128, h=64, qp=32, cu=16, mode_fixed=None, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 2 + yy * 3) % 255).astype(np.uint8)
    y = np.clip(y.astype(np.int32) + rng.integers(-20, 20, y.shape), 0,
                255).astype(np.uint8)
    u = ((xx[::2, ::2] + 128) % 255).astype(np.uint8)
    v = ((yy[::2, ::2] + 64) % 255).astype(np.uint8)

    cfg = EncoderConfig(width=w, height=h, qp=qp, sao=False,
                        deblocking=False, sign_hiding=False)
    ccfg = binding.make_cfg(cfg)
    rec, ry, ru, rv = refenc.encode_frame_intra(y, u, v, qp, cu_size=cu,
                                                mode_fixed=mode_fixed)
    bs = binding.write_parameter_sets(ccfg)
    sl = binding.encode_slice(ccfg, rec)
    stream = bs + sl
    with open("/tmp/test.265", "wb") as f:
        f.write(stream)
    frames = de265.decode(stream)
    assert frames, "no frames decoded"
    dy, du, dv = frames[0]
    print("decoded", dy.shape, "stream", len(stream), "bytes")
    for name, dec, enc in (("Y", dy, ry), ("U", du, ru), ("V", dv, rv)):
        enc8 = enc.astype(np.uint8)
        if dec.shape != enc8.shape:
            print(f"{name}: shape mismatch {dec.shape} vs {enc8.shape}")
            enc8 = enc8[:dec.shape[0], :dec.shape[1]]
        diff = np.abs(dec.astype(int) - enc8.astype(int))
        print(f"{name}: maxdiff={diff.max()} n_diff={(diff > 0).sum()}")
        if diff.max() > 0:
            idx = np.unravel_index(np.argmax(diff), diff.shape)
            print("  first big diff at", idx, "dec", dec[idx], "enc",
                  enc8[idx])
            ys, xs = np.nonzero(diff)
            print("  diff bbox rows", ys.min(), ys.max(), "cols", xs.min(),
                  xs.max())
    return (np.abs(dy.astype(int) - ry[:dy.shape[0], :dy.shape[1]]).max() == 0)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--cu", type=int, default=16)
    ap.add_argument("--mode", type=int, default=None)
    a = ap.parse_args()
    ok = run(a.w, a.h, a.qp, a.cu, a.mode)
    print("OK" if ok else "MISMATCH")
