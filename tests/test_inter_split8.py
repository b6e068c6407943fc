"""8x8 inter CUs (VERDICT r3 item 3): 16x16 blocks with divergent
motion re-code as four 8x8 CUs with their own MVs and TB8/TB4s — the
spec-legal form of 8x8 motion granularity with MinCbLog2SizeY=3 (inter
NxN requires log2CbSize == MinCbLog2SizeY, spec 7.4.9.5, so NxN-at-16
cannot be signalled in this stream).  Ref: the max-depth NxN/8x8
search, hmr_motion_inter.c:3088."""
import numpy as np
import jax
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


def _divergent_pair(h=128, w=192):
    """(frame0, frame1): sharp texture where every 16x16 block's four
    8x8 quadrants move by different integer offsets."""
    g = np.mgrid[0:h + 64, 0:w + 64]
    base = (((g[1] * 11) ^ (g[0] * 7)) % 200 + 20).astype(np.uint8)
    y0 = base[:h, :w].copy()
    u0 = np.ascontiguousarray(base[0:h // 2, 0:w // 2] // 2 + 64)
    v0 = np.ascontiguousarray(base[4:4 + h // 2, 4:4 + w // 2] // 2 + 64)
    y1 = np.empty_like(y0)
    for by in range(h // 8):
        for bx in range(w // 8):
            dy = (by % 2) * 2 + 1
            dx = (bx % 2) * 2 + 1
            y1[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
                base[by * 8 + dy:(by + 1) * 8 + dy,
                     bx * 8 + dx:(bx + 1) * 8 + dx]
    return (y0, u0, v0), (y1, u0.copy(), v0.copy())


def test_split8_decode_roundtrip():
    from tools import de265
    f0, f1 = _divergent_pair()
    h, w = f0[0].shape
    cfg = EncoderConfig(width=w, height=h, qp=27, intra_period=100,
                        deblocking=True, sao=True, frames_per_launch=1)
    enc = Encoder(cfg)
    stream = b""
    recons = []
    for fr in (f0, f1, f1):
        cf = enc.encode(*fr)
        stream += cf.nalus
        recons.append(cf.recon)

    # the divergent frame must actually produce 8x8 CUs
    enc2 = Encoder(cfg)
    enc2.encode(*f0)
    pend = enc2._dispatch_p_chunk([f1], k=1)
    pk = np.asarray(pend["out"]["packed"])[0]
    nb = (h // 16) * (w // 16)
    o = nb * 2                         # packed: per-16 mv first
    depth = pk[o + 6 * nb:o + 7 * nb]
    assert (depth == 3).sum() > nb // 2, "8x8 split CUs did not fire"

    decoded = de265.decode(stream)
    assert len(decoded) == 3
    for planes, rec in zip(decoded, recons):
        for d, r in zip(planes, rec):
            np.testing.assert_array_equal(d, r)


def test_split8_saves_bits_on_divergent_motion():
    """Divergent-motion content must code in fewer bits with the 8x8
    split enabled (the capability's raison d'etre)."""
    f0, f1 = _divergent_pair()
    h, w = f0[0].shape

    def run(on):
        cfg = EncoderConfig(width=w, height=h, qp=27, intra_period=100,
                            deblocking=True, sao=True,
                            frames_per_launch=1)
        enc = Encoder(cfg)
        if not on:
            orig = enc._p_ladder_knobs
            enc._p_ladder_knobs = lambda: dict(orig(), inter_nxn=False)
        enc.encode(*f0)
        return enc.encode(*f1).bits

    bits_on = run(True)
    bits_off = run(False)
    assert bits_on < 0.9 * bits_off, (bits_on, bits_off)


def test_split8_row_sharded_bit_transparent():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 (virtual) devices")
    f0, f1 = _divergent_pair()
    h, w = f0[0].shape

    def run(chips):
        cfg = EncoderConfig(width=w, height=h, qp=27, intra_period=100,
                            deblocking=True, sao=True,
                            frames_per_launch=1, num_chips=chips)
        enc = Encoder(cfg)
        out = b""
        for fr in (f0, f1, f1):
            out += enc.encode(*fr, compute_recon=False).nalus
        return out

    assert run(2) == run(1)


def test_split8_fallback_adjacency_qp12_noise():
    """Regression: the 8x8-split stage must not re-code blocks whose
    reconstruction the intra fallback's ADI already read (found as a
    +-1 deblock-region mismatch at QP12 pure noise — split8 ran after
    the fallback and changed its neighbours)."""
    import numpy as np
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from tools import de265
    rng = np.random.default_rng(3)
    w, h = 192, 128
    frames = [(rng.integers(0, 256, (h, w)).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
               rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
              for _ in range(3)]
    cfg = EncoderConfig(width=w, height=h, qp=12, intra_period=100,
                        deblocking=True, sao=True, sign_hiding=True)
    enc = Encoder(cfg)
    stream, frs = b"", []
    for f in frames:
        fr = enc.encode(*f)
        frs.append(fr)
        stream += fr.nalus
    dec = de265.decode(stream)
    for i in range(3):
        for d, r in zip(dec[i], frs[i].recon):
            np.testing.assert_array_equal(np.asarray(d), r)
