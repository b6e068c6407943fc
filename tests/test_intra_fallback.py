"""Isolated intra fallback in P frames + scene-change GOP restart:
mixed inter/intra P slices must stay decoder-exact (MPM in P slices,
BS=2 deblocking incl. chroma, AMVP with intra neighbors)."""
import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


def test_scene_change_intra_fallback_conformant():
    from tools import de265
    rng = np.random.default_rng(7)
    w, h, m = 128, 64, 16
    g = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 16, g[0].shape), 0, 255) \
        .astype(np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=100,
                        deblocking=True, sao=True)
    enc = Encoder(cfg)
    stream = b""
    recons = []
    fracs = []
    for i in range(4):
        dx, dy = 2 * i, i
        y = base[dy:dy + h, dx:dx + w].copy()
        u = np.ascontiguousarray(base[dy // 2:dy // 2 + h // 2,
                                      dx // 2:dx // 2 + w // 2])
        v = np.ascontiguousarray(base[dy // 2 + 4:dy // 2 + 4 + h // 2,
                                      dx // 2 + 4:dx // 2 + 4 + w // 2])
        if i >= 2:   # hard scene change to flat gradient content.
            # NOTE values sit NEAR 255, above anything in `base`: since
            # the ME range reaches the edge-replicated reference
            # padding (a legitimate, decoder-exact prediction source),
            # flat content at values present in the reference would be
            # predicted from the padding instead of going intra.
            yy = np.mgrid[0:h, 0:w][0]
            y = (250 + (yy // 16) + 2 * (i - 2)).clip(0, 255) \
                .astype(np.uint8)
        f = enc.encode(y, u, v)
        stream += f.nalus
        recons.append(f.recon)
        fracs.append(enc._last_intra_cand_frac)
    decoded = de265.decode(stream)
    assert len(decoded) == 4
    for planes, rec in zip(decoded, recons):
        for d, r in zip(planes, rec):
            np.testing.assert_array_equal(d, r)
    # the scene-change frame must have triggered intra candidates
    assert fracs[2] > 0.5
    # and the following frame must have been re-encoded as IDR
    assert enc._gop_poc == 1
