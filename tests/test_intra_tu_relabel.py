"""Intra TU-tree relabel (api._i_record): shared-mode CU quartets fold
into the parent CU with split_transform_flag — reconstruction is
IDENTICAL (intra prediction is per TB), strictly fewer mode/split bits
(ref TU-tree loop, hmr_motion_intra.c:1226)."""
import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


def _smooth(w=176, h=144):
    """16px checkerboard: DC predicts each 16 tile perfectly but a 32
    TB spans levels -> the tree picks 16-CUs with one shared mode,
    exactly the relabel's shape."""
    yy, xx = np.mgrid[0:h, 0:w]
    y = (64 + 32 * ((xx // 16 + yy // 16) % 2)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    return y, u, v


def test_relabel_fires_and_decodes():
    from tools import de265
    w, h = 176, 144
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=1,
                        deblocking=True, sao=True)
    enc = Encoder(cfg)
    recs = []
    orig = enc._emit
    enc._emit = lambda rec, pend, i, o=orig: (
        recs.append(rec), o(rec, pend, i))[1]
    f = enc.encode(*_smooth(w, h))
    planes = de265.decode(f.nalus)[0]
    for d, r in zip(planes, f.recon):
        np.testing.assert_array_equal(d, r)
    # checkerboard content must actually trigger TU-split relabels
    assert (recs[0].tr_depth > 0).any()
    # every relabeled region carries a legal depth (1 or 2) and one
    # mode across its 4-granules
    tr = recs[0].tr_depth
    cu = recs[0].cu_depth
    assert ((tr == 0) | (cu <= 2)).all()
