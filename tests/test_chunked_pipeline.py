"""Chunked multi-frame dispatch (encode_async with frames_per_launch>1)
must produce byte-identical streams to the frame-by-frame synchronous
path under fixed QP, across IDR boundaries and partial tail chunks."""
import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


def _frames(n, h, w):
    rng = np.random.default_rng(5)
    g = np.mgrid[0:h + 32, 0:w + 32]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 16, g[0].shape), 0, 255) \
        .astype(np.uint8)
    out = []
    for i in range(n):
        dx, dy = 2 * i, i
        out.append((base[dy:dy + h, dx:dx + w],
                    np.ascontiguousarray(base[0:h // 2,
                                              dx // 2:dx // 2 + w // 2]),
                    np.ascontiguousarray(base[4:4 + h // 2,
                                              5:5 + w // 2])))
    return out


def test_chunked_equals_sync():
    w, h = 128, 64
    frames = _frames(7, h, w)
    # intra_period 4 puts an IDR inside chunk boundaries; 7 frames with
    # K=2 leaves a partial tail chunk
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=4,
                        deblocking=True, sao=True, frames_per_launch=2)

    enc_sync = Encoder(cfg)
    ref = [enc_sync.encode(*f, compute_recon=False).nalus
           for f in frames]

    enc_async = Encoder(cfg)
    got = []
    for f in frames:
        got += [fr.nalus for fr in enc_async.encode_async(*f)]
    got += [fr.nalus for fr in enc_async.flush()]

    assert len(got) == len(ref)
    for i, (a, b) in enumerate(zip(got, ref)):
        assert a == b, f"frame {i} differs (chunked vs sync)"


def test_all_intra_chunked_equals_sync():
    """All-intra streams chunk via vmap (independent frames); bytes
    must match the frame-by-frame path."""
    w, h = 128, 64
    frames = _frames(5, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=1,
                        deblocking=True, sao=True, frames_per_launch=2)
    enc_sync = Encoder(EncoderConfig(width=w, height=h, qp=30,
                                     intra_period=1, deblocking=True,
                                     sao=True))
    ref = [enc_sync.encode(*f, compute_recon=False).nalus
           for f in frames]
    enc = Encoder(cfg)
    got = []
    for f in frames:
        got += [fr.nalus for fr in enc.encode_async(*f)]
    got += [fr.nalus for fr in enc.flush()]
    assert got == ref
