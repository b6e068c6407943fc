"""Checkpoint/resume: an encoder restored mid-stream must produce
byte-identical NALUs to the uninterrupted run (determinism by
construction, SURVEY.md §5)."""
import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import BitrateMode, EncoderConfig


def _frames(n, h, w):
    rng = np.random.default_rng(11)
    g = np.mgrid[0:h + 16, 0:w + 16]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 16, g[0].shape), 0, 255) \
        .astype(np.uint8)
    out = []
    for i in range(n):
        dx, dy = 2 * i, i
        out.append((base[dy:dy + h, dx:dx + w],
                    base[dy // 2:dy // 2 + h // 2,
                         dx // 2:dx // 2 + w // 2],
                    base[dy // 2 + 4:dy // 2 + 4 + h // 2,
                         dx // 2 + 4:dx // 2 + 4 + w // 2]))
    return out


def test_checkpoint_resume_bit_identical(tmp_path):
    w, h = 128, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=100,
                        deblocking=True, sao=True,
                        bitrate_mode=BitrateMode.CBR, bitrate=300)
    frames = _frames(5, h, w)

    ref_nalus = []
    enc = Encoder(cfg)
    for f in frames:
        ref_nalus.append(enc.encode(*f, compute_recon=False).nalus)

    enc1 = Encoder(cfg)
    for f in frames[:3]:
        enc1.encode(*f, compute_recon=False)
    ck = tmp_path / "ck.npz"
    enc1.save_checkpoint(str(ck))

    enc2 = Encoder(cfg)
    enc2.load_checkpoint(str(ck))
    for i, f in enumerate(frames[3:]):
        got = enc2.encode(*f, compute_recon=False).nalus
        assert got == ref_nalus[3 + i], f"frame {3 + i} diverged"
