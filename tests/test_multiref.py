"""Multi-reference P coding (num_ref_frames=2; ref ref_pic_list
machinery hmr_encoder_lib.c:1546-1576): per-block ref picks on device,
ref_idx_l0 syntax, slice-local RPS for the first P after an IDR, and
spec 8.5.3.2.6-8 AMVP scaling — all validated by the conformant
decoder (decode-loop invariant)."""
import numpy as np
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


W, H, M = 128, 64, 16


def _content(n, mixed=False, seed=9):
    """Flicker stream: odd frames add a noise field, so the same-parity
    frame TWO back is the far better reference.  With `mixed`, only the
    left half flickers — blocks pick different refs within one frame,
    exercising ref-mixed merge candidates and scaled AMVP."""
    rng = np.random.default_rng(seed)
    g = np.mgrid[0:H + M, 0:W + M]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 16, g[0].shape), 0, 255) \
        .astype(np.int32)
    flick = rng.integers(-25, 26, g[0].shape)
    if mixed:
        flick[:, (W + M) // 2:] = 0
    frames = []
    for i in range(n):
        dx, dy = 2 * i, i
        y = np.clip(base + (i % 2) * flick, 0, 255) \
            .astype(np.uint8)[dy:dy + H, dx:dx + W]
        u = np.clip(128 + base[dy // 2:dy // 2 + H // 2,
                               dx // 2:dx // 2 + W // 2] // 4
                    + (i % 2) * 10, 0, 255).astype(np.uint8)
        v = np.clip(110 + base[dy // 2 + 4:dy // 2 + 4 + H // 2,
                               dx // 2 + 4:dx // 2 + 4 + W // 2] // 4,
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _run(frames, nref, intra_period=100):
    cfg = EncoderConfig(width=W, height=H, qp=30,
                        intra_period=intra_period,
                        deblocking=True, sao=True, num_ref_frames=nref)
    enc = Encoder(cfg)
    stream, recons, bits = b"", [], []
    for f in frames:
        out = enc.encode(*f)
        stream += out.nalus
        recons.append(out.recon)
        bits.append(out.bits)
    return stream, recons, bits


def _assert_decode_loop(stream, recons):
    from tools import de265
    decoded = de265.decode(stream)
    assert len(decoded) == len(recons)
    for planes, rec in zip(decoded, recons):
        for d, r in zip(planes, rec):
            np.testing.assert_array_equal(d, r)


@pytest.mark.parametrize("mixed", [False, True])
def test_two_ref_decode_loop_and_rd_gain(mixed):
    frames = _content(6, mixed=mixed)
    s2, r2, b2 = _run(frames, 2)
    _assert_decode_loop(s2, r2)
    _, _, b1 = _run(frames, 1)
    # from the 3rd frame on, the same-parity reference must pay off
    assert sum(b2[2:]) < sum(b1[2:])


def test_two_ref_idr_restart_resets_dpb():
    """An IDR mid-stream empties the DPB: the P right after it must be
    coded with one active ref again (slice-local RPS path)."""
    frames = _content(8)
    s2, r2, _ = _run(frames, 2, intra_period=4)
    _assert_decode_loop(s2, r2)


def test_two_ref_checkpoint_roundtrip():
    """Both reference pictures survive checkpoint/resume: the stream
    continued after resume is byte-identical to the uninterrupted one."""
    import tempfile
    frames = _content(6)
    cfg = EncoderConfig(width=W, height=H, qp=30, intra_period=100,
                        deblocking=True, sao=True, num_ref_frames=2)
    enc = Encoder(cfg)
    full = [enc.encode(*f).nalus for f in frames]
    enc2 = Encoder(cfg)
    for f in frames[:4]:
        enc2.encode(*f)
    with tempfile.NamedTemporaryFile(suffix=".npz") as tmp:
        enc2.save_checkpoint(tmp.name)
        enc3 = Encoder(cfg)
        enc3.load_checkpoint(tmp.name)
    tail = [enc3.encode(*f).nalus for f in frames[4:]]
    assert tail == full[4:]
