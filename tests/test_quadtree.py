"""Decode-loop tests for the device CU quadtree and scaling lists.

The quadtree consolidation (models/inter_frame.quadtree_consolidate)
changes CU/TU structure, MVs, deblock boundary strengths and chroma TB
sizes — the strongest check is the decode-loop invariant: a conformant
decoder (libde265) must reproduce the encoder's reconstruction exactly.
"""
import numpy as np
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


def _decode(stream):
    from tools import de265
    return de265.decode(stream)


def _content(h, w, n):
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (h + 32, w + 32)).astype(np.uint8)
    yy, xx = np.mgrid[0:h + 32, 0:w + 32]
    smooth = (128 + 60 * np.sin(xx / 23.0) * np.cos(yy / 31.0)) \
        .astype(np.uint8)
    frames = []
    for i in range(n):
        f = smooth[i:i + h, 2 * i:2 * i + w].copy()
        f[40:56, 40:56] = base[40:56, 40:56]   # static noise patch
        frames.append(f)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 160, np.uint8)
    return frames, u, v


def test_p_quadtree_decode_loop():
    """IPPP with smooth global motion: 32/64 CUs + 32 TBs + 16 chroma
    TBs are exercised; recon must match libde265 bit-exactly."""
    h, w = 128, 192
    frames, u, v = _content(h, w, 4)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=100,
                        frames_per_launch=1)
    enc = Encoder(cfg)
    stream = b""
    recons = []
    for f in frames:
        fr = enc.encode(f, u, v, compute_recon=True)
        stream += fr.nalus
        recons.append(fr.recon)
    dec = _decode(stream)
    for i in range(len(frames)):
        for c in range(3):
            np.testing.assert_array_equal(
                dec[i][c][:recons[i][c].shape[0],
                          :recons[i][c].shape[1]],
                recons[i][c], err_msg=f"frame {i} comp {c}")


@pytest.mark.parametrize("intra_period", [1, 100])
def test_scaling_lists_decode_loop(intra_period):
    """Default scaling lists (SPS signaled, data_present=0) must keep
    the decode loop bit-exact for both intra and inter TBs."""
    h, w = 128, 128
    frames, u, v = _content(h, w, 3)
    cfg = EncoderConfig(width=w, height=h, qp=30,
                        intra_period=intra_period,
                        frames_per_launch=1, scaling_lists=True)
    enc = Encoder(cfg)
    stream = b""
    recons = []
    for f in frames:
        fr = enc.encode(f, u, v, compute_recon=True)
        stream += fr.nalus
        recons.append(fr.recon)
    dec = _decode(stream)
    for i in range(len(frames)):
        for c in range(3):
            np.testing.assert_array_equal(
                dec[i][c][:recons[i][c].shape[0],
                          :recons[i][c].shape[1]],
                recons[i][c], err_msg=f"frame {i} comp {c}")


def test_cu_qp_delta_decode_loop():
    """Per-CTU QP (adaptive_qp): cu_qp_delta syntax, per-block device
    quantization and the effective-QP deblock chain must keep the
    decode loop bit-exact (incl. |delta| >= 5 -> the EG0 suffix)."""
    rng = np.random.default_rng(4)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h + 16, 0:w + 16]
    smooth = (128 + 60 * np.sin(xx / 19.0) * np.cos(yy / 23.0)) \
        .astype(np.uint8)
    frames = []
    for i in range(4):
        f = smooth[i:i + h, 2 * i:2 * i + w].copy()
        f[0:64, 0:64] = rng.integers(0, 255, (64, 64))  # busy CTU
        frames.append(f)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 160, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=100,
                        frames_per_launch=1, adaptive_qp=True)
    enc = Encoder(cfg)
    assert enc._per_ctu_qp
    stream = b""
    recs = []
    for f in frames:
        fr = enc.encode(f, u, v, compute_recon=True)
        stream += fr.nalus
        recs.append(fr.recon)
    dec = _decode(stream)
    for i in range(len(frames)):
        for c in range(3):
            np.testing.assert_array_equal(
                dec[i][c][:recs[i][c].shape[0], :recs[i][c].shape[1]],
                recs[i][c], err_msg=f"frame {i} comp {c}")


def test_intra_nxn_decode_loop():
    """rd=full enables NxN (4x4 PUs + DST): the stream must carry
    part_size=NxN CUs and decode bit-exactly (libde265), with the
    decode-loop invariant recon == decoder output."""
    from homerhevc_tpu.config import RDMode
    h, w = 128, 192
    rng = np.random.default_rng(17)
    y = np.clip((np.mgrid[0:h, 0:w][1] * 3
                 + np.mgrid[0:h, 0:w][0] * 2) % 235
                + rng.integers(0, 20, (h, w)), 0, 255).astype(np.uint8)
    u = (128 + 40 * np.sin(np.mgrid[0:h // 2, 0:w // 2][1] / 17.0)) \
        .astype(np.uint8)
    v = np.full((h // 2, w // 2), 90, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=1,
                        rd_mode=RDMode.RD_FULL)
    enc = Encoder(cfg)
    fr = enc.encode(y, u, v)
    dy, du, dv = _decode(fr.nalus)[0]
    np.testing.assert_array_equal(dy[:h, :w], fr.recon[0])
    np.testing.assert_array_equal(du[:h // 2, :w // 2], fr.recon[1])
    np.testing.assert_array_equal(dv[:h // 2, :w // 2], fr.recon[2])
