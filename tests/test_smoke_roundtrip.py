"""Smoke-tier end-to-end roundtrip: a tiny IPPP stream through the
public Encoder decoded bit-exactly by libde265 (the ground-truth
runtime invariant, kept tiny so `pytest -m smoke` stays under 5 min)."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def _content(n, h, w):
    rng = np.random.default_rng(11)
    m = 4 * n + 8
    g = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 20, g[0].shape), 0, 255) \
        .astype(np.uint8)
    ys = [base[i:i + h, 3 * i:3 * i + w].copy() for i in range(n)]
    us = [base[i // 2:i // 2 + h // 2, i:i + w // 2].copy()
          for i in range(n)]
    vs = [base[4 + i:4 + i + h // 2, 7:7 + w // 2].copy()
          for i in range(n)]
    return ys, us, vs


def test_tiny_ippp_roundtrip():
    from homerhevc_tpu.api import Encoder
    from homerhevc_tpu.config import EncoderConfig
    from tools import de265

    n, h, w = 3, 96, 112   # non-CTU-multiple: exercises the crop
    ys, us, vs = _content(n, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=8)
    enc = Encoder(cfg)
    frames = [enc.encode(ys[i], us[i], vs[i]) for i in range(n)]
    dec = de265.decode(b"".join(f.nalus for f in frames))
    assert len(dec) == n
    for i, (dy, du, dv) in enumerate(dec):
        ry, ru, rv = frames[i].recon
        np.testing.assert_array_equal(dy, ry, err_msg=f"Y f{i}")
        np.testing.assert_array_equal(du, ru, err_msg=f"U f{i}")
        np.testing.assert_array_equal(dv, rv, err_msg=f"V f{i}")
    err = np.mean((dec[1][0].astype(np.float64)
                   - ys[1].astype(np.float64)) ** 2)
    assert 10 * np.log10(255 ** 2 / max(err, 1e-9)) > 30
