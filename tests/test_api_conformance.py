"""End-to-end conformance of the public Encoder API (the JAX compute
path + native entropy stage): streams must decode in libde265 to
reconstructions bit-identical to the encoder's own (decode-loop
invariant, SURVEY.md §4) — including non-CTU-multiple frame sizes
(conformance window) and with the deblocking filter enabled."""
import numpy as np
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


def _content(i, h, w, rng):
    y = (((np.mgrid[0:h, 0:w][1] * 2) % 230)
         + rng.integers(0, 16, (h, w)) + 3 * i).astype(np.uint8)
    u = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("w,h,deblocking,sao", [
    (176, 144, True, True),    # non-CTU-multiple + both in-loop filters
    (128, 64, False, False),   # CTU multiple, unfiltered
])
def test_encoder_decode_loop_invariant(w, h, deblocking, sao):
    from tools import de265
    rng = np.random.default_rng(42)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=1,
                        deblocking=deblocking, sao=sao)
    enc = Encoder(cfg)
    stream = b""
    recons = []
    for i in range(2):
        f = enc.encode(*_content(i, h, w, rng))
        stream += f.nalus
        recons.append(f.recon)
    decoded = de265.decode(stream)
    assert len(decoded) == 2
    for i, planes in enumerate(decoded):
        for d, r in zip(planes, recons[i]):
            np.testing.assert_array_equal(d, r)


def test_encoder_ippp_decode_loop_invariant():
    """IPPP: dense ME + MC + inter residuals + merge/skip/AMVP derivation
    + inter deblocking, all validated by the conformant decoder."""
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
    bits = []
    for i in range(4):
        dx, dy = 2 * i, i                       # global motion
        y = base[dy:dy + h, dx:dx + w]
        u = base[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2]
        v = base[dy // 2 + 4:dy // 2 + 4 + h // 2,
                 dx // 2 + 4:dx // 2 + 4 + w // 2]
        f = enc.encode(y, u, v)
        stream += f.nalus
        recons.append(f.recon)
        bits.append(f.bits)
    decoded = de265.decode(stream)
    assert len(decoded) == 4
    for i, planes in enumerate(decoded):
        for d, r in zip(planes, recons[i]):
            np.testing.assert_array_equal(d, r)
    # P frames must actually exploit the reference
    assert max(bits[1:]) < bits[0]


@pytest.mark.parametrize("tc,tr", [
    (2, 2),   # uneven grid on 3x3 CTUs (1- and 2-CTU tiles)
    (3, 1),   # column-only tiles
])
def test_encoder_tiles_decode_loop_invariant(tc, tr):
    """All-intra tiles: tile-scan CTU order, per-tile CABAC substreams
    with entry points, availability broken at tile boundaries on both
    the device wavefront and the writer (spec 6.5.1 / 6.4.1)."""
    from tools import de265
    rng = np.random.default_rng(11)
    w, h = 176, 144
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=1,
                        deblocking=True, sao=True,
                        tile_cols=tc, tile_rows=tr)
    assert cfg.tiles == (tc, tr)
    enc = Encoder(cfg)
    stream = b""
    recons = []
    for i in range(2):
        f = enc.encode(*_content(i, h, w, rng))
        stream += f.nalus
        recons.append(f.recon)
    decoded = de265.decode(stream)
    assert len(decoded) == 2
    for i, planes in enumerate(decoded):
        for d, r in zip(planes, recons[i]):
            np.testing.assert_array_equal(d, r)


def test_tiles_shorten_wavefront():
    """The point of tiles: the device wavefront gets structurally
    shorter (more CTU-independent work per step)."""
    from homerhevc_tpu.models import schedule
    _, n_plain, _ = schedule.wavefront_schedule(14, 8, 2, None)
    _, n_tiled, b = schedule.wavefront_schedule(14, 8, 2, (4, 2))
    assert n_tiled < n_plain / 2
    assert b.shape[1] > 8          # wider per-step batches


def test_tiles_ignored_for_ippp():
    """Tiles apply only to all-intra streams; IPPP keeps the tile-free
    path (cfg.tiles is None)."""
    cfg = EncoderConfig(width=176, height=144, intra_period=100,
                        tile_cols=2, tile_rows=2)
    assert cfg.tiles is None


def test_tiles_sao_coincident_params_no_cross_tile_merge():
    """Flat content derives identical SAO params in every CTU; the
    merge-coincidence pass must still not mark merges across a tile
    boundary (the writer emits no merge flag there)."""
    from tools import de265
    w, h = 128, 128
    y = np.full((h, w), 100, np.uint8)
    y[::7, ::5] = 110                    # mild texture so SAO engages
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=34, intra_period=1,
                        deblocking=True, sao=True,
                        tile_cols=2, tile_rows=2)
    enc = Encoder(cfg)
    f = enc.encode(y, u, v)
    (dy, du, dv), = de265.decode(f.nalus)
    np.testing.assert_array_equal(dy, f.recon[0])
    np.testing.assert_array_equal(du, f.recon[1])
    np.testing.assert_array_equal(dv, f.recon[2])
