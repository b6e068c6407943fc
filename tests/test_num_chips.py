"""cfg.num_chips consumption: all-intra chunks shard their frame axis
over the chip mesh bit-transparently (api._dispatch_i_chunk ->
intra_frame.encode_i_chunk_sharded)."""
import numpy as np
import jax
import pytest

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import EncoderConfig


def _frames(n=8, h=64, w=128, seed=4):
    rng = np.random.default_rng(seed)
    g = np.mgrid[0:h + 8, 0:w + 8]
    base = np.clip(((g[1] * 5 + g[0] * 3) % 221)
                   + rng.integers(0, 18, g[0].shape), 0, 255) \
        .astype(np.uint8)
    return [(base[i:i + h, i:i + w],
             base[0:h // 2, i:i + w // 2],
             base[4:4 + h // 2, i:i + w // 2]) for i in range(n)]


def test_num_chips_all_intra_bit_transparent():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    frames = _frames()

    def run(num_chips):
        cfg = EncoderConfig(width=128, height=64, qp=33, intra_period=1,
                            intra_frames_per_launch=8,
                            num_chips=num_chips)
        enc = Encoder(cfg)
        out = []
        for f in frames:
            out.extend(enc.encode_async(*f))
        out.extend(enc.flush())
        return b"".join(fr.nalus for fr in out)

    assert run(4) == run(1)


def test_num_chips_ippp_bit_transparent():
    """num_chips>1 on an IPPP config routes P chunks through the
    row-sharded chunk program (api._p_mesh); the stream must be
    byte-identical to single-chip (VERDICT r3 item 5)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 (virtual) devices")
    frames = _frames(n=3, h=120, w=128, seed=6)   # padded to 2 CTU rows

    def run(num_chips):
        cfg = EncoderConfig(width=128, height=120, qp=31,
                            intra_period=100, frames_per_launch=2,
                            num_chips=num_chips)
        enc = Encoder(cfg)
        out = []
        for f in frames:
            out.extend(enc.encode_async(*f))
        out.extend(enc.flush())
        return b"".join(fr.nalus for fr in out)

    assert run(2) == run(1)


@pytest.mark.parametrize("variant", ["cbr", "adaptive_qp", "multiref",
                                     "wpp_substreams"])
def test_num_chips_ippp_feature_matrix(variant):
    """num_chips>1 combined with CBR / adaptive QP / multiref / WPP
    substreams must stay byte-identical to single-chip (VERDICT r4
    item 9: the default path was the only covered combination)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 (virtual) devices")
    frames = _frames(n=5, h=120, w=128, seed=9)

    from homerhevc_tpu.config import BitrateMode
    kw = dict(width=128, height=120, qp=31, intra_period=100,
              frames_per_launch=2, deblocking=True, sao=True)
    if variant == "cbr":
        kw.update(bitrate_mode=BitrateMode.CBR, bitrate=150,
                  frame_rate=25)
    elif variant == "adaptive_qp":
        kw.update(adaptive_qp=True)
    elif variant == "multiref":
        kw.update(num_ref_frames=2)
    elif variant == "wpp_substreams":
        kw.update(wpp_substreams=True)

    def run(num_chips):
        enc = Encoder(EncoderConfig(num_chips=num_chips, **kw))
        out = []
        for f in frames:
            out.extend(enc.encode_async(*f))
        out.extend(enc.flush())
        return b"".join(fr.nalus for fr in out)

    assert run(2) == run(1)


def test_num_chips_tiles_all_intra():
    """Tiles + num_chips>1 (all-intra data-parallel chunks)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 (virtual) devices")
    frames = _frames(n=4, h=128, w=256, seed=10)

    def run(num_chips):
        cfg = EncoderConfig(width=256, height=128, qp=33,
                            intra_period=1, intra_frames_per_launch=4,
                            tile_cols=2, tile_rows=1,
                            num_chips=num_chips)
        enc = Encoder(cfg)
        out = []
        for f in frames:
            out.extend(enc.encode_async(*f))
        out.extend(enc.flush())
        return b"".join(fr.nalus for fr in out)

    assert run(2) == run(1)
