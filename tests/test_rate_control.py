"""Rate control: CBR tracking, VBV bounds, conformance with per-frame
QP (traced QP => no recompilation per value)."""
import numpy as np

from homerhevc_tpu.api import Encoder
from homerhevc_tpu.config import BitrateMode, EncoderConfig
from homerhevc_tpu.rc import RateControl


def test_cbr_tracks_target_and_stays_conformant():
    from tools import de265
    rng = np.random.default_rng(7)
    w, h, m = 128, 64, 40
    g = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, 16, g[0].shape), 0, 255) \
        .astype(np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=32, intra_period=100,
                        deblocking=True, sao=True,
                        bitrate_mode=BitrateMode.CBR, bitrate=200,
                        frame_rate=25, vbv_size=1.0, vbv_init=0.6)
    enc = Encoder(cfg)
    stream = b""
    recons, bits = [], []
    for i in range(10):
        dx, dy = (2 * i) % m, i % m
        f = enc.encode(base[dy:dy + h, dx:dx + w],
                       base[dy // 2:dy // 2 + h // 2,
                            dx // 2:dx // 2 + w // 2],
                       base[dy // 2 + 4:dy // 2 + 4 + h // 2,
                            dx // 2 + 4:dx // 2 + 4 + w // 2])
        stream += f.nalus
        recons.append(f.recon)
        bits.append(f.bits)
    decoded = de265.decode(stream)
    assert len(decoded) == 10
    for planes, rec in zip(decoded, recons):
        for d, r in zip(planes, rec):
            np.testing.assert_array_equal(d, r)
    target = 200 * 1000 / 25
    tail = bits[5:]
    assert sum(tail) / len(tail) < 2.0 * target     # converging
    assert 0.0 <= enc._rc.vbv_fullness <= enc._rc.vbv_size


def test_rc_state_roundtrip():
    cfg = EncoderConfig(bitrate_mode=BitrateMode.VBR, bitrate=1250)
    rc = RateControl(cfg)
    rc.start_pic(True)
    rc.end_pic(90000, True)
    rc.start_pic(False)
    rc.end_pic(30000, False, avg_dist=8000)
    st = rc.state_dict()
    rc2 = RateControl(cfg)
    rc2.load_state_dict(st)
    assert rc2.start_pic(False) == rc.start_pic(False)
    assert rc2.vbv_fullness == rc.vbv_fullness
