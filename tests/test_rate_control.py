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


def _moving_frames(n, h, w, noise=16, seed=7):
    rng = np.random.default_rng(seed)
    m = 2 * n + 8
    g = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((g[1] * 3 + g[0] * 2) % 235)
                   + rng.integers(0, noise, g[0].shape), 0, 255) \
        .astype(np.uint8)
    out = []
    for i in range(n):
        dx, dy = (2 * i) % m, i % m
        out.append((np.ascontiguousarray(base[dy:dy + h, dx:dx + w]),
                    np.ascontiguousarray(
                        base[dy // 2:dy // 2 + h // 2,
                             dx // 2:dx // 2 + w // 2]),
                    np.ascontiguousarray(
                        base[dy // 2 + 4:dy // 2 + 4 + h // 2,
                             dx // 2 + 4:dx // 2 + 4 + w // 2])))
    return out


def _encode_cbr(cfg, frames):
    enc = Encoder(cfg)
    bits = {}
    for f in frames:
        for fr in enc.encode_async(*f):
            bits[fr.poc] = fr.bits
    for fr in enc.flush():
        bits[fr.poc] = fr.bits
    return [bits[p] for p in sorted(bits)], enc


def test_project_chunk_is_pure_and_per_frame():
    """project_chunk returns k per-frame QPs without mutating the real
    state, and matches the on-target start/end recurrence."""
    cfg = EncoderConfig(bitrate_mode=BitrateMode.CBR, bitrate=400,
                        frame_rate=25)
    rc = RateControl(cfg)
    rc.start_pic(True)
    rc.end_pic(60000, True)
    before = rc.state_dict()
    qps = rc.project_chunk(4)
    assert rc.state_dict() == before
    assert len(qps) == 4 and all(isinstance(q, int) for q in qps)
    # recurrence check: a shadow fed model-predicted bits (no model
    # learning) reproduces the QPs
    sh = RateControl(cfg)
    sh.load_state_dict(before)
    expect = []
    for _ in range(4):
        q = sh.start_pic(False)
        expect.append(q)
        sh.end_pic(int(sh.predict_bits(q, False)), False, qp=q,
                   learn=False)
    assert qps == expect


def test_cbr_bitrate_step_tracks_new_target():
    """Mid-stream bitrate reconfiguration (control/HENC_SETCFG) must be
    followed by the measured rate within a convergence window (VERDICT
    r3 item 6; ref hmr_rate_control.c:89-136)."""
    w, h = 128, 64
    frames = _moving_frames(36, h, w)
    base = dict(width=w, height=h, qp=32, intra_period=100,
                deblocking=True, sao=True, frame_rate=25,
                bitrate_mode=BitrateMode.CBR, frames_per_launch=4)
    cfg1 = EncoderConfig(bitrate=400, **base)
    enc = Encoder(cfg1)
    bits = []
    for f in frames[:18]:
        bits += [fr.bits for fr in enc.encode_async(*f)]
    bits += [fr.bits for fr in enc.flush()]
    # reconfigure to half the rate mid-stream
    enc.control(EncoderConfig(bitrate=200, **base))
    bits2 = []
    for f in frames[18:]:
        bits2 += [fr.bits for fr in enc.encode_async(*f)]
    bits2 += [fr.bits for fr in enc.flush()]
    t1 = 400 * 1000 / 25
    t2 = 200 * 1000 / 25
    tail1 = bits[6:]          # skip the IDR + convergence
    tail2 = bits2[6:]         # skip the forced IDR + convergence
    assert 0.4 * t1 < sum(tail1) / len(tail1) < 1.6 * t1
    assert 0.4 * t2 < sum(tail2) / len(tail2) < 1.6 * t2
    # the step must actually reduce the rate
    assert sum(tail2) / len(tail2) < 0.75 * (sum(tail1) / len(tail1))


def test_cbr_vbv_pressure_raises_qp():
    """Starved VBV (noisy content at a low bitrate) must push QP up
    within the first chunks and keep the buffer in bounds (role of the
    vbv_corrector, ref hmr_rate_control.c:261-337)."""
    w, h = 128, 64
    frames = _moving_frames(24, h, w, noise=64, seed=3)
    cfg = EncoderConfig(width=w, height=h, qp=20, intra_period=100,
                        deblocking=True, sao=True, frame_rate=25,
                        bitrate_mode=BitrateMode.CBR, bitrate=60,
                        vbv_size=0.5, vbv_init=0.8,
                        frames_per_launch=4)
    enc = Encoder(cfg)
    qps_seen = []
    orig_project = enc._rc.project_chunk

    def spy(k):
        qps = orig_project(k)
        qps_seen.extend(qps)
        return qps
    enc._rc.project_chunk = spy
    bits = []
    for f in frames:
        bits += [fr.bits for fr in enc.encode_async(*f)]
    bits += [fr.bits for fr in enc.flush()]
    assert 0.0 <= enc._rc.vbv_fullness <= enc._rc.vbv_size
    # under pressure the projected QPs must ramp well above the start
    assert max(qps_seen) >= qps_seen[0] + 6
    # and within a chunk the projection reacts (non-constant per-frame
    # QP in at least one chunk while the buffer drains)
    chunks = [qps_seen[i:i + 4] for i in range(0, len(qps_seen) - 3, 4)]
    assert any(len(set(c)) > 1 for c in chunks)
    # the tail must be rate-bounded
    tail = bits[8:]
    target = 60 * 1000 / 25
    assert sum(tail) / len(tail) < 1.6 * target


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


def test_cbr_wpp_substreams_with_cu_qp_delta_conformant():
    """WPP substreams + per-CTU QP together (VERDICT r4 item 6): the
    device QP chain models the per-row QpY_prev reset, so the stream
    must decode bit-exactly with both features on."""
    from tools import de265
    w, h = 128, 128
    frames = _moving_frames(6, h, w)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=100,
                        deblocking=True, sao=True, frame_rate=25,
                        bitrate_mode=BitrateMode.CBR, bitrate=250,
                        adaptive_qp=True, wpp_substreams=True,
                        frames_per_launch=2)
    enc = Encoder(cfg)
    stream, frs = b"", []
    for f in frames:
        fr = enc.encode(*f)          # sync: recon rides along
        frs.append(fr)
        stream += fr.nalus
    dec = de265.decode(stream)
    assert len(dec) == len(frames)
    for i, fr in enumerate(frs):
        for d, r in zip(dec[i], fr.recon):
            np.testing.assert_array_equal(np.asarray(d), r)
