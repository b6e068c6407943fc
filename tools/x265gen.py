"""Generate ground-truth HEVC streams with libx265 (via libavcodec ctypes).

Used by conformance tests: x265 output is authoritative spec syntax; our
Python decoder (tools/pydec.py) must parse it bit-exactly.
"""
import ctypes
import numpy as np

_avc = ctypes.CDLL("libavcodec.so.59")
_avu = ctypes.CDLL("libavutil.so.57")
_avc.avcodec_find_encoder_by_name.restype = ctypes.c_void_p
_avc.avcodec_alloc_context3.restype = ctypes.c_void_p
_avc.avcodec_alloc_context3.argtypes = [ctypes.c_void_p]
_avc.av_packet_alloc.restype = ctypes.c_void_p
_avu.av_frame_alloc.restype = ctypes.c_void_p
_avu.av_opt_set.restype = ctypes.c_int
_avu.av_opt_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                            ctypes.c_char_p, ctypes.c_int]
_avc.avcodec_open2.argtypes = [ctypes.c_void_p] * 3
_avc.avcodec_send_frame.argtypes = [ctypes.c_void_p] * 2
_avc.avcodec_receive_packet.argtypes = [ctypes.c_void_p] * 2


def encode(y, u, v, params: str) -> bytes:
    """Encode one frame (uint8 planes) with x265; returns Annex-B bytes."""
    h, w = y.shape
    codec = _avc.avcodec_find_encoder_by_name(b"libx265")
    cctx = _avc.avcodec_alloc_context3(codec)
    ints = ctypes.cast(ctypes.c_void_p(cctx),
                       ctypes.POINTER(ctypes.c_int * 80)).contents
    ints[25] = 1
    ints[26] = 25       # time_base
    ints[29] = w
    ints[30] = h
    ints[33] = 1        # gop
    ints[34] = 0        # pix_fmt yuv420p
    priv = ctypes.cast(ctypes.c_void_p(cctx + 32),
                       ctypes.POINTER(ctypes.c_void_p)).contents.value
    full = params + ":log-level=-1:repeat-headers=1:frame-threads=1:no-wpp=1"
    assert _avu.av_opt_set(priv, b"x265-params", full.encode(), 0) == 0
    assert _avc.avcodec_open2(cctx, codec, None) == 0
    frame = _avu.av_frame_alloc()
    fints = ctypes.cast(ctypes.c_void_p(frame),
                        ctypes.POINTER(ctypes.c_int * 64)).contents
    fints[26] = w
    fints[27] = h
    fints[29] = 0       # format @116
    ctypes.cast(ctypes.c_void_p(frame + 136),
                ctypes.POINTER(ctypes.c_int64)).contents.value = 0  # pts
    planes = [np.ascontiguousarray(p) for p in (y, u, v)]
    dptrs = ctypes.cast(ctypes.c_void_p(frame),
                        ctypes.POINTER(ctypes.c_void_p * 8)).contents
    lsp = ctypes.cast(ctypes.c_void_p(frame + 64),
                      ctypes.POINTER(ctypes.c_int * 8)).contents
    for pl, arr in enumerate(planes):
        dptrs[pl] = arr.ctypes.data
        lsp[pl] = arr.shape[1]
    assert _avc.avcodec_send_frame(cctx, frame) == 0
    _avc.avcodec_send_frame(cctx, None)
    pkt = _avc.av_packet_alloc()
    assert _avc.avcodec_receive_packet(cctx, pkt) == 0
    dp = ctypes.cast(ctypes.c_void_p(pkt + 24),
                     ctypes.POINTER(ctypes.c_void_p)).contents.value
    size = ctypes.cast(ctypes.c_void_p(pkt + 32),
                       ctypes.POINTER(ctypes.c_int)).contents.value
    return ctypes.string_at(dp, size)


def test_frame(w=64, h=64, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 3 + yy * 2) % 200).astype(np.int32)
                + rng.integers(-25, 25, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(128 + rng.integers(-20, 20, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    v = np.clip(128 + rng.integers(-20, 20, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    return y, u, v
