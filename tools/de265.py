"""ctypes wrapper for libde265 — the conformance oracle.

Decodes Annex-B HEVC bitstreams with an independent, conformant decoder
and returns the reconstructed planes, so tests can assert that
(a) our streams parse, and (b) the decoder's reconstruction is
bit-identical to the encoder's own reconstruction (the decode-loop
invariant; see SURVEY.md section 4).
"""
from __future__ import annotations

import ctypes

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL("libde265.so.0")
        lib.de265_new_decoder.restype = ctypes.c_void_p
        lib.de265_push_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int, ctypes.c_int64,
                                        ctypes.c_void_p]
        lib.de265_flush_data.argtypes = [ctypes.c_void_p]
        lib.de265_decode.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int)]
        lib.de265_get_next_picture.restype = ctypes.c_void_p
        lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
        lib.de265_get_image_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.de265_get_image_plane.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                              ctypes.POINTER(ctypes.c_int)]
        lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
        lib.de265_get_error_text.restype = ctypes.c_char_p
        lib.de265_get_error_text.argtypes = [ctypes.c_int]
        try:
            lib.de265_disable_logging()
        except Exception:
            pass
        _lib = lib
    return _lib


def decode(bitstream: bytes, max_frames: int = 10000):
    """Decode an Annex-B byte stream; returns list of (Y, U, V) uint8."""
    lib = _load()
    dec = lib.de265_new_decoder()
    assert dec
    frames = []
    try:
        err = lib.de265_push_data(dec, bitstream, len(bitstream), 0, None)
        if err != 0:
            raise RuntimeError(
                f"de265 push: {lib.de265_get_error_text(err).decode()}")
        lib.de265_flush_data(dec)
        more = ctypes.c_int(1)
        while more.value:
            err = lib.de265_decode(dec, ctypes.byref(more))
            if err not in (0, 1):  # DE265_OK / waiting-for-input
                text = lib.de265_get_error_text(err).decode()
                if "end of stream" in text.lower():
                    break
                raise RuntimeError(f"de265 decode error {err}: {text}")
            img = lib.de265_get_next_picture(dec)
            while img:
                planes = []
                for c in range(3):
                    w = lib.de265_get_image_width(img, c)
                    h = lib.de265_get_image_height(img, c)
                    stride = ctypes.c_int(0)
                    p = lib.de265_get_image_plane(img, c,
                                                  ctypes.byref(stride))
                    buf = np.ctypeslib.as_array(p, shape=(h, stride.value))
                    planes.append(buf[:, :w].copy())
                frames.append(tuple(planes))
                if len(frames) >= max_frames:
                    return frames
                img = lib.de265_get_next_picture(dec)
    finally:
        lib.de265_free_decoder(dec)
    return frames
