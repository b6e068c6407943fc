"""Public encoder API (reference parity: homer_hevc_enc_api.h).

Surface mirrors HOMER_enc_init / HOMER_enc_control / HOMER_enc_encode /
HOMER_enc_get_coded_frame / HOMER_enc_write_annex_b_output /
HOMER_enc_close (ref: homer_hevc_enc_api.h:167-172), re-shaped as a
Python class around the TPU pipeline: device compute (JAX) produces a
FrameRecord per frame, the native host library entropy-codes it.
"""
from __future__ import annotations

import dataclasses
from typing import BinaryIO, Optional

import numpy as np

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.entropy import binding
from homerhevc_tpu.models import inter_frame, intra_frame


@dataclasses.dataclass
class CodedFrame:
    """Output unit (role of encoder_in_out_t / nalu_t sets)."""
    poc: int
    nalus: bytes            # Annex-B bytes (parameter sets + slice)
    bits: int
    recon: Optional[tuple] = None  # (Y, U, V) uint8, cropped
    psnr: Optional[tuple] = None


def _pad_plane(p: np.ndarray, mult: int) -> np.ndarray:
    h, w = p.shape
    ph = (h + mult - 1) // mult * mult
    pw = (w + mult - 1) // mult * mult
    if (ph, pw) == (h, w):
        return p
    return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")


class Encoder:
    """HEVC encoder: YUV420 8-bit in, Annex-B out."""

    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg.validate()
        self.ccfg = binding.make_cfg(cfg)
        binding.load_library()
        self._headers = binding.write_parameter_sets(self.ccfg)
        self._poc = 0          # frame counter (display = coding order)
        self._gop_poc = 0      # POC since last IDR (slice header POC lsb)
        self._ref = None       # previous frame's (deblocked) recon planes
        self._out: list[CodedFrame] = []

    # -- control (HENC_SETCFG re-configuration) --
    def control(self, cfg: EncoderConfig):
        self.__init__(cfg)

    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
               compute_recon: bool = True) -> CodedFrame:
        """Encode one frame (blocking; the pipelined path is
        Pipeline.encode in pipeline.py)."""
        cfg = self.cfg
        ctu = cfg.ctu_size
        yp = _pad_plane(np.asarray(y, np.uint8), ctu)
        up = _pad_plane(np.asarray(u, np.uint8), ctu // 2)
        vp = _pad_plane(np.asarray(v, np.uint8), ctu // 2)

        is_idr = cfg.intra_period <= 1 or \
            (self._poc % max(cfg.intra_period, 1)) == 0 or self._ref is None
        if is_idr:
            self._gop_poc = 0
            out = intra_frame.encode_frame_jit(
                yp, up, vp, qp=cfg.qp, cu=16, ctu=ctu,
                sign_hiding=cfg.sign_hiding, deblocking=cfg.deblocking)
            rec = self._record_from_device(out, yp.shape, cfg)
        else:
            out = inter_frame.encode_p_frame_jit(
                yp, up, vp, *self._ref, qp=cfg.qp, block=16,
                sign_hiding=cfg.sign_hiding, deblocking=cfg.deblocking)
            rec = self._p_record_from_device(out, yp.shape, cfg)
        self._ref = (out["recon_y"], out["recon_u"], out["recon_v"])
        slice_bytes = binding.encode_slice(self.ccfg, rec)
        nalus = (self._headers if is_idr else b"") + slice_bytes
        frame = CodedFrame(
            poc=self._poc, nalus=nalus, bits=len(slice_bytes) * 8,
            recon=(np.asarray(out["recon_y"], np.uint8)[:y.shape[0], :y.shape[1]],
                   np.asarray(out["recon_u"], np.uint8)[:u.shape[0], :u.shape[1]],
                   np.asarray(out["recon_v"], np.uint8)[:v.shape[0], :v.shape[1]])
            if compute_recon else None,
        )
        if compute_recon:
            frame.psnr = tuple(
                _psnr(a, b) for a, b in zip((y, u, v), frame.recon))
        self._poc += 1
        self._gop_poc += 1
        self._out.append(frame)
        return frame

    def get_coded_frame(self) -> Optional[CodedFrame]:
        return self._out.pop(0) if self._out else None

    @staticmethod
    def write_annex_b_output(frame: CodedFrame, f: BinaryIO):
        f.write(frame.nalus)

    def close(self):
        self._out.clear()

    # -- device output -> host FrameRecord --
    def _record_from_device(self, out, padded_shape, cfg) -> binding.FrameRecord:
        h, w = padded_shape
        h4, w4 = h // 4, w // 4
        modes = np.asarray(out["modes"], np.uint8)      # [bh, bw] 16x16 CUs
        cbf = np.asarray(out["cbf"], np.uint8)
        k = 16 // 4
        mode4 = np.repeat(np.repeat(modes, k, 0), k, 1)
        rec = binding.FrameRecord(
            width=w, height=h, slice_type=2, slice_qp=cfg.qp,
            poc=self._poc, is_idr=True,
            cu_depth=np.full((h4, w4), {64: 0, 32: 1, 16: 2}[16], np.uint8),
            intra_luma_mode=mode4,
            intra_chroma_mode=mode4,           # DM
            cbf_y=np.repeat(np.repeat(cbf[0], k, 0), k, 1),
            cbf_cb=np.repeat(np.repeat(cbf[1], k, 0), k, 1),
            cbf_cr=np.repeat(np.repeat(cbf[2], k, 0), k, 1),
            coeff_y=np.asarray(out["coeff_y"], np.int16),
            coeff_cb=np.asarray(out["coeff_cb"], np.int16),
            coeff_cr=np.asarray(out["coeff_cr"], np.int16),
            pred_mode=np.ones((h4, w4), np.uint8),
        )
        return rec

    def _p_record_from_device(self, out, padded_shape, cfg) \
            -> binding.FrameRecord:
        h, w = padded_shape
        h4, w4 = h // 4, w // 4
        k = 16 // 4
        cbf = np.asarray(out["cbf"], np.uint8)
        mv = np.asarray(out["mv"], np.int16)            # [bh, bw, 2] (y,x)
        rep = lambda m: np.repeat(np.repeat(m, k, 0), k, 1)
        rec = binding.FrameRecord(
            width=w, height=h, slice_type=1, slice_qp=cfg.qp,
            poc=self._gop_poc, is_idr=False, num_merge_cands=2,
            cu_depth=np.full((h4, w4), 2, np.uint8),   # 16x16 CUs (ctu 64)
            pred_mode=np.zeros((h4, w4), np.uint8),    # all inter
            mv_x=rep(mv[..., 1]).astype(np.int16),
            mv_y=rep(mv[..., 0]).astype(np.int16),
            cbf_y=rep(cbf[0]), cbf_cb=rep(cbf[1]), cbf_cr=rep(cbf[2]),
            coeff_y=np.asarray(out["coeff_y"], np.int16),
            coeff_cb=np.asarray(out["coeff_cb"], np.int16),
            coeff_cr=np.asarray(out["coeff_cr"], np.int16),
        )
        return rec


def _psnr(ref: np.ndarray, rec: np.ndarray) -> float:
    mse = np.mean((np.asarray(ref, np.float64) - np.asarray(rec, np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0 * 255.0 / mse)
