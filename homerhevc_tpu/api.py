"""Public encoder API (reference parity: homer_hevc_enc_api.h).

Surface mirrors HOMER_enc_init / HOMER_enc_control / HOMER_enc_encode /
HOMER_enc_get_coded_frame / HOMER_enc_write_annex_b_output /
HOMER_enc_close (ref: homer_hevc_enc_api.h:167-172), re-shaped as a
Python class around the TPU pipeline: device compute (JAX) produces a
FrameRecord per frame, the native host library entropy-codes it.
"""
from __future__ import annotations

import concurrent.futures
import dataclasses
from typing import BinaryIO, Optional

import jax
import numpy as np

from homerhevc_tpu.config import EncoderConfig, PerfMode, RDMode
from homerhevc_tpu.entropy import binding
from homerhevc_tpu.models import inter_frame, intra_frame
from homerhevc_tpu.rc import RateControl
from homerhevc_tpu.utils.profiler import stage


@dataclasses.dataclass
class CodedFrame:
    """Output unit (role of encoder_in_out_t / nalu_t sets)."""
    poc: int
    nalus: bytes            # Annex-B bytes (parameter sets + slice)
    bits: int
    recon: Optional[tuple] = None  # (Y, U, V) uint8, cropped
    psnr: Optional[tuple] = None


def _start_d2h(arr):
    """Enqueue the device->host copy right behind the compute that
    produces `arr` (the worker's np.asarray then finds the bytes
    already in flight instead of paying a fresh round trip on the
    high-latency link)."""
    try:
        arr.copy_to_host_async()
    except Exception:       # backend without async copies: harmless
        pass


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
        self._ref2 = None      # the one before (list0 idx 1, multi-ref)
        self._out: list[CodedFrame] = []
        self._pending: list = []
        self._inbuf: list = []
        self._rc = RateControl(cfg)
        self._per_ctu_qp = bool(self.ccfg.cu_qp_delta_enabled)
        # intra NxN (4x4 PUs + DST) on by default: the reference's
        # default operating point includes 4x4 TBs (max_intra_tr_depth
        # 2, homer_app.c:99) and they are decisive at high QP
        # (measured: -8% bits AND +1.1 dB Y at QP38 all-intra).  The
        # 4x4 z-order pass deepens the wavefront, so ULTRAFAST drops it.
        self._search_nxn = (cfg.rd_mode != RDMode.RD_ULTRAFAST
                            and cfg.max_pred_depth >= 4)
        self._force_idr = False
        self._last_intra_cand_frac = 0.0
        self._p_mesh_cache = "unset"      # resolved lazily per config
        self._mesh_cache = None
        # single host worker: transfer + entropy of chunk N-1 overlap
        # the device compute of chunk N (FIFO => deterministic output
        # order; RC sees the same 1-chunk lag as the inline pipeline)
        self._worker = concurrent.futures.ThreadPoolExecutor(
            max_workers=1)

    def _p_ladder_knobs(self) -> dict:
        """Speed-ladder knobs of the P pipeline per rd_mode (measured
        on TPU — fps/RD table in STATUS.md).  merge_rounds: coherence
        rounds of the merge/skip RD; fallback_rounds: isolated-intra
        growth rounds; quadtree_majority: evaluate non-MV-uniform
        32/64 parents at the majority MV (ref's large-CU search,
        hmr_motion_inter.c:2503)."""
        rd = self.cfg.rd_mode
        if rd == RDMode.RD_FULL:
            return dict(merge_rounds=2, fallback_rounds=2,
                        quadtree_majority=True, inter_nxn=True)
        if rd == RDMode.RD_FAST:
            return dict(merge_rounds=2, fallback_rounds=2,
                        quadtree_majority=True, inter_nxn=True)
        return dict(merge_rounds=1, fallback_rounds=1,
                    quadtree_majority=False, inter_nxn=False)

    def _p_mesh(self):
        """Row-band mesh for IPPP chunks (the WPP analogue wired into
        the product path, ref hmr_encoder_lib.c:2357): bands must be
        CTU-row-aligned, so the effective chip count is the largest
        divisor of the padded CTU-row count <= cfg.num_chips."""
        want = self.cfg.num_chips
        if want <= 1:
            return None
        if getattr(self, "_p_mesh_cache", "unset") != "unset":
            return self._p_mesh_cache
        import jax
        from jax.sharding import Mesh
        rows = self.cfg.padded_height // self.cfg.ctu_size
        n = max([d for d in range(1, min(want, rows, len(jax.devices()))
                                  + 1) if rows % d == 0])
        self._p_mesh_cache = None if n <= 1 else Mesh(
            np.asarray(jax.devices()[:n]), ("row",))
        return self._p_mesh_cache

    def _chip_mesh(self, k: int):
        """Mesh over cfg.num_chips devices for chunk sharding, or None
        when single-chip / not divisible / not enough devices."""
        n = self.cfg.num_chips
        if n <= 1 or k % n != 0:
            return None
        if getattr(self, "_mesh_cache", None) is not None:
            return self._mesh_cache
        import jax
        from jax.sharding import Mesh
        if len(jax.devices()) < n:
            return None
        self._mesh_cache = Mesh(np.asarray(jax.devices()[:n]), ("gop",))
        return self._mesh_cache

    # -- control (HENC_SETCFG re-configuration) --
    def control(self, cfg: EncoderConfig):
        """Reconfigure mid-stream.  Drains in-flight work first (the
        reference stops/joins its engine threads before reconfiguring,
        hmr_encoder_lib.c:525-536) so no buffered frames are dropped;
        already-coded output stays available via get_coded_frame()."""
        if getattr(self, "_worker", None) is not None:
            self.flush()
            self._worker.shutdown(wait=True)
        out = list(getattr(self, "_out", []))
        self.__init__(cfg)
        self._out = out

    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
               compute_recon: bool = True) -> CodedFrame:
        """Encode one frame, blocking until its bytes are ready."""
        pend = self._dispatch(y, u, v, compute_recon)
        frames = self._finalize(pend)
        for fr in frames:
            self._account(fr)
        return frames[0]

    def encode_async(self, y: np.ndarray, u: np.ndarray, v: np.ndarray
                     ) -> list:
        """Pipelined encode (role of the reference's engine pipeline,
        hmr_encoder_lib.c:2640): buffers up to cfg.frames_per_launch P
        frames into one device program (lax.scan over the reference
        dependency — one dispatch + one transfer per chunk, amortizing
        the host<->device round trip), entropy-coding the previous
        chunk on the host while the device computes.  Returns the list
        of newly completed CodedFrames (possibly empty); drain the tail
        with flush().  Do not mix with the synchronous encode()."""
        done = []
        if self.cfg.intra_period == 1:
            # all-intra: frames are independent -> chunk them too
            self._inbuf.append((y, u, v))
            if len(self._inbuf) >= max(
                    self.cfg.intra_frames_per_launch, 1):
                done += self._flush_inbuf()
            done += self._drain(keep=1)
            return done
        next_poc = self._poc + len(self._inbuf)
        # intra_period == 0: only the stream's first frame is intra
        # (ref hmr_encoder_lib.c:1602) — IDR only at start / on force
        is_idr = (self.cfg.intra_period > 1
                  and next_poc % self.cfg.intra_period == 0) or \
            (self._ref is None and not self._pending
             and not self._inbuf) or self._force_idr
        if is_idr:
            done += self._flush_inbuf()
            self._force_idr = False
            self._pending.append(
                self._submit(self._dispatch_i(y, u, v, False)))
        else:
            self._inbuf.append((y, u, v))
            if len(self._inbuf) >= max(self.cfg.frames_per_launch, 1):
                done += self._flush_inbuf()
        done += self._drain(keep=1)
        return done

    def flush(self) -> list:
        done = self._flush_inbuf()
        done += self._drain(keep=0)
        return done

    def _submit(self, pend):
        return self._worker.submit(self._finalize, pend)

    def _drain(self, keep: int) -> list:
        """Collect finalized chunks in FIFO order, keeping up to `keep`
        in flight."""
        done = []
        while len(self._pending) > keep:
            frs = self._pending.pop(0).result()
            # RC + scene-change bookkeeping happens HERE, on the main
            # thread at the deterministic FIFO drain point (the worker
            # thread only transfers + entropy-codes), so the per-frame
            # QP sequence is independent of thread timing
            for fr in frs:
                self._account(fr)
            self._out.extend(frs)
            done += frs
        return done

    def _account(self, fr: CodedFrame):
        """Post-frame rate-control and scene-change bookkeeping (role of
        hmr_rc_end_pic + the intra-ratio scene check, ref
        hmr_encoder_lib.c:2767, hmr_motion_inter.c:2836)."""
        is_idr = fr._is_idr
        if self._rc.enabled:
            # refresh the real state's per-picture target before the
            # VBV update (the dispatched QPs came from a projection;
            # start_pic is idempotent between end_pic calls)
            self._rc.start_pic(is_idr)
        self._rc.end_pic(fr.bits, is_idr, avg_dist=fr._dist,
                         qp=getattr(fr, "_qp", None))
        self._last_intra_cand_frac = fr._intra_frac
        if (not is_idr and self.cfg.scene_change_reinit
                and self.cfg.intra_period != 1
                and fr._intra_frac > 0.5):
            self._force_idr = True

    def _flush_inbuf(self) -> list:
        """Dispatch buffered frames as one chunk; collect overdue
        results."""
        if self._inbuf:
            frames = self._inbuf
            self._inbuf = []
            if self.cfg.intra_period == 1:
                self._pending.append(
                    self._submit(self._dispatch_i_chunk(frames)))
            else:
                self._pending.append(
                    self._submit(self._dispatch_p_chunk(frames)))
        return self._drain(keep=1)

    def _dispatch_i_chunk(self, frames):
        cfg = self.cfg
        ctu = cfg.ctu_size
        n_real = len(frames)
        k = max(cfg.intra_frames_per_launch, 1)
        frames = list(frames) + [frames[-1]] * (k - n_real) \
            if n_real < k else list(frames)
        yps = np.stack([_pad_plane(np.asarray(f[0], np.uint8), ctu)
                        for f in frames])
        ups = np.stack([_pad_plane(np.asarray(f[1], np.uint8), ctu // 2)
                        for f in frames])
        vps = np.stack([_pad_plane(np.asarray(f[2], np.uint8), ctu // 2)
                        for f in frames])
        qp = self._rc.start_pic(True)
        s8 = cfg.rd_mode != RDMode.RD_ULTRAFAST \
            and cfg.max_pred_depth >= 3
        ikw = dict(
            ctu=ctu,
            sign_hiding=cfg.sign_hiding, deblocking=cfg.deblocking,
            sao_enabled=cfg.sao,
            search_8x8=s8,
            search_nxn=self._search_nxn,
            scaling_lists=cfg.scaling_lists,
            chroma_qp_offset=cfg.chroma_qp_offset,
            tiles=cfg.tiles,
            rd_refine=cfg.rd_mode == RDMode.RD_FULL,
            tu_split=s8 and cfg.max_intra_tr_depth >= 1,
            vis_h=cfg.height, vis_w=cfg.width,
            true_size=cfg.code_true_size)
        mesh = self._chip_mesh(k)
        if mesh is not None:
            # cfg.num_chips > 1: shard the chunk's frame axis over the
            # chips (bit-transparent — all-intra frames are independent)
            out = intra_frame.encode_i_chunk_sharded_jit(
                yps, ups, vps, qp, mesh=mesh, **ikw)
        else:
            out = intra_frame.encode_i_chunk_jit(yps, ups, vps, qp,
                                                 **ikw)
        self._ref = (out["recon_y"][-1], out["recon_u"][-1],
                     out["recon_v"][-1])
        self._ref2 = None
        _start_d2h(out["packed"])
        pend = dict(kind="i_chunk", out=out, qp=qp, poc=self._poc,
                    gop_poc=0, padded=yps.shape[1:], n=n_real,
                    orig=None)
        self._poc += n_real
        self._gop_poc = 1
        return pend

    # -- stage 1: device compute (async dispatch) --
    def _dispatch(self, y, u, v, compute_recon):
        """Single-frame dispatch (synchronous encode path)."""
        cfg = self.cfg
        is_idr = cfg.intra_period == 1 or \
            (cfg.intra_period > 1
             and self._poc % cfg.intra_period == 0) or \
            self._ref is None or self._force_idr
        self._force_idr = False
        if is_idr:
            return self._dispatch_i(y, u, v, compute_recon)
        return self._dispatch_p_chunk([(y, u, v)], compute_recon, k=1)

    def _dispatch_i(self, y, u, v, compute_recon=False):
        cfg = self.cfg
        ctu = cfg.ctu_size
        yp = _pad_plane(np.asarray(y, np.uint8), ctu)
        up = _pad_plane(np.asarray(u, np.uint8), ctu // 2)
        vp = _pad_plane(np.asarray(v, np.uint8), ctu // 2)
        # NOTE under pipelining the RC state lags (previous frames' bits
        # land in end_pic later) - same topology as the reference's
        # inter-engine RC exchange (hmr_encoder_lib.c:2773).
        qp = self._rc.start_pic(True)
        self._gop_poc = 0
        s8 = cfg.rd_mode != RDMode.RD_ULTRAFAST \
            and cfg.max_pred_depth >= 3
        out = intra_frame.encode_frame_jit(
            yp, up, vp, qp=qp, ctu=ctu,
            sign_hiding=cfg.sign_hiding, deblocking=cfg.deblocking,
            sao_enabled=cfg.sao,
            # the 8x8 split RD is time-amortized (one I frame per GOP)
            # and RD-positive; only rd=ultrafast skips it
            search_8x8=s8,
            search_nxn=self._search_nxn,
            scaling_lists=cfg.scaling_lists,
            chroma_qp_offset=cfg.chroma_qp_offset,
            tiles=cfg.tiles,
            rd_refine=cfg.rd_mode == RDMode.RD_FULL,
            tu_split=s8 and cfg.max_intra_tr_depth >= 1,
            vis_h=cfg.height, vis_w=cfg.width,
            true_size=cfg.code_true_size)
        self._ref = (out["recon_y"], out["recon_u"], out["recon_v"])
        self._ref2 = None
        _start_d2h(out["packed"])
        pend = dict(kind="i", out=out, qp=qp, poc=self._poc,
                    gop_poc=self._gop_poc, padded=yp.shape,
                    orig=(y, u, v) if compute_recon else None)
        self._poc += 1
        self._gop_poc += 1
        return pend

    def _dispatch_p_chunk(self, frames, compute_recon=False, k=None):
        cfg = self.cfg
        ctu = cfg.ctu_size
        n_real = len(frames)
        # pad partial chunks to the compiled chunk size (one program per
        # K): padding re-encodes the last frame; safe because partial
        # flushes only happen right before an IDR or at stream end, so
        # the padded reference is never consumed (the frame-by-frame
        # sync path passes k=1 and never pads)
        if k is None:
            k = max(cfg.frames_per_launch, 1)
        if n_real < k:
            frames = list(frames) + [frames[-1]] * (k - n_real)
            # the padded duplicate's reconstruction becomes self._ref,
            # which differs from what a decoder holds for the real last
            # frame — force the next frame to IDR so the stream stays
            # conformant if encoding continues after this partial flush
            self._force_idr = True
        else:
            frames = list(frames)
        # ONE H2D buffer for the chunk (raw planes; device pads) — the
        # tunneled link charges a ~29 ms fixed cost per transfer
        buf = np.concatenate(
            [np.asarray(f[i], np.uint8).ravel()
             for i in range(3) for f in frames])
        buf_dev = jax.device_put(buf)   # async upload starts now
        # per-frame QP inside the chunk (closed-loop RC projection —
        # the reference's every-picture QP update, hmr_rate_control.c:89)
        qps = self._rc.project_chunk(k)
        qp_vec = np.asarray(qps, np.int32)
        qp_maps = None
        if self._per_ctu_qp:
            from homerhevc_tpu.rc import ctu_qp_map
            qp_maps = np.stack([
                ctu_qp_map(qps[j],
                           _pad_plane(np.asarray(f[0], np.uint8), ctu),
                           ctu)
                for j, f in enumerate(frames)])
        ultra = cfg.rd_mode == RDMode.RD_ULTRAFAST
        ref2_kw = {}
        if cfg.num_ref_frames >= 2:
            # list0 index 1 = the picture before self._ref; the first P
            # after an IDR has no second reference yet -> has_ref2
            # masks the pick (gop_poc counts pictures since the IDR)
            r2 = self._ref2 if self._ref2 is not None else self._ref
            ref2_kw = dict(
                ref2_y=r2[0], ref2_u=r2[1], ref2_v=r2[2],
                has_ref2=np.asarray(
                    [self._gop_poc + j >= 2 for j in range(k)], bool))
        mesh_kw = {}
        pmesh = self._p_mesh()
        if pmesh is not None:
            mesh_kw = dict(mesh=pmesh, row_axis="row")
        out = inter_frame.encode_p_chunk_packed_jit(
            buf_dev, *self._ref, k=k, qp=qp_vec, qp_maps=qp_maps,
            block=16, **mesh_kw,
            vis_h=cfg.height, vis_w=cfg.width,
            true_size=cfg.code_true_size,
            wpp_substreams=cfg.wpp_substreams,
            **ref2_kw,
            sign_hiding=cfg.sign_hiding, deblocking=cfg.deblocking,
            sao_enabled=cfg.sao, ctu=ctu,
            intra_fallback=cfg.intra_in_p and not ultra,
            chroma_rd_scale=3.0 if ultra else 1.0,
            chroma_qp_offset=cfg.chroma_qp_offset,
            me_precision=cfg.motion_estimation_precision,
            scaling_lists=cfg.scaling_lists,
            # perf=FULL searches the complete +-3 qpel reachable set of
            # the reference's half+quarter walk; FAST/UFAST trim to +-2
            me_subpel_r=3 if cfg.performance_mode == PerfMode.FULL_COMPUTATION
            else 2,
            **self._p_ladder_knobs())
        self._ref = (out["recon_y"], out["recon_u"], out["recon_v"])
        if cfg.num_ref_frames >= 2:
            self._ref2 = (out["recon2_y"], out["recon2_u"],
                          out["recon2_v"])
        _start_d2h(out["packed"])
        pend = dict(kind="p", out=out, qps=qps, poc=self._poc,
                    gop_poc=self._gop_poc,
                    padded=(-cfg.height % ctu + cfg.height,
                            -cfg.width % ctu + cfg.width),
                    n=n_real, qp_maps=qp_maps,
                    orig=frames[-1] if compute_recon else None)
        self._poc += n_real
        self._gop_poc += n_real
        return pend

    def _records(self, packed, pend):
        """Per-frame (pk, record, is_idr) triples of a pulled chunk —
        the single definition of the pend format walk (also used by
        tools/pipeline_split.py for stage attribution)."""
        cfg = self.cfg
        if pend["kind"] == "i":
            yield pend, self._i_record(packed, pend, cfg), True
        elif pend["kind"] == "i_chunk":
            for k in range(pend["n"]):
                pk = dict(pend, poc=pend["poc"] + k, gop_poc=0, k=k)
                yield pk, self._i_record(packed[k], pk, cfg), True
        else:
            for k in range(pend["n"]):
                pk = dict(pend, poc=pend["poc"] + k,
                          gop_poc=pend["gop_poc"] + k, k=k)
                yield pk, self._p_record(packed[k], pk, cfg), False

    # -- stage 2: host transfer + entropy --
    def _finalize(self, pend) -> list:
        out = pend["out"]
        with stage("transfer"):
            packed = np.asarray(out["packed"])  # ONE device->host pull
        frames = []
        for pk, rec, is_idr in self._records(packed, pend):
            frames.append(self._emit(rec, pk, is_idr))
        if pend["orig"] is not None:
            y, u, v = pend["orig"]
            fr = frames[-1]
            fr.recon = (
                np.asarray(out["recon_y"], np.uint8)[:y.shape[0],
                                                     :y.shape[1]],
                np.asarray(out["recon_u"], np.uint8)[:u.shape[0],
                                                     :u.shape[1]],
                np.asarray(out["recon_v"], np.uint8)[:v.shape[0],
                                                     :v.shape[1]])
            fr.psnr = tuple(
                _psnr(a, b) for a, b in zip((y, u, v), fr.recon))
        return frames

    def _emit(self, rec, pend, is_idr: bool) -> CodedFrame:
        """Entropy-code one record (worker thread; no shared-state
        mutation — bookkeeping happens in _account at drain time)."""
        with stage("entropy"):
            slice_bytes = binding.encode_slice(self.ccfg, rec)
        nalus = (self._headers if is_idr else b"") + slice_bytes
        frame = CodedFrame(poc=pend["poc"], nalus=nalus,
                           bits=len(slice_bytes) * 8)
        frame._is_idr = is_idr
        frame._intra_frac = pend.get("intra_frac", 0.0)
        frame._dist = pend.get("dist")
        frame._qp = int(pend["qps"][pend["k"]]) if "qps" in pend \
            else int(pend["qp"])
        return frame

    @staticmethod
    def _unpack(packed, h, w, tail_elems):
        ny, nc = h * w, (h // 2) * (w // 2)
        coeff_y = packed[:ny].reshape(h, w)
        coeff_cb = packed[ny:ny + nc].reshape(h // 2, w // 2)
        coeff_cr = packed[ny + nc:ny + 2 * nc].reshape(h // 2, w // 2)
        tail = packed[ny + 2 * nc:]
        return coeff_y, coeff_cb, coeff_cr, tail

    def _apply_sao_fields(self, rec, tail, h, w):
        """Fill the record's SAO maps from the packed tail (device
        layout: type/offsets/band_pos from sao.pack_sao_fields)."""
        from homerhevc_tpu.ops import sao as sao_ops
        ctus_y, ctus_x = h // 64, w // 64
        t, off, bp = sao_ops.unpack_sao_fields(tail, ctus_y, ctus_x)
        n_real = ctus_y * ctus_x
        nctu = (h // 64 + 1) * (w // 64 + 1) * 4
        sao_type = np.zeros(nctu * 3, np.uint8)
        sao_type.reshape(-1, 3)[:n_real] = \
            t.transpose(1, 2, 0).reshape(-1, 3)
        sao_off = np.zeros(nctu * 3 * 4, np.int8)
        sao_off.reshape(-1, 3, 4)[:n_real] = \
            off.transpose(1, 2, 0, 3).reshape(-1, 3, 4)
        sao_bp = np.zeros(nctu * 3, np.uint8)
        sao_bp.reshape(-1, 3)[:n_real] = \
            bp.transpose(1, 2, 0).reshape(-1, 3)
        rec.sao_type = sao_type
        rec.sao_offset = sao_off
        rec.sao_band_pos = sao_bp
        # merge-left / merge-up when the independently-derived params
        # coincide with the neighbour's (role of sao_derive_mode_merge
        # _rdo, ref hmr_sao.c:854, restricted to exact coincidences:
        # identical params -> identical reconstruction, strictly fewer
        # bits, no wavefront needed)
        tg = sao_type.reshape(-1, 3)[:n_real].reshape(ctus_y, ctus_x, 3)
        og = sao_off.reshape(-1, 3, 4)[:n_real] \
            .reshape(ctus_y, ctus_x, 12)
        bg = sao_bp.reshape(-1, 3)[:n_real].reshape(ctus_y, ctus_x, 3)
        allp = np.concatenate([tg, og, bg], axis=-1)
        eq_l = np.zeros((ctus_y, ctus_x), bool)
        eq_l[:, 1:] = (allp[:, 1:] == allp[:, :-1]).all(-1)
        eq_u = np.zeros((ctus_y, ctus_x), bool)
        eq_u[1:, :] = (allp[1:] == allp[:-1]).all(-1)
        # a neighbour in another tile is unavailable (the writer emits
        # no merge flag there — spec 7.3.8.3 leftCtbInTile/upCtbInTile)
        tiles = self.cfg.tiles
        if tiles is not None:
            from homerhevc_tpu.models.schedule import tile_bounds
            for b in tile_bounds(ctus_x, tiles[0])[1:-1]:
                eq_l[:, b] = False
            for b in tile_bounds(ctus_y, tiles[1])[1:-1]:
                eq_u[b, :] = False
        merge = np.where(eq_l, 1, np.where(eq_u, 2, 0)).astype(np.uint8)
        sao_merge = np.zeros(nctu, np.uint8)
        sao_merge[:n_real] = merge.reshape(-1)
        rec.sao_merge = sao_merge
        rec.sao_luma = True
        rec.sao_chroma = True
        return rec

    # -- checkpoint / resume (SURVEY.md §5: cross-frame state is the
    # reference planes + POC counters + RC VBV state; IDR frames are the
    # natural restart points, ref hmr_encoder_lib.c:2792) --
    def save_checkpoint(self, path: str):
        assert not self._pending and not self._inbuf, \
            "flush() before checkpointing"
        state = dict(poc=self._poc, gop_poc=self._gop_poc,
                     rc=self._rc.state_dict())
        if self._ref is not None:
            state["ref_y"] = np.asarray(self._ref[0], np.int32)
            state["ref_u"] = np.asarray(self._ref[1], np.int32)
            state["ref_v"] = np.asarray(self._ref[2], np.int32)
        if self._ref2 is not None:
            state["ref2_y"] = np.asarray(self._ref2[0], np.int32)
            state["ref2_u"] = np.asarray(self._ref2[1], np.int32)
            state["ref2_v"] = np.asarray(self._ref2[2], np.int32)
        np.savez(path, **_flatten_ckpt(state))

    def load_checkpoint(self, path: str):
        z = np.load(path)
        self._poc = int(z["poc"])
        self._gop_poc = int(z["gop_poc"])
        self._rc.load_state_dict(
            {k[3:]: float(z[k]) if k != "rc.num_encoded_frames"
             else int(z[k]) for k in z.files if k.startswith("rc.")})
        if "ref_y" in z.files:
            self._ref = (z["ref_y"], z["ref_u"], z["ref_v"])
        else:
            self._ref = None
        self._ref2 = (z["ref2_y"], z["ref2_u"], z["ref2_v"]) \
            if "ref2_y" in z.files else None
        self._pending.clear()
        self._out.clear()

    def get_coded_frame(self) -> Optional[CodedFrame]:
        return self._out.pop(0) if self._out else None

    @staticmethod
    def write_annex_b_output(frame: CodedFrame, f: BinaryIO):
        f.write(frame.nalus)

    def close(self):
        self._out.clear()

    # -- packed device buffer -> host FrameRecord --
    def _i_record(self, packed, pend, cfg) -> binding.FrameRecord:
        h, w = pend["padded"]
        h4, w4 = h // 4, w // 4
        bh, bw = h // 16, w // 16
        cy, cb, cr, tail = self._unpack(packed, h, w, 0)
        n8 = (2 * bh) * (2 * bw)
        modes8 = tail[:n8].reshape(2 * bh, 2 * bw).astype(np.uint8)
        cmodes8 = tail[n8:2 * n8].reshape(2 * bh, 2 * bw) \
            .astype(np.uint8)
        cbf8 = tail[2 * n8:5 * n8].reshape(3, 2 * bh, 2 * bw) \
            .astype(np.uint8)
        depth = tail[5 * n8:5 * n8 + bh * bw].reshape(bh, bw)
        pend["dist"] = float(tail[5 * n8 + bh * bw])
        sao_tail = tail[5 * n8 + bh * bw + 1:]
        nxn8 = pu4 = None
        if self._search_nxn:
            nxn8 = sao_tail[:n8].reshape(2 * bh, 2 * bw) \
                .astype(np.uint8)
            pu4 = sao_tail[n8:5 * n8].reshape(4 * bh, 4 * bw) \
                .astype(np.int32)
            sao_tail = sao_tail[5 * n8:]
        rep2 = lambda m: np.repeat(np.repeat(m, 2, 0), 2, 1)
        rep4 = lambda m: np.repeat(np.repeat(m, 4, 0), 4, 1)
        mode4 = rep2(modes8)
        # depth granule map: 1 = 32x32 CU, 2 = 16x16 CU, 3 = 8x8 CUs
        qpm = None
        if self._per_ctu_qp:
            qpm = np.full((h // 4, w // 4), pend["qp"], np.int8)
        luma4 = mode4
        cbf_y4 = rep2(cbf8[0])
        # ---- TU-tree relabel (intra TU splits, ref loop 3
        # hmr_motion_intra.c:1226): a quartet of same-mode CUs and one
        # CU with split_transform_flag reconstruct IDENTICALLY (intra
        # prediction is per TB), so fold shared-mode quartets into the
        # parent CU with tr_depth 1 — strictly fewer bits, recon
        # untouched.  Device decisions are unchanged; this is a pure
        # syntax-level optimization at the record stage.
        tr16 = np.zeros((bh, bw), np.uint8)
        nxn_any8 = nxn8.astype(bool) if nxn8 is not None \
            else np.zeros_like(modes8, bool)
        # the 8->16 / 16->32 folds emit real split_transform_flag=1
        # trees, which need max_intra_tr_depth >= 1 (the 32->64 fold's
        # split is FORCED by log2CbSize > MaxTbLog2 and stays legal)
        fold_ok = cfg.max_intra_tr_depth >= 1

        def quartets(a, s):
            return a[:a.shape[0] // s * s, :a.shape[1] // s * s] \
                .reshape(a.shape[0] // s, s, a.shape[1] // s, s)

        # 8x8 quartets (depth 3, 2Nx2N) with one (luma, chroma) mode
        # -> 16x16 CU with four 8x8 TBs
        m8q = quartets(modes8, 2)
        c8q = quartets(cmodes8, 2)
        same8 = (fold_ok
                 & (m8q == m8q[:, :1, :, :1]).all((1, 3))
                 & (c8q == c8q[:, :1, :, :1]).all((1, 3))
                 & ~quartets(nxn_any8, 2).any((1, 3))
                 & (depth == 3))
        depth = np.where(same8, 2, depth)
        tr16 = np.where(same8, 1, tr16).astype(np.uint8)
        # 16x16 quartets (depth 2, tr 0) with one mode -> 32x32 CU
        # with four 16x16 TBs
        d16q = quartets(depth, 2)
        t16q = quartets(tr16, 2)
        m16q = quartets(modes8, 4)
        c16q = quartets(cmodes8, 4)
        same16 = (fold_ok
                  & (d16q == 2).all((1, 3)) & (t16q == 0).all((1, 3))
                  & (m16q == m16q[:, :1, :, :1]).all((1, 3))
                  & (c16q == c16q[:, :1, :, :1]).all((1, 3)))
        if cfg.code_true_size:
            # a 32-CU straddling the coded bounds cannot be signalled
            # (the writer implicit-splits it, and TB16s under trd=1
            # would not match the folded recon) — keep such quartets
            # as 16-CUs
            j32 = np.arange(same16.shape[1])
            i32 = np.arange(same16.shape[0])
            inside32 = ((32 * (j32 + 1) <= cfg.coded_width)[None, :]
                        & (32 * (i32 + 1) <= cfg.coded_height)[:, None])
            same16 = same16 & inside32
        m32 = np.zeros((bh, bw), bool)          # odd grid tails stay
        m32[:bh // 2 * 2, :bw // 2 * 2] = \
            np.repeat(np.repeat(same16, 2, 0), 2, 1)
        depth = np.where(m32, 1, depth)
        tr16 = np.where(m32, 1, tr16).astype(np.uint8)
        # ---- 64x64 intra CUs (VERDICT r3 item 4 / ref 64-CU search,
        # hmr_sse42_functions_prediction.c:45): four 32x32 CUs (depth
        # 1, tr 0 — each one 32 TB) with one (luma, chroma) mode fold
        # into a depth-0 CU.  log2CbSize 6 > MaxTbLog2 5 forces the TU
        # split to four 32 TBs with per-TB prediction and four 16
        # chroma TBs (spec 7.3.8.8) — exactly what the four 32-CUs
        # reconstructed, so recon is untouched and three mode
        # signalings + split flags are saved.
        d32q = quartets(depth, 4)
        t32q = quartets(tr16, 4)
        m32q = quartets(modes8, 8)
        c32q = quartets(cmodes8, 8)
        same32 = ((d32q == 1).all((1, 3)) & (t32q == 0).all((1, 3))
                  & (m32q == m32q[:, :1, :, :1]).all((1, 3))
                  & (c32q == c32q[:, :1, :, :1]).all((1, 3)))
        m64 = np.zeros((bh, bw), bool)
        m64[:bh // 4 * 4, :bw // 4 * 4] = \
            np.repeat(np.repeat(same32, 4, 0), 4, 1)
        depth = np.where(m64, 0, depth)
        # depth-0 CUs: the forced split at 64 IS trafoDepth 1; keep
        # tr16 = 0 here (the writer derives the forced split from the
        # CU size, spec 7.3.8.8 interSplitFlag/MaxTb clause)
        tr16 = np.where(m64, 0, tr16).astype(np.uint8)
        part4 = None
        if nxn8 is not None and nxn8.any():
            # NxN CUs: per-4x4 PU modes and TB cbfs from the packed PU
            # map (mode | cbf << 8); part_size=1 at those 8x8 CUs
            nxn4 = rep2(nxn8).astype(bool)
            luma4 = np.where(nxn4, (pu4 & 0xff).astype(np.uint8),
                             mode4)
            cbf_y4 = np.where(nxn4, ((pu4 >> 8) & 1).astype(np.uint8),
                              cbf_y4)
            part4 = rep2(nxn8).astype(np.uint8)
        rec = binding.FrameRecord(
            width=w, height=h, slice_type=2, slice_qp=pend["qp"],
            poc=pend["gop_poc"], is_idr=True, qp_map=qpm,
            cu_depth=rep4(np.clip(depth, 0, 3)).astype(np.uint8),
            tr_depth=rep4(tr16),
            intra_luma_mode=luma4,
            intra_chroma_mode=rep2(cmodes8),   # 5-candidate search
            part_size=part4,
            cbf_y=cbf_y4, cbf_cb=rep2(cbf8[1]),
            cbf_cr=rep2(cbf8[2]),
            coeff_y=cy, coeff_cb=cb, coeff_cr=cr,
            pred_mode=np.ones((h4, w4), np.uint8),
        )
        if cfg.sao:
            rec = self._apply_sao_fields(rec, sao_tail, h, w)
        return rec

    def _p_record(self, packed, pend, cfg) -> binding.FrameRecord:
        from homerhevc_tpu.models.inter_frame import p_caps
        from homerhevc_tpu.ops import packing
        h, w = pend["padded"]
        h4, w4 = h // 4, w // 4
        bh, bw = h // 16, w // 16
        nb = bh * bw
        mv = packed[:nb * 2].reshape(bh, bw, 2)          # per-16 CU MV
        o = nb * 2
        ref_idx = packed[o:o + nb].reshape(bh, bw).astype(np.uint8)
        cbf = packed[o + nb:o + 4 * nb].reshape(3, bh, bw) \
            .astype(np.uint8)
        is_intra = packed[o + 4 * nb:o + 5 * nb].reshape(bh, bw) \
            .astype(np.uint8)
        imodes = packed[o + 5 * nb:o + 6 * nb].reshape(bh, bw) \
            .astype(np.uint8)
        cu_depth = packed[o + 6 * nb:o + 7 * nb].reshape(bh, bw) \
            .astype(np.uint8)
        tr_depth = packed[o + 7 * nb:o + 8 * nb].reshape(bh, bw) \
            .astype(np.uint8)
        # split-CU sidebands: per-8 MV deltas (dy|dx<<8 int8 pairs) and
        # per-16 packed sub-CU TB cbfs (4 x (y|cb<<1|cr<<2))
        mvd8p = packed[o + 8 * nb:o + 12 * nb].view(np.uint16) \
            .reshape(2 * bh, 2 * bw)
        mvd8 = np.stack([(mvd8p & 0xFF).astype(np.uint8).view(np.int8),
                         (mvd8p >> 8).astype(np.uint8).view(np.int8)],
                        -1).astype(np.int16)
        cbf8_blk = packed[o + 12 * nb:o + 13 * nb].reshape(bh, bw)
        cbf8 = np.zeros((2 * bh, 2 * bw), np.uint8)
        for q, (qy, qx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            cbf8[qy::2, qx::2] = (cbf8_blk >> (3 * q)) & 7
        pend["intra_frac"] = float(packed[o + 13 * nb]) / nb
        pend["dist"] = float(packed[o + 13 * nb + 1])
        from homerhevc_tpu.models.inter_frame import p_caps_small
        cap_ys, cap_cs, esc_ys, esc_cs = p_caps_small(nb)
        off = o + 13 * nb + 2
        sz_ys = packing.compact_i8_size(cap_ys, 16, esc_ys)
        sz_cs = packing.compact_i8_size(cap_cs, 8, esc_cs)
        cnt_y, blk_y = packing.unpack_blocks_i8(packed[off:off + sz_ys],
                                                cap_ys, 16, nb, esc_ys)
        off += sz_ys
        cnt_b, blk_b = packing.unpack_blocks_i8(packed[off:off + sz_cs],
                                                cap_cs, 8, nb, esc_cs)
        off += sz_cs
        cnt_r, blk_r = packing.unpack_blocks_i8(packed[off:off + sz_cs],
                                                cap_cs, 8, nb, esc_cs)
        off += sz_cs
        sao_tail = packed[off:]
        if blk_y is None or blk_b is None or blk_r is None:
            # small-tier overflow: one extra pull of this frame's full
            # tier (graceful; content-dependent, rare at normal QPs)
            cap_y, cap_c, esc_y, esc_c = p_caps(nb)
            # ONE pull for the whole chunk's full tier, cached on the
            # SHARED out dict (per-frame pends are copies; per-frame
            # pulls cost a tunnel round trip each)
            if "_pf_host" not in pend["out"]:
                pend["out"]["_pf_host"] = np.asarray(
                    pend["out"]["packed_full"])
            pf = pend["out"]["_pf_host"]
            if pf.ndim == 2:
                pf = pf[pend["k"]]
            sz_y = packing.compact_i8_size(cap_y, 16, esc_y)
            sz_c = packing.compact_i8_size(cap_c, 8, esc_c)
            if blk_y is None:
                cnt_y, blk_y = packing.unpack_blocks_i8(
                    pf[:sz_y], cap_y, 16, nb, esc_y)
            if blk_b is None:
                cnt_b, blk_b = packing.unpack_blocks_i8(
                    pf[sz_y:sz_y + sz_c], cap_c, 8, nb, esc_c)
            if blk_r is None:
                cnt_r, blk_r = packing.unpack_blocks_i8(
                    pf[sz_y + sz_c:sz_y + 2 * sz_c], cap_c, 8, nb,
                    esc_c)

        def plane(blocks, hh, ww, b):
            return np.ascontiguousarray(
                blocks.reshape(hh // b, ww // b, b, b)
                .transpose(0, 2, 1, 3).reshape(hh, ww))

        # overflow fallback: pull the raw planes (rare; low QP content);
        # chunked pends carry [K, ...] planes, indexed by pend["k"]
        out = pend["out"]

        def raw(name):
            arr = out[name]
            if arr.ndim == 3:
                arr = arr[pend["k"]]
            return np.asarray(arr)

        cy = plane(blk_y, h, w, 16) if blk_y is not None else raw("coeff_y")
        cb = plane(blk_b, h // 2, w // 2, 8) if blk_b is not None \
            else raw("coeff_cb")
        cr = plane(blk_r, h // 2, w // 2, 8) if blk_r is not None \
            else raw("coeff_cr")
        k = 4
        rep = lambda m: np.repeat(np.repeat(m, k, 0), k, 1)
        rep2 = lambda m: np.repeat(np.repeat(m, 2, 0), 2, 1)
        imode4 = rep(imodes)
        mv8 = rep2(mv).astype(np.int16) + mvd8   # per-8x8 sub-CU MVs
        mv4 = rep2(mv8)                  # per-4x4 from per-8x8 sub-CUs
        # cbf maps: per-16 TBs except under split CUs (four TB8/TB4s)
        split4 = rep(cu_depth == 3)
        cbf_y4 = np.where(split4, rep2(cbf8 & 1), rep(cbf[0]))
        cbf_cb4 = np.where(split4, rep2((cbf8 >> 1) & 1), rep(cbf[1]))
        cbf_cr4 = np.where(split4, rep2((cbf8 >> 2) & 1), rep(cbf[2]))
        qpm = None
        if pend.get("qp_maps") is not None:
            r = cfg.ctu_size // 4
            qpm = np.repeat(np.repeat(
                pend["qp_maps"][pend["k"]], r, 0), r, 1).astype(np.int8)
        rec = binding.FrameRecord(
            width=w, height=h, slice_type=1,
            slice_qp=int(pend["qps"][pend["k"]]),
            poc=pend["gop_poc"], is_idr=False, num_merge_cands=2,
            cu_depth=rep(cu_depth), tr_depth=rep(tr_depth),
            pred_mode=rep(is_intra),
            intra_luma_mode=imode4, intra_chroma_mode=imode4,  # DM
            mv_x=np.ascontiguousarray(mv4[..., 1]),
            mv_y=np.ascontiguousarray(mv4[..., 0]),
            cbf_y=np.ascontiguousarray(cbf_y4.astype(np.uint8)),
            cbf_cb=np.ascontiguousarray(cbf_cb4.astype(np.uint8)),
            cbf_cr=np.ascontiguousarray(cbf_cr4.astype(np.uint8)),
            coeff_y=cy, coeff_cb=cb, coeff_cr=cr,
            qp_map=qpm,
            ref_idx=rep(ref_idx),
            # active list0 refs for THIS frame: pictures since the IDR
            # (pend["gop_poc"] is already per-frame here), capped by the
            # configured DPB depth (the first P after an IDR has one)
            num_ref_l0=max(1, min(cfg.num_ref_frames,
                                  pend["gop_poc"])),
        )
        if cfg.sao:
            rec = self._apply_sao_fields(rec, sao_tail, h, w)
        return rec


def _flatten_ckpt(state: dict) -> dict:
    out = {}
    for k, v in state.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                out[f"{k}.{kk}"] = vv
        else:
            out[k] = v
    return out


def _psnr(ref: np.ndarray, rec: np.ndarray) -> float:
    mse = np.mean((np.asarray(ref, np.float64) - np.asarray(rec, np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0 * 255.0 / mse)
