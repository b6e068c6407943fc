"""Conformance tests against independent implementations.

1. Writer -> libde265: our native entropy writer's streams must decode
   (in a conformant decoder) to reconstructions bit-identical to the
   encoder's own reconstruction (decode-loop invariant, SURVEY.md §4).
2. x265 -> pydec: our Python decoder (sharing all syntax/context rules
   with the framework) must bit-exactly decode streams produced by an
   independent encoder.
"""
import numpy as np
import pytest

from homerhevc_tpu.config import EncoderConfig
from homerhevc_tpu.entropy import binding
from homerhevc_tpu.models import schedule
from tests import golden_model as gm


def _roundtrip(cp, qp=32, cu=16):
    from tools import refenc, de265
    w = h = 64
    bw = 64 // cu
    bpc = 64 // cu
    avail = schedule.availability(bw, bw, bpc)
    order = schedule.coding_order(bw, bw, bpc)
    flat = np.argsort(order, axis=None)
    recy = np.zeros((64, 64), np.int32)
    for f in flat:
        by, bx = divmod(int(f), bw)
        av = {k: bool(m[by, bx]) for k, m in avail.items()}
        adi = refenc.build_adi(recy, bx, by, cu, av)
        pred = gm.predict_intra(1, adi, cu, True)
        c = cp[by * cu:(by + 1) * cu, bx * cu:(bx + 1) * cu].astype(np.int32)
        r = gm.inv_transform(gm.dequant(c, qp)) if c.any() else 0
        recy[by * cu:(by + 1) * cu, bx * cu:(bx + 1) * cu] = \
            np.clip(pred + r, 0, 255)
    cfg = EncoderConfig(width=w, height=h, qp=qp, sao=False, chroma_qp_offset=0,
                        deblocking=False, sign_hiding=False)
    ccfg = binding.make_cfg(cfg)
    c4 = cu // 4
    rec = binding.FrameRecord(
        width=w, height=h, slice_type=2, slice_qp=qp,
        cu_depth=np.full((16, 16), {64: 0, 32: 1, 16: 2, 8: 3}[cu], np.uint8),
        intra_luma_mode=np.ones((16, 16), np.uint8),
        intra_chroma_mode=np.ones((16, 16), np.uint8),
        pred_mode=np.ones((16, 16), np.uint8))
    rec._fill_defaults()
    rec.coeff_y[:] = cp
    for by in range(bw):
        for bx in range(bw):
            rec.cbf_y[by * c4:(by + 1) * c4, bx * c4:(bx + 1) * c4] = \
                int(cp[by * cu:(by + 1) * cu, bx * cu:(bx + 1) * cu].any())
    stream = binding.write_parameter_sets(ccfg) + \
        binding.encode_slice(ccfg, rec)
    from tools import de265 as d2
    dy = d2.decode(stream)[0][0]
    return int(np.abs(dy.astype(np.int32) - recy).max())


def test_writer_coefficient_fuzz_vs_libde265():
    rng = np.random.default_rng(2)
    for _ in range(12):
        cp = np.zeros((64, 64), np.int16)
        n = rng.integers(1, 60)
        pos = rng.integers(0, 64, (n, 2))
        vals = rng.integers(-30, 31, n)
        for (r, c), vv in zip(pos, vals):
            cp[r, c] = vv
        assert _roundtrip(cp) == 0


def test_full_frame_mode_search_vs_libde265():
    from tools import refenc, de265
    rng = np.random.default_rng(0)
    w, h, qp = 128, 64, 32
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 2 + yy * 3) % 255).astype(np.int32)
                + rng.integers(-20, 20, (h, w)), 0, 255).astype(np.uint8)
    u = ((xx[::2, ::2] + 128) % 255).astype(np.uint8)
    v = ((yy[::2, ::2] + 64) % 255).astype(np.uint8)
    cfg = EncoderConfig(width=w, height=h, qp=qp, sao=False, chroma_qp_offset=0,
                        deblocking=False, sign_hiding=False)
    ccfg = binding.make_cfg(cfg)
    rec, ry, ru, rv = refenc.encode_frame_intra(y, u, v, qp, cu_size=16)
    stream = binding.write_parameter_sets(ccfg) + \
        binding.encode_slice(ccfg, rec)
    dy, du, dv = de265.decode(stream)[0]
    assert np.array_equal(dy, ry.astype(np.uint8))
    assert np.array_equal(du, ru.astype(np.uint8))
    assert np.array_equal(dv, rv.astype(np.uint8))


@pytest.mark.parametrize("ctu,qp", [(16, 37), (32, 30)])
def test_pydec_decodes_x265_bit_exact(ctu, qp):
    from tools import x265gen, pydec, de265
    y, u, v = x265gen.test_frame()
    p = (f"qp={qp}:keyint=1:no-sao=1:no-deblock=1:ctu={ctu}:"
         f"min-cu-size={ctu}:no-signhide=1:no-strong-intra-smoothing=1")
    s = x265gen.encode(y, u, v, p)
    ry, ru, rv = [pl.astype(np.int32) for pl in de265.decode(s)[0]]
    dec = pydec.decode_stream(s)
    dec.written_y = np.zeros((16, 16), bool)
    dec.written_u = np.zeros((16, 16), bool)
    dec.written_v = np.zeros((16, 16), bool)
    dec.decode_slice()
    assert np.array_equal(dec.rec_y, ry)
    assert np.array_equal(dec.rec_u, ru)
    assert np.array_equal(dec.rec_v, rv)
