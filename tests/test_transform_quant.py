import numpy as np
import pytest
import jax.numpy as jnp

from homerhevc_tpu import tables
from homerhevc_tpu.ops import transform, quant
from tests import golden_model as gm


pytestmark = pytest.mark.smoke

def test_dct_matrices_known_rows():
    t4 = tables.dct_matrix(4)
    assert t4.tolist() == [[64, 64, 64, 64], [83, 36, -36, -83],
                           [64, -64, -64, 64], [36, -83, 83, -36]]
    t8 = tables.dct_matrix(8)
    assert t8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert t8[7].tolist() == [18, -50, 75, -89, 89, -75, 50, -18]
    t16 = tables.dct_matrix(16)
    assert t16[1].tolist() == [90, 87, 80, 70, 57, 43, 25, 9,
                               -9, -25, -43, -57, -70, -80, -87, -90]
    t32 = tables.dct_matrix(32)
    assert t32[1][:8].tolist() == [90, 90, 88, 85, 82, 78, 73, 67]
    assert t32[31][:4].tolist() == [4, -13, 22, -31]
    # even rows of T32 subsample T16
    assert (t32[::2, :16] == t16).all()
    # rows are orthogonal-ish: exact orthogonality not guaranteed by the
    # integer design, but row norms must be within 1% of 64*sqrt(2)*sqrt(N)/..
    for n in (4, 8, 16, 32):
        t = tables.dct_matrix(n).astype(np.float64)
        norms = np.sqrt((t * t).sum(1))
        assert np.allclose(norms, norms[0], rtol=0.01)


@pytest.mark.parametrize("size,is_dst", [(4, False), (4, True), (8, False),
                                         (16, False), (32, False)])
def test_forward_inverse_vs_golden(size, is_dst):
    rng = np.random.default_rng(0)
    for _ in range(4):
        x = rng.integers(-255, 256, (size, size)).astype(np.int32)
        c_g = gm.fwd_transform(x, is_dst)
        c_j = np.asarray(transform.forward_transform(jnp.asarray(x), size, is_dst))
        np.testing.assert_array_equal(c_g, c_j)
        r_g = gm.inv_transform(c_g, is_dst)
        r_j = np.asarray(transform.inverse_transform(jnp.asarray(c_g), size, is_dst))
        np.testing.assert_array_equal(r_g, r_j)


def test_transform_roundtrip_accuracy():
    # lossless-ish for small residuals at high precision: recon error of
    # T^-1(T(x)) must be tiny (the integer DCT is near-orthonormal)
    rng = np.random.default_rng(1)
    for size in (4, 8, 16, 32):
        x = rng.integers(-100, 100, (2, size, size)).astype(np.int32)
        c = transform.forward_transform(jnp.asarray(x), size)
        r = transform.inverse_transform(c, size)
        assert np.abs(np.asarray(r) - x).max() <= 2


def test_batched_transform_shapes():
    x = jnp.zeros((7, 3, 8, 8), jnp.int32)
    c = transform.forward_transform(x, 8)
    assert c.shape == (7, 3, 8, 8)


@pytest.mark.parametrize("qp", [0, 17, 32, 45, 51])
@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_quant_dequant_vs_golden(qp, size):
    rng = np.random.default_rng(qp * size)
    c = rng.integers(-30000, 30000, (size, size)).astype(np.int32)
    lv_g, du_g = gm.quant(c, qp)
    lv_j, du_j = quant.quantize(jnp.asarray(c), qp, size)
    np.testing.assert_array_equal(lv_g, np.asarray(lv_j))
    np.testing.assert_array_equal(du_g, np.asarray(du_j))
    dq_g = gm.dequant(lv_g, qp)
    dq_j = quant.dequantize(lv_j, qp, size)
    np.testing.assert_array_equal(dq_g, np.asarray(dq_j))


def test_sign_bit_hide_parity_contract():
    # decoder contract: for each CG with last-first>=4 in scan order,
    # parity(sum abs) must equal sign(first nz)
    rng = np.random.default_rng(3)
    size = 8
    scan = tables.scan_order(size, tables.SCAN_DIAG)
    for _ in range(50):
        lv = rng.integers(-8, 9, (size, size)).astype(np.int32)
        du = rng.integers(-128, 128, (size, size)).astype(np.int32)
        out = np.asarray(quant.sign_bit_hide(jnp.asarray(lv), jnp.asarray(du),
                                             tuple(scan), size))
        flat = out.reshape(-1)[scan]
        for cg in range(4):
            g = flat[cg * 16:(cg + 1) * 16]
            nz = np.nonzero(g)[0]
            if len(nz) == 0 or nz[-1] - nz[0] < 4:
                continue
            assert (np.abs(g).sum() % 2) == (1 if g[nz[0]] < 0 else 0)
        # and the adjustment changed at most one coefficient by +-1
        assert (np.abs(out - lv) > 1).sum() == 0
        ncg_changed = 0
        for cg in range(4):
            a = lv.reshape(-1)[scan][cg * 16:(cg + 1) * 16]
            b = flat[cg * 16:(cg + 1) * 16]
            ncg_changed += (a != b).sum()
        assert ncg_changed <= 4  # at most one per CG


def test_scan_orders():
    diag4 = tables.scan_order(4, tables.SCAN_DIAG)
    # spec up-right diagonal for 4x4 (raster indices)
    assert diag4.tolist() == [0, 4, 1, 8, 5, 2, 12, 9, 6, 3,
                              13, 10, 7, 14, 11, 15]
    hor4 = tables.scan_order(4, tables.SCAN_HOR)
    assert hor4.tolist() == list(range(16))
    ver4 = tables.scan_order(4, tables.SCAN_VER)
    assert ver4.tolist() == [0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15]
    for size in (8, 16, 32):
        for idx in (0, 1, 2):
            s = tables.scan_order(size, idx)
            assert sorted(s.tolist()) == list(range(size * size))
    # 8x8 diag: first CG is the bottom-left-to-top-right pattern of CG 0
    diag8 = tables.scan_order(8, tables.SCAN_DIAG)
    assert diag8[0] == 0 and diag8[1] == 8 and diag8[2] == 1


def test_ctx_init_state_range():
    for iv in (154, 111, 79, 224, 63):
        for qp in (0, 26, 51):
            st = tables.ctx_init_state(iv, qp)
            assert 0 <= st <= 127
    # CNU (154) at any qp: slope 0, offset ((154&15)<<3)-16 = 64 -> s=64
    # -> mps=1, pstate=0
    assert tables.ctx_init_state(154, 30) == 1
