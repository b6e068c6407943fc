"""MC interpolation kernels vs scalar golden model, all 16/64 phases."""
import numpy as np
import jax.numpy as jnp
import pytest

from homerhevc_tpu.ops import interp
from tests import golden_inter as gi


pytestmark = pytest.mark.smoke

def test_luma_all_phases():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    size = 8
    x0 = y0 = 16
    for fy in range(4):
        for fx in range(4):
            mvx, mvy = 4 * (-2) + fx, 4 * 1 + fy
            want = gi.mc_luma_golden(ref, x0, y0, mvx, mvy, size)
            ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
            win = jnp.asarray(ref[iy - 3:iy + size + 4,
                                  ix - 3:ix + size + 4])
            got = np.asarray(interp.mc_luma(win, jnp.int32(mvx & 3),
                                            jnp.int32(mvy & 3), size))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"fx={fx} fy={fy}")


def test_chroma_all_phases():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (48, 48)).astype(np.int32)
    size = 4
    x0 = y0 = 12
    for fy in range(8):
        for fx in range(8):
            mvx, mvy = 8 * 1 + fx, 8 * (-1) + fy
            want = gi.mc_chroma_golden(ref, x0, y0, mvx, mvy, size)
            ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
            win = jnp.asarray(ref[iy - 1:iy + size + 3,
                                  ix - 1:ix + size + 3])
            got = np.asarray(interp.mc_chroma(win, jnp.int32(mvx & 7),
                                              jnp.int32(mvy & 7), size))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"fx={fx} fy={fy}")


def test_batched_vmap():
    import jax
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    size = 16
    wins = jnp.asarray(np.stack([ref[y:y + size + 7, x:x + size + 7]
                                 for y, x in [(0, 0), (8, 16), (20, 4)]]))
    fx = jnp.asarray([1, 2, 3])
    fy = jnp.asarray([3, 0, 2])
    got = jax.vmap(lambda w, a, b: interp.mc_luma(w, a, b, size))(
        wins, fx, fy)
    for i, (y, x) in enumerate([(0, 0), (8, 16), (20, 4)]):
        want = gi.mc_luma_golden(ref, x + 3, y + 3,
                                 int(fx[i]), int(fy[i]), size)
        np.testing.assert_array_equal(np.asarray(got[i]), want)
