import numpy as np
import pytest
import jax.numpy as jnp

from homerhevc_tpu.ops import intra
from tests import golden_model as gm


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_all_modes_vs_golden(size, is_luma):
    if size == 32 and not is_luma:
        pytest.skip("chroma TB max 16 with CTU 64 / 4:2:0")
    rng = np.random.default_rng(size)
    adi = rng.integers(0, 256, (4 * size + 1,)).astype(np.int32)
    preds = np.asarray(intra.predict_all_modes(jnp.asarray(adi), size, is_luma))
    assert preds.shape == (35, size, size)
    for mode in range(35):
        g = gm.predict_intra(mode, adi, size, is_luma)
        np.testing.assert_array_equal(
            preds[mode], g, err_msg=f"mode={mode} size={size} luma={is_luma}")


def test_substitution():
    size = 8
    n = 4 * size + 1
    adi = np.arange(n, dtype=np.int32) + 10
    # nothing available -> 128
    out = np.asarray(intra.substitute_refs(
        jnp.asarray(adi), jnp.zeros(n, bool)))
    assert (out == 128).all()
    # only top available: bottom-left/left/corner take first top sample
    avail = np.zeros(n, bool)
    avail[2 * size + 1:3 * size + 1] = True
    out = np.asarray(intra.substitute_refs(jnp.asarray(adi), jnp.asarray(avail)))
    first_top = adi[2 * size + 1]
    assert (out[:2 * size + 1] == first_top).all()
    assert (out[2 * size + 1:3 * size + 1] == adi[2 * size + 1:3 * size + 1]).all()
    # top-right unavailable -> copies last top sample
    assert (out[3 * size + 1:] == adi[3 * size]).all()
    # batched
    out2 = np.asarray(intra.substitute_refs(
        jnp.asarray(np.stack([adi, adi])),
        jnp.asarray(np.stack([avail, np.ones(n, bool)]))))
    np.testing.assert_array_equal(out2[0], out)
    np.testing.assert_array_equal(out2[1], adi)


def test_filter_refs_keeps_ends():
    size = 8
    rng = np.random.default_rng(0)
    adi = rng.integers(0, 256, (4 * size + 1,)).astype(np.int32)
    f = np.asarray(intra.filter_refs(jnp.asarray(adi), size))
    assert f[0] == adi[0] and f[-1] == adi[-1]
    k = 5
    assert f[k] == (adi[k - 1] + 2 * adi[k] + adi[k + 1] + 2) >> 2
