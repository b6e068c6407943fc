import numpy as np
import pytest
import jax.numpy as jnp

from homerhevc_tpu.ops import intra
from tests import golden_model as gm


pytestmark = pytest.mark.smoke

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


def test_predict_single_mode_matches_all_modes():
    """predict_single_mode (recon-pass fast path) must be bit-exact vs
    the full 35-stack + select for every mode/size/component."""
    import jax.numpy as jnp
    from homerhevc_tpu.ops import intra as iops
    rng = np.random.default_rng(11)
    for size in (4, 8, 16, 32):
        for is_luma in (True, False):
            adi = jnp.asarray(
                rng.integers(0, 256, (35, 4 * size + 1)), jnp.int32)
            modes = jnp.arange(35, dtype=jnp.int32)
            full = iops.predict_all_modes(adi, size, is_luma)
            sel = jnp.take_along_axis(
                full, modes[:, None, None, None], 1)[:, 0]
            single = iops.predict_single_mode(adi, modes, size, is_luma)
            np.testing.assert_array_equal(
                np.asarray(single), np.asarray(sel),
                err_msg=f"size={size} luma={is_luma}")
