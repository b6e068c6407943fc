"""Round-trip tests of the device-side record compaction."""
import numpy as np
import jax.numpy as jnp

from homerhevc_tpu.ops import packing
import pytest


pytestmark = pytest.mark.smoke

def _blocks(rng, nb, b, frac_nz, hi=5):
    lv = rng.integers(-hi, hi + 1, (nb, b, b)).astype(np.int32)
    mask = rng.random((nb, 1, 1)) < frac_nz
    return (lv * mask).astype(np.int32)


def test_compact_roundtrip():
    rng = np.random.default_rng(0)
    nb, b, cap = 100, 8, 64
    lv = _blocks(rng, nb, b, 0.4)
    vec = np.asarray(packing.compact_blocks(jnp.asarray(lv), cap))
    count, out = packing.unpack_blocks(vec, cap, b, nb)
    assert out is not None
    np.testing.assert_array_equal(out.reshape(nb, b, b), lv)


def test_compact_overflow():
    rng = np.random.default_rng(1)
    lv = _blocks(rng, 100, 4, 1.0)
    lv[:, 0, 0] = 1   # every block nonzero
    vec = np.asarray(packing.compact_blocks(jnp.asarray(lv), 32))
    count, out = packing.unpack_blocks(vec, 32, 4, 100)
    assert out is None and count == 100


def test_compact_i8_roundtrip_with_escapes():
    rng = np.random.default_rng(2)
    nb, b, cap, esc_cap = 128, 8, 96, 32
    lv = _blocks(rng, nb, b, 0.5, hi=4)
    # plant escape values incl. extremes
    lv[3, 2, 2] = 300
    lv[7, 0, 0] = -4000
    lv[9, 7, 7] = 32000
    lv[9, 0, 1] = -128   # boundary: NOT an escape
    lv[11, 0, 0] = -129  # boundary escape
    vec = np.asarray(packing.compact_blocks_i8(jnp.asarray(lv), cap,
                                               esc_cap))
    assert vec.shape[0] == packing.compact_i8_size(cap, b, esc_cap)
    count, out = packing.unpack_blocks_i8(vec, cap, b, nb, esc_cap)
    assert out is not None
    np.testing.assert_array_equal(out.reshape(nb, b, b), lv)


def test_compact_i8_escape_overflow():
    rng = np.random.default_rng(3)
    nb, b = 64, 4
    lv = np.zeros((nb, b, b), np.int32)
    lv[:8, 0, 0] = 500     # 8 escape blocks > esc_cap of 4
    vec = np.asarray(packing.compact_blocks_i8(jnp.asarray(lv), 32, 4))
    count, out = packing.unpack_blocks_i8(vec, 32, b, nb, 4)
    assert out is None
