"""Deblocking filter: JAX kernel vs scalar golden model, both directions,
random boundary strengths and random content."""
import numpy as np
import jax.numpy as jnp
import pytest

from homerhevc_tpu.ops import deblock
from tests import golden_deblock as gd


pytestmark = pytest.mark.smoke

@pytest.mark.parametrize("qp", [20, 30, 37, 51])
def test_luma_vs_golden(qp):
    rng = np.random.default_rng(qp)
    h, w = 64, 96
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    # blocky content so strong/weak/skip all trigger
    y[:, 0:w // 2] //= 2
    y[0:h // 2, :] += 60
    y = np.clip(y, 0, 255)
    bs_v = rng.integers(0, 3, (h // 4, w // 8)).astype(np.int32)
    bs_h = rng.integers(0, 3, (h // 8, w // 4)).astype(np.int32)
    bs_v[:, 0] = 0
    bs_h[0, :] = 0
    got = np.asarray(deblock.deblock_luma(
        jnp.asarray(y), jnp.asarray(bs_v), jnp.asarray(bs_h), qp))
    want = gd.deblock_luma(y, bs_v, bs_h, qp)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qp_c", [25, 34, 43])
def test_chroma_vs_golden(qp_c):
    rng = np.random.default_rng(qp_c)
    h, w = 32, 48
    c = rng.integers(0, 256, (h, w)).astype(np.int32)
    c[:, 0:w // 2] //= 3
    bs_v = rng.integers(0, 3, (h // 2, w // 8)).astype(np.int32)
    bs_h = rng.integers(0, 3, (h // 8, w // 2)).astype(np.int32)
    bs_v[:, 0] = 0
    bs_h[0, :] = 0
    got = np.asarray(deblock.deblock_chroma(
        jnp.asarray(c), jnp.asarray(bs_v), jnp.asarray(bs_h), qp_c))
    want = gd.deblock_chroma(c, bs_v, bs_h, qp_c)
    np.testing.assert_array_equal(got, want)


def test_flat_content_unchanged():
    y = np.full((32, 32), 77, np.int32)
    bs_v, bs_h = deblock.uniform_intra_bs(32, 32, 16)
    out = np.asarray(deblock.deblock_luma(
        jnp.asarray(y), jnp.asarray(bs_v), jnp.asarray(bs_h), 32))
    np.testing.assert_array_equal(out, y)
