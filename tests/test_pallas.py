"""Pallas kernels vs their jnp reference implementations (interpreter
mode, so CI needs no TPU)."""
import numpy as np
import jax.numpy as jnp

from homerhevc_tpu.ops import me, pallas_kernels


def test_slab_search_kernel_matches_jnp():
    rng = np.random.default_rng(0)
    h, w, bs, r = 32, 48, 4, 4
    cur = rng.integers(0, 1020, (h, w)).astype(np.int32)
    slab = rng.integers(0, 1020, (h + 2 * r, w + 2 * r)).astype(np.int32)
    # plant exact matches to exercise the |mv| tie-break determinism
    slab[r + 4:r + 12, r + 8:r + 16] = cur[4:12, 8:16]
    slab[r - 2 + 4:r - 2 + 12, r + 3 + 8:r + 3 + 16] = cur[4:12, 8:16]
    want = np.asarray(me.slab_search_jnp(jnp.asarray(cur),
                                         jnp.asarray(slab), bs, r, r))
    got = np.asarray(pallas_kernels.slab_search_pallas(
        jnp.asarray(cur), jnp.asarray(slab), bs, r, interpret=True))
    np.testing.assert_array_equal(got, want)
