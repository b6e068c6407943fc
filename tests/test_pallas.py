"""Pallas kernels vs their jnp reference implementations (interpreter
mode, so CI needs no TPU)."""
import numpy as np
import jax.numpy as jnp

from homerhevc_tpu.ops import me, pallas_kernels
import pytest


pytestmark = pytest.mark.smoke

def test_gather_windows_kernel_matches_jnp():
    rng = np.random.default_rng(1)
    hp, wp, size, n = 96, 200, 23, 70   # n not a chunk multiple
    ref = rng.integers(0, 1020, (hp, wp)).astype(np.int32)
    by = rng.integers(0, hp - size, n).astype(np.int32)
    bx = rng.integers(0, wp - size, n).astype(np.int32)
    # clamp semantics: push some origins out of range (the kernel
    # clamps into [0, dim-size]; lax.dynamic_slice does too for
    # non-negative starts, but reinterprets NEGATIVE starts as
    # unsigned, so the oracle clamps explicitly)
    by[:3] = np.array([-5, hp - 1, hp + 40])
    bx[:3] = np.array([wp + 9, -1, wp - 1])
    import jax
    want = np.asarray(jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(
            jnp.asarray(ref), (y, x), (size, size)))(
        jnp.asarray(np.clip(by, 0, hp - size)),
        jnp.asarray(np.clip(bx, 0, wp - size))))
    got = np.asarray(pallas_kernels.gather_windows_pallas(
        jnp.asarray(ref), jnp.asarray(by), jnp.asarray(bx), size,
        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_gather_windows_ref_kernel_matches_jnp():
    rng = np.random.default_rng(2)
    hp, wp, size, n, r = 64, 160, 12, 33, 3
    refs = rng.integers(0, 1020, (r, hp, wp)).astype(np.int32)
    by = rng.integers(0, hp - size, n).astype(np.int32)
    bx = rng.integers(0, wp - size, n).astype(np.int32)
    ri = rng.integers(0, r, n).astype(np.int32)
    import jax
    want = np.asarray(jax.vmap(
        lambda rr, y, x: jax.lax.dynamic_slice(
            jnp.asarray(refs), (rr, y, x), (1, size, size))[0])(
        jnp.asarray(ri), jnp.asarray(by), jnp.asarray(bx)))
    got = np.asarray(pallas_kernels.gather_windows_ref_pallas(
        jnp.asarray(refs), jnp.asarray(ri), jnp.asarray(by),
        jnp.asarray(bx), size, interpret=True))
    np.testing.assert_array_equal(got, want)


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


def test_pallas_selftest_on_hardware():
    """On-TPU bit-equality gate (spec: VERDICT r3 item 7).  Skipped on
    CPU — interpreter equality is covered above; this catches Mosaic
    hardware miscompiles (wrong results with clean compiles)."""
    import jax
    if jax.default_backend() == "cpu":
        pytest.skip("needs real TPU hardware")
    assert me.pallas_selftest()
