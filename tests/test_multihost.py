"""Multi-host DCN pipeline (parallel/multihost.py): the single-process
degenerate case must reproduce encode_ippp_gops bit-exactly and return
process-local records in GOP order (the host entropy stage consumes
them).  True multi-process runs share this exact code path — only
distribute_gops switches to make_array_from_process_local_data.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from homerhevc_tpu.parallel import gop, multihost


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} (virtual) devices")


def test_multihost_single_process_matches_gop_sharding():
    _need(4)
    rng = np.random.default_rng(9)
    n_gops, g, h, w = 4, 3, 64, 128
    m = 16
    grid = np.mgrid[0:h + m, 0:w + m]
    base = np.clip(((grid[1] * 3 + grid[0] * 2) % 235)
                   + rng.integers(0, 16, grid[0].shape), 0, 255) \
        .astype(np.uint8)
    ys = np.stack([np.stack([base[k:k + h, 3 * k + i:3 * k + i + w]
                             for k in range(g)])
                   for i in range(n_gops)])
    us = np.stack([np.stack([base[0:h // 2, i + k:i + k + w // 2]
                             for k in range(g)])
                   for i in range(n_gops)])
    vs = np.stack([np.stack([base[2:2 + h // 2, i + k:i + k + w // 2]
                             for k in range(g)])
                   for i in range(n_gops)])

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gop",))
    kw = dict(sign_hiding=True, deblocking=True, sao_enabled=True,
              intra_fallback=False)
    local, avg = multihost.encode_ippp_multihost(
        ys, us, vs, qp=30, mesh=mesh, **kw)

    ref_recs, ref_avg = jax.jit(
        lambda y, u, v: gop.encode_ippp_gops(
            y, u, v, qp=30, mesh=mesh, **kw))(
        jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs))

    assert set(local) == {"i_packed", "p_packed"}
    np.testing.assert_array_equal(local["i_packed"],
                                  np.asarray(ref_recs["i_packed"]))
    np.testing.assert_array_equal(local["p_packed"],
                                  np.asarray(ref_recs["p_packed"]))
    assert avg == pytest.approx(float(np.asarray(ref_avg)))
