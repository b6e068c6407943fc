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


def _mh_frames(n_gops=4, g=3, h=64, w=128):
    rng = np.random.default_rng(9)
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
    return ys, us, vs


_MH_RUNNER = r"""
import os, sys
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "REPO")
import jax
jax.config.update("jax_platforms", "cpu")
# distributed init MUST precede any backend-initializing call --
# including package imports that touch jax.devices
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
from homerhevc_tpu.parallel import multihost
from tests.test_multihost import _mh_frames
ys, us, vs = _mh_frames()
mesh = multihost.global_mesh()
# each process feeds ITS OWN half of the GOP batch
lo, hi = (0, 2) if pid == 0 else (2, 4)
local, avg = multihost.encode_ippp_multihost(
    ys[lo:hi], us[lo:hi], vs[lo:hi], qp=30, mesh=mesh,
    sign_hiding=True, deblocking=True, sao_enabled=True,
    intra_fallback=False)
np.savez(os.path.join(outdir, f"mh_{pid}.npz"), avg=avg, **local)
print("runner", pid, "done", flush=True)
"""


def test_multihost_two_processes_match_single():
    """TWO coordinated jax.distributed CPU processes (2 local devices
    each) must produce byte-identical packed records to the
    single-process 4-device run (VERDICT r3 item 9; ref inter-engine
    RC exchange hmr_encoder_lib.c:2773)."""
    import os
    import socket
    import subprocess
    import sys
    import tempfile
    _need(4)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        runner = os.path.join(td, "runner.py")
        with open(runner, "w") as f:
            f.write(_MH_RUNNER.replace("REPO", repo))
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, runner, str(i), str(port), td],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = [p.communicate(timeout=480)[0].decode() for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, o[-2000:]
        z0 = np.load(os.path.join(td, "mh_0.npz"))
        z1 = np.load(os.path.join(td, "mh_1.npz"))

    # single-process oracle on a 4-device virtual mesh
    ys, us, vs = _mh_frames()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("gop",))
    ref, ref_avg = jax.jit(
        lambda y, u, v: gop.encode_ippp_gops(
            y, u, v, qp=30, mesh=mesh, sign_hiding=True,
            deblocking=True, sao_enabled=True, intra_fallback=False))(
        jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs))
    i_ref = np.asarray(ref["i_packed"])
    p_ref = np.asarray(ref["p_packed"])
    np.testing.assert_array_equal(z0["i_packed"], i_ref[:2])
    np.testing.assert_array_equal(z1["i_packed"], i_ref[2:])
    np.testing.assert_array_equal(z0["p_packed"], p_ref[:2])
    np.testing.assert_array_equal(z1["p_packed"], p_ref[2:])
    assert float(z0["avg"]) == pytest.approx(float(np.asarray(ref_avg)))
    assert float(z1["avg"]) == pytest.approx(float(np.asarray(ref_avg)))
