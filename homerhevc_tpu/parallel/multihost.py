"""Multi-host (DCN) frame-parallel encoding.

The reference scales frame parallelism with encoder-engine threads on
one machine (ref encoder_engine_thread hmr_encoder_lib.c:2640-2896,
MAX_NUM_ENCODER_ENGINES hmr_private.h:1187).  The TPU-native scale-out
axis is hosts: a global `jax.sharding.Mesh` spans every chip of every
process, closed GOPs shard over it (SURVEY.md §2.8 / §7), and because
each shard's GOP starts with its own IDR there is NO cross-host
reference-pixel traffic — the only DCN payload is the psum'd
rate-control signal (the analogue of the engines' RC-state exchange,
hmr_encoder_lib.c:2773-2784) and the gathered packed records.

Design rules (jax-ml.github.io/scaling-book):
* shard the GOP axis over hosts (DCN) and, within a host, over its
  local chips (ICI) — one mesh axis is enough since closed GOPs are
  fully independent; collectives on that axis are a single scalar
  psum, so DCN latency is irrelevant;
* row-band sharding (parallel/wpp.py) composes on a second mesh axis
  INSIDE a host so its all_gather stays on ICI.

Host-side flow (each process):
  init_distributed() -> global_mesh() -> encode the process-local
  slice of GOPs with encode_ippp_sharded(); every process receives the
  records for its OWN GOPs (addressable shards) and runs the native
  entropy stage on them; NALU concatenation across hosts is the
  caller's transport concern (the reference's output container role,
  hmr_encoder_lib.c:2888).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from homerhevc_tpu.parallel import gop as gop_mod


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None):
    """Join the multi-host runtime (no-op for single-process runs).

    Wraps jax.distributed.initialize; all arguments optional when the
    cluster environment (TPU pod metadata / env vars) provides them.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "gop") -> Mesh:
    """One mesh axis over every device of every host (DCN x ICI)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def distribute_gops(y, u, v, mesh: Mesh, axis: str = "gop"):
    """Build global arrays from per-process GOP batches.

    y: uint8 [n_local_gops, g, H, W] host-local; with N processes the
    global array is [N * n_local_gops, g, H, W], sharded over `axis`.
    Single-process: returns device_put with the sharding (so the same
    code path runs under a virtual mesh in tests).
    """
    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, sh) for a in (y, u, v))
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in (y, u, v))


def encode_ippp_multihost(y, u, v, *, qp: int, mesh: Mesh,
                          axis: str = "gop", **kw):
    """Encode per-process GOP batches over the global mesh.

    Returns (local_records, avg_dist): local_records is a dict of
    numpy arrays holding ONLY this process's GOPs (i_packed
    [n_local, Li], p_packed [n_local, g-1, Lp]) ready for the host
    entropy stage; avg_dist is the global RC signal (replicated).
    """
    gy, gu, gv = distribute_gops(y, u, v, mesh, axis)
    fn = jax.jit(
        lambda a, b, c: gop_mod.encode_ippp_gops(
            a, b, c, qp=qp, mesh=mesh, axis=axis, **kw))
    if jax.process_count() > 1:
        # AOT-compile BEFORE touching the cross-process collective
        # transport, then rendezvous at a coordination-service barrier:
        # the collective backend's bootstrap (e.g. Gloo KV exchange on
        # CPU) has a short timeout, and per-process compile-time skew
        # must not eat into it.  The barrier rides the coordination
        # service (no collectives), so a generous timeout is safe.
        compiled = fn.lower(gy, gu, gv).compile()
        from jax._src import distributed
        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier("homerhevc_mh_compiled",
                                   timeout_in_ms=600_000)
        recs, avg = compiled(gy, gu, gv)
    else:
        recs, avg = fn(gy, gu, gv)

    def local_np(garr):
        shards = sorted(
            (s for s in garr.addressable_shards),
            key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards])

    return ({k: local_np(v_) for k, v_ in recs.items()},
            float(np.asarray(avg)))
