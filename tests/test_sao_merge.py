"""SAO merge-left/up RDO (ops/sao.merge_adopt_rdo): a CTU adopts its
left or above neighbour's params when RD-cheaper; adopted params are
exactly equal so the host coincidence pass emits merge flags (ref
sao_derive_mode_merge_rdo, hmr_sao.c:854)."""
import numpy as np
import jax.numpy as jnp

from homerhevc_tpu.ops import sao


def _planes(bias_left=-4, bias_right=-3, seed=3):
    """Two-CTU-wide frame where both CTUs have a systematic negative
    reconstruction bias on bands 8..11 (values 64..95) — slightly
    different magnitude per CTU, so the explicit BO offsets differ but
    adopting the left CTU's params is RD-cheaper than signaling."""
    rng = np.random.default_rng(seed)
    h, w = 64, 128
    org = rng.integers(40, 200, (h, w)).astype(np.int32)
    band = (org >= 64) & (org < 96)
    rec = org.copy()
    rec[:, :64][band[:, :64]] += bias_left
    rec[:, 64:][band[:, 64:]] += bias_right
    rec = np.clip(rec, 0, 255)
    return jnp.asarray(org), jnp.asarray(rec)


def test_merge_left_adopts_params():
    org, rec = _planes()
    orgc = org[::2, ::2]
    lam = 60.0
    _, _, _, fields = sao.sao_frame(
        org, orgc, orgc, rec, orgc, orgc, lam, lam, ctu=64,
        merge_rdo=True)
    t = np.asarray(fields["type"])
    off = np.asarray(fields["offsets"])
    bp = np.asarray(fields["band_pos"])
    # the left CTU derived live params
    assert t[0, 0, 0] != 0
    # and the right CTU adopted them exactly (despite a different
    # explicit optimum: bias -3 vs -4)
    assert (t[:, :, 1] == t[:, :, 0]).all()
    assert (off[:, :, 1] == off[:, :, 0]).all()
    assert (bp[:, :, 1] == bp[:, :, 0]).all()


def test_explicit_params_differ_without_merge():
    """Sanity: without merge RDO the two CTUs pick different offsets
    (otherwise the adoption test proves nothing)."""
    org, rec = _planes()
    orgc = org[::2, ::2]
    lam = 60.0
    _, _, _, fields = sao.sao_frame(
        org, orgc, orgc, rec, orgc, orgc, lam, lam, ctu=64,
        merge_rdo=False)
    off = np.asarray(fields["offsets"])
    assert (off[0, :, 1] != off[0, :, 0]).any()


def test_merge_rdo_bounded_distortion_cost():
    """Adoption was priced against the explicit cost, so the applied
    luma SSD may exceed the explicit path's only by the priced-in
    rate saving."""
    org, rec = _planes(seed=11)
    orgc = org[::2, ::2]
    lam = 60.0
    y_m, _, _, _ = sao.sao_frame(org, orgc, orgc, rec, orgc, orgc,
                                 lam, lam, 64, merge_rdo=True)
    y_e, _, _, _ = sao.sao_frame(org, orgc, orgc, rec, orgc, orgc,
                                 lam, lam, 64, merge_rdo=False)
    ssd_m = float(jnp.sum((y_m - org) ** 2))
    ssd_e = float(jnp.sum((y_e - org) ** 2))
    assert ssd_m <= ssd_e + lam * 64


def test_tile_boundary_blocks_adoption():
    org, rec = _planes(seed=5)
    orgc = org[::2, ::2]
    lam = 60.0
    _, _, _, fields = sao.sao_frame(
        org, orgc, orgc, rec, orgc, orgc, lam, lam, 64,
        tiles=(2, 1), merge_rdo=True)
    off = np.asarray(fields["offsets"])
    # the tile boundary between the two CTUs forbids adoption: each
    # CTU keeps its own explicit optimum (-4 vs -3 bias -> different)
    assert (off[0, :, 1] != off[0, :, 0]).any()
    av_l, av_u = sao._avail_lu_np(1, 2, (2, 1))
    assert not av_l[0, 1] and not av_l[0, 0]


def test_merge_up_adopts_params():
    """Two vertically stacked CTUs with close-but-different BO biases:
    the lower CTU adopts the upper one's params (merge-up)."""
    org, rec = _planes()
    org, rec = org.T.copy(), rec.T.copy()            # 128x64: 2 rows
    orgc = org[::2, ::2]
    lam = 60.0
    _, _, _, fields = sao.sao_frame(
        org, orgc, orgc, rec, orgc, orgc, lam, lam, ctu=64,
        merge_rdo=True)
    t = np.asarray(fields["type"])
    off = np.asarray(fields["offsets"])
    bp = np.asarray(fields["band_pos"])
    assert t[0, 0, 0] != 0
    assert (t[:, 1, :] == t[:, 0, :]).all()
    assert (off[:, 1, :] == off[:, 0, :]).all()
    assert (bp[:, 1, :] == bp[:, 0, :]).all()
