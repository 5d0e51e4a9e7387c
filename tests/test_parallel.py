"""Multi-device SPMD tests on the virtual 8-way CPU mesh: sharded step
equals the single-device step; invariant to the mesh factorization
(host-count invariance analog)."""

import numpy as np
import jax

from coolpuppy_tpu.ops.gather import GatherConfig, make_pileup_step
from coolpuppy_tpu.parallel import (
    make_mesh,
    make_sharded_pileup_step,
    sharded_pileup_demo_inputs,
)


def _cfg(S):
    return GatherConfig(
        W=11,
        B=64,
        S=S,
        block=min(128, S),
        capacity=8,
        cis=True,
        ignore_diags=2,
        ooe=True,
        emit_expected=False,
        coverage=True,
        stripes=False,
    )


def _single_device_reference(cfg_local, inputs, n_loci):
    """Run the same global workload on one device, summing region batches."""
    (ncolp, tiles, tmap, evec, v1, v2, c1, c2, r1, r2, dd0, cid, sm) = (
        inputs
    )
    S_global = r1.shape[1]
    cfg_full = GatherConfig(**{**cfg_local.__dict__, "S": S_global,
                               "block": cfg_local.block})
    step = make_pileup_step(cfg_full)
    total = None
    for r in range(tiles.shape[0]):
        out = step(
            tiles[r], tmap[r], ncolp, evec[r], v1[r], v2[r], c1[r], c2[r],
            r1[r], r2[r], dd0[r], cid[r], sm[r],
        )
        out = {k: np.asarray(v, np.float64) for k, v in out.items()}
        total = out if total is None else {
            k: total[k] + out[k] for k in out
        }
    return total


def test_sharded_equals_single():
    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh(devices, regions_axis=2)
    S_local = 128
    cfg = _cfg(S_local)
    inputs = sharded_pileup_demo_inputs(cfg, mesh, nr=2, seed=3)
    sharded = make_sharded_pileup_step(cfg, mesh)
    out = sharded(*inputs)
    out = {k: np.asarray(v, np.float64) for k, v in out.items()}

    want = _single_device_reference(cfg, inputs, mesh.shape["loci"])
    for k in want:
        np.testing.assert_allclose(out[k], want[k], rtol=2e-4, atol=1e-4)


def test_mesh_factorization_invariance():
    """1x8 and 2x4 meshes give the same accumulators for the same global
    workload — the host-count invariance the reference can't offer."""
    devices = jax.devices()
    mesh_a = make_mesh(devices, regions_axis=2)  # 2 x 4
    S_a = 128  # -> S_global = 512

    cfg_a = _cfg(S_a)
    inputs = sharded_pileup_demo_inputs(cfg_a, mesh_a, nr=2, seed=5)
    out_a = make_sharded_pileup_step(cfg_a, mesh_a)(*inputs)

    mesh_b = make_mesh(devices, regions_axis=1)  # 1 x 8
    cfg_b = _cfg(64)  # 64 * 8 = 512 global
    out_b = make_sharded_pileup_step(cfg_b, mesh_b)(*inputs)

    for k in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[k]), np.asarray(out_b[k]), rtol=2e-4, atol=1e-4
        )


# -- engine-level mesh parity: the PRODUCTION path over a real cooler --------

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_toy_cooler, toy_features, toy_regions  # noqa: E402

from coolpuppy_tpu import pileup  # noqa: E402
from coolpuppy_tpu.parallel import make_loci_mesh  # noqa: E402

BINSIZE = 1_000_000


def _run_pileup(clr, mesh, **kw):
    return pileup(
        clr,
        toy_features(),
        features_format="bed",
        view_df=toy_regions(),
        flank=3 * BINSIZE,
        mindist=0,
        seed=0,
        mesh=mesh,
        **kw,
    )


def test_engine_mesh_equals_single(tmp_path):
    """pileup() through the 8-device loci mesh == single-device pileup():
    same groups, counts and data planes (the reference's Pool-over-regions +
    reduce, reference coolpup.py:1502–1531, as mesh collectives)."""
    clr, dense, weights = make_toy_cooler(str(tmp_path / "t.cool"), seed=7)
    mesh = make_loci_mesh(jax.devices())
    assert mesh.shape["loci"] == 8

    single = _run_pileup(clr, None, by_strand=True, nshifts=1)
    meshed = _run_pileup(clr, mesh, by_strand=True, nshifts=1)

    a = single.set_index("orientation")
    b = meshed.set_index("orientation")
    assert list(a.index) == list(b.index)
    for ori in a.index:
        assert a.loc[ori, "n"] == b.loc[ori, "n"]
        np.testing.assert_allclose(
            a.loc[ori, "data"], b.loc[ori, "data"], rtol=1e-4, atol=1e-7
        )


def test_engine_mesh_stripes_and_expected(tmp_path):
    """Mesh parity on the stripes path (per-snip sharded outputs) with
    expected normalization."""
    from fixtures import toy_expected

    clr, dense, weights = make_toy_cooler(str(tmp_path / "t2.cool"), seed=9)
    view = toy_regions()
    exp = toy_expected(clr, dense, view, weights=weights)
    mesh = make_loci_mesh(jax.devices())

    single = _run_pileup(
        clr, None, expected_df=exp, ooe=True, store_stripes=True
    )
    meshed = _run_pileup(
        clr, mesh, expected_df=exp, ooe=True, store_stripes=True
    )
    sa = single.set_index("group").loc["all"]
    sb = meshed.set_index("group").loc["all"]
    assert sa["n"] == sb["n"] > 0
    np.testing.assert_allclose(sa["data"], sb["data"], rtol=1e-4, atol=1e-7)
    # per-snip stripes reassembled from sharded outputs: same multiset
    va = np.asarray(sa["vertical_stripe"], dtype=float)
    vb = np.asarray(sb["vertical_stripe"], dtype=float)
    assert va.shape == vb.shape
    np.testing.assert_allclose(
        np.sort(np.nan_to_num(va), axis=0),
        np.sort(np.nan_to_num(vb), axis=0),
        rtol=1e-4,
        atol=1e-7,
    )
