"""Multi-chip slab decomposition: distributed results must match
single-device results to near machine precision.

Runs on 8 virtual CPU devices (conftest sets
xla_force_host_platform_device_count=8). The analogue of the reference's
(untested) MPI path (SURVEY.md section 2c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pynama_tpu.cases.analytic import CustomFuncProblem
from pynama_tpu.cases.cavity import CavityProblem
from pynama_tpu.parallel.slab import SlabDecomposition
from pynama_tpu.parallel.sharded_problem import ShardedNSProblem
from tests.test_cases import make_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs multi-device (virtual) platform"
)


def test_slab_round_trip():
    from pynama_tpu.mesh.structured import BoxMesh

    m = BoxMesh(nelem=(3, 8), lower=(0, 0), upper=(1, 1), ngl=3)
    sl = SlabDecomposition(m, 4)
    x = np.random.default_rng(0).normal(size=m.n_nodes * 2)
    loc = sl.to_local(x, 2)
    assert loc.shape == (4, sl.n_loc * 2)
    np.testing.assert_allclose(sl.from_local(loc, 2), x)
    # overlap consistency: device d's last plane == device d+1's first plane
    pk = sl.plane * 2
    for d in range(3):
        np.testing.assert_allclose(loc[d][-pk:], loc[d + 1][:pk])


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_taylor_green_matches_single(n_dev):
    cfg = make_config((4, 8), 3, rho=0.5, mu=0.01, end=0.02, max_steps=20)
    cfg["multigrid"] = False
    p = CustomFuncProblem(cfg, case="taylor-green").setup()
    w_ref, t_ref, n_ref = p.run()

    p2 = CustomFuncProblem(cfg, case="taylor-green").setup()
    sp = ShardedNSProblem(p2, n_dev)
    w_loc, t, n = sp.run()
    w_dist = sp.unshard(w_loc, p2.dim_w)

    assert n == n_ref
    assert abs(t - t_ref) < 1e-14
    err = np.linalg.norm(w_dist - np.asarray(w_ref)) / np.linalg.norm(
        np.asarray(w_ref)
    )
    assert err < 1e-10, err


def test_sharded_cavity_matches_single():
    cfg = make_config((4, 8), 3, rho=1.0, mu=0.1, end=0.1, max_steps=10)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    # the sharded path uses Jacobi-CG; compare the same algorithm
    cfg["multigrid"] = False
    p = CavityProblem(cfg).setup()
    w_ref, t_ref, n_ref = p.run(max_steps=4)

    p2 = CavityProblem(cfg).setup()
    sp = ShardedNSProblem(p2, 4)
    w_loc, t, n = sp.run(max_steps=4)
    w_dist = sp.unshard(w_loc, 1)

    assert n == n_ref
    denom = max(np.linalg.norm(np.asarray(w_ref)), 1.0)
    err = np.linalg.norm(w_dist - np.asarray(w_ref)) / denom
    # CG reduction order differs across device counts; corner-singular
    # cavity amplifies the rounding slightly more than smooth TG
    assert err < 1e-8, err


def test_sharded_channel3d_matches_single():
    """3D slab decomposition (BASELINE benchmark config 5, shrunk):
    uniform channel flow distributed over 4 devices matches single-device."""
    from pynama_tpu.cases.uniform import UniformFlowProblem

    cfg = {
        "name": "ch3d",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {
            "ngl": 3,
            "box-mesh": {"nelem": [3, 3, 8], "lower": [0, 0, 0],
                         "upper": [1, 1, 2.5]},
        },
        "time-solver": {"start-time": 0.0, "end-time": 0.01, "max-steps": 4},
        "kle-rtol": 1e-10,
        "multigrid": False,
    }
    p = UniformFlowProblem(cfg).setup()
    w_ref, t_ref, n_ref = p.run()

    p2 = UniformFlowProblem(cfg).setup()
    sp = ShardedNSProblem(p2, 4)
    w_loc, t, n = sp.run()
    w_dist = sp.unshard(w_loc, p2.dim_w)

    assert n == n_ref
    err = np.linalg.norm(w_dist - np.asarray(w_ref))
    assert err < 1e-9, err


def test_unstructured_distributed_matches_single(tmp_path):
    """Element-partitioned data parallelism on a distorted Gmsh quad mesh
    (replicated state + psum-reduced applies) matches single-device — the
    general-mesh analogue of the reference's DMPlex distribute()."""
    from pynama_tpu.cases.analytic import CustomFuncProblem
    from pynama_tpu.parallel.unstructured import ShardedUnstructuredProblem
    from tests.test_unstructured import box_corner_mesh

    pts, quads = box_corner_mesh(4, 4, distort=0.03)
    msh = tmp_path / "tg2d.msh"
    with open(msh, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{len(pts)}\n")
        for i, p in enumerate(pts):
            f.write(f"{i+1} {p[0]:.17g} {p[1]:.17g} 0\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n{len(quads)}\n")
        for i, q in enumerate(quads):
            f.write(f"{i+1} 3 2 1 1 " + " ".join(str(v + 1) for v in q)
                    + "\n")
        f.write("$EndElements\n")
    cfg = {
        "name": "tg2d-dist",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {"ngl": 4, "gmsh-file": str(msh)},
        "time-solver": {"start-time": 0.0, "end-time": 0.05, "max-steps": 30},
        "kle-rtol": 1e-11,
    }
    p = CustomFuncProblem(cfg, case="taylor-green").setup()
    w_ref, t_ref, n_ref = p.run()

    p2 = CustomFuncProblem(cfg, case="taylor-green").setup()
    sp = ShardedUnstructuredProblem(p2, 4)  # 16 cells over 4 devices
    w, t, n = sp.run()
    err = np.linalg.norm(np.asarray(w) - np.asarray(w_ref).reshape(-1)) \
        / np.linalg.norm(np.asarray(w_ref))
    assert n == n_ref
    assert abs(t - t_ref) < 1e-14
    assert err < 1e-10, err


@pytest.mark.parametrize("pgrid", [(2, 2), (4, 2)])
def test_pencil_taylor_green_matches_single(pgrid):
    """N-D pencil decomposition (2D device mesh over the two slowest grid
    axes, sequential per-axis halo exchange) matches single-device."""
    cfg = make_config((4, 8), 3, rho=0.5, mu=0.01, end=0.02, max_steps=20)
    cfg["multigrid"] = False
    p = CustomFuncProblem(cfg, case="taylor-green").setup()
    w_ref, t_ref, n_ref = p.run()

    p2 = CustomFuncProblem(cfg, case="taylor-green").setup()
    sp = ShardedNSProblem(p2, pgrid)
    w_loc, t, n = sp.run()
    w_dist = sp.unshard(w_loc, p2.dim_w)
    assert n == n_ref
    err = np.linalg.norm(w_dist - np.asarray(w_ref)) / np.linalg.norm(
        np.asarray(w_ref)
    )
    assert err < 1e-10, err


def test_pencil_cavity_matches_single():
    """Dual-mask cavity solve on a (2, 2) device mesh."""
    cfg = make_config((4, 8), 3, rho=1.0, mu=0.1, end=0.1, max_steps=10)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    cfg["multigrid"] = False
    p = CavityProblem(cfg).setup()
    w_ref, t_ref, n_ref = p.run(max_steps=4)

    p2 = CavityProblem(cfg).setup()
    sp = ShardedNSProblem(p2, (2, 2))
    w_loc, t, n = sp.run(max_steps=4)
    w_dist = sp.unshard(w_loc, 1)
    assert n == n_ref
    denom = max(np.linalg.norm(np.asarray(w_ref)), 1.0)
    err = np.linalg.norm(w_dist - np.asarray(w_ref)) / denom
    assert err < 1e-8, err


def test_distributed_multigrid_rhs_matches_single():
    """Distributed V-cycle (pynama_tpu/parallel/dist_mg.py): the slab-
    partitioned multigrid-preconditioned RHS matches the single-device
    MG path. Compared at the RHS level — the fully-inlined distributed
    stepper with V-cycles is compile-prohibitive at test scale, and the
    production path host-stages stages anyway (bench.py)."""
    import jax.numpy as jnp

    cfg = make_config((16, 16), 3, rho=1.0, mu=0.1, end=0.05, max_steps=6)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    cfg["kle-rtol"] = 1e-11
    p = CavityProblem(cfg).setup()
    assert getattr(p, "mg", None) is not None
    t = jnp.asarray(0.0, p.dtype)
    w0 = p.initial_vorticity()
    f_ref, _ = p.transport_rhs(t, w0, p.zero_vel())
    f_ref = np.asarray(f_ref).reshape(-1)

    sp = ShardedNSProblem(p, 4)
    assert sp._dmg is not None, "distributed MG must build for 16/8/4 slabs"
    rhs = sp.build_rhs()
    w = sp.shard(np.asarray(w0).reshape(-1), p.dim_w)
    vel = sp.shard(np.zeros(p.mesh.n_nodes * p.dim), p.dim)
    f, _ = rhs(w, (vel, vel), t)
    fd = sp.unshard(f, p.dim_w)
    err = np.linalg.norm(fd - f_ref) / max(np.linalg.norm(f_ref), 1.0)
    assert err < 1e-6, err


def test_distributed_patch_apply_matches_single():
    """dist_patch_apply (slab-decomposed vertex-star Schwarz smoother,
    pynama_tpu/parallel/dist_mg.py) must equal the single-chip
    MGPreconditioner._patch_apply to machine precision: the conv is
    decomposed linearly over slabs (0.5-weighted shared interface
    planes) with a 2-block ghost-margin exchange."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from pynama_tpu.parallel.dist_mg import dist_patch_apply

    cfg = make_config((16, 16), 3, rho=1.0, mu=0.1, end=0.05, max_steps=6)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    p = CavityProblem(cfg).setup()
    assert p._blocked and p.mg is not None and p.mg.patch_W is not None
    sp = ShardedNSProblem(p, 4)
    assert sp._dmg is not None
    meta, stacked, repl = sp._dmg
    assert meta.use_patch[0], "fine level must smooth with patches"

    rng = np.random.default_rng(3)
    r_flat = rng.normal(size=p.mesh.n_nodes * p.dim)

    # single-chip reference (blocked layout)
    mask_b = p._m("free_mask")
    r_b = p._blk(jnp.asarray(r_flat.reshape(p._gshape(p.dim)), p.dtype))
    y_ref = np.asarray(p._unblk(
        p.mg._patch_apply(0, mask_b, r_b, blocked=True)
    )).reshape(-1)

    # distributed: same operator inside shard_map over 4 slabs
    r_st = sp.shard(r_flat, p.dim)
    half_st = stacked[0]["half"]
    W = repl["levels"][0]["patch_W"]
    sq, ex = sp._sq, sp._ex

    def body(half, mask, r):
        y = dist_patch_apply(W, sq(half), sq(mask), sq(r),
                             sp.axis_names[0], sp.n_dev)
        return ex(y)

    spec = P(*sp.axis_names)
    f = jax.jit(jax.shard_map(
        body, mesh=sp.mesh_dev, in_specs=(spec, spec, spec),
        out_specs=spec,
    ))
    y_dist = sp.unshard(f(half_st, sp.mask, r_st), p.dim)
    err = np.linalg.norm(y_dist - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err


def test_run_staged_attempt_matches_single():
    """The production distributed stepping path — run_staged over
    build_attempt (ONE SPMD dispatch per BS5 attempt, stages lax.scan
    inside) — must match a single-device run through the same scan
    attempt + host dt controller (identical tensordot stage combines and
    real-dof wlte norms -> identical accept/dt decisions)."""
    from pynama_tpu.solvers.rk import (make_attempt_host_stepper,
                                       make_bs5_scan_attempt)

    cfg = make_config((4, 8), 3, rho=0.5, mu=0.01, end=0.02, max_steps=8)
    cfg["multigrid"] = False
    p = CustomFuncProblem(cfg, case="taylor-green").setup()

    def rhs_s(t, w, aux):
        return p.transport_rhs(t, w, aux)

    attempt = jax.jit(make_bs5_scan_attempt(
        rhs_s, atol=p.ts_atol, rtol=p.ts_rtol, wlte_norm=p._wlte_norm()))
    step = make_attempt_host_stepper(attempt)
    blk = p._blk if getattr(p, "_blocked", False) else (lambda x: x)
    unblk = p._unblk if getattr(p, "_blocked", False) else (lambda x: x)
    w = blk(p.initial_vorticity())
    vel = blk(p.zero_vel())
    t = jnp.asarray(p.t_start, p.dtype)
    dt = jnp.asarray(p.dt0, p.dtype)
    t_end = jnp.asarray(p.t_end, p.dtype)
    f1, vel = rhs_s(t, w, vel)
    n_ref = 0
    while float(t) < float(t_end) - 1e-14 and n_ref < 8:
        res = step(w, t, dt, vel, f1, t_end)
        w, t, dt, vel, f1 = res.y, res.t, res.dt_next, res.aux, res.f_new
        n_ref += 1
    w_ref = np.asarray(unblk(w)).reshape(-1)

    p2 = CustomFuncProblem(cfg, case="taylor-green").setup()
    sp = ShardedNSProblem(p2, 4)
    w_loc, t_d, n = sp.run_staged(max_steps=8)
    w_dist = sp.unshard(w_loc, p2.dim_w)

    assert n == n_ref
    assert abs(t_d - float(t)) < 1e-12
    err = np.linalg.norm(w_dist - w_ref) / np.linalg.norm(w_ref)
    assert err < 1e-10, err


def test_distributed_blocked_transfers_engage_and_match():
    """The distributed blocked-native MG transfer path (dist_mg
    blocked_restrict_apply with ghost-margin exchange) must actually
    ENGAGE — meta.tms[0] is not None — at a config whose per-level LOCAL
    super factors admit the stride-m kernel (32x32 over 4 slabs), and
    the distributed RHS must match the single-device MG path. Guards
    against silent grid-path fallbacks in the production (channel3d
    sharded) code path."""
    import jax.numpy as jnp

    cfg = make_config((32, 32), 3, rho=1.0, mu=0.1, end=0.05, max_steps=6)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    cfg["kle-rtol"] = 1e-11
    p = CavityProblem(cfg).setup()
    assert getattr(p, "mg", None) is not None
    t = jnp.asarray(0.0, p.dtype)
    w0 = p.initial_vorticity()
    f_ref, _ = p.transport_rhs(t, w0, p.zero_vel())
    f_ref = np.asarray(f_ref).reshape(-1)

    sp = ShardedNSProblem(p, 4)
    assert sp._dmg is not None
    meta = sp._dmg[0]
    assert meta.tms and meta.tms[0] is not None, (
        "blocked-native distributed transfers must engage at 32x32/4 "
        f"slabs; tms={meta.tms}"
    )
    rhs = sp.build_rhs()
    w = sp.shard(np.asarray(w0).reshape(-1), p.dim_w)
    vel = sp.shard(np.zeros(p.mesh.n_nodes * p.dim), p.dim)
    f, _ = rhs(w, (vel, vel), t)
    fd = sp.unshard(f, p.dim_w)
    err = np.linalg.norm(fd - f_ref) / max(np.linalg.norm(f_ref), 1.0)
    assert err < 1e-6, err


def test_distributed_multigrid_agglomerated_tail():
    """Coarse-grid agglomeration: on 8 slabs the 48/24/12 hierarchy can
    only distribute its first two levels (12 % 8 != 0); the coarser tail
    must run replicated after an all_gather, and the distributed RHS
    still matches single-device. This is the path that lets ANY
    hierarchy/device-count combination use distributed MG (previously
    such meshes fell back to Jacobi-CG)."""
    import jax.numpy as jnp

    cfg = make_config((48, 48), 3, rho=1.0, mu=0.1, end=0.05, max_steps=6)
    cfg["boundary-conditions"] = {"no-slip": {"up": [1.0, 0.0]}}
    cfg["kle-rtol"] = 1e-11
    p = CavityProblem(cfg).setup()
    t = jnp.asarray(0.0, p.dtype)
    w0 = p.initial_vorticity()
    f_ref, _ = p.transport_rhs(t, w0, p.zero_vel())
    f_ref = np.asarray(f_ref).reshape(-1)

    sp = ShardedNSProblem(p, 8)
    assert sp._dmg is not None, "agglomeration must enable dist MG on 8 slabs"
    meta = sp._dmg[0]
    assert meta.aggl and len(sp._dmg[1]) == 2
    rhs = sp.build_rhs()
    w = sp.shard(np.asarray(w0).reshape(-1), p.dim_w)
    vel = sp.shard(np.zeros(p.mesh.n_nodes * p.dim), p.dim)
    f, _ = rhs(w, (vel, vel), t)
    fd = sp.unshard(f, p.dim_w)
    err = np.linalg.norm(fd - f_ref) / max(np.linalg.norm(f_ref), 1.0)
    assert err < 1e-6, err


def test_owner_field_partition():
    """createNumProcVec analogue: per-node owning device indices."""
    from pynama_tpu.mesh.structured import BoxMesh
    from pynama_tpu.parallel.slab import GridDecomposition

    m = BoxMesh(nelem=(4, 8), lower=(0, 0), upper=(1, 1), ngl=3)
    sd = SlabDecomposition(m, 4)
    f = sd.owner_field()
    assert f.shape == (m.n_nodes,)
    # 8 elements / 4 devs -> 2 element planes (4 node rows) each + shared
    g = f.reshape(m.npts[1], m.npts[0])
    assert set(np.unique(f)) == {0.0, 1.0, 2.0, 3.0}
    assert np.all(g[0:5] == 0)        # rows 0-4: device 0 (row 4 shared)
    assert np.all(g[5:9] == 1)
    assert np.all(g[13:] == 3)
    # pencil: 2x2 devices over a square mesh
    gd = GridDecomposition(m, (2, 2))
    fo = gd.owner_field().reshape(m.npts[1], m.npts[0])
    assert fo[0, 0] == 0 and fo[-1, -1] == 3
    assert fo[-1, 0] == 2 and fo[0, -1] == 1
    assert set(np.unique(fo)) == {0.0, 1.0, 2.0, 3.0}


@pytest.mark.parametrize("ws", [False, True])
def test_run_staged_chunked_matches_per_attempt(ws):
    """ts-chunk=k fuses the accept/reject dt controller into the SPMD
    program (host syncs every k attempts). Same controller arithmetic ->
    identical trajectory, step count and final time as the per-attempt
    path; ws additionally exercises the sharded per-slot warm-start
    history (replicated time scalars + sharded slot stacks)."""
    cfg = make_config((4, 8), 3, rho=0.5, mu=0.01, end=0.02, max_steps=8)
    cfg["multigrid"] = False
    if ws:
        cfg["kle-ws-extrapolate"] = True
    p1 = CustomFuncProblem(cfg, case="taylor-green").setup()
    sp1 = ShardedNSProblem(p1, 4)
    w1, t1, n1 = sp1.run_staged(max_steps=8)

    p2 = CustomFuncProblem({**cfg, "ts-chunk": 3},
                           case="taylor-green").setup()
    sp2 = ShardedNSProblem(p2, 4)
    w2, t2, n2 = sp2.run_staged(max_steps=8)

    assert n2 == n1
    assert abs(t2 - t1) < 1e-12
    a = sp1.unshard(w1, p1.dim_w)
    b = sp2.unshard(w2, p2.dim_w)
    err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
    assert err < 1e-10, err
