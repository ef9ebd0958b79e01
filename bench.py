"""Benchmark: wall-clock per Navier-Stokes timestep, lid-driven cavity.

North-star metric (BASELINE.json): wall-clock per timestep (KLE solves +
operator chain) at ~1M velocity DOFs on the 2D lid-driven cavity, vs the
reference's single-node CPU direct-LU algorithm at matching residual
(1e-8 relative).

The reference (petsc4py) cannot run in this container (no petsc4py/mpi4py),
so the baseline is a faithful scipy re-implementation of its per-step
algorithm: assembled CSR matrices, SuperLU factor-once + 2 backsolves per
RHS eval, 7 RHS evals per BS5(4) step — the same solve structure as
/root/reference/src/cases/base_problem.py:212-232,321-327 with
ksp preonly+lu (ksp_solver.py:12-19). Baseline numbers are measured once
and cached in bench_baseline.json (re-measure with BENCH_MEASURE_BASELINE=1).

Output: ONE json line
  {"metric": ..., "value": ms_per_step, "unit": "ms", "vs_baseline": x}
where vs_baseline = baseline_ms / ours_ms (>1 means we are faster).

Env knobs: BENCH_NELEM (default 360 -> 1.04M vel dofs at ngl=3),
BENCH_STEPS, BENCH_DTYPE (float64|float32), BENCH_MEASURE_BASELINE.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Precision: f64 WORKS on the axon TPU (K apply ~10x f32 — fine for the
# one defect-residual apply per refinement round; avoid f64 V-cycles,
# ~200x). Default bench dtype is f32; BENCH_REFINE=1 switches to f64
# state + mixed-precision iterative refinement (kle.py solve_ir) for
# TRUE 1e-8 residuals — the parity configuration.
NELEM = int(os.environ.get("BENCH_NELEM", "384"))
NGL = 3
STEPS = int(os.environ.get("BENCH_STEPS", "3"))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
KLE_RTOL = float(os.environ.get("BENCH_KLE_RTOL", "1e-5"))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")


def cavity_config():
    mg = True
    if os.environ.get("BENCH_MG_PRE") or os.environ.get("BENCH_MG_POST"):
        mg = {"pre": int(os.environ.get("BENCH_MG_PRE", "3")),
              "post": int(os.environ.get("BENCH_MG_POST", "3"))}
    cfg_extra = {}
    if os.environ.get("BENCH_REFINE") == "1":
        # f64 state + mixed-precision refinement: TRUE 1e-8 residuals
        cfg_extra["kle-refine"] = True
    if os.environ.get("BENCH_KLE_INNER_RTOL"):
        cfg_extra["kle-inner-rtol"] = float(
            os.environ["BENCH_KLE_INNER_RTOL"])
    if os.environ.get("BENCH_ADAPTIVE_INNER"):
        cfg_extra["kle-adaptive-inner"] = (
            os.environ["BENCH_ADAPTIVE_INNER"] == "1")
    return {
        "multigrid": mg,
        **cfg_extra,
        "name": "cavity-bench",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {
            "ngl": NGL,
            "box-mesh": {
                "nelem": [NELEM, NELEM],
                "lower": [0, 0],
                "upper": [1, 1],
            },
        },
        "time-solver": {"start-time": 0.0, "end-time": 100.0, "max-steps": 10000},
        "boundary-conditions": {"no-slip": {"up": [1.0, 0.0]}},
        "kle-rtol": KLE_RTOL,
        "kle-maxiter": int(os.environ.get("BENCH_KLE_MAXITER", "4000")),
    }


def profile():
    """Per-phase breakdown of the north-star metric (BENCH_PROFILE / --profile).

    Times the primitive operations on-device (looped inside one jit program
    — dispatch over the axon tunnel costs 50-100 ms, so per-op timing must
    amortize it) and prints CG iteration counts per KLE solve.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PYNAMA_JAX_CACHE",
                                     "/tmp/pynama-jax-cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pynama_tpu.cases.cavity import CavityProblem
    from pynama_tpu.kle import ns_rhs

    dtype = jnp.float64 if DTYPE == "float64" else jnp.float32
    p = CavityProblem(cavity_config(), dtype=dtype).setup()
    n_dofs = p.mesh.n_nodes * p.dim
    print(f"profile: {n_dofs} dofs, platform {jax.devices()[0].platform}, "
          f"{DTYPE}", file=sys.stderr)

    # per-dispatch overhead (axon tunnel arg processing + launch): timed
    # once and subtracted from the SINGLE-dispatch numbers below (KLE
    # solve / RHS eval) — round 4's profile divided ONE dispatch by n=32,
    # which inflated sub-ms ops by dispatch/32 (the "9 GB/s K apply" was
    # mostly this artifact; the isolated kernel measures ~45 GB/s,
    # scripts/stencil_breakdown_tpu.py). The looped per-op timings use a
    # two-length difference instead, which cancels dispatch exactly.
    @jax.jit
    def _noop(x):
        return x * jnp.asarray(1.0, x.dtype)

    probe = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(_noop(probe))
    t0 = time.perf_counter()
    for _ in range(8):
        jax.block_until_ready(_noop(probe))
    dispatch_ms = (time.perf_counter() - t0) / 8 * 1e3
    print(f"  dispatch overhead: {dispatch_ms:.2f} ms "
          f"(subtracted from single-dispatch timings)", file=sys.stderr)

    def timed_loop(name, fn, x, n=64, flops=None, bytes_=None):
        # two-length difference: per-op = (t(3n) - t(n)) / 2n. The
        # per-dispatch overhead (and any fixed in/out transfer) cancels
        # EXACTLY instead of being subtracted from a separately-measured
        # estimate, which went negative for sub-ms ops (the round-5
        # "0.000 ms K apply" artifact).
        def make_loop(m):
            @jax.jit
            def loop(x):
                def body(i, v):
                    return fn(v) * jnp.asarray(1.0, v.dtype)
                return jax.lax.fori_loop(0, m, body, x)
            return loop

        loop1, loop3 = make_loop(n), make_loop(3 * n)

        def best_ms(loop):
            jax.block_until_ready(loop(x))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(loop(x))
                best = min(best, time.perf_counter() - t0)
            return best * 1e3

        per = max((best_ms(loop3) - best_ms(loop1)) / (2 * n), 1e-6)
        extra = ""
        if bytes_:
            extra = f"  ({bytes_ / per * 1e3 / 1e9:.0f} GB/s effective)"
        print(f"  {name:<28s} {per:8.3f} ms{extra}", file=sys.stderr)
        return per

    w0 = p.initial_vorticity()
    u_bc = p.vel_bc(0.0)
    if getattr(p, "_blocked", False):
        w0, u_bc = p._blk(w0), p._blk(u_bc)
    mask, mask_fs = p._m("free_mask"), p._m("free_mask_fs")
    v = p.system.rhs(w0, u_bc, mask_fs)
    itemsize = np.dtype(DTYPE).itemsize
    vel_bytes = n_dofs * itemsize

    t_apply = timed_loop("K apply (masked)",
                         lambda x: p.system.apply_masked(x, mask),
                         v, bytes_=2 * vel_bytes)
    if getattr(p, "_minv", None) is not None:
        t_v = timed_loop("MG V-cycle", p._minv, v)
        timed_loop("V-cycle + K apply (1 CG it)",
                   lambda x: p._minv(p.system.apply_masked(x, mask)),
                   v)
    timed_loop("transport operator chain",
               lambda x: p.system.Rw(ns_rhs(p.operators, x, p.mu,
                                            p.rho, p.dim)), v)

    # KLE solve iteration counts: cold then warm(ish); jitted (eager
    # dispatch over the axon tunnel costs 50-100 ms PER OP)
    @partial(jax.jit, static_argnames=("which",))
    def jsolve(w, x0, which):
        m = mask_fs if which == "fs" else mask
        minv = getattr(p, "_minv_fs" if which == "fs" else "_minv", None)
        return p.system.solve(w, u_bc, m, x0=x0, rtol=KLE_RTOL,
                              maxiter=p.kle_maxiter, restarts=1, m_inv=minv)

    def solve_counts(which, x0, tag):
        res = jsolve(w0, x0, which)
        jax.block_until_ready(res.x)
        t0 = time.perf_counter()
        res = jsolve(w0, x0, which)
        jax.block_until_ready(res.x)
        ms = (time.perf_counter() - t0) * 1e3 - dispatch_ms
        print(f"  KLE solve [{tag}]: {int(res.iters)} iters, {ms:.1f} ms "
              f"({ms / max(int(res.iters), 1):.2f} ms/iter), "
              f"resnorm {float(res.resnorm):.2e}", file=sys.stderr)
        return res.x

    x_fs = solve_counts("fs", None, "FS, cold")
    solve_counts("final", x_fs, "final, warm")
    solve_counts("fs", x_fs, "FS, warm")

    # full RHS eval (2 solves + operator chain), warm-started
    @jax.jit
    def rhs(t, w, vel_ws):
        return p.transport_rhs(t, w, vel_ws)

    vel0 = p.zero_vel()
    if getattr(p, "_blocked", False):
        vel0 = p._blk(vel0)
    f1, vel = rhs(jnp.asarray(0.0, dtype), w0, vel0)
    # second warmup: the aux pytree may change structure after the first
    # call (dual-mask warm-start pair), which would retrace — warm the
    # steady-state structure before timing
    f1, vel = rhs(jnp.asarray(0.0, dtype), w0, vel)
    jax.block_until_ready((f1, vel))
    t0 = time.perf_counter()
    f1, vel = rhs(jnp.asarray(0.0, dtype), w0, vel)
    jax.block_until_ready((f1, vel))
    rhs_ms = (time.perf_counter() - t0) * 1e3 - dispatch_ms
    print(f"  RHS eval (warm):             {rhs_ms:8.1f} ms"
          f"  (x7 per BS5 step)", file=sys.stderr)

    # allocation report (printMatsInfo analogue, mat_generator.py:120-130)
    from pynama_tpu.utils.report import device_report

    print(device_report(p), file=sys.stderr)


def bench_ours(refine=False, donor=None):
    """Per-step time; refine=True runs the PARITY configuration (f64
    state + mixed-precision iterative refinement, TRUE 1e-8 residuals —
    kle.py solve_ir) and appends an f64 residual self-check so the
    recorded artifact carries its own verification.

    donor: the f32 leg's problem object — the parity leg's f32 inner
    machinery (system32, MG preconditioners) is IDENTICAL to the f32
    leg's (same mesh/masks/dtype), so reusing it cuts the parity setup
    to the f64 system build alone (round-4's 122.9 s parity setup inside
    a fixed driver budget was the BENCH_r04 rc=124 failure mode).
    """
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PYNAMA_JAX_CACHE",
                                     "/tmp/pynama-jax-cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pynama_tpu.cases.cavity import CavityProblem
    from pynama_tpu.solvers.rk import (make_attempt_host_stepper,
                                       make_bs5_scan_attempt)

    if refine:
        dtype = jnp.float64
        cfg = {**cavity_config(), "kle-refine": True, "kle-rtol": 1e-8}
        # Parity leg runs the round-3 solver settings: with ws
        # extrapolation + adaptive inner BOTH on, the on-chip parity
        # step regressed 1649 -> 3281 ms (run-artifacts/
        # bench-r5-onchip-tail.txt) — the extrapolated warm start lands
        # in the band where the adaptive inner solve under-delivers
        # near the f32 floor and solve_ir burns extra f64 defect
        # rounds (ADVICE r4 #1 predicted this interaction). The f32
        # leg keeps both (327 -> 185 ms there). Overridable via env.
        cfg.setdefault("kle-adaptive-inner",
                       os.environ.get("BENCH_ADAPTIVE_INNER") == "1")
    else:
        dtype = jnp.float64 if DTYPE == "float64" else jnp.float32
        cfg = cavity_config()
    if os.environ.get("BENCH_NO_MG") == "1":  # Jacobi-CG, comparable to
        cfg["multigrid"] = False              # the sharded path's solver
    t_setup0 = time.perf_counter()
    if (refine and donor is not None and dtype == jnp.float64
            and donor.dtype == jnp.float32):
        p = CavityProblem(cfg, dtype=dtype)
        p.mesh, p.elem = donor.mesh, donor.elem
        from pynama_tpu.kle import build_kle_system, build_operators

        p.system = build_kle_system(p.mesh, p.elem, dtype)
        p.operators = build_operators(p.mesh, p.elem, dtype)
        p.system32 = donor.system
        p.setup_bc()
        p._setup_blocked()
        # f32 V-cycles on the same masks: donated as-is (the parity
        # problem's masks only differ in dtype, and MG runs f32 anyway)
        p._minv = getattr(donor, "_minv", None)
        p._minv_fs = getattr(donor, "_minv_fs", None)
        p.mg = getattr(donor, "mg", None)
        p._setup_done = True
    else:
        p = CavityProblem(cfg, dtype=dtype).setup()
    setup_s = time.perf_counter() - t_setup0
    n_dofs = p.mesh.n_nodes * p.dim
    print(f"setup ({'parity' if refine else DTYPE}): {setup_s:.1f} s "
          f"at {n_dofs} dofs", file=sys.stderr)

    def rhs(t, w, vel_ws):
        return p.transport_rhs(t, w, vel_ws)

    # host dt controller + ONE compiled dispatch per attempt (the 7 RHS
    # stages lax.scan inside — the fully-inlined adaptive program OOMs
    # the compiler at this size); huge tolerances -> every attempt
    # accepted -> fixed-dt stepping, so the measured work per step is
    # exactly 7 RHS evals. BENCH_WS=1 (default on the f32 leg) adds the
    # cross-step per-stage-slot warm-start extrapolation (solvers/rk.py);
    # the parity leg defaults it OFF (see the refine cfg note above).
    ws = os.environ.get("BENCH_WS", "0" if refine else "1") == "1"
    attempt = jax.jit(make_bs5_scan_attempt(rhs, atol=1e12, rtol=1e12,
                                            ws_extrapolate=ws))
    step = make_attempt_host_stepper(attempt)

    w = p.initial_vorticity()
    vel = p.zero_vel()
    if getattr(p, "_blocked", False):
        w, vel = p._blk(w), p._blk(vel)  # solver layout end-to-end
    t = jnp.asarray(0.0, dtype=dtype)
    dt = jnp.asarray(1e-3, dtype=dtype)
    t_end = jnp.asarray(1e9, dtype=dtype)
    f1, vel = rhs(t, w, vel)
    jax.block_until_ready((f1, vel))
    if ws:
        from pynama_tpu.solvers.rk import make_ws_state

        vel = make_ws_state(vel, t)

    # warmup (compile + first solve from cold start)
    t_c0 = time.perf_counter()
    res = step(w, t, dt, vel, f1, t_end)
    jax.block_until_ready(res.y)
    print(f"compile+warmup: {time.perf_counter() - t_c0:.1f} s",
          file=sys.stderr)
    w, t, vel, f1 = res.y, res.t, res.aux, res.f_new

    t0 = time.perf_counter()
    for _ in range(STEPS):
        res = step(w, t, dt, vel, f1, t_end)
        w, t, vel, f1 = res.y, res.t, res.aux, res.f_new
    jax.block_until_ready(w)
    elapsed = time.perf_counter() - t0

    true_res = None
    if refine:
        # f64 residual self-check: solve the FINAL-stage masked system
        # through the same refinement path and report ITS true f64
        # relative residual (solve_ir forms the defect with f64 operator
        # applies, so resnorm IS the true residual, not a recurrence
        # estimate). Must be <= 1e-8 to claim parity with the reference
        # LU. Checked at the INITIAL vorticity: the timed steps run at a
        # fixed dt far above the explicit diffusive stability limit
        # (deliberately — every attempt accepted makes the measured work
        # exactly 7 RHS evals/step), so the end state is non-physical.
        from pynama_tpu.kle import solve_ir

        w0 = p.initial_vorticity()
        if getattr(p, "_blocked", False):
            w0 = p._blk(w0)
        mask = p._m("free_mask")
        t0_ = jnp.asarray(0.0, dtype)
        u_bc = p._solver_bc(t0_)
        res = solve_ir(
            p.system, p.system32, w0, u_bc, mask,
            mask.astype(jnp.float32),
            rtol=1e-8, maxiter=p.kle_maxiter,
            inner_rtol=p.kle_inner_rtol,
            m_inv32=getattr(p, "_minv", None),
        )
        b = p.system.rhs(w0, u_bc, mask)
        bnorm = float(jnp.linalg.norm(b.reshape(-1)))
        true_res = float(res.resnorm) / max(bnorm, 1e-300)
        print(f"parity check: f64 true relative residual {true_res:.3e} "
              f"(gate 1e-8, {int(res.iters)} inner iters)", file=sys.stderr)
    return (elapsed / STEPS * 1e3, n_dofs, jax.devices()[0].platform,
            true_res, setup_s, p)


def bench_sharded(n_dev):
    """Per-step time of the DISTRIBUTED path on the real device(s).

    Runs the shard_map slab decomposition (halo exchange + psum
    collectives) with chunked SPMD stepping — a 1-device mesh quantifies
    the distributed path's overhead vs the single-chip bench (target:
    within ~1.1x with the fused controller); more devices measure real
    scaling. BENCH_CASE=channel3d measures the 3D hex channel slab
    (vs the single-chip --channel3d number) instead of the cavity.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PYNAMA_JAX_CACHE",
                                     "/tmp/pynama-jax-cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pynama_tpu.cases.cavity import CavityProblem
    from pynama_tpu.cases.uniform import UniformFlowProblem
    from pynama_tpu.parallel.sharded_problem import ShardedNSProblem
    from pynama_tpu.solvers.rk import make_attempt_host_stepper

    dtype = jnp.float64 if DTYPE == "float64" else jnp.float32
    if os.environ.get("BENCH_CASE") == "channel3d":
        nelem = [int(x) for x in
                 os.environ.get("BENCH_NELEM3D", "32,32,80").split(",")]
        cfg = {
            "name": "channel3d-bench",
            "material-properties": {"rho": 1.0, "mu": 0.01},
            "domain": {"ngl": NGL,
                       "box-mesh": {"nelem": nelem, "lower": [0, 0, 0],
                                    "upper": [1, 1, 2.5]}},
            "time-solver": {"start-time": 0.0, "end-time": 100.0,
                            "max-steps": 10000},
            "kle-rtol": KLE_RTOL,
            "kle-maxiter": int(os.environ.get("BENCH_KLE_MAXITER", "4000")),
        }
        if os.environ.get("BENCH_NO_MG") == "1":
            cfg["multigrid"] = False
        p = UniformFlowProblem(cfg, dtype=dtype).setup()
    else:
        cfg = cavity_config()
        if os.environ.get("BENCH_NO_MG") == "1":
            cfg["multigrid"] = False
        p = CavityProblem(cfg, dtype=dtype).setup()
    n_dofs = p.mesh.n_nodes * p.dim
    sp = ShardedNSProblem(p, n_dev)
    if sp._dmg is not None:
        print("sharded: distributed multigrid active", file=sys.stderr)
    rhs_fn = sp.build_rhs(kle_rtol=KLE_RTOL, kle_maxiter=p.kle_maxiter)

    def rhs(t, w, aux):
        f, vel = rhs_fn(w, aux, t)
        return f, vel

    # the accept/reject dt controller runs INSIDE the SPMD program as a
    # k-attempt lax.scan (BENCH_CHUNK, default 4): the host syncs once
    # per k attempts instead of per attempt — the round-4 1.15x
    # step-level overhead was exactly this per-attempt readback
    chunk = int(os.environ.get("BENCH_CHUNK", "4"))
    ws = os.environ.get("BENCH_WS", "1") == "1"
    attempt = sp.build_attempt(kle_rtol=KLE_RTOL, kle_maxiter=p.kle_maxiter,
                               atol=1e12, rtol=1e12, chunk=chunk,
                               ws_extrapolate=ws)
    w = sp.shard(np.zeros(p.mesh.n_nodes * p.dim_w), p.dim_w)
    vel = sp.shard(np.zeros(n_dofs), p.dim)
    t = jnp.asarray(0.0, dtype=dtype)
    dt = jnp.asarray(1e-3, dtype=dtype)
    t_end = jnp.asarray(1e9, dtype=dtype)
    f1, vel = rhs(t, w, vel)
    jax.block_until_ready((f1, vel))
    if ws:
        from pynama_tpu.solvers.rk import make_ws_state

        vel = make_ws_state(vel, t)

    if chunk == 1:
        step = make_attempt_host_stepper(attempt)

        def do_chunk(w, t, dt, vel, f1):
            res = step(w, t, dt, vel, f1, t_end)
            return res.y, res.t, res.dt_next, res.aux, res.f_new, 1
    else:
        def do_chunk(w, t, dt, vel, f1):
            w, t, dt, vel, f1, n_acc, _ = attempt(w, t, dt, vel, f1, t_end)
            return w, t, dt, vel, f1, int(n_acc)

    out = do_chunk(w, t, dt, vel, f1)  # warmup/compile
    jax.block_until_ready(out[0])
    w, t, dt, vel, f1 = out[:5]
    n_steps = 0
    t0 = time.perf_counter()
    while n_steps < STEPS * chunk:
        w, t, dt, vel, f1, n_acc = do_chunk(w, t, dt, vel, f1)
        n_steps += n_acc
    jax.block_until_ready(w)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    pc = "distributed MG" if sp._dmg is not None else "Jacobi-CG"
    print(f"sharded[{n_dev} dev] {n_dofs} dofs: {ms:.1f} ms/step "
          f"({pc}, chunk={chunk}, ws={ws})", file=sys.stderr)
    return ms, n_dofs


def bench_channel3d():
    """Steady-state per-step time for BASELINE config 5 (3D hex channel).

    Same protocol as bench_ours — host dt controller + one compiled
    dispatch per BS5 attempt (7-stage scan inside), huge tolerances so
    every attempt is accepted and a step is exactly 7 RHS evals — on the
    channel3d box (configs/channel3d.yaml geometry). Setup + compile are
    timed separately and excluded from the per-step number.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PYNAMA_JAX_CACHE",
                                     "/tmp/pynama-jax-cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pynama_tpu.cases.uniform import UniformFlowProblem
    from pynama_tpu.solvers.rk import (make_attempt_host_stepper,
                                       make_bs5_scan_attempt)

    nelem = [int(x) for x in
             os.environ.get("BENCH_NELEM3D", "32,32,80").split(",")]
    dtype = jnp.float64 if DTYPE == "float64" else jnp.float32
    cfg = {
        "name": "channel3d-bench",
        "material-properties": {"rho": 1.0, "mu": 0.01},
        "domain": {
            "ngl": NGL,
            "box-mesh": {"nelem": nelem, "lower": [0, 0, 0],
                         "upper": [1, 1, 2.5]},
        },
        "time-solver": {"start-time": 0.0, "end-time": 100.0,
                        "max-steps": 10000},
        "kle-rtol": KLE_RTOL,
        "kle-maxiter": int(os.environ.get("BENCH_KLE_MAXITER", "4000")),
    }
    t_setup0 = time.perf_counter()
    p = UniformFlowProblem(cfg, dtype=dtype).setup()
    setup_s = time.perf_counter() - t_setup0
    n_dofs = p.mesh.n_nodes * p.dim
    print(f"channel3d: {n_dofs} dofs ({'x'.join(map(str, nelem))} ngl={NGL}),"
          f" setup {setup_s:.1f} s, platform {jax.devices()[0].platform}",
          file=sys.stderr)

    def rhs(t, w, vel_ws):
        return p.transport_rhs(t, w, vel_ws)

    ws = os.environ.get("BENCH_WS", "1") == "1"
    attempt = jax.jit(make_bs5_scan_attempt(rhs, atol=1e12, rtol=1e12,
                                            ws_extrapolate=ws))
    step = make_attempt_host_stepper(attempt)

    w = p.initial_vorticity()
    vel = p.zero_vel()
    if getattr(p, "_blocked", False):
        w, vel = p._blk(w), p._blk(vel)
    t = jnp.asarray(0.0, dtype=dtype)
    dt = jnp.asarray(float(os.environ.get("BENCH_DT", "1e-3")), dtype=dtype)
    t_end = jnp.asarray(1e9, dtype=dtype)
    t_c0 = time.perf_counter()
    f1, vel = rhs(t, w, vel)
    jax.block_until_ready((f1, vel))
    if ws:
        from pynama_tpu.solvers.rk import make_ws_state

        vel = make_ws_state(vel, t)
    res = step(w, t, dt, vel, f1, t_end)  # warmup/compile
    jax.block_until_ready(res.y)
    print(f"channel3d: compile+warmup {time.perf_counter() - t_c0:.1f} s",
          file=sys.stderr)
    w, t, vel, f1 = res.y, res.t, res.aux, res.f_new
    t0 = time.perf_counter()
    for _ in range(STEPS):
        res = step(w, t, dt, vel, f1, t_end)
        w, t, vel, f1 = res.y, res.t, res.aux, res.f_new
    jax.block_until_ready(w)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    assert np.isfinite(np.asarray(jax.device_get(res.f_new))).all()
    return ms, n_dofs, setup_s


def bench_baseline():
    """scipy re-implementation of the reference per-step algorithm."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    import jax

    jax.config.update("jax_platforms", "cpu")
    from pynama_tpu.cases.cavity import CavityProblem
    from pynama_tpu.kle import v_tens_v

    # the baseline only needs the assembled matrices, not our MG hierarchy
    p = CavityProblem({**cavity_config(), "multigrid": False}).setup()
    m = p.mesh
    dim, dim_w, dim_s = m.dim, m.dim_w, m.dim_s
    nv, nw, ns_ = m.n_nodes * dim, m.n_nodes * dim_w, m.n_nodes * dim_s

    def assemble(A_el, in_dofs, out_dofs, shape):
        E, ik = in_dofs.shape
        ok = out_dofs.shape[1]
        data = np.broadcast_to(A_el, (E, ok, ik)).reshape(-1)
        rows = np.repeat(out_dofs, ik, axis=1).reshape(-1)
        cols = np.tile(in_dofs, (1, ok)).reshape(-1)
        return sp.coo_matrix((data, (rows, cols)), shape=shape).tocsr()

    vd = np.asarray(m.cell_dofs(dim))
    wd = np.asarray(m.cell_dofs(dim_w))
    sd = np.asarray(m.cell_dofs(dim_s))
    sysm, ops = p.system, p.operators

    print("baseline: assembling CSR matrices ...", file=sys.stderr)
    K = assemble(np.asarray(sysm.K.A), vd, vd, (nv, nv))
    Rw = assemble(np.asarray(sysm.Rw.A), wd, vd, (nv, nw))
    Curl = sp.diags(1.0 / np.asarray(ops.w_curl)) @ assemble(
        np.asarray(ops.Curl.A), vd, wd, (nw, nv)
    )
    SrT = sp.diags(1.0 / np.asarray(ops.w_srt)) @ assemble(
        np.asarray(ops.SrT.A), vd, sd, (ns_, nv)
    )
    Div = sp.diags(1.0 / np.asarray(ops.w_div)) @ assemble(
        np.asarray(ops.DivSrT.A), sd, vd, (nv, ns_)
    )

    mask = np.asarray(p.free_mask).reshape(-1)
    mask_fs = np.asarray(p.free_mask_fs).reshape(-1)
    u_bc = np.asarray(p.vel_bc(0.0)).reshape(-1)

    def masked(Kc, msk):
        D = sp.diags(msk)
        return (D @ Kc @ D + sp.diags(1.0 - msk)).tocsc()

    print("baseline: LU factorization (final-stage K) ...", file=sys.stderr)
    t0 = time.perf_counter()
    lu = spla.splu(masked(K, mask))
    print(f"  factor 1: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    lu_fs = spla.splu(masked(K, mask_fs))
    print(f"  factor 2: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    fsfree = mask_fs - mask
    mu, rho = p.mu, p.rho

    def vtv(vel):
        v = vel.reshape(-1, 2)
        out = np.empty(ns_)
        out[0::3] = v[:, 0] * v[:, 0]
        out[1::3] = v[:, 0] * v[:, 1]
        out[2::3] = v[:, 1] * v[:, 1]
        return out

    def eval_rhs(w):
        b = mask_fs * (Rw @ w - K @ ((1 - mask_fs) * u_bc)) + (1 - mask_fs) * u_bc
        vel_fs = lu_fs.solve(b)
        vel_fs = vel_fs * (1 - fsfree) + u_bc * fsfree
        w2 = Curl @ vel_fs
        b = mask * (Rw @ w2 - K @ ((1 - mask) * u_bc)) + (1 - mask) * u_bc
        vel = lu.solve(b)
        aux = 2 * mu * (SrT @ vel) - rho * vtv(vel)
        return Curl @ ((Div @ aux) / rho)

    w = np.zeros(nw)
    eval_rhs(w)  # warmup
    n_rhs = 7 * max(1, STEPS)
    t0 = time.perf_counter()
    for _ in range(n_rhs):
        f = eval_rhs(w)
        w = w + 1e-6 * f  # keep data changing (defeat any caching)
    elapsed = time.perf_counter() - t0
    return elapsed / max(1, STEPS) * 1e3  # ms per step (7 rhs evals)


def _baseline_ms():
    """Cached scipy-LU baseline ms/step (measure w/ BENCH_MEASURE_BASELINE)."""
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        cache = json.load(open(BASELINE_CACHE))
    key = f"cavity-{NELEM}-{NGL}"
    if os.environ.get("BENCH_MEASURE_BASELINE") == "1":
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--baseline"],
            capture_output=True, text=True, env=os.environ,
        )
        ms = json.loads(r.stdout.strip().splitlines()[-1])["baseline_ms"]
        cache[key] = {"ms_per_step": ms, "host": "1-core container"}
        json.dump(cache, open(BASELINE_CACHE, "w"), indent=1)
        return ms
    return cache.get(key, {}).get("ms_per_step")


def main():
    # sitecustomize pins the axon TPU plugin before env is consulted;
    # honor JAX_PLATFORMS explicitly (cf. run_case.py main)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    if "--profile" in sys.argv or os.environ.get("BENCH_PROFILE") == "1":
        profile()
        return
    if "--baseline" in sys.argv:
        # subprocess mode: measure the scipy-LU baseline on CPU, print ms
        print(json.dumps({"baseline_ms": bench_baseline()}))
        return
    if "--channel3d" in sys.argv:
        ms, n_dofs, setup_s = bench_channel3d()
        print(json.dumps({"metric": "channel3d_ms_per_step",
                          "value": round(ms, 3), "unit": "ms",
                          "n_dofs": n_dofs, "kle_rtol": KLE_RTOL,
                          "dtype": DTYPE, "setup_s": round(setup_s, 1)}))
        return
    if "--sharded" in sys.argv or os.environ.get("BENCH_SHARDED"):
        n_dev = int(os.environ.get("BENCH_SHARDED", "1"))
        ms, n_dofs = bench_sharded(n_dev)
        print(json.dumps({"metric": f"sharded_{n_dev}dev_ms_per_step",
                          "value": round(ms, 3), "unit": "ms",
                          "n_dofs": n_dofs}))
        return

    # The driver parses the LAST json line on stdout and runs under a
    # fixed wall budget (BENCH_r04 was rc=124/parsed=null: the parity leg
    # never finished, so the already-measured f32 number was lost). The
    # order here is budget-defensive: measure the cheap f32 leg FIRST and
    # emit a complete headline immediately, then upgrade the headline
    # in-place after each later leg (profile niceties, then the parity
    # leg) — a timeout at any point still leaves a parsed artifact.
    baseline_ms = _baseline_ms()

    def vs(ms):
        return round(baseline_ms / ms, 3) if baseline_ms else None

    # the axon TPU worker occasionally needs a restart after a prior
    # kernel fault; one retry covers the flake
    try:
        ours_ms, n_dofs, platform, _, setup_s, p32 = bench_ours()
    except Exception as e:  # pragma: no cover
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        time.sleep(30)
        ours_ms, n_dofs, platform, _, setup_s, p32 = bench_ours()

    ladder = {"rtol1e-5_f32": {"ms": round(ours_ms, 3),
                               "vs_baseline": vs(ours_ms)}}
    out = {
        "metric": f"cavity_ns_wallclock_per_timestep_{n_dofs}dof_{platform}",
        "value": round(ours_ms, 3),
        "unit": "ms",
        "vs_baseline": vs(ours_ms),
        "setup_s": round(setup_s, 1),
        "ladder": ladder,
    }
    print(json.dumps(out), flush=True)

    # PARITY row: f64 state + mixed-precision refinement, TRUE 1e-8
    # residuals (the metric BASELINE.md defines the 10x target against —
    # the reference's LU backsolves give f64 machine-precision residuals).
    # BENCH_PARITY=0 skips it (e.g. quick f32-only runs). Runs BEFORE the
    # diagnostic profile: profile() rebuilds its own problem (~2.5 min of
    # host setup that upgrades no headline), so under a tight driver
    # budget the full ladder must be emitted first.
    if os.environ.get("BENCH_PARITY", "1") == "1":
        try:
            parity_ms, _, _, parity_res, parity_setup, _ = bench_ours(
                refine=True, donor=p32 if DTYPE == "float32" else None)
        except Exception as e:  # pragma: no cover
            print(f"parity bench failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
        else:
            ladder["true1e-8_f64ir"] = {"ms": round(parity_ms, 3),
                                        "vs_baseline": vs(parity_ms)}
            out = {
                "metric": (f"cavity_ns_wallclock_per_timestep_{n_dofs}dof_"
                           f"{platform}_true1e-8"),
                "value": round(parity_ms, 3),
                "unit": "ms",
                "vs_baseline": vs(parity_ms),
                "true_f64_rel_residual": parity_res,
                "setup_s": round(parity_setup, 1),
                "ladder": ladder,
            }
            print(json.dumps(out), flush=True)

    # phase breakdown (stderr): per-op times + CG iteration counts +
    # device-allocation report; diagnostics only, after every headline.
    if os.environ.get("BENCH_NO_PROFILE") != "1":
        try:
            profile()
        except Exception as e:  # pragma: no cover - keep the metric alive
            print(f"profile phase skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

    # the full ladder is already printed; re-emit it LAST so the driver's
    # last-json-line parse always sees the complete ladder even though the
    # profile wrote diagnostics in between
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
