"""CLI driver: production runs, convergence charts, operator tests.

Parity: /root/reference/src/run_case.py —
  python -m pynama_tpu.run_case -case <name> [-test kle|operators|chartkle]
         [-log LEVEL] [-ngl N] [-nelem N] [-resume ckpt] [-dtype float32]

Modes (run_case.py:164-185):
  (default)        transient production run (timeSolving :152-162) with
                   XDMF/HDF5 output, checkpoints and step logging
  -test kle        KLE p-refinement convergence chart (generateChart :30-77)
  -test operators  convective/diffusive/curl error chart
                   (generateChartOperators :79-130)
  -test chartkle   transient error tracking vs the analytic solution
                   (convergedStepFunctionKLET path :138-149)

Case configs are YAML files with the reference schema
(/root/reference/src/cases/*.yaml), looked up in ./configs/ or by path.
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np
import yaml

logger = logging.getLogger("pynama_tpu")

CASE_CLASSES = {
    "uniform": ("pynama_tpu.cases.uniform", "UniformFlowProblem", {}),
    "cavity": ("pynama_tpu.cases.cavity", "CavityProblem", {}),
    "taylor-green": ("pynama_tpu.cases.analytic", "CustomFuncProblem",
                     {"case": "taylor-green"}),
    "taylor-green2d-3d": ("pynama_tpu.cases.analytic", "CustomFuncProblem",
                          {"case": "taylor-green2d-3d"}),
    "senoidal": ("pynama_tpu.cases.analytic", "CustomFuncProblem",
                 {"case": "senoidal"}),
    "flat-plate": ("pynama_tpu.cases.analytic", "CustomFuncProblem",
                   {"case": "flat-plate"}),
    "ibm-static": ("pynama_tpu.cases.immersed", "ImmersedBoundaryProblem", {}),
    "ibm-dynamic": ("pynama_tpu.cases.immersed",
                    "ImmersedBoundaryDynamicProblem", {}),
    # 3D hex channel (BASELINE benchmark config 5): uniform inflow
    "channel3d": ("pynama_tpu.cases.uniform", "UniformFlowProblem", {}),
}


def load_config(case: str, path=None):
    candidates = [
        path,
        case if case and case.endswith((".yaml", ".yml")) else None,
        os.path.join(os.path.dirname(__file__), "..", "configs", f"{case}.yaml"),
        os.path.join("configs", f"{case}.yaml"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            with open(c) as f:
                return yaml.safe_load(f)
    raise FileNotFoundError(f"no YAML config found for case '{case}'")


def apply_opts(config, opts):
    """Merge ``-opt key=value`` overrides into the loaded config dict.

    The analogue of the reference's open PETSc options DB — any flag on
    argv reaches KSP/TS via setFromOptions (run_case.py:9-10,
    ksp_solver.py:17, ts_solver.py:26) — for solver knobs not promoted
    to dedicated CLI flags. Dotted keys address nested sections
    (``-opt multigrid.pre=2``); values parse as YAML scalars
    (``-opt kle-rtol=1e-9``, ``-opt multigrid.smoother=jacobi``,
    ``-opt kle-refine=true``). A section currently holding a scalar
    (``multigrid: true``) is upgraded to a dict so its sub-keys become
    addressable.
    """
    for item in opts or []:
        if "=" not in item:
            raise SystemExit(f"-opt expects key=value, got {item!r}")
        key, val = item.split("=", 1)
        val = yaml.safe_load(val)
        if isinstance(val, str):
            try:  # YAML 1.1 reads '1e-7' (no dot) as a string
                val = float(val)
            except ValueError:
                pass
        d = config
        parts = key.split(".")
        for p in parts[:-1]:
            cur = d.get(p)
            if not isinstance(cur, dict):
                cur = {}
                d[p] = cur
            d = cur
        d[parts[-1]] = val
    return config


def make_problem(case, config, **overrides):
    import importlib

    import jax.numpy as jnp

    mod_name, cls_name, kw = CASE_CLASSES[case]
    cls = getattr(importlib.import_module(mod_name), cls_name)
    dtype = overrides.pop("dtype", None)
    kw = dict(kw)
    if dtype:
        kw["dtype"] = jnp.float32 if dtype == "float32" else jnp.float64
    kw.update({k: v for k, v in overrides.items() if v is not None})
    return cls(config, **kw)


def _apply_run_overrides(p, args):
    """CLI overrides of run-length/tolerance (demo + bench runs)."""
    if getattr(args, "max_steps", None) is not None:
        p.max_steps = args.max_steps
    if getattr(args, "kle_rtol", None) is not None:
        p.kle_rtol = args.kle_rtol
    if getattr(args, "max_dt", None) is not None:
        p.ts_max_dt = args.max_dt


def time_solving(args, config):
    """Production run. Parity: timeSolving (run_case.py:152-162)."""
    p = make_problem(args.case, config, ngl=args.ngl, nelem=args.nelem,
                     dtype=args.dtype,
                     gmsh_file=getattr(args, "gmsh", None)).setup()
    _apply_run_overrides(p, args)
    save_dir = config.get("save-dir", f"run-{args.case}")
    save_every = int(config.get("save-n-steps", 1))

    writer = None
    try:
        from pynama_tpu.io.xdmf import XdmfWriter

        writer = XdmfWriter(save_dir, p.dim)
        writer.save_mesh(p.mesh.coords)
    except Exception as e:  # h5py missing etc.
        logger.warning("XDMF output disabled: %s", e)

    t0 = time.perf_counter()

    def cb(step, t, dt, vort, vel):
        logger.info("Converged: Step %4d | Time %.4e | Increment Time: %.2e",
                    step, t, dt)
        if writer is not None and step % save_every == 0:
            writer.save_fields(
                step, t,
                velocity=np.asarray(vel).reshape(-1),
                vorticity=np.asarray(vort).reshape(-1),
            )
            writer.write_xmf(config.get("name", args.case))

    vort, t, n = p.run(
        callback=cb,
        checkpoint_path=os.path.join(save_dir, "checkpoint.npz"),
        checkpoint_every=max(save_every, 1),
        resume_from=args.resume,
    )
    elapsed = time.perf_counter() - t0
    logger.info("Total Time: %.3f s (%d steps to t=%.4f)", elapsed, n, t)

    metrics = {"steps": n, "final_time": t, "elapsed_s": elapsed}
    if hasattr(p, "cd_history") and p.cd_history:
        metrics["cd"] = [c[0] for c in p.cd_history]
        metrics["cl"] = [c[0] for c in p.cl_history]
        metrics["times"] = p.t_history
        from pynama_tpu.io.plots import drag_lift_chart, shedding_frequency

        drag_lift_chart(p.t_history, metrics["cd"], metrics["cl"],
                        os.path.join(save_dir, "drag-lift.png"))
        f, st = shedding_frequency(p.t_history, metrics["cl"],
                                   u_ref=getattr(p, "u_ref", 1.0))
        metrics["shedding_frequency"] = f
        metrics["strouhal"] = st
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, f"{args.case}-metrics.yaml"), "w") as f:
        yaml.safe_dump(metrics, f)
    return metrics


def time_solving_sharded(args, config):
    """Distributed production run over an N-device slab mesh (-sharded N).

    The TPU-native analogue of the reference's `mpirun -n N python
    src/run_case.py ...` (makefile:2-7): the mesh is slab-partitioned
    over a jax.sharding device mesh, KLE solves run inside shard_map
    (halo exchange + psum dots + distributed multigrid when the
    hierarchy divides), and the BS5(4) stage loop is host-staged.
    """
    import jax

    from pynama_tpu.parallel.sharded_problem import ShardedNSProblem

    n_dev = int(args.sharded)
    if len(jax.devices()) < n_dev:
        raise SystemExit(
            f"-sharded {n_dev}: only {len(jax.devices())} devices visible. "
            f"For virtual CPU devices set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_dev}"
        )
    p = make_problem(args.case, config, ngl=args.ngl, nelem=args.nelem,
                     dtype=args.dtype).setup()
    _apply_run_overrides(p, args)
    sp = ShardedNSProblem(p, n_dev)
    logger.info("sharded run: %d devices, %d nodes (%d vel dofs), "
                "distributed multigrid %s", n_dev, p.mesh.n_nodes,
                p.mesh.n_nodes * p.dim,
                "active" if sp._dmg is not None else "OFF (Jacobi-CG)")
    save_dir = config.get("save-dir", f"run-{args.case}")

    # rank-ownership debug field (createNumProcVec analogue,
    # base_problem.py:164-172): node -> owning device, for visual
    # partition checks in ParaView
    from pynama_tpu.io.vtk import write_point_cloud

    os.makedirs(save_dir, exist_ok=True)
    write_point_cloud(
        os.path.join(save_dir, "owner.vtk"), np.asarray(p.mesh.coords),
        fields={"owner": sp.slab.owner_field()},
    )

    t0 = time.perf_counter()
    step_times = []
    last = [t0]

    def cb(step, t, dt, w, vel):
        now = time.perf_counter()
        step_times.append(now - last[0])
        last[0] = now
        logger.info("Converged: Step %4d | Time %.4e | Increment Time: "
                    "%.2e | %.1f s", step, t, dt, step_times[-1])

    w, t, n = sp.run_staged(callback=cb)
    elapsed = time.perf_counter() - t0
    w_global = sp.unshard(w, p.dim_w)
    assert np.isfinite(w_global).all(), "non-finite vorticity"
    logger.info("Total Time: %.3f s (%d steps to t=%.4f)", elapsed, n, t)

    metrics = {
        "steps": n, "final_time": t, "elapsed_s": elapsed,
        "devices": n_dev, "n_dofs": p.mesh.n_nodes * p.dim,
        "platform": jax.devices()[0].platform,
        "distributed_multigrid": sp._dmg is not None,
        "s_per_step_steady": (float(np.median(step_times[1:]))
                              if len(step_times) > 1 else None),
        "vort_norm": float(np.linalg.norm(w_global)),
    }
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir,
                           f"{args.case}-sharded{n_dev}-metrics.yaml"),
              "w") as f:
        yaml.safe_dump(metrics, f)
    print(json.dumps(metrics))
    return metrics


def kle_field_dump(args, config):
    """Solve the KLE at the viscous-time sequence and write computed +
    exact fields for ParaView.

    Parity: `-test kle` -> generateParaviewer -> solveKLETests
    (/root/reference/src/run_case.py:132-136, custom_func.py:85-105):
    at each t = tau^2/(4 nu) the KLE is solved from the EXACT vorticity,
    the vorticity check-field is Curl(exact velocity), and both are
    saved alongside the exact counterparts.
    """
    import jax.numpy as jnp

    p = make_problem(args.case, config, ngl=args.ngl, nelem=args.nelem,
                     dtype=args.dtype).setup()
    save_dir = config.get("save-dir", f"run-{args.case}-kle")
    writer = None
    try:
        from pynama_tpu.io.xdmf import XdmfWriter

        writer = XdmfWriter(save_dir, p.dim)
        writer.save_mesh(p.mesh.coords)
    except Exception as e:  # h5py missing etc.
        logger.warning("XDMF output disabled: %s", e)

    viscous_times = [0.01, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                     0.9]  # custom_func.py:90
    errors = []
    for step, tau in enumerate(viscous_times):
        t = (tau**2) / (4.0 * p.nu)
        vel_e, vort_e = p.exact_fields(t)
        vel = p.solve_kle(
            t, jnp.asarray(np.asarray(vort_e).reshape(p._gshape(p.dim_w))),
            rtol=1e-13, maxiter=30000, restarts=2,
        )
        vort = p.operators.curl(
            jnp.asarray(np.asarray(vel_e).reshape(p._gshape(p.dim))))
        err = float(np.linalg.norm(
            np.asarray(vel).reshape(-1) - np.asarray(vel_e).reshape(-1)))
        errors.append(err)
        logger.info("Saving time: %.3f | Step: %d | ||u-u_e|| %.3e",
                    t, step, err)
        if writer is not None:
            writer.save_fields(
                step, t,
                velocity=np.asarray(vel).reshape(-1),
                vorticity=np.asarray(vort).reshape(-1),
                exact_velocity=np.asarray(vel_e).reshape(-1),
                exact_vorticity=np.asarray(vort_e).reshape(-1),
            )
            writer.write_xmf(config.get("name", args.case) + "-kle")
    print(json.dumps({"viscous_times": viscous_times, "errors": errors,
                      "save_dir": save_dir}))


def chart_kle(args, config):
    """p- AND h-refinement KLE convergence charts.

    Parity: generateChart (/root/reference/src/run_case.py:30-77), which
    plots the p-refinement error per viscous time alongside a Q2
    h-refinement curve, both against the per-axis node count N*.
    """
    ngls = list(range(3, int(args.max_ngl) + 1, 2))
    taus = [0.2, 0.5, 0.9]
    rows = []
    for ngl in ngls:
        p = make_problem(args.case, config, ngl=ngl, nelem=args.nelem,
                         dtype=args.dtype).setup()
        errs = p.kle_error(taus)
        nstar = max(p.mesh.npts)
        rows.append((ngl, nstar, errs))
        logger.info("p-ref ngl=%2d N*=%3d errors=%s", ngl, nstar,
                    ["%.3e" % e for e in errs])

    # h-refinement at fixed Q2 (ngl=3), doubling nelem until the per-axis
    # node count matches the largest p-refinement mesh (run_case.py:56-76)
    n_max = max(r[1] for r in rows)
    dim = p.dim
    h_rows = []
    ne = 2
    while 2 * ne + 1 <= n_max:
        p = make_problem(args.case, config, ngl=3, nelem=(ne,) * dim,
                         dtype=args.dtype).setup()
        errs = p.kle_error(taus)
        h_rows.append((ne, max(p.mesh.npts), errs))
        logger.info("h-ref Q2 nelem=%3d N*=%3d errors=%s", ne,
                    h_rows[-1][1], ["%.3e" % e for e in errs])
        ne *= 2
    from pynama_tpu.io.plots import loglog_error_chart

    series = [
        (f"p-ref tau={tau}", np.array([r[1] for r in rows]),
         np.array([r[2][i] for r in rows]))
        for i, tau in enumerate(taus)
    ] + [
        (f"h-ref Q2 tau={tau}", np.array([r[1] for r in h_rows]),
         np.array([r[2][i] for r in h_rows]))
        for i, tau in enumerate(taus)
        if h_rows
    ]
    out = loglog_error_chart(series, f"chart-kle-{args.case}.png",
                             xlabel="N* (nodes per axis)",
                             ylabel="||u - u_exact||")
    print(json.dumps({"ngl": [r[0] for r in rows],
                      "errors": [r[2] for r in rows],
                      "h_nelem": [r[0] for r in h_rows],
                      "h_errors": [r[2] for r in h_rows],
                      "chart": out}))


def chart_operators(args, config):
    """Operator-error convergence. Parity: generateChartOperators (:79-130).

    (The reference version crashes on an undefined variable at HEAD —
    SURVEY.md section 2 'latent bugs'; this one runs.)
    """
    ngls = list(range(3, int(args.max_ngl) + 1, 2))
    rows = []
    for ngl in ngls:
        p = make_problem(args.case, config, ngl=ngl, nelem=args.nelem,
                         dtype=args.dtype).setup()
        conv, diff, curl = p.operators_test(viscous_time=1.0)
        rows.append((ngl, conv, diff, curl))
        logger.info("ngl=%2d conv=%.3e diff=%.3e curl=%.3e",
                    ngl, conv, diff, curl)
    from pynama_tpu.io.plots import loglog_error_chart

    x = np.array([r[0] for r in rows])
    out = loglog_error_chart(
        [("convective", x, np.array([r[1] for r in rows])),
         ("diffusive", x, np.array([r[2] for r in rows])),
         ("curl", x, np.array([r[3] for r in rows]))],
        f"chart-operators-{args.case}.png", xlabel="ngl", ylabel="error",
    )
    print(json.dumps({"rows": rows, "chart": out}))


def chart_kle_transient(args, config):
    """Transient error tracking. Parity: convergedStepFunctionKLET
    (base_problem.py:184-204) via -test chartkle (run_case.py:138-149)."""
    import jax.numpy as jnp

    p = make_problem(args.case, config, ngl=args.ngl, nelem=args.nelem,
                     dtype=args.dtype).setup()
    hist = {"step": [], "time": [], "error2": [], "errorInf": []}

    def cb(step, t, dt, vort, vel):
        vel_e, _ = p.exact_fields(t)
        e = jnp.asarray(np.asarray(vel).reshape(-1)) - vel_e.reshape(-1)
        hist["step"].append(step)
        hist["time"].append(t)
        hist["error2"].append(float(jnp.linalg.norm(e)))
        hist["errorInf"].append(float(jnp.max(jnp.abs(e))))
        logger.info("Step %4d | t=%.4e | e2=%.3e einf=%.3e", step, t,
                    hist["error2"][-1], hist["errorInf"][-1])

    p.run(callback=cb)
    with open(f"chartkle-{args.case}.yaml", "w") as f:
        yaml.safe_dump(hist, f)
    print(json.dumps({k: v[-1] if v else None for k, v in hist.items()}))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-case", required=True, choices=sorted(CASE_CLASSES))
    ap.add_argument("-config", default=None, help="explicit YAML path")
    ap.add_argument("-test", default=None,
                    choices=["kle", "chart", "operators", "chartkle"])
    ap.add_argument("-log", default="INFO")
    ap.add_argument("-ngl", type=int, default=None)
    ap.add_argument("-nelem", type=int, nargs="+", default=None)
    ap.add_argument("-gmsh", default=None, metavar="FILE",
                    help="run the case on an unstructured Gmsh mesh "
                         "(overrides the config's domain; parity: "
                         "gmsh-file configs, dmplex.py:22-23)")
    ap.add_argument("-max-ngl", type=int, default=9)
    ap.add_argument("-resume", default=None, help="checkpoint to resume from")
    ap.add_argument("-dtype", default=None, choices=["float32", "float64"])
    ap.add_argument("-max-steps", type=int, default=None, dest="max_steps",
                    help="override the config's time-solver max-steps")
    ap.add_argument("-kle-rtol", type=float, default=None, dest="kle_rtol",
                    help="override the config's KLE solve tolerance "
                         "(e.g. 1e-5 for float32 demo runs)")
    ap.add_argument("-max-dt", type=float, default=None, dest="max_dt",
                    help="cap the adaptive time step (config 'max-dt')")
    ap.add_argument("-sharded", type=int, default=None, metavar="N",
                    help="distribute the production run over an N-device "
                         "slab mesh (shard_map + halo exchange + psum; "
                         "the analogue of the reference's mpirun -n N, "
                         "makefile:2-7). Needs N (virtual or real) "
                         "devices and N | nelem on every MG level's "
                         "last axis for distributed multigrid")
    ap.add_argument("-opt", action="append", default=[], metavar="KEY=VALUE",
                    help="override any config entry (repeatable; dotted "
                         "keys reach nested sections, values parse as "
                         "YAML): -opt multigrid.smoother=jacobi "
                         "-opt kle-solver=gmres. The analogue of the "
                         "reference's open PETSc options DB")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=getattr(logging, args.log.upper(), logging.INFO),
        format="%(levelname)s %(name)s: %(message)s",
    )
    import jax

    # the container's sitecustomize registers the TPU plugin before the env
    # is consulted; honor JAX_PLATFORMS explicitly so `JAX_PLATFORMS=cpu
    # python -m pynama_tpu.run_case ...` really runs on CPU
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PYNAMA_JAX_CACHE",
                                     "/tmp/pynama-jax-cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    config = apply_opts(load_config(args.case, args.config), args.opt)
    if args.nelem is not None:
        args.nelem = tuple(args.nelem)

    # -test modes need an analytic exact solution (kle_error/operators_test
    # exist on CustomFuncProblem only); fail with a clear message instead of
    # an AttributeError mid-setup
    analytic = {"taylor-green", "taylor-green2d-3d", "senoidal", "flat-plate"}
    if args.test and args.case not in analytic:
        ap.error(
            f"-test {args.test} requires an analytic-solution case "
            f"({', '.join(sorted(analytic))}); got '{args.case}'"
        )

    if args.test == "kle":
        kle_field_dump(args, config)
    elif args.test == "chart":
        chart_kle(args, config)
    elif args.test == "operators":
        chart_operators(args, config)
    elif args.test == "chartkle":
        chart_kle_transient(args, config)
    elif args.sharded:
        time_solving_sharded(args, config)
    else:
        time_solving(args, config)


if __name__ == "__main__":
    main()
