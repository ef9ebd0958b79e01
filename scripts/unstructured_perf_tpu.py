"""On-chip wall-clock for the unstructured (gather/scatter) KLE path.

The structured cavity benchmark exercises the conv fast path; gmsh-style
meshes run the generic gather-GEMM-scatter operators plus the two-level
additive-Schwarz preconditioner (solvers/schwarz.py). This records the
first wall-clock numbers for that path on the real TPU: ms per KLE solve
and ms per CG iteration, Schwarz vs Jacobi, at two mesh sizes.

Parity context: the reference's direct LU solves any mesh equally
(/root/reference/src/solver/ksp_solver.py:12-19); this measures what the
TPU pays on meshes that can use neither the conv stencils nor geometric
multigrid. Appends results to run-artifacts/unstructured_perf.json.

Usage:  python scripts/unstructured_perf_tpu.py [--sizes 32,48] [--ngl 3]
        [--dtype float32] [--rtol 1e-5] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PYNAMA_JAX_CACHE", "/tmp/pynama-jax-cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32,48")
    ap.add_argument("--ngl", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["PYNAMA_JAX_CACHE"])
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from pynama_tpu.elements.spectral import SpectralElement
    from pynama_tpu.kle import build_kle_system
    from pynama_tpu.mesh.unstructured import UnstructuredQuadMesh
    from pynama_tpu.solvers.schwarz import build_element_schwarz
    from tests.test_kle_solve import taylor_green_2d
    from tests.test_unstructured import box_corner_mesh

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    platform = jax.devices()[0].platform
    record = {"platform": platform, "dtype": args.dtype,
              "ngl": args.ngl, "rtol": args.rtol, "results": {}}
    for n in (int(s) for s in args.sizes.split(",")):
        pts, quads = box_corner_mesh(n, n, distort=0.15 / n, seed=1)
        m = UnstructuredQuadMesh(pts, quads, ngl=args.ngl)
        n_dofs = m.n_nodes * 2
        sys_ = build_kle_system(m, SpectralElement(args.ngl, 2), dtype=dtype)
        mask = np.ones(n_dofs)
        mask[m.node_dofs(m.boundary_nodes, 2)] = 0.0
        vel_e, vort_e = taylor_green_2d(m.coords, nu=0.02, t=0.0)
        t0 = time.perf_counter()
        minv = build_element_schwarz(m, sys_.K.A, mask, dtype=dtype)
        setup_s = time.perf_counter() - t0
        vort_j = jnp.asarray(vort_e, dtype=dtype)
        bc_j = jnp.asarray(vel_e.reshape(-1), dtype=dtype)
        mask_j = jnp.asarray(mask, dtype=dtype)

        entry = {"n_dofs": n_dofs, "schwarz_setup_s": round(setup_s, 2)}
        for tag, pc in (("schwarz", minv), ("jacobi", None)):
            if tag == "schwarz" and minv is None:
                entry[tag] = {"note": "blocks over budget, skipped"}
                continue
            kw = dict(rtol=args.rtol, maxiter=20000, m_inv=pc, restarts=1)
            res = sys_.solve(vort_j, bc_j, mask_j, **kw)  # compile
            jax.block_until_ready(res.x)
            iters = int(res.iters)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                res = sys_.solve(vort_j, bc_j, mask_j, **kw)
                jax.block_until_ready(res.x)
            ms = (time.perf_counter() - t0) / args.reps * 1e3
            err = float(np.linalg.norm(np.asarray(res.x, dtype=np.float64)
                                       - vel_e.reshape(-1)))
            entry[tag] = {"iters": iters, "ms_per_solve": round(ms, 2),
                          "ms_per_iter": round(ms / max(iters, 1), 3),
                          "err_vs_exact": float(f"{err:.3e}")}
            print(f"n={n} {tag:8s} {iters:5d} iters  {ms:9.1f} ms/solve  "
                  f"({ms / max(iters, 1):.3f} ms/iter)  err {err:.3e}",
                  file=sys.stderr)
        record["results"][f"n{n}"] = entry

    path = os.path.join(os.path.dirname(__file__), "..",
                        "run-artifacts", "unstructured_perf.json")
    if os.path.exists(path):  # merge: keep sizes from earlier invocations
        with open(path) as f:
            prev = json.load(f)
        if all(prev.get(k) == record[k]
               for k in ("platform", "dtype", "ngl", "rtol")):
            record["results"] = {**prev["results"], **record["results"]}
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
