"""Run the IBM physics regressions (tests/test_ibm_physics.py) on the TPU.

The pytest harness pins tests to CPU (tests/conftest.py), where each full
transient costs 1-2 h of the container's single core; on the chip the same
protocol finishes in minutes. This driver runs the identical test bodies —
same meshes, same Richardson two-dt drag elimination, same FFT Strouhal
extraction, same assertion windows — on the axon TPU with the production
mixed-precision solver path (PYNAMA_IBM_REFINE=1: f64 state + true f64
defect residuals, f32 multigrid V-cycles; f64 V-cycles are ~200x f32
on-chip). Measured values land in run-artifacts/ibm_regression.json via
the tests' own _record().

Usage (sequential; the axon tunnel serves ONE client at a time):
    python scripts/run_ibm_regression_tpu.py [re40] [big] [st]
"""

import os
import sys
import tempfile
import time
from pathlib import Path

os.environ["PYNAMA_IBM_REFINE"] = "1"

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PYNAMA_JAX_CACHE",
                                 "/tmp/pynama-jax-cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tests import test_ibm_physics as T  # noqa: E402


def main():
    which = set(sys.argv[1:]) or {"re40", "big", "st"}
    plat = jax.devices()[0].platform
    print(f"platform: {plat}", flush=True)
    tmp = Path(tempfile.mkdtemp(prefix="ibm-reg-"))
    for tag, fn in [
        ("re40", lambda: T.test_static_cylinder_re40_drag(tmp)),
        ("big", lambda: T.test_static_cylinder_re40_drag_big_domain(tmp)),
        ("st", T.test_cylinder_re100_strouhal),
    ]:
        if tag not in which:
            continue
        # the axon tunnel flakes transiently (remote_compile body closed,
        # worker UNAVAILABLE after an outage) — retry in-process with no
        # inner kill (killing a blocked client re-stales the TPU grant
        # and extends the wedge; see ROUND4_NOTES.md operational notes)
        for attempt in range(4):
            t0 = time.perf_counter()
            print(f"[{tag}] start (attempt {attempt + 1})", flush=True)
            try:
                fn()
            except AssertionError:
                raise  # a real physics-gate failure, not infrastructure
            except Exception as e:
                print(f"[{tag}] infrastructure error after "
                      f"{time.perf_counter() - t0:.0f} s: "
                      f"{type(e).__name__}: {e}", flush=True)
                if attempt == 3:
                    raise
                time.sleep(120)
                continue
            print(f"[{tag}] PASS in {time.perf_counter() - t0:.0f} s",
                  flush=True)
            break
    print("all selected regressions passed", flush=True)


if __name__ == "__main__":
    main()
