"""Adaptive explicit Runge-Kutta time integration (Bogacki-Shampine 5(4)).

TPU-native replacement for PETSc TS type 'rk' with RKType '5bs' and
MATCHSTEP final-time handling (/root/reference/src/solver/ts_solver.py:3-26).
The 8-stage Bogacki-Shampine RK5(4) pair (RKSUITE / PETSc TSRK5BS) is FSAL:
the 8th stage is the new solution's derivative, reused as stage 1 of the
next accepted step.

Everything jit-compiles: a single accepted step (including rejected
attempts) runs inside lax.while_loop, so a full Navier-Stokes step —
KLE CG solves, operator chain, stage loop, dt controller — is one XLA
program. The controller mirrors PETSc TSAdaptBasic: weighted local
truncation error wlte (atol/rtol, 2-norm), accept iff wlte <= 1,
dt *= clip(0.9 * wlte^(-1/5), 0.1, 10).

The RHS signature is ``rhs(t, y, aux) -> (f, aux)``: ``aux`` threads
solver state (e.g. the KLE velocity for warm-started CG) through stages
and steps.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Bogacki & Shampine RK5(4)8 pair (PETSc '5bs'); FSAL: b == A[7].
BS5_A = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [1 / 6, 0, 0, 0, 0, 0, 0, 0],
        [2 / 27, 4 / 27, 0, 0, 0, 0, 0, 0],
        [183 / 1372, -162 / 343, 1053 / 1372, 0, 0, 0, 0, 0],
        [68 / 297, -4 / 11, 42 / 143, 1960 / 3861, 0, 0, 0, 0],
        [597 / 22528, 81 / 352, 63099 / 585728, 58653 / 366080, 4617 / 20480, 0, 0, 0],
        [174197 / 959244, -30942 / 79937, 8152137 / 19744439, 666106 / 1039181,
         -29421 / 29068, 482048 / 414219, 0, 0],
        [587 / 8064, 0, 4440339 / 15491840, 24353 / 124800, 387 / 44800,
         2152 / 5985, 7267 / 94080, 0],
    ]
)
BS5_B = BS5_A[7].copy()
BS5_BEMBED = np.array(
    [2479 / 34992, 0, 123 / 416, 612941 / 3411720, 43 / 1440, 2272 / 6561,
     79937 / 1113912, 3293 / 556956]
)
BS5_C = BS5_A.sum(axis=1)
BS5_STAGES = 8
BS5_ORDER = 5


class StepResult(NamedTuple):
    y: jnp.ndarray
    t: jnp.ndarray
    dt_next: jnp.ndarray
    aux: object
    f_new: jnp.ndarray      # FSAL derivative at (t, y)
    wlte: jnp.ndarray
    attempts: jnp.ndarray


# ----------------------------------------------------------------------
# cross-step per-stage-slot warm-start extrapolation
# ----------------------------------------------------------------------
def make_ws_state(aux, t0):
    """Initial slot-history aux for ws_extrapolate steppers.

    ``aux`` must already have its steady-state pytree structure (call the
    RHS once first — dual-mask problems upgrade a bare velocity into a
    (vel_fs, vel) pair on the first solve). Returns
    (H1, H2, t_prev, t_prevprev): H1/H2 stack one aux per derivative
    stage slot (BS5_STAGES-1 slots); equal step times disable the
    extrapolation until two real steps have been accepted.
    """
    H = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (BS5_STAGES - 1,) + a.shape),
        aux)
    t0 = jnp.asarray(t0)
    return (H, H, t0, t0)


def ws_aux_vel(aux_ws):
    """Latest final-stage aux from a ws_extrapolate history (slot -1)."""
    H1 = aux_ws[0]
    return jax.tree.map(lambda h: h[BS5_STAGES - 2], H1)


def _ws_theta(t, t_prev, t_prevprev):
    """Extrapolation weight (t - t_prev)/(t_prev - t_prevprev), 0 cold.

    Linear-in-time extrapolation of each stage slot's solution: exact
    spacing handling under the adaptive controller (dt varies between
    steps), degenerating to the plain previous-slot warm start while
    fewer than two steps of history exist.
    """
    d = t_prev - t_prevprev
    safe = jnp.where(d == 0, 1.0, d)
    return jnp.where(d == 0, 0.0, (t - t_prev) / safe)


def _ws_guess(H1, H2, slot, theta):
    """tree_map(a + theta*(a - b)) at a (possibly traced) stage slot."""
    def pick(h):
        return jax.lax.dynamic_index_in_dim(h, slot, 0, keepdims=False)

    a = jax.tree.map(pick, H1)
    b = jax.tree.map(pick, H2)
    return jax.tree.map(lambda x, y: x + theta * (x - y).astype(x.dtype),
                        a, b)


def _ws_store(H1, slot, aux_out):
    return jax.tree.map(
        lambda h, v: jax.lax.dynamic_update_index_in_dim(h, v, slot, 0),
        H1, aux_out)


def _wlte_norm(err, y_old, y_new, atol, rtol):
    w = atol + rtol * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
    e = err / w
    return jnp.sqrt(jnp.mean(e * e))


def make_bs5_stepper(
    rhs: Callable,
    atol: float = 1e-4,
    rtol: float = 1e-4,
    safety: float = 0.9,
    min_factor: float = 0.1,
    max_factor: float = 10.0,
    max_attempts: int = 12,
    wlte_norm: Callable = _wlte_norm,
    max_dt: Optional[float] = None,
    ws_extrapolate: bool = False,
):
    """Build ``step(y, t, dt, aux, f1, t_end) -> StepResult``.

    One *accepted* adaptive step; rejected attempts loop inside. ``f1`` is
    the FSAL derivative at (t, y) (pass rhs(t, y, aux)[0] initially). dt is
    clamped so t never overshoots t_end (PETSc MATCHSTEP behavior,
    ts_solver.py:19); max_dt additionally caps the controller's proposals
    (PETSc TSAdapt dt limits — e.g. a CFL-like bound for IBM runs where
    the body coupling is applied once per step).

    ws_extrapolate: aux becomes the make_ws_state slot history and each
    stage's warm start is the linear-in-time extrapolation of ITS OWN
    slot's last two accepted solutions (2*u_prev - u_prevprev at constant
    dt) instead of the within-step chain — typically halves warm CG
    iterations on smooth transients (ROUND4 backlog #3).
    """
    def attempt(y, t, dt, aux, f1):
        # tableau entries enter as python floats: stays dtype-clean under
        # x64 (float64 on CPU parity runs, float32 on TPU speed runs)
        ks = [f1]
        if ws_extrapolate:
            H1, H2, t_prev, t_pp = aux
            theta = _ws_theta(t, t_prev, t_pp)
        else:
            aux_c = aux
        for i in range(1, BS5_STAGES):
            yi = y
            for j in range(i):
                a = float(BS5_A[i, j])
                if a != 0.0:
                    yi = yi + (dt * a) * ks[j]
            if ws_extrapolate:
                guess = jax.tree.map(
                    lambda h1, h2: (h1[i - 1]
                                    + theta * (h1[i - 1] - h2[i - 1])
                                    .astype(h1.dtype)), H1, H2)
                fi, aux_out = rhs(t + float(BS5_C[i]) * dt, yi, guess)
                H1 = jax.tree.map(lambda h, v, i=i: h.at[i - 1].set(v),
                                  H1, aux_out)
            else:
                fi, aux_c = rhs(t + float(BS5_C[i]) * dt, yi, aux_c)
            ks.append(fi)
        if ws_extrapolate:
            aux_c = (H1, aux[0], t, t_prev)
        y5 = y
        for j in range(BS5_STAGES):
            b = float(BS5_B[j])
            if b != 0.0:
                y5 = y5 + (dt * b) * ks[j]
        err = jnp.zeros_like(y)
        for j in range(BS5_STAGES):
            d = float(BS5_B[j] - BS5_BEMBED[j])
            if d != 0.0:
                err = err + (dt * d) * ks[j]
        wlte = wlte_norm(err, y, y5, atol, rtol)
        return y5, ks[-1], wlte, aux_c

    def step(y, t, dt, aux, f1, t_end):
        if max_dt is not None:
            dt = jnp.minimum(dt, max_dt)
        dt = jnp.minimum(dt, t_end - t)

        def cond(s):
            _, _, _, _, _, accepted, k, _ = s
            return (~accepted) & (k < max_attempts)

        def body(s):
            y0, t0, dt0, aux0, f10, _, k, _ = s
            y5, f_new, wlte, aux1 = attempt(y0, t0, dt0, aux0, f10)
            accepted = wlte <= 1.0
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(wlte, 1e-30), -1.0 / BS5_ORDER),
                min_factor,
                max_factor,
            )
            dt_next = dt0 * jnp.where(accepted, factor, jnp.minimum(factor, 1.0))
            # on accept: y,t advance; dt_next proposed for next step
            y_out = jnp.where(accepted, y5, y0)
            t_out = jnp.where(accepted, t0 + dt0, t0)
            f_out = jax.tree.map(
                lambda a, b: jnp.where(accepted, a, b), f_new, f10
            )
            aux_out = jax.tree.map(
                lambda a, b: jnp.where(accepted, a, b), aux1, aux0
            )
            dt_attempt = jnp.where(accepted, dt_next, dt_next)
            return (y_out, t_out, dt_attempt, aux_out, f_out, accepted, k + 1, wlte)

        init = (y, t, dt, aux, f1, jnp.asarray(False), jnp.asarray(0, jnp.int32),
                jnp.asarray(jnp.inf, y.dtype))
        y_o, t_o, dt_o, aux_o, f_o, _, k, wlte = jax.lax.while_loop(cond, body, init)
        return StepResult(y=y_o, t=t_o, dt_next=dt_o, aux=aux_o, f_new=f_o,
                          wlte=wlte, attempts=k)

    return step


def make_bs5_scan_attempt(
    rhs: Callable,
    atol: float = 1e-4,
    rtol: float = 1e-4,
    wlte_norm: Callable = _wlte_norm,
    ws_extrapolate: bool = False,
):
    """ONE BS5(4) attempt as a single traceable program (lax.scan).

    ``attempt(y, t, dt, aux, f1) -> (y5, f_new, wlte, aux_new)``: the 7
    derivative stages run as a lax.scan whose body contains ONE rhs eval
    — the compiled program is the size of a single RHS program (vs 7x
    for an unrolled chain), and the host dt controller needs exactly one
    device dispatch per attempt (vs 8 for the staged stepper — the
    per-dispatch argument-processing overhead on sharded arrays was the
    round-3 distributed step-level gap, parallel/sharded_problem.py).
    Numerics are identical to make_bs5_host_stepper's stage_fn/_combine
    (same tensordot stage combinations).

    ws_extrapolate: aux is the make_ws_state slot history; each stage
    warm-starts from the linear-in-time extrapolation of its OWN slot
    across the last two accepted steps (see make_bs5_stepper).
    """
    A = jnp.asarray(BS5_A)
    C = jnp.asarray(BS5_C)
    B = jnp.asarray(BS5_B)
    D = jnp.asarray(BS5_B - BS5_BEMBED)

    def attempt(y, t, dt, aux, f1):
        ks0 = jnp.zeros((BS5_STAGES,) + y.shape, dtype=y.dtype)
        ks0 = ks0.at[0].set(f1)
        if ws_extrapolate:
            H1_in, H2, t_prev, t_pp = aux
            theta = _ws_theta(t, t_prev, t_pp)

            def stage(carry, i):
                ks, H1 = carry
                a_row = A[i].astype(y.dtype)
                yi = y + dt * jnp.tensordot(a_row, ks, axes=1)
                guess = _ws_guess(H1, H2, i - 1, theta)
                fi, aux_out = rhs(t + C[i].astype(y.dtype) * dt, yi, guess)
                ks = jax.lax.dynamic_update_index_in_dim(ks, fi, i, 0)
                return (ks, _ws_store(H1, i - 1, aux_out)), None

            (ks, H1), _ = jax.lax.scan(
                stage, (ks0, H1_in), jnp.arange(1, BS5_STAGES))
            aux_n = (H1, H1_in, t, t_prev)
        else:
            def stage(carry, i):
                ks, aux_c = carry
                a_row = A[i].astype(y.dtype)
                yi = y + dt * jnp.tensordot(a_row, ks, axes=1)
                fi, aux_c = rhs(t + C[i].astype(y.dtype) * dt, yi, aux_c)
                ks = jax.lax.dynamic_update_index_in_dim(ks, fi, i, 0)
                return (ks, aux_c), None

            (ks, aux_n), _ = jax.lax.scan(
                stage, (ks0, aux), jnp.arange(1, BS5_STAGES))
        y5 = y + dt * jnp.tensordot(B.astype(y.dtype), ks, axes=1)
        err = dt * jnp.tensordot(D.astype(y.dtype), ks, axes=1)
        wlte = wlte_norm(err, y, y5, atol, rtol)
        return y5, ks[BS5_STAGES - 1], wlte, aux_n

    return attempt


def make_chunk_controller(
    attempt_fn: Callable,
    k: int,
    safety: float = 0.9,
    min_factor: float = 0.1,
    max_factor: float = 10.0,
    max_dt: Optional[float] = None,
):
    """k adaptive BS5 attempts (accept/reject + dt update) in ONE program.

    ``chunk(y, t, dt, aux, f1, t_end) -> (y, t, dt, aux, f1, n_acc,
    wlte_last)``: the same controller logic as make_attempt_host_stepper,
    but the attempt loop is a lax.scan inside the traced program, so a
    host round-trip costs k attempts instead of one. This is the fix for
    the distributed path's remaining step-level gap — per-attempt sharded
    argument processing + the wlte readback sync (ROUND4 backlog #4).
    Attempts past t_end are no-ops (dt clamps to 0, nothing is counted),
    so the tail chunk of a run wastes at most k-1 attempt programs.
    """
    def chunk(y, t, dt, aux, f1, t_end):
        def body(carry, _):
            y, t, dt, aux, f1, n_acc = carry
            live = t < t_end
            dt_att = jnp.minimum(dt, t_end - t)
            if max_dt is not None:
                dt_att = jnp.minimum(dt_att, max_dt)
            dt_att = jnp.maximum(dt_att, 0.0)
            y5, f_new, wlte, aux_n = attempt_fn(y, t, dt_att, aux, f1)
            accepted = (wlte <= 1.0) & live
            factor = jnp.clip(
                safety * jnp.power(jnp.maximum(wlte, 1e-30),
                                   -1.0 / BS5_ORDER),
                min_factor, max_factor)
            dt_next = jnp.where(
                live,
                dt_att * jnp.where(accepted, factor,
                                   jnp.minimum(factor, 1.0)),
                dt)
            pick = lambda a, b: jax.tree.map(
                lambda u, v: jnp.where(accepted, u, v), a, b)
            y = jnp.where(accepted, y5, y)
            t = jnp.where(accepted, t + dt_att, t)
            f1 = pick(f_new, f1)
            aux = pick(aux_n, aux)
            n_acc = n_acc + accepted.astype(jnp.int32)
            return (y, t, dt_next, aux, f1, n_acc), wlte

        init = (y, t, dt, aux, f1, jnp.asarray(0, jnp.int32))
        (y, t, dt, aux, f1, n_acc), wltes = jax.lax.scan(
            body, init, None, length=k)
        return y, t, dt, aux, f1, n_acc, wltes[-1]

    return chunk


def make_attempt_host_stepper(
    attempt_fn: Callable,
    safety: float = 0.9,
    min_factor: float = 0.1,
    max_factor: float = 10.0,
    max_attempts: int = 12,
    max_dt: Optional[float] = None,
):
    """Host dt controller around a compiled single-dispatch attempt.

    ``attempt_fn(y, t, dt, aux, f1) -> (y5, f_new, wlte, aux)`` (already
    jitted — make_bs5_scan_attempt under jax.jit or shard_map). Same
    accept/reject + dt logic as make_bs5_host_stepper, one device
    round-trip per attempt.
    """
    def step(y, t, dt, aux, f1, t_end):
        dt = float(min(float(dt), float(t_end) - float(t)))
        if max_dt is not None:
            dt = min(dt, float(max_dt))
        for _ in range(max_attempts):
            y5, f_new, wlte, aux_n = attempt_fn(
                y, jnp.asarray(t, y.dtype), jnp.asarray(dt, y.dtype),
                aux, f1)
            w = float(wlte)
            factor = float(np.clip(
                safety * max(w, 1e-30) ** (-1.0 / BS5_ORDER),
                min_factor, max_factor))
            if w <= 1.0:
                return StepResult(
                    y=y5, t=jnp.asarray(float(t) + dt, y.dtype),
                    dt_next=jnp.asarray(dt * factor, y.dtype), aux=aux_n,
                    f_new=f_new, wlte=wlte,
                    attempts=jnp.asarray(1, jnp.int32),
                )
            dt = dt * min(factor, 1.0)
        raise RuntimeError("BS5 step rejected max_attempts times")

    return step


def make_bs5_host_stepper(
    rhs: Callable,
    atol: float = 1e-4,
    rtol: float = 1e-4,
    safety: float = 0.9,
    min_factor: float = 0.1,
    max_factor: float = 10.0,
    max_attempts: int = 12,
    wlte_norm: Callable = _wlte_norm,
    max_dt: Optional[float] = None,
):
    """Host-orchestrated BS5(4) step: one jitted program per stage.

    For large problems the fully-inlined step (8 stages x CG while_loops x
    multigrid V-cycles) produces XLA programs big enough to OOM the
    compiler (observed: 57 MB MLIR killed at 1.2M dofs). Here the stage
    loop and dt controller run in Python, dispatching a single compiled
    stage kernel (stage combine + RHS) 7x per attempt — identical
    numerics, ~8x smaller program, negligible dispatch overhead at these
    problem sizes.
    """
    A = jnp.asarray(BS5_A)

    def _combine(w, ks):
        # ks is a TUPLE of per-stage arrays: every eager big-array op in
        # the host loop is a separate dispatch (and on sharded arrays a
        # resharding pass) over the axon tunnel — keeping the stage
        # derivatives as a pytree makes each stage exactly ONE jitted
        # dispatch with the stack/combine fused inside the program
        return jnp.tensordot(w, jnp.stack(ks), axes=1)

    @jax.jit
    def stage_fn(a_row, c, ks, y, t, dt, aux):
        yi = y + dt * _combine(a_row.astype(y.dtype), ks)
        f, aux = rhs(t + c * dt, yi, aux)
        return f, aux

    @jax.jit
    def finish_fn(ks, y, t, dt):
        y5 = y + dt * _combine(jnp.asarray(BS5_B, dtype=y.dtype), ks)
        err = dt * _combine(jnp.asarray(BS5_B - BS5_BEMBED, dtype=y.dtype), ks)
        wlte = wlte_norm(err, y, y5, atol, rtol)
        return y5, wlte

    def step(y, t, dt, aux, f1, t_end):
        dt = float(min(float(dt), float(t_end) - float(t)))
        if max_dt is not None:
            dt = min(dt, float(max_dt))
        zero = None
        for _ in range(max_attempts):
            if zero is None:
                zero = jnp.zeros_like(f1)
            ks = [f1] + [zero] * (BS5_STAGES - 1)
            aux_c = aux
            for i in range(1, BS5_STAGES):
                fi, aux_c = stage_fn(
                    A[i], float(BS5_C[i]), tuple(ks), y,
                    jnp.asarray(t, y.dtype), jnp.asarray(dt, y.dtype), aux_c,
                )
                ks[i] = fi
            y5, wlte = finish_fn(tuple(ks), y, jnp.asarray(t, y.dtype),
                                 jnp.asarray(dt, y.dtype))
            w = float(wlte)
            factor = float(np.clip(safety * max(w, 1e-30) ** (-1.0 / BS5_ORDER),
                                   min_factor, max_factor))
            if w <= 1.0:
                return StepResult(
                    y=y5, t=jnp.asarray(float(t) + dt, y.dtype),
                    dt_next=jnp.asarray(dt * factor, y.dtype), aux=aux_c,
                    f_new=ks[BS5_STAGES - 1], wlte=wlte,
                    attempts=jnp.asarray(1, jnp.int32),
                )
            dt = dt * min(factor, 1.0)
        raise RuntimeError("BS5 step rejected max_attempts times")

    return step


def integrate(
    rhs: Callable,
    y0,
    t0: float,
    t_end: float,
    dt0: float,
    aux,
    max_steps: int = 10**6,
    atol: float = 1e-4,
    rtol: float = 1e-4,
    callback=None,
):
    """Host-driven adaptive integration loop (one jitted step per iteration).

    ``callback(step, t, dt, y, aux)`` runs on host after each accepted step
    — the analogue of the reference's convergedStepFunction
    (base_problem.py:174-182).
    """
    step = jax.jit(make_bs5_stepper(rhs, atol=atol, rtol=rtol))
    y = y0
    t = jnp.asarray(t0, dtype=y0.dtype)
    dt = jnp.asarray(dt0, dtype=y0.dtype)
    f1, aux = rhs(t, y, aux)
    n = 0
    while float(t) < t_end - 1e-14 and n < max_steps:
        res = step(y, t, dt, aux, f1, t_end)
        y, t, dt, aux, f1 = res.y, res.t, res.dt_next, res.aux, res.f_new
        n += 1
        if callback is not None:
            callback(n, float(t), float(res.dt_next), y, aux)
    return y, float(t), n
