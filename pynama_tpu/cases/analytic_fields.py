"""Analytic verification fields, vectorized over coordinates (jnp).

Parity: /root/reference/src/cases/custom_func.py:173-337 (static methods
taylorGreen*/senoidal*/flatplate*). All functions take coords (N, dim),
kinematic viscosity nu, and time t, and return jnp arrays:
velocity (N, dim), vorticity (N, dim_w), convective/diffusive (N, dim_w).
"""

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


# ----------------------------------------------------------------------
# Taylor-Green 2D (Lx = Ly = 1, Uref = 1)
# ----------------------------------------------------------------------
def taylor_green_vel_2d(coords, nu, t):
    x = TWO_PI * coords[:, 0]
    y = TWO_PI * coords[:, 1]
    expo = jnp.exp(-8.0 * jnp.pi**2 * nu * t)
    return jnp.stack(
        [jnp.cos(x) * jnp.sin(y) * expo, -jnp.sin(x) * jnp.cos(y) * expo], axis=1
    )


def taylor_green_vort_2d(coords, nu, t):
    x = TWO_PI * coords[:, 0]
    y = TWO_PI * coords[:, 1]
    expo = jnp.exp(-8.0 * jnp.pi**2 * nu * t)
    return (-4.0 * jnp.pi * jnp.cos(x) * jnp.cos(y) * expo)[:, None]


# ----------------------------------------------------------------------
# Taylor-Green 3D (Lx = Ly = Lz = 1)
# ----------------------------------------------------------------------
def taylor_green_vel_3d(coords, nu, t):
    x, y, z = (TWO_PI * coords[:, i] for i in range(3))
    expo = jnp.exp(-12.0 * jnp.pi**2 * nu * t)
    return jnp.stack(
        [
            jnp.cos(x) * jnp.sin(y) * jnp.sin(z) * expo,
            jnp.sin(x) * jnp.cos(y) * jnp.sin(z) * expo,
            -2.0 * jnp.sin(x) * jnp.sin(y) * jnp.cos(z) * expo,
        ],
        axis=1,
    )


def taylor_green_vort_3d(coords, nu, t):
    x, y, z = (TWO_PI * coords[:, i] for i in range(3))
    expo = jnp.exp(-12.0 * jnp.pi**2 * nu * t)
    return jnp.stack(
        [
            -2.0 * jnp.pi * 3.0 * jnp.sin(x) * jnp.cos(y) * jnp.cos(z) * expo,
            2.0 * jnp.pi * 3.0 * jnp.cos(x) * jnp.sin(y) * jnp.cos(z) * expo,
            jnp.zeros_like(x),
        ],
        axis=1,
    )


def taylor_green_conv_3d(coords, nu, t):
    x, y, z = (TWO_PI * coords[:, i] for i in range(3))
    expo = jnp.exp(-12.0 * jnp.pi**2 * nu * t)
    f = (TWO_PI * expo) ** 2
    return jnp.stack(
        [
            -2.0 * 3.0 * f * jnp.sin(y) * jnp.cos(y) * jnp.sin(z) * jnp.cos(z),
            2.0 * 3.0 * f * jnp.sin(x) * jnp.cos(x) * jnp.sin(z) * jnp.cos(z),
            jnp.zeros_like(x),
        ],
        axis=1,
    )


def taylor_green_diff_3d(coords, nu, t):
    x, y, z = (TWO_PI * coords[:, i] for i in range(3))
    expo = nu * jnp.exp(-12.0 * jnp.pi**2 * nu * t)
    f = (TWO_PI) ** 3 * expo
    return jnp.stack(
        [
            f * jnp.sin(x) * jnp.cos(y) * jnp.cos(z) * (2.0 * 3.0 + 3.0),
            -f * jnp.cos(x) * jnp.sin(y) * jnp.cos(z) * (2.0 * 3.0 + 3.0),
            jnp.zeros_like(x),
        ],
        axis=1,
    )


# ----------------------------------------------------------------------
# Taylor-Green 2D-in-3D
# ----------------------------------------------------------------------
def taylor_green_vel_2d3d(coords, nu, t):
    x = TWO_PI * coords[:, 0]
    y = TWO_PI * coords[:, 1]
    expo = jnp.exp(-8.0 * jnp.pi**2 * nu * t)
    return jnp.stack(
        [
            jnp.cos(x) * jnp.sin(y) * expo,
            -jnp.sin(x) * jnp.cos(y) * expo,
            jnp.zeros_like(x),
        ],
        axis=1,
    )


def taylor_green_vort_2d3d(coords, nu, t):
    x = TWO_PI * coords[:, 0]
    y = TWO_PI * coords[:, 1]
    expo = jnp.exp(-8.0 * jnp.pi**2 * nu * t)
    return jnp.stack(
        [
            jnp.zeros_like(x),
            jnp.zeros_like(x),
            -4.0 * jnp.pi * jnp.cos(x) * jnp.cos(y) * expo,
        ],
        axis=1,
    )


# ----------------------------------------------------------------------
# Senoidal 2D (steady; Wref_x = 4, Wref_y = 2)
# ----------------------------------------------------------------------
_WX = 4.0
_WY = 2.0


def senoidal_vel_2d(coords, nu, t):
    xa = _WY * jnp.pi * coords[:, 1]
    ya = _WX * jnp.pi * coords[:, 0]
    return jnp.stack([jnp.sin(xa), jnp.sin(ya)], axis=1)


def senoidal_vort_2d(coords, nu, t):
    xa = _WY * jnp.pi * coords[:, 1]
    ya = _WX * jnp.pi * coords[:, 0]
    return (_WX * jnp.pi * jnp.cos(ya) - _WY * jnp.pi * jnp.cos(xa))[:, None]


def senoidal_conv_2d(coords, nu, t):
    xa = _WY * jnp.pi * coords[:, 1]
    ya = _WX * jnp.pi * coords[:, 0]
    return (((_WY * jnp.pi) ** 2 - (_WX * jnp.pi) ** 2) * jnp.sin(xa) * jnp.sin(ya))[
        :, None
    ]


def senoidal_diff_2d(coords, nu, t):
    xa = _WY * jnp.pi * coords[:, 1]
    ya = _WX * jnp.pi * coords[:, 0]
    return (-((_WX * jnp.pi) ** 3) * jnp.cos(ya) + (_WY * jnp.pi) ** 3 * jnp.cos(xa))[
        :, None
    ]


# ----------------------------------------------------------------------
# Flat plate (Stokes' first problem; erf profile)
# ----------------------------------------------------------------------
def flat_plate_vel(coords, nu, t):
    tau = jnp.sqrt(4.0 * nu * t)
    vx = jax_erf(coords[:, 1] / tau)
    return jnp.stack([vx, jnp.ones_like(vx)], axis=1)


def flat_plate_vort(coords, nu, t):
    tau = jnp.sqrt(4.0 * nu * t)
    return ((-2.0 / (tau * jnp.sqrt(jnp.pi))) * jnp.exp(-((coords[:, 1] / tau) ** 2)))[
        :, None
    ]


def flat_plate_conv(coords, nu, t):
    tau = jnp.sqrt(4.0 * nu * t)
    alpha = 4.0 * coords[:, 1] / (jnp.sqrt(jnp.pi) * tau**3)
    return (alpha * jnp.exp(-((coords[:, 1] / tau) ** 2)))[:, None]


def flat_plate_diff(coords, nu, t):
    tau = jnp.sqrt(4.0 * nu * t)
    alpha = 4.0 / (jnp.sqrt(jnp.pi) * tau**3)
    beta = 1.0 - 2.0 * coords[:, 1] ** 2 / tau**2
    return (nu * alpha * beta * jnp.exp(-((coords[:, 1] / tau) ** 2)))[:, None]


def jax_erf(x):
    import jax.scipy.special as jsp

    return jsp.erf(x)


CASES_2D = {
    "taylor-green": (taylor_green_vel_2d, taylor_green_vort_2d, None, None),
    "senoidal": (senoidal_vel_2d, senoidal_vort_2d, senoidal_conv_2d, senoidal_diff_2d),
    "flat-plate": (flat_plate_vel, flat_plate_vort, flat_plate_conv, flat_plate_diff),
}
CASES_3D = {
    "taylor-green": (
        taylor_green_vel_3d,
        taylor_green_vort_3d,
        taylor_green_conv_3d,
        taylor_green_diff_3d,
    ),
    "taylor-green2d-3d": (taylor_green_vel_2d3d, taylor_green_vort_2d3d, None, None),
}
