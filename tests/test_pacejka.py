"""Pacejka magic-formula model + runtime parameter sweep axis."""

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.models.pacejka import (
    PacejkaParams,
    pacejka_bicycle_dynamics,
    pacejka_dynamics_p,
)


def _state(v=10.0, vy=0.2, r=0.1, delta=0.05):
    return jnp.array([0.0, 0.0, 0.0, v, vy, r, delta])


def test_magic_formula_tire_curve_properties():
    """The magic formula must be ~linear at small slip (slope mu*Fz*C*B),
    monotone up to the peak, and saturating beyond it."""
    from ad_mpc_tpu.models.pacejka import magic_formula

    b, c, d, fz, mu = 10.0, 1.9, 1.0, 8000.0, 1.0
    a_small = 0.002
    f_small = float(magic_formula(jnp.asarray(a_small), b, c, d, fz, mu))
    slope = mu * fz * d * c * b  # dF/dalpha at 0
    assert abs(f_small - slope * a_small) < 0.02 * abs(slope * a_small)
    # Monotone below the peak, saturating after.
    alphas = jnp.linspace(0.0, 0.12, 25)
    F = np.asarray(jax.vmap(
        lambda a: magic_formula(a, b, c, d, fz, mu))(alphas))
    assert np.all(np.diff(F[:10]) > 0)
    assert F.max() <= mu * fz * d * 1.0 + 1e-6
    # Odd symmetry.
    f_neg = float(magic_formula(jnp.asarray(-a_small), b, c, d, fz, mu))
    assert abs(f_neg + f_small) < 1e-9


def test_friction_scales_lateral_force():
    x = _state(delta=0.15)
    u = jnp.array([0.0, 0.0])
    lo = pacejka_dynamics_p(x, u, jnp.array([0.5, 0.0, 0.0]))
    hi = pacejka_dynamics_p(x, u, jnp.array([1.0, 0.0, 0.0]))
    # Lateral dynamics (v_y_dot + v_x r coupling removed) scale with mu.
    p = PacejkaParams()
    f_lo = float(lo[4]) + p.g * 0.0 + float(x[3] * x[5])
    f_hi = float(hi[4]) + float(x[3] * x[5])
    assert abs(f_hi) > 1.5 * abs(f_lo)


def test_topography_gravity_feedthrough():
    x = _state(vy=0.0, r=0.0, delta=0.0)
    u = jnp.array([0.0, 0.0])
    flat = pacejka_dynamics_p(x, u, jnp.array([1.0, 0.0, 0.0]))
    uphill = pacejka_dynamics_p(x, u, jnp.array([1.0, 0.08, 0.0]))
    # Uphill pitch decelerates: g*sin(pitch) ~ 0.78 m/s^2.
    assert float(flat[3]) - float(uphill[3]) > 0.5
    rolled = pacejka_dynamics_p(x, u, jnp.array([1.0, 0.0, 0.08]))
    assert abs(float(rolled[4]) - float(flat[4])) > 0.5


def test_stiffness_peak_scaling_five_params():
    x = _state(delta=0.25, vy=-1.0)  # large slip: near the force peak
    u = jnp.array([0.0, 0.0])
    base = pacejka_dynamics_p(x, u, jnp.array([1.0, 0.0, 0.0, 1.0, 1.0]))
    softer = pacejka_dynamics_p(x, u, jnp.array([1.0, 0.0, 0.0, 0.5, 0.7]))
    # Lower stiffness/peak factors -> weaker lateral response.
    assert abs(float(softer[4] + x[3] * x[5])) < abs(
        float(base[4] + x[3] * x[5])
    )
    # 3-param and 5-param-with-unit-scales paths agree.
    three = pacejka_dynamics_p(x, u, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(base), np.asarray(three),
                               atol=1e-6)


def test_jit_and_grad_through_sweep_params():
    x = _state()
    u = jnp.array([0.3, 0.1])
    f = jax.jit(lambda p: jnp.sum(pacejka_dynamics_p(x, u, p) ** 2))
    p = jnp.array([0.9, 0.02, -0.03, 1.1, 0.95])
    g = jax.grad(f)(p)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_bench_friction_circle_velocity_envelope():
    """The c4 sweep's reference-velocity cap (analogous in spirit to the
    reference's resample_vel longitudinal-reachability cap,
    nodes/gp_ad_mpc_node.py:344-349; the lateral friction-circle form is
    ours): after capping, no scenario
    demands lateral acceleration beyond 75% of its drawn tire limit mu*g*D.
    Round-3 diagnosis: every fleet member with kkt > 9e-4 had a_y demand
    above 0.9*mu*g*D, i.e. a physically untrackable reference."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    _, p_of, v_cap = bench.make_pacejka()
    rng = np.random.default_rng(3)
    n = 512
    v = rng.uniform(5.0, 15.0, n).astype(np.float32)
    kappa = (rng.uniform(-1.0, 1.0, n) * 0.05).astype(np.float32)
    p = np.stack([
        np.asarray(p_of(float(vv), float(kk), rng.uniform(0.0, 1.0, 8)))
        for vv, kk in zip(v, kappa)
    ])
    v_c = v_cap(v, kappa, p)
    assert (v_c <= v + 1e-6).all()
    a_y = v_c**2 * np.abs(kappa)
    limit = p[:, 0] * 9.81 * p[:, 4]
    assert (a_y <= 0.75 * limit + 1e-4).all()
    # The cap only bites where it must: uncapped-feasible scenarios keep v.
    feasible = v**2 * np.abs(kappa) <= 0.75 * limit
    np.testing.assert_allclose(v_c[feasible], v[feasible])


def test_fleet_init_applies_velocity_envelope():
    """bench.build_fleet(v_cap=...) must cap both the reference speed and
    the initial forward velocity before anything reaches the solver."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    dyn, p_of, v_cap = bench.make_pacejka()
    _, init, _, _ = bench.build_fleet(dyn, p_of, v_cap=v_cap)
    x0, s0, v, kappa, p, states = init(256, seed=0)
    v, kappa, p = np.asarray(v), np.asarray(kappa), np.asarray(p)
    a_y = v**2 * np.abs(kappa)
    assert (a_y <= 0.75 * p[:, 0] * 9.81 * p[:, 4] + 1e-3).all()
    np.testing.assert_allclose(np.asarray(x0)[:, 3], v)
