"""Extended-Jacobian HPF: devices with internal control unknowns.

The capability generalizes example_hpf_fuchs.py:185-381 (alpha/beta as
Newton unknowns).  The reference's own version is degenerate — its device
ignores the angles, H5 = 0, and H1 is *random* "to avoid unsolvable
system" (:373-374) — so the tests here gate (a) the degenerate case
reproduces the plain solver exactly when closed with a principled
regularization, and (b) a genuinely voltage-coupled control unknown is
solved to its setpoint.
"""
import jax
import jax.numpy as jnp
import numpy as np

import hpfx
from hpfx import cx
from hpfx.devices import norton_inject
from hpfx.extended import ControlledDeviceSet, hpf_extended

from conftest import make_setup


def _inert_inject(params, V_m, V_a, u):
    """Injection that ignores u — the reference's own (degenerate) case."""
    return norton_inject(params, V_m, V_a)


def _pin_constraint(params, V_m, V_a, u):
    """g(u) = u: pins the inert unknowns at zero — the well-posed version
    of the reference's random-H1 trick (nonsingular, decoupled rows)."""
    return u


def test_inert_unknowns_match_plain_solver():
    """With injection-independent unknowns and pinning constraints, the
    extended Newton takes the same trajectory as the plain solver: same
    voltages AND same iteration count (the unknown rows are decoupled,
    exactly the structure Fuchs' 16x16 degenerates to)."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    ref = hpfx.hpf(net, dev, s)

    cdev = ControlledDeviceSet(
        params=(dev.I_N, dev.Y_N),
        u0=jnp.zeros((net.n_nonlinear, 2)),    # (alpha, beta) per device
        inject=_inert_inject, constraint=_pin_constraint,
        n_nl=net.n_nonlinear, n_u=2)
    ext = hpf_extended(net, cdev, s)
    assert bool(ext.converged)
    assert int(ext.n_iter) == int(ref.n_iter)
    np.testing.assert_allclose(np.asarray(ext.V_m), np.asarray(ref.V_m),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(ext.u), 0.0, atol=1e-12)


def test_control_unknown_solved_to_setpoint():
    """A device with a control unknown u scaling its injection (a genuine
    V-u coupling, unlike the reference's inert alpha/beta), closed by the
    requirement that the device's fundamental *active power draw* hits a
    setpoint.  The extended Newton must find (V, u) jointly such that the
    power constraint holds at the converged network state."""
    cfg = ("net2", 5, True)
    s, net, dev = make_setup(cfg)
    # the SMPS Norton model draws ~9.018 pu fundamental power at the
    # nominal solution (the buses-table P is not enforced at nonlinear
    # buses — HCNE replaces their power rows with current balance);
    # ask the control unknown to push it ~2% above that
    P_set = 9.2

    def inject(params, V_m, V_a, u):
        I_N, Y_N, p_set = params
        base = norton_inject((I_N, Y_N), V_m, V_a)
        return base * (1.0 + u[0])

    def constraint(params, V_m, V_a, u):
        I_N, Y_N, p_set = params
        I = inject(params, V_m, V_a, u)
        V1 = cx.polar(V_m[0:1], V_a[0:1])
        # device fundamental active power: P = Re(V1 · conj(I_dev,1)) with
        # the injection convention I_inj = -I_device
        P_dev = -(V1 * I[0:1].conj()).re[0]
        return jnp.array([P_dev - p_set])

    params = (dev.I_N[0], dev.Y_N[0], jnp.asarray(P_set))
    cdev = ControlledDeviceSet(
        params=jax.tree.map(lambda x: x[None] if hasattr(x, "ndim") else x,
                            params),
        u0=jnp.zeros((1, 1)),
        inject=inject, constraint=constraint, n_nl=1, n_u=1)
    ext = hpf_extended(net, cdev, s)
    assert bool(ext.converged), float(ext.err)
    u = float(ext.u[0, 0])
    assert abs(u) > 1e-4          # the angle actually moved
    # recompute the constraint at the solution: satisfied to thresh
    g = constraint(jax.tree.map(lambda x: x[0], cdev.params),
                   ext.V_m[:, net.m:][:, 0], ext.V_a[:, net.m:][:, 0],
                   ext.u[0])
    assert abs(float(g[0])) < 2e-4, (u, float(g[0]))

