"""Least-squares solver family: Conjugate Gradient + Gauss-Newton CG.

Rebuild of RGBD/models/DeT/pytracking/libs/optimization.py:49-713 (the
ECO/ATOM-era solvers) as pure pytree functions: the reference hand-writes
problem-specific Jacobian products (L2Problem.ip_input etc.); here
jax.linearize/vjp produce them for ANY residual function, so one
implementation serves ATOM's FactorizedConvProblem (joint filter +
projection), its online ConvProblem, and future meta-optimizer users
(KYS/LWL-style heads). Everything runs as lax.fori_loop bodies inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tree_vdot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _tree_axpy(alpha, x, y):
    return jax.tree.map(lambda a, b: alpha * a + b, x, y)


def conjugate_gradient(A, b, x0, num_iter: int, eps: float = 1e-10,
                       precond=None):
    """Solve A x = b for a symmetric PSD linear operator A on pytrees.

    Standard (optionally preconditioned) CG (optimization.py
    ConjugateGradientBase.run_CG, standard_alpha path); num_iter may be a
    traced int. `precond` is M^-1 as a pytree function (the reference's M1,
    e.g. division by the diagonal energy estimate in ECO's FilterOptim).
    """
    M1 = precond or (lambda t: t)

    def body(_, carry):
        x, r, p, rho = carry
        Ap = A(p)
        denom = _tree_vdot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > eps, rho / denom, 0.0)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, Ap, r)
        z = M1(r)
        rho_new = _tree_vdot(r, z)
        beta = jnp.where(jnp.abs(rho) > eps, rho_new / rho, 0.0)
        p = _tree_axpy(beta, p, z)
        return x, r, p, rho_new

    r0 = jax.tree.map(lambda bb, ax: bb - ax, b, A(x0))
    z0 = M1(r0)
    carry = (x0, r0, z0, _tree_vdot(r0, z0))
    x, _, _, _ = jax.lax.fori_loop(0, num_iter, body, carry)
    return x


def cg_state_init(x):
    """Empty carried-direction state for conjugate_gradient_stateful:
    (p, rho, r_prev, has_p) — the reference's ConjugateGradientBase
    reset_state (optimization.py:117-122: p=None, rho=1, r_prev=None),
    expressed as fixed-shape pytrees so it can live in a jitted tracker
    state. rho follows the variable's real dtype so an f64 replay (the
    parity probes) stays f64 end to end."""
    zeros = jax.tree.map(jnp.zeros_like, x)
    dt = jnp.real(jnp.zeros((), jax.tree.leaves(x)[0].dtype)).dtype
    return (zeros, jnp.ones((), dt), zeros,
            jnp.zeros((), jnp.bool_))


def conjugate_gradient_stateful(A, b, x0, num_iter: int, state,
                                precond=None, fletcher_reeves: bool = True,
                                direction_forget_factor: float = 0.0,
                                eps: float = 1e-10):
    """CG with the reference's cross-run carried direction
    (ConjugateGradientBase.run_CG, optimization.py:125-216).

    Unlike `conjugate_gradient` this mirrors the reference's loop order
    and supports:
      - Polak-Ribiere beta (fletcher_reeves=False):
        beta = (rho - <r_prev, z>) / rho1, clamped at 0 (:170-176);
      - a conjugate direction `p` and its `rho` persisting across calls,
        decayed on entry by rho /= direction_forget_factor (:135-138) —
        ECO's online FilterOptim runs with
        dff = (1 - learning_rate)**CG_forgetting_rate (eco.py:93-95), so
        each periodic re-optimization warm-starts from the previous
        frame's search direction.

    state: (p, rho, r_prev, has_p) from cg_state_init / a previous call.
    Returns (x, new_state). With direction_forget_factor == 0 the state
    is reset on entry (reference :135-136) and the iteration equals the
    fresh-start form.
    """
    M1 = precond or (lambda t: t)
    p0, rho0, rprev0, has_p0 = state
    if direction_forget_factor == 0.0:
        p0, rho0, rprev0, has_p0 = cg_state_init(x0)
    else:
        rho0 = jnp.where(has_p0, rho0 / direction_forget_factor, rho0)

    r0 = jax.tree.map(lambda bb, ax: bb - ax, b, A(x0))

    def body(_, carry):
        x, r, p, rho, r_prev, has_p = carry
        z = M1(r)
        rho1 = rho
        rho_new = jnp.real(_tree_vdot(r, z)).astype(rho1.dtype)
        # check_zero (:160-166): rho == 0 -> the iteration has converged;
        # freeze by zeroing alpha/beta below
        alive = jnp.abs(rho_new) > eps
        safe_rho1 = jnp.where(jnp.abs(rho1) > eps, rho1, 1.0)
        if fletcher_reeves:
            beta = rho_new / safe_rho1
        else:
            rr = jnp.real(_tree_vdot(r_prev, z)).astype(jnp.float32)
            beta = (rho_new - rr) / safe_rho1
        beta = jnp.maximum(beta, 0.0)                    # clamp(0) (:176)
        beta = jnp.where(has_p & alive & (jnp.abs(rho1) > eps), beta, 0.0)
        # the reference RETURNS on rho == 0 (:160-166), leaving p/rho/
        # r_prev at their last live values for the next carried run —
        # emulate by freezing the whole carry on dead iterations
        p_live = _tree_axpy(beta, p, z)                  # p = z + beta p
        p = jax.tree.map(lambda a, bb: jnp.where(alive, a, bb), p_live, p)
        q = A(p)
        pq = jnp.real(_tree_vdot(p, q))
        alpha = jnp.where(alive & (jnp.abs(pq) > eps), rho_new / pq, 0.0)
        if not fletcher_reeves:
            r_prev = jax.tree.map(lambda a, bb: jnp.where(alive, a, bb),
                                  r, r_prev)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, q, r)
        rho_out = jnp.where(alive, rho_new, rho1)
        return x, r, p, rho_out, r_prev, has_p | alive

    carry = (x0, r0, p0, rho0, rprev0, has_p0)
    x, r, p, rho, r_prev, has_p = jax.lax.fori_loop(0, num_iter, body, carry)
    return x, (p, rho, r_prev, has_p)


def gauss_newton_cg(residual_fn, x, num_gn_iter: int, num_cg_iter: int,
                    precond=None, fletcher_reeves: bool = True):
    """Minimize ||residual_fn(x)||^2 by Gauss-Newton steps, each solved with
    `num_cg_iter` CG iterations on the normal equations
    (GaussNewtonCG, optimization.py:49-230).

    residual_fn: pytree -> pytree of residuals. Returns the optimized x.
    num_gn_iter must be static (python int); num_cg_iter may be traced.
    `precond` preconditions the CG inner solves (same tree as x — the
    reference's problem.M1, e.g. FactorizedConvProblem's division by
    diag([filter_reg, projection_reg]), atom/optim.py:18,67-68).
    `fletcher_reeves=False` uses the Polak-Ribiere beta, matching the
    reference's ConjugateGradient(fletcher_reeves=params.fletcher_reeves)
    online filter optimizer at ATOM's default.py:31 setting; each GN step
    starts the CG direction fresh (direction_forget_factor == 0).

    The GN iterations run as a lax.fori_loop (one traced copy of the
    linearized graph instead of num_gn_iter unrolled ones — the unrolled
    form blew past the TPU backend's program size on ECO's joint
    problem). This makes the result non-reverse-differentiable; use
    steepest_descent_gn for meta-learned optimizers.
    """
    def gn_step(_, x):
        r, jvp_fn = jax.linearize(residual_fn, x)
        _, vjp_fn = jax.vjp(residual_fn, x)

        def A(u):
            return vjp_fn(jvp_fn(u))[0]

        b = jax.tree.map(lambda g: -g, vjp_fn(r)[0])
        zero = jax.tree.map(jnp.zeros_like, x)
        if fletcher_reeves:
            dx = conjugate_gradient(A, b, zero, num_cg_iter, precond=precond)
        else:
            dx, _ = conjugate_gradient_stateful(
                A, b, zero, num_cg_iter, cg_state_init(zero),
                precond=precond, fletcher_reeves=False,
                direction_forget_factor=0.0)
        return jax.tree.map(jnp.add, x, dx)

    return jax.lax.fori_loop(0, num_gn_iter, gn_step, x)


def steepest_descent_gn(residual_fn, x, num_iter: int,
                        steplength_reg: float = 0.0, batch_dims: int = 0):
    """Generic Gauss-Newton steepest descent over pytree meta-parameters.

    Rebuild of GNSteepestDescent (RGBD/models/DeT/ltr/models/meta/
    steepestdescent.py:8-107), the meta-optimizer the KYS/LWL-style heads
    train through. Per iteration, with r = residual_fn(x) and J = dr/dx:

        g     = J^T r                       (gradient of 0.5||r||^2)
        h     = J g                         (Gauss-Newton curvature probe)
        alpha = ||g||^2 / (||h||^2 + steplength_reg * ||g||^2)
        x    <- x - alpha * g

    jax.vjp/jvp replace the reference's double torch.autograd.grad trick;
    the unrolled loop stays end-to-end differentiable so the residual
    module's own parameters can be meta-learned (compute_losses equivalent:
    differentiate through the returned iterate).

    batch_dims > 0 computes a per-sample alpha over the leading `batch_dims`
    axes shared by every leaf (parameter_batch_dim/residual_batch_dim in the
    reference); 0 reduces to one global step length.
    """
    def _sqr_norm(tree):
        if batch_dims == 0:
            return sum(jnp.sum(jnp.square(l)) for l in jax.tree.leaves(tree))
        return sum(jnp.sum(jnp.square(l).reshape(l.shape[:batch_dims] + (-1,)),
                           axis=-1) for l in jax.tree.leaves(tree))

    def _scaled_sub(x, g, alpha):
        def upd(p, gg):
            a = alpha if batch_dims == 0 else alpha.reshape(
                alpha.shape + (1,) * (gg.ndim - batch_dims))
            return p - a * gg
        return jax.tree.map(upd, x, g)

    for _ in range(num_iter):
        r, vjp_fn = jax.vjp(residual_fn, x)
        g = vjp_fn(r)[0]
        _, h = jax.jvp(residual_fn, (x,), (g,))
        ip_gg = _sqr_norm(g)
        ip_hh = _sqr_norm(h)
        alpha = ip_gg / jnp.clip(ip_hh + steplength_reg * ip_gg, 1e-8)
        x = _scaled_sub(x, g, alpha)
    return x


def mlu(x, a: float = 0.05):
    """The 'mlu' response activation (atom.py:455,471):
    elu(leaky_relu(x, 1/a), alpha=a)."""
    y = jnp.where(x >= 0, x, x * (1.0 / a))   # leaky_relu(x, 1/a)
    return jnp.where(y >= 0, y, a * (jnp.exp(y) - 1.0))  # elu(y, alpha=a)
