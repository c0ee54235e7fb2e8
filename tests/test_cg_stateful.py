"""conjugate_gradient_stateful vs a numpy oracle of the reference's
ConjugateGradientBase.run_CG (keep_track_vot2021/pytracking/libs/
optimization.py:108-216): Polak-Ribiere / Fletcher-Reeves beta with
clamp, standard alpha, preconditioning, and the carried conjugate
direction with the direction forget factor across runs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.ops.optimization import (
    cg_state_init,
    conjugate_gradient,
    conjugate_gradient_stateful,
)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


class RefCG:
    """Line-for-line numpy port of ConjugateGradientBase (run_CG only)."""

    def __init__(self, fletcher_reeves, direction_forget_factor, M=None):
        self.fr = fletcher_reeves
        self.dff = direction_forget_factor
        self.M = M if M is not None else (lambda r: r)
        self.p = None
        self.rho = 1.0
        self.r_prev = None

    def run(self, A, b, x, num_iter):
        if self.dff == 0:
            self.p, self.rho, self.r_prev = None, 1.0, None
        elif self.p is not None:
            self.rho = self.rho / self.dff

        r = b - A(x)
        for _ in range(num_iter):
            z = self.M(r)
            rho1 = self.rho
            self.rho = float(r @ z)
            if abs(self.rho) == 0.0:
                return x
            if self.p is None:
                self.p = z.copy()
            else:
                if self.fr:
                    beta = self.rho / rho1
                else:
                    rho2 = float(self.r_prev @ z)
                    beta = (self.rho - rho2) / rho1
                beta = max(beta, 0.0)
                self.p = z + self.p * beta
            q = A(self.p)
            alpha = self.rho / float(self.p @ q)
            if not self.fr:
                self.r_prev = r.copy()
            x = x + alpha * self.p
            r = r - alpha * q
        return x


def _spd(n, seed):
    rng = np.random.RandomState(seed)
    B = rng.randn(n, n).astype(np.float32)
    return (B @ B.T + n * np.eye(n, dtype=np.float32)).astype(np.float32)


def _run_ours(A_mat, b, x0, iters, state, fr, dff, M_diag=None):
    A = lambda u: jnp.asarray(A_mat) @ u
    precond = None if M_diag is None else (
        lambda r: r / jnp.asarray(M_diag))
    return conjugate_gradient_stateful(
        A, jnp.asarray(b), jnp.asarray(x0), iters, state,
        precond=precond, fletcher_reeves=fr, direction_forget_factor=dff)


def test_fresh_fr_matches_plain_cg():
    A = _spd(8, 0)
    b = np.random.RandomState(1).randn(8).astype(np.float32)
    x0 = np.zeros(8, np.float32)
    plain = conjugate_gradient(lambda u: jnp.asarray(A) @ u, jnp.asarray(b),
                               jnp.asarray(x0), 5)
    ours, _ = _run_ours(A, b, x0, 5, cg_state_init(jnp.asarray(x0)),
                        fr=True, dff=0.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)


def test_matches_reference_oracle_across_carried_runs():
    """Three consecutive runs with PR beta, preconditioner and dff carry —
    the exact online-ECO configuration (fletcher_reeves=False,
    dff=(1-0.025)**75) — must match the torch algorithm step for step."""
    n = 10
    rng = np.random.RandomState(3)
    b = rng.randn(n).astype(np.float32)
    M_diag = (0.5 + rng.rand(n)).astype(np.float32)
    dff = (1 - 0.025) ** 75

    ref = RefCG(fletcher_reeves=False, direction_forget_factor=dff,
                M=lambda r: r / M_diag)
    state = cg_state_init(jnp.zeros(n, jnp.float32))
    x_ref = np.zeros(n, np.float32)
    x_ours = jnp.zeros(n, jnp.float32)
    for run, seed in enumerate([10, 11, 12]):
        A = _spd(n, seed)  # the operator changes between runs (new samples)
        x_ref = ref.run(lambda u: A @ u, b, x_ref, 5)
        x_ours, state = _run_ours(A, b, np.asarray(x_ours), 5, state,
                                  fr=False, dff=dff, M_diag=M_diag)
        np.testing.assert_allclose(np.asarray(x_ours), x_ref,
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"diverged at run {run}")


def test_fr_carry_matches_oracle():
    n = 6
    rng = np.random.RandomState(5)
    b = rng.randn(n).astype(np.float32)
    dff = 0.6
    ref = RefCG(fletcher_reeves=True, direction_forget_factor=dff)
    state = cg_state_init(jnp.zeros(n, jnp.float32))
    x_ref = np.zeros(n, np.float32)
    x_ours = jnp.zeros(n, jnp.float32)
    for seed in [20, 21]:
        A = _spd(n, seed)
        x_ref = ref.run(lambda u: A @ u, b, x_ref, 4)
        x_ours, state = _run_ours(A, b, np.asarray(x_ours), 4, state,
                                  fr=True, dff=dff)
        np.testing.assert_allclose(np.asarray(x_ours), x_ref,
                                   rtol=2e-4, atol=2e-5)


def test_pr_beta_clamped_at_zero():
    # construct a run where PR beta would be negative: after an exact
    # solve in 1 iteration of a 1-d system, switching A makes
    # rho - <r_prev, z> < 0; the clamp must keep directions valid and the
    # solver must still converge to A^-1 b eventually
    n = 4
    A = _spd(n, 7)
    b = np.random.RandomState(8).randn(n).astype(np.float32)
    state = cg_state_init(jnp.zeros(n, jnp.float32))
    x = jnp.zeros(n, jnp.float32)
    for _ in range(6):
        x, state = _run_ours(A, b, np.asarray(x), 4, state, fr=False,
                             dff=0.5)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-3, atol=1e-4)


def test_converged_run_freezes_but_preserves_carry():
    # solve exactly, then run again: x must stay at the solution and the
    # carried state must not blow up (reference early-returns on rho=0)
    n = 3
    A = _spd(n, 9)
    b = np.random.RandomState(9).randn(n).astype(np.float32)
    x_star = np.linalg.solve(A, b).astype(np.float32)
    state = cg_state_init(jnp.asarray(x_star))
    x, state = _run_ours(A, b, x_star, 5, state, fr=False, dff=0.5)
    np.testing.assert_allclose(np.asarray(x), x_star, rtol=1e-5, atol=1e-5)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(state))
