"""Continuous normalizing flow (FFJORD-style) with optional regularization.

Integrates ``dx/dt = f(t, x)`` jointly with the instantaneous log-det
(trace of df/dx) and, optionally, Finlay kinetic + Jacobian-Frobenius
regularization. The trace is computed with forward-mode ``jax.jvp``:
``exact`` vmaps over the D basis vectors (one jvp each — no reverse-mode
graph gymnastics, cf. the reference's autograd machinery at
/root/reference/tfep/nn/flows/continuous.py:285-375), while ``hutchinson``
uses N Gaussian probes (``e . (J e)`` estimates the trace and ``|J e|^2``
the Frobenius norm). Integration is a fixed-grid ``lax.scan``
(:mod:`tfep_tpu.nn.ode`); reverse-mode AD through the scan provides exact
discretize-then-optimize gradients (the reference's adjoint alternative).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tfep_tpu.nn.flows.flow import Flow
from tfep_tpu.nn.module import buffer, static
from tfep_tpu.nn.ode import odeint

__all__ = ['ContinuousFlow']


class ContinuousFlow(Flow):
    """Continuous normalizing flow over a dynamics network ``f(t, x)``.

    The flow is the time-1 map of the ODE ``dx/dt = f(t, x)`` where ``f``
    is any callable module (e.g. :class:`~tfep_tpu.nn.dynamics.EGNNDynamics`)
    mapping ``(t, (batch, dim))`` to velocities of the same shape. The
    log-absolute-Jacobian-determinant is integrated alongside as the trace
    of ``df/dx`` (instantaneous change of variables, FFJORD), and the
    inverse map simply integrates the negated field backwards in time — the
    two directions cost the same.

    Attributes
    ----------
    dynamics : Module
        The velocity field ``f(t, x)``.
    trace_estimator : {'hutchinson', 'exact'}
        ``'exact'`` vmaps one ``jax.jvp`` per basis vector (``dim`` JVPs:
        exact but O(dim) cost); ``'hutchinson'`` uses
        ``n_hutchinson_samples`` Gaussian probes (``E[e . J e]``, unbiased,
        O(1) cost — the default, and what the KL training loss needs).
    solver : {'euler', 'midpoint', 'rk4', 'dopri5'}
        Fixed-grid integrator from :mod:`tfep_tpu.nn.ode`.
    n_steps : int
        Number of integration steps (static — the scan is compiled once).
    regularization : bool
        If ``True``, also integrate the Finlay et al. regularizers
        (kinetic energy ``|f|^2`` + Jacobian Frobenius norm estimate) and
        return them as a third output for the training loss.
    checkpoint : bool
        Rematerialize each ODE step under reverse-mode AD (trades ~1
        extra forward per step for O(n_steps) less activation memory).
    hutchinson_key : jax.Array
        Default PRNG key data for the probe draw when ``forward`` is
        called without an explicit ``key``.

    Notes
    -----
    Gradients flow through the ``lax.scan`` (discretize-then-optimize),
    which is exact for the discrete map — unlike the reference's
    torchdiffeq adjoint option, which integrates a second ODE and drifts
    (/root/reference/tfep/nn/flows/continuous.py:134-169).
    """

    dynamics: object
    hutchinson_key: jnp.ndarray = buffer(default=None)
    trace_estimator: str = static(default='hutchinson')
    solver: str = static(default='dopri5')
    n_steps: int = static(default=20)
    n_hutchinson_samples: int = static(default=1)
    regularization: bool = static(default=True)
    checkpoint: bool = static(default=True)

    @classmethod
    def create(cls, dynamics, trace_estimator: str = 'hutchinson',
               solver: str = 'dopri5', n_steps: int = 20,
               n_hutchinson_samples: int = 1,
               regularization: bool = True,
               seed: int = 0, checkpoint: bool = True) -> 'ContinuousFlow':
        """Build a CNF; see the class docstring for parameter semantics.

        ``seed`` initializes the default Hutchinson probe key used when no
        explicit ``key`` is passed to :meth:`forward`/:meth:`inverse`.
        """
        if trace_estimator not in ('exact', 'hutchinson'):
            raise ValueError(
                "trace_estimator must be 'exact' or 'hutchinson'.")
        # Pallas-backed dynamics cannot be vmapped (no batching rule for
        # pallas calls): only the single-probe Hutchinson path avoids
        # vmap. Fail here with a clear message instead of deep in a scan.
        # Unwrap dynamics adapters (e.g. MaskedVelocityDynamics) so a
        # wrapped Pallas-backed EGNN cannot slip past the check.
        inner = dynamics
        while (not hasattr(inner, 'graph_layers')
               and hasattr(inner, 'dynamics')):
            inner = inner.dynamics
        uses_pallas = any(
            getattr(layer, 'pairwise', 'xla') == 'pallas'
            for layer in getattr(inner, 'graph_layers', ()))
        if uses_pallas and (trace_estimator == 'exact'
                            or n_hutchinson_samples != 1):
            raise ValueError(
                "Dynamics with pairwise='pallas' support only "
                "trace_estimator='hutchinson' with n_hutchinson_samples="
                '1 (probe batching would vmap the fused kernel).')
        return cls(dynamics=dynamics,
                   hutchinson_key=jax.random.key_data(jax.random.key(seed)),
                   trace_estimator=trace_estimator, solver=solver,
                   n_steps=int(n_steps),
                   n_hutchinson_samples=int(n_hutchinson_samples),
                   regularization=regularization, checkpoint=checkpoint)

    # ------------------------------------------------------------------ #
    def forward(self, x, key: Optional[jax.Array] = None):
        """Integrate ``x`` of shape ``(batch, dim)`` from t=0 to t=1.

        Parameters
        ----------
        x : jax.Array
            ``(batch, dim)`` input configurations.
        key : jax.Array, optional
            PRNG key for the Hutchinson probes. Pass a fresh key per
            training step for an unbiased trace; defaults to the stored
            ``hutchinson_key`` (deterministic, useful for evaluation).

        Returns
        -------
        y : jax.Array
            ``(batch, dim)`` integrated configurations.
        log_det_J : jax.Array
            ``(batch,)`` integrated trace (the log-det estimate).
        reg : jax.Array
            ``(batch,)`` integrated regularizer — only when
            ``regularization=True``.
        """
        return self._pass(x, inverse=False, key=key)

    def inverse(self, y, key: Optional[jax.Array] = None):
        """Integrate the negated field backwards; same contract as
        :meth:`forward`. Exact only up to the fixed-grid discretization
        error of the solver."""
        return self._pass(y, inverse=True, key=key)

    def _pass(self, x, inverse: bool, key):
        batch, dim = x.shape

        if key is None:
            key = jax.random.wrap_key_data(self.hutchinson_key)
        if self.trace_estimator == 'hutchinson':
            eps = jax.random.normal(key, (self.n_hutchinson_samples, *x.shape),
                                    dtype=x.dtype)
        else:
            eps = None

        def integrand(tau, state):
            # The inverse runs the dynamics backwards: physical time
            # t = 1 - tau with a negated field.
            t = 1.0 - tau if inverse else tau
            xt = state[0]
            vel_fn = lambda z: self.dynamics(t, z)

            if self.trace_estimator == 'exact':
                eye = jnp.eye(dim, dtype=x.dtype)

                def jvp_basis(e):
                    _, jv = jax.jvp(vel_fn, (xt,),
                                    (jnp.broadcast_to(e, xt.shape),))
                    return jv

                # (dim, batch, dim): J columns for every basis vector.
                jvs = jax.vmap(jvp_basis)(eye)
                vel = vel_fn(xt)
                # trace = sum_i (J e_i)_i.
                trace = jnp.einsum('ibi->b', jvs)
                frobenius = jnp.sum(jvs ** 2, axis=(0, 2))
            elif self.n_hutchinson_samples == 1:
                # Single probe (the default) without vmap: Pallas-backed
                # dynamics expand the jvp into first-order kernel ops via
                # their custom_jvp rule, and pallas calls have no vmap
                # batching rule.
                vel, jv = jax.jvp(vel_fn, (xt,), (eps[0],))
                # E[e . J e].
                trace = jnp.sum(eps[0] * jv, axis=-1)
                frobenius = jnp.sum(jv ** 2, axis=-1)
            else:
                # Multiple probes: batch them with vmap (XLA dynamics
                # only — see the pallas check in create()).
                def jvp_eps(e):
                    return jax.jvp(vel_fn, (xt,), (e,))

                vels, jvs = jax.vmap(jvp_eps)(eps)
                vel = vels[0]
                trace = jnp.mean(jnp.sum(eps * jvs, axis=-1), axis=0)
                frobenius = jnp.mean(jnp.sum(jvs ** 2, axis=-1), axis=0)

            if inverse:
                vel = -vel
                trace = -trace

            if self.regularization:
                reg = jnp.sum(vel ** 2, axis=-1) + frobenius
                return (vel, trace, reg)
            return (vel, trace)

        trace0 = jnp.zeros(batch, dtype=x.dtype)
        if self.regularization:
            state0 = (x, trace0, jnp.zeros(batch, dtype=x.dtype))
        else:
            state0 = (x, trace0)

        # Integrate forward in tau in [0, 1]; the inverse negates the field.
        state1 = odeint(integrand, state0, 0.0, 1.0, n_steps=self.n_steps,
                        solver=self.solver, checkpoint=self.checkpoint)

        if self.regularization:
            y, trace, reg = state1
            return y, trace, reg
        y, trace = state1
        return y, trace

    def n_parameters(self) -> int:
        from tfep_tpu.nn.module import n_parameters
        return n_parameters(self.dynamics)
