"""Fleet: a stacked, padded collection of dynamics models.

The joint multi-agent system is represented as rectangular arrays
``x: (n_agents, nx_p)``, ``u: (n_agents, nu_p)`` where ``nx_p``/``nu_p`` are
the fleet-wide maximum state/control dimensions and shorter models are
zero-padded.  All fleet operations are batched over the agent axis with
``vmap`` and dispatch between heterogeneous models with ``lax.switch`` so a
mixed fleet still compiles to one fused program (no per-agent Python loop,
unlike the reference's MultiDynamicalModel, dpilqr/dynamics.py:148-186).

Padding semantics: padded state components have zero dynamics and an identity
row in the discretized Jacobian (they hold their value), exactly like the
reference's hand-padded Human6D model (dpilqr/bbdynamics.cpp:311-316).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from .integrate import euler_discretize, rk4_integrate
from .specs import ModelSpec, get_model


@dataclass(frozen=True)
class Fleet:
    """Static fleet description: one ModelSpec per agent plus the timestep.

    Hashable, so it can be closed over / passed as a static argument to jit.
    """

    specs: tuple[ModelSpec, ...]
    dt: float

    def __post_init__(self):
        object.__setattr__(self, "specs", tuple(get_model(s) for s in self.specs))

    # ---- static metadata -------------------------------------------------
    @property
    def n_agents(self) -> int:
        return len(self.specs)

    @cached_property
    def nx_p(self) -> int:
        return max(s.n_x for s in self.specs)

    @cached_property
    def nu_p(self) -> int:
        return max(s.n_u for s in self.specs)

    @cached_property
    def x_dims(self) -> tuple[int, ...]:
        return tuple(s.n_x for s in self.specs)

    @cached_property
    def u_dims(self) -> tuple[int, ...]:
        return tuple(s.n_u for s in self.specs)

    @cached_property
    def n_pos(self) -> tuple[int, ...]:
        return tuple(s.n_pos for s in self.specs)

    @cached_property
    def _unique_specs(self) -> tuple[ModelSpec, ...]:
        seen: dict[int, ModelSpec] = {}
        for s in self.specs:
            seen.setdefault(s.model_id, s)
        return tuple(seen.values())

    @cached_property
    def _branch_index(self) -> np.ndarray:
        """Per-agent index into the unique-spec branch table."""
        order = {s.model_id: i for i, s in enumerate(self._unique_specs)}
        return np.array([order[s.model_id] for s in self.specs], dtype=np.int32)

    @cached_property
    def state_mask(self) -> np.ndarray:
        """(n_agents, nx_p) 1.0 where a state component is real, 0.0 in padding."""
        m = np.zeros((self.n_agents, self.nx_p))
        for i, s in enumerate(self.specs):
            m[i, : s.n_x] = 1.0
        return m

    @cached_property
    def control_mask(self) -> np.ndarray:
        m = np.zeros((self.n_agents, self.nu_p))
        for i, s in enumerate(self.specs):
            m[i, : s.n_u] = 1.0
        return m

    # ---- padded per-model functions --------------------------------------
    def _padded_f(self, spec: ModelSpec):
        nx_p, nu_p = self.nx_p, self.nu_p

        def pf(x, u):
            xdot = spec.f(x[: spec.n_x], u[: spec.n_u])
            return jnp.concatenate([xdot, jnp.zeros(nx_p - spec.n_x, x.dtype)])

        return pf

    def _padded_step(self, spec: ModelSpec):
        pf = self._padded_f(spec)
        dt = self.dt

        def step(x, u):
            return rk4_integrate(pf, x, u, dt, spec.rk4_substeps)

        return step

    def _padded_linearize(self, spec: ModelSpec):
        pf = self._padded_f(spec)
        dt = self.dt
        jac_x = jax.jacfwd(pf, argnums=0)
        jac_u = jax.jacfwd(pf, argnums=1)

        def lin(x, u):
            return euler_discretize(jac_x(x, u), jac_u(x, u), dt)

        return lin

    def _dispatch(self, make_branch):
        """Build an (x, u) -> out fleet function vmapped over agents."""
        branches = [make_branch(s) for s in self._unique_specs]
        if len(branches) == 1:
            fn = branches[0]
            return jax.vmap(fn)
        # NOTE: keep the branch index as a host numpy array.  These dispatch
        # closures are cached on the Fleet (cached_property) and reused
        # across jit traces; a jnp array materialized here during a trace
        # would leak that trace's tracer into later ones.
        idx = self._branch_index

        def per_agent(i, x, u):
            return jax.lax.switch(i, branches, x, u)

        vm = jax.vmap(per_agent, in_axes=(0, 0, 0))

        def fleet_fn(x, u):
            return vm(jnp.asarray(idx), x, u)

        return fleet_fn

    def _dispatch_dyn(self, make_branch):
        """Like _dispatch but model selection is a *traced* per-slot index
        array (for gathered subproblems whose slot models are data-dependent).
        Branch indices refer to ``self._unique_specs`` order."""
        branches = [make_branch(s) for s in self._unique_specs]
        if len(branches) == 1:
            fn = branches[0]
            vm = jax.vmap(fn)
            return lambda mids, x, u: vm(x, u)

        def per_agent(i, x, u):
            return jax.lax.switch(i, branches, x, u)

        return jax.vmap(per_agent, in_axes=(0, 0, 0))

    # ---- public fleet operations -----------------------------------------
    @cached_property
    def f(self):
        """Continuous dynamics: (n, nx_p), (n, nu_p) -> (n, nx_p)."""
        return self._dispatch(self._padded_f)

    @cached_property
    def step(self):
        """Discrete step (RK4 over dt): (n, nx_p), (n, nu_p) -> (n, nx_p)."""
        return self._dispatch(self._padded_step)

    @cached_property
    def linearize(self):
        """Discretized Jacobian blocks: -> A (n, nx_p, nx_p), B (n, nx_p, nu_p)."""
        return self._dispatch(self._padded_linearize)

    # Dynamic-dispatch variants: first argument is a traced (k,) int32 array
    # of branch indices (see ``branch_index_array``); slot count k may differ
    # from n_agents.  Used by the distributed layer, where subproblem slots
    # are data-dependent gathers of the parent fleet.
    @cached_property
    def step_dyn(self):
        return self._dispatch_dyn(self._padded_step)

    @cached_property
    def linearize_dyn(self):
        return self._dispatch_dyn(self._padded_linearize)

    @cached_property
    def branch_index_array(self) -> np.ndarray:
        """(n_agents,) int32 branch index per agent for the *_dyn functions."""
        return self._branch_index

    # ---- helpers ----------------------------------------------------------
    def pad_states(self, x_native):
        """Concatenated native-dim state vector -> (n_agents, nx_p) padded."""
        x_native = np.asarray(x_native).flatten()
        out = np.zeros((self.n_agents, self.nx_p), dtype=x_native.dtype)
        off = 0
        for i, s in enumerate(self.specs):
            out[i, : s.n_x] = x_native[off : off + s.n_x]
            off += s.n_x
        assert off == x_native.size
        return out

    def unpad_states(self, x_padded):
        """(..., n_agents, nx_p) -> (..., sum(x_dims)) concatenated native."""
        x_padded = np.asarray(x_padded)
        parts = [
            x_padded[..., i, : s.n_x] for i, s in enumerate(self.specs)
        ]
        return np.concatenate(parts, axis=-1)

    def pad_controls(self, u_native):
        u_native = np.asarray(u_native)
        lead = u_native.shape[:-1]
        u_flat = u_native.reshape(*lead, -1)
        out = np.zeros((*lead, self.n_agents, self.nu_p), dtype=u_native.dtype)
        off = 0
        for i, s in enumerate(self.specs):
            out[..., i, : s.n_u] = u_flat[..., off : off + s.n_u]
            off += s.n_u
        return out

    def unpad_controls(self, u_padded):
        u_padded = np.asarray(u_padded)
        parts = [
            u_padded[..., i, : s.n_u] for i, s in enumerate(self.specs)
        ]
        return np.concatenate(parts, axis=-1)


def homogeneous_fleet(model, n_agents: int, dt: float) -> Fleet:
    """Fleet of ``n_agents`` copies of one model."""
    spec = get_model(model)
    return Fleet((spec,) * n_agents, dt)
