"""Hard-BC ansatz recipes: lift interpolates every BC group's data and the
bubble vanishes there, so u = lift + bubble*N meets the constraints exactly
(problems.HARD_BC / net.wrap_hard_bc; capability extension over the
reference's penalty-only BCs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpinn import problems
from tpinn.core import pde


@pytest.mark.parametrize("name", sorted(problems.HARD_BC))
def test_lift_matches_bc_data_and_bubble_vanishes(name):
    problem = problems.with_hard_bc(problems.get_problem(name))
    lift = pde.compile_coord_expr(problem.hard_bc[0], problem.coords)
    bubble = pde.compile_coord_expr(problem.hard_bc[1], problem.coords)

    def smooth_net(z):
        # an arbitrary smooth stand-in for the network output
        val = jnp.sin(3.0 * z[:, :1] + 1.0) + 0.7
        for j in range(1, z.shape[1]):
            val = val * jnp.cos(2.0 * z[:, j : j + 1] - 0.5)
        return val + 0.3

    for g in problem.bc_groups:
        lo = np.asarray(g.lo, np.float64)
        hi = np.asarray(g.hi, np.float64)
        s = np.linspace(0.0, 1.0, 33)[:, None]
        z = jnp.asarray(lo + s * (hi - lo), jnp.float32)
        target = g.target(z)
        if g.operator:
            # The constraint is operator(u) = target on the group set, so
            # the ansatz u = lift + bubble*N must satisfy it via
            # operator(lift) = target and operator(bubble*N) = 0 for ANY N
            # (e.g. wave_1d's velocity IC u_t: a t-independent lift plus a
            # t^2 bubble, problems/__init__.py HARD_BC docstring).
            op = pde.compile_pde(g.operator, problem.coords)
            got = op.residual(lift, z)
            assert float(jnp.max(jnp.abs(got - target))) < 1e-4, (name, g)
            ann = op.residual(lambda zz: bubble(zz) * smooth_net(zz), z)
            assert float(jnp.max(jnp.abs(ann))) < 1e-4, (name, g)
        else:
            assert float(jnp.max(jnp.abs(lift(z) - target))) < 1e-5, (name, g)
        assert float(jnp.max(jnp.abs(bubble(z)))) < 1e-6, (name, g)


def test_with_hard_bc_requires_recipe():
    import dataclasses

    fake = dataclasses.replace(problems.poisson_1d(), name="nope")
    with pytest.raises(KeyError):
        problems.with_hard_bc(fake)
