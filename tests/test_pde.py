"""Symbolic PDE compiler: parsing, grammar superset, residual numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import deriv, pde


def u_known(z):
    # u = sin(x) * cos(y)
    return (jnp.sin(z[:, 0:1]) * jnp.cos(z[:, 1:2]))


def test_parse_reference_grammar_superset():
    """Everything the reference validator accepts must parse here
    (input_validation.py:29-50 grammar)."""
    valid = [
        "u_xx + u_yy",
        "u_rr + 1/r*u_r + 1/r**2*u_tt",
        "2*u_x - 0.5*u",
        "(u_x + u_y) * 3.0",
        "u_xx+u_yy-1",
        "x*y*u",
        "u_x/2 + .5*u",
        "3**2 * u_x",
    ]
    for s in valid:
        assert pde.validate_equation(s), s

    # NOTE: unary +/- prefixes (which the reference rejects) are legal here.
    invalid = [
        "u_x+",         # trailing operator
        "u_q",          # unknown coordinate suffix
        "foo + u",
        "u_x + @",
        "(u_x",
    ]
    for s in invalid:
        assert not pde.validate_equation(s), s


def test_reference_valid_but_meaningless_suffixes_rejected():
    """Deliberate tightening vs the reference regex (pde.py module
    docstring): the reference accepts ``u_`` + ANY two lowercase letters
    (input_validation.py:40) because it never interprets the string; the
    compiler must give it meaning, so non-coordinate suffixes are a parse
    error with a precise message."""
    with pytest.raises(pde.PDESyntaxError, match="not one of the coordinates"):
        pde.parse("u_ab + u_x", coords=("x", "y"))
    assert not pde.validate_equation("u_ab + u_x", coords=("x", "y"))


def test_parse_extensions():
    assert pde.validate_equation("u_t + u*u_x - 0.01*u_xx = 0", coords=("x", "t"))
    assert pde.validate_equation("u_xx + sin(pi*x)", coords=("x",))
    assert pde.validate_equation("-u_xx + 2", coords=("x",))  # unary minus


def test_laplacian_residual_matches_manual():
    compiled = pde.compile_pde("u_xx + u_yy", coords=("x", "y"))
    z = jax.random.uniform(jax.random.PRNGKey(0), (40, 2), minval=0.1, maxval=1.0)
    f = compiled.residual(u_known, z)
    # Δ(sin x cos y) = -2 sin x cos y
    np.testing.assert_allclose(f, -2.0 * u_known(z), rtol=1e-4, atol=1e-5)


def test_polar_laplace_matches_reference_hardcoded():
    """The parsed polar Laplacian equals the reference's hardcoded gov_eqn
    residual u_rr + (1/r)u_r + (1/r²)u_θθ (software.py:283-297), evaluated
    here with the reference-style reverse-over-reverse engine as oracle."""
    compiled = pde.compile_pde("u_rr + 1/r*u_r + 1/r**2*u_tt", coords=("r", "t"))
    z = jax.random.uniform(jax.random.PRNGKey(1), (64, 2), minval=0.2, maxval=1.0)

    def f_u(zz):
        return jnp.log(zz[:, 0:1]) / jnp.log(0.1) + 0.01 * jnp.sin(zz[:, 1:2])

    f_parsed = compiled.residual(f_u, z)

    # oracle: reverse-over-reverse as the reference implements it
    ug, _ = deriv.vect_grad_reverse(f_u, z)
    u_r = ug[:, 0:1]
    fu_r = lambda zz: deriv.vect_grad_reverse(f_u, zz)[0][:, 0:1]
    fu_t = lambda zz: deriv.vect_grad_reverse(f_u, zz)[0][:, 1:2]
    u_rr = deriv.vect_grad_reverse(fu_r, z)[0][:, 0:1]
    u_tt = deriv.vect_grad_reverse(fu_t, z)[0][:, 1:2]
    r = z[:, 0:1]
    f_ref = u_rr + 1 / r * u_r + 1 / r**2 * u_tt
    np.testing.assert_allclose(f_parsed, f_ref, rtol=1e-4, atol=1e-5)


def test_mixed_derivative_and_time():
    compiled = pde.compile_pde("u_t + u*u_x - 0.1*u_xx", coords=("x", "t"))
    assert compiled.indices == frozenset({(1,), (), (0,), (0, 0)})
    z = jax.random.uniform(jax.random.PRNGKey(2), (32, 2))

    def u_fn(zz):
        x, t = zz[:, 0:1], zz[:, 1:2]
        return x**2 * t

    f = compiled.residual(u_fn, z)
    x, t = z[:, 0:1], z[:, 1:2]
    expected = x**2 + (x**2 * t) * (2 * x * t) - 0.1 * 2 * t
    np.testing.assert_allclose(f, expected, rtol=1e-4, atol=1e-5)


def test_equation_with_equals_and_source():
    compiled = pde.compile_pde("u_xx = -(pi**2)*sin(pi*x)", coords=("x",))
    z = jnp.linspace(0.05, 0.95, 21)[:, None]
    u_exact = lambda zz: jnp.sin(jnp.pi * zz[:, 0:1])
    f = compiled.residual(u_exact, z)
    np.testing.assert_allclose(f, jnp.zeros_like(f), atol=1e-4)


def test_coord_expr():
    g = pde.compile_coord_expr("sin(pi*x)*2", coords=("x",))
    z = jnp.array([[0.5], [0.25]])
    np.testing.assert_allclose(g(z)[:, 0], [2.0, 2 * np.sin(np.pi / 4)], rtol=1e-6)
    with pytest.raises(pde.PDESyntaxError):
        pde.compile_coord_expr("u_x + 1", coords=("x",))


def test_syntax_errors_informative():
    with pytest.raises(pde.PDESyntaxError):
        pde.parse("u_x + (", coords=("x",))
    with pytest.raises(pde.PDESyntaxError):
        pde.parse("", coords=("x",))
    with pytest.raises(pde.PDESyntaxError):
        pde.parse("a = b = c", coords=("x",))


def test_residual_jittable():
    compiled = pde.compile_pde("u_xx + u_yy + u", coords=("x", "y"))
    fn = jax.jit(lambda z: compiled.residual(u_known, z))
    out = fn(jax.random.uniform(jax.random.PRNGKey(3), (16, 2)))
    assert out.shape == (16, 1)


def test_infer_coords():
    assert pde.infer_coords("u_rr + 1/r*u_r + 1/r**2*u_tt") == ("r", "t")
    assert pde.infer_coords("u_xx + u_yy") == ("x", "y")
    assert pde.infer_coords("u_t + u*u_x - 0.01*u_xx") == ("x", "t")
    assert pde.infer_coords("u_xx + sin(pi*x)") == ("x",)
    assert pde.infer_coords("u_xx + exp(u)") == ("x",)  # 'exp' is not x/p
    with pytest.raises(pde.PDESyntaxError):
        pde.infer_coords("u_rr + u_xx")


def test_random_expression_fuzz_matches_constructed_oracle():
    """Structural fuzz of the compiler: build 60 random residual
    expressions compositionally — each node carries both its string form
    and an independent numpy evaluator — compile the string, and check
    the compiled AST's value on random points and random derivative
    fields against the constructed oracle.  Exercises tokenizer,
    precedence, unary minus, parentheses, function calls, powers, and
    the derivative-suffix → multi-index mapping far beyond the
    hand-written cases.  Also pins is_linear: an equation is flagged
    nonlinear iff a u·u_x-style product term was generated."""
    rng = np.random.default_rng(20260818)
    coords = ("x", "y")
    suffixes = {"u": (), "u_x": (0,), "u_y": (1,), "u_xx": (0, 0),
                "u_yy": (1, 1), "u_xy": (0, 1)}

    def coeff(depth=0):
        """Random coefficient expression -> (string, fn(z)->[n,1])."""
        kind = rng.integers(0, 7 if depth < 2 else 4)
        if kind == 0:
            v = round(float(rng.uniform(-3, 3)), 3)
            # negative literals exercise unary minus at term heads
            return (repr(v), lambda z, v=v: np.full((z.shape[0], 1), v))
        if kind == 1:
            return ("x", lambda z: z[:, 0:1])
        if kind == 2:
            return ("y", lambda z: z[:, 1:2])
        if kind == 3:
            k = int(rng.integers(1, 4))
            f, nf = (("sin", np.sin), ("cos", np.cos),
                     ("exp", np.exp))[rng.integers(0, 3)]
            c = ("x", "y")[rng.integers(0, 2)]
            j = 0 if c == "x" else 1
            if f == "exp":
                return (f"exp({c})", lambda z, j=j: np.exp(z[:, j:j + 1]))
            return (f"{f}({k}*{c})",
                    lambda z, j=j, k=k, nf=nf: nf(k * z[:, j:j + 1]))
        if kind == 4:
            a_s, a_f = coeff(depth + 1)
            b_s, b_f = coeff(depth + 1)
            return (f"({a_s} + {b_s})", lambda z: a_f(z) + b_f(z))
        if kind == 5:
            a_s, a_f = coeff(depth + 1)
            b_s, b_f = coeff(depth + 1)
            return (f"({a_s})*({b_s})", lambda z: a_f(z) * b_f(z))
        a_s, a_f = coeff(depth + 1)
        p = int(rng.integers(2, 4))
        return (f"({a_s})**{p}", lambda z: a_f(z) ** p)

    for trial in range(60):
        n_terms = int(rng.integers(1, 5))
        strs, fns, nonlinear = [], [], False
        names = list(suffixes)
        for t in range(n_terms):
            c_s, c_f = coeff()
            d = names[rng.integers(0, len(names))]
            if t > 0 and rng.uniform() < 0.25:
                # nonlinear transport-style product u * u_d
                d2 = names[rng.integers(1, len(names))]
                strs.append(f"{c_s}*u*{d2}")
                fns.append(lambda z, parts, c_f=c_f, d2=d2:
                           c_f(z) * parts["u"] * parts[d2])
                nonlinear = True
            else:
                strs.append(f"{c_s}*{d}")
                fns.append(lambda z, parts, c_f=c_f, d=d:
                           c_f(z) * parts[d])
        expr = strs[0]
        signs = [1.0]
        for s in strs[1:]:
            neg = rng.uniform() < 0.5
            signs.append(-1.0 if neg else 1.0)
            expr += (" - " if neg else " + ") + s
        compiled = pde.compile_pde(expr, coords)
        assert compiled.is_linear == (not nonlinear), expr

        z = rng.uniform(0.3, 1.7, (64, 2))
        parts_np = {nm: rng.normal(0, 1, (64, 1)) for nm in names}
        want = sum(sg * f(z, parts_np) for sg, f in zip(signs, fns))
        parts_ix = {suffixes[nm]: jnp.asarray(v)
                    for nm, v in parts_np.items()
                    if suffixes[nm] in compiled.indices}
        # compiled.indices may be a subset (unused suffixes dropped)
        for ix in compiled.indices:
            parts_ix.setdefault(ix, jnp.zeros((64, 1)))
        got = np.asarray(compiled.evaluate(jnp.asarray(z), parts_ix))
        assert np.allclose(got, want, rtol=1e-5, atol=1e-6), expr
