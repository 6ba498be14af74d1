"""Serving: checkpoint reload + HTTP prediction round-trip."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpinn.core import net
from tpinn.utils import checkpoint


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    fm = net.feature_map_for(("minmax", "periodic"))
    spec = net.MLPSpec(depth=2, width=16)
    params = net.init_params(jax.random.PRNGKey(0), spec, fm)
    path = tmp / "params_stage_1.npz"
    checkpoint.save_pytree(path, params,
                           meta={"stage": 1, "scl": 1.0, "epsil": 1.0,
                                 "problem": "annulus_laplace"})
    return path, params, spec, fm


def test_server_predict_matches_direct(ckpt_path):
    from tpinn.app.serve import PINNServer

    path, params, spec, fm = ckpt_path
    srv = PINNServer(str(path), "annulus_laplace")
    pts = [[0.5, 0.3], [0.7, 0.9], [0.2, 0.1]]
    u = srv.predict(pts)
    assert len(u) == 3

    predictor = net.make_predictor(spec, fm, jnp.array([0.1, 0.0]),
                                   jnp.array([1.0, 1.0]))
    direct = predictor(params, jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(np.asarray(u), np.asarray(direct)[:, 0],
                               rtol=1e-5, atol=1e-6)

    f = srv.residual(pts)
    assert len(f) == 3 and all(np.isfinite(f))

    with pytest.raises(ValueError):
        srv.predict([[0.5]])


def test_server_two_stage_chain_honors_act_first(tmp_path):
    """A stage-2 checkpoint (nested {"stage","prev"} params + spec chain in
    meta) must serve the composed predictor exactly — including the stage-2
    sin first activation and scl/epsil (the round-1 serve bug: act_first was
    silently dropped, VERDICT weak #5)."""
    from tpinn.app.serve import PINNServer
    from tpinn import problems

    problem = problems.annulus_laplace()
    fm = net.feature_map_for(problem.feature_kinds)
    lb, ub = jnp.asarray(problem.lb), jnp.asarray(problem.ub)
    spec1 = net.MLPSpec(depth=2, width=16)
    spec2 = net.MLPSpec(depth=2, width=12, act_first="sin", scl=7.0,
                        epsil=0.03)
    p1 = net.init_params(jax.random.PRNGKey(0), spec1, fm)
    p2 = net.init_params(jax.random.PRNGKey(1), spec2, fm)
    pred1 = net.make_predictor(spec1, fm, lb, ub)
    pred2 = net.compose_stages(pred1, spec2, fm, lb, ub)
    params = net.compose_params(p2, p1)

    path = tmp_path / "params_stage_2.npz"
    checkpoint.save_pytree(
        path, params,
        meta={"stage": 2, "scl": spec2.scl, "epsil": spec2.epsil,
              "problem": problem.name,
              "chain": [net.spec_to_dict(spec1), net.spec_to_dict(spec2)],
              "feature_kinds": list(problem.feature_kinds),
              "lb": list(problem.lb), "ub": list(problem.ub)},
    )

    srv = PINNServer(str(path), problem.name)
    pts = [[0.5, 0.3], [0.7, 0.9], [0.2, 0.1]]
    u = srv.predict(pts)
    direct = pred2(params, jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(np.asarray(u), np.asarray(direct)[:, 0],
                               rtol=1e-5, atol=1e-6)
    # sanity: with tanh instead of sin in stage 2 the output must differ —
    # i.e. the chain really carries act_first
    spec2_tanh = net.MLPSpec(depth=2, width=12, act_first="tanh", scl=7.0,
                             epsil=0.03)
    pred2_tanh = net.compose_stages(pred1, spec2_tanh, fm, lb, ub)
    wrong = pred2_tanh(params, jnp.asarray(pts, jnp.float32))
    assert not np.allclose(np.asarray(u), np.asarray(wrong)[:, 0])


def test_server_http(ckpt_path):
    from tpinn.app.serve import PINNServer, make_handler

    path, *_ = ckpt_path
    srv = PINNServer(str(path), "annulus_laplace")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        h = json.loads(urllib.request.urlopen(base + "/health").read())
        assert h["ok"] and h["problem"] == "annulus_laplace"
        body = json.dumps({"points": [[0.5, 0.5]]}).encode()
        r = json.loads(urllib.request.urlopen(
            urllib.request.Request(base + "/predict", data=body,
                                   method="POST")).read())
        assert len(r["u"]) == 1
        r = json.loads(urllib.request.urlopen(
            urllib.request.Request(base + "/residual", data=body,
                                   method="POST")).read())
        assert len(r["f"]) == 1
    finally:
        httpd.shutdown()


def test_server_hard_bc_chain(tmp_path):
    """A hard-BC checkpoint (meta hard_bc/coords/pad_features) serves with
    machine-exact boundary values regardless of the net's weights."""
    from tpinn.app.serve import PINNServer

    fm = net.feature_map_for(("minmax", "periodic"), pad_to=3)
    spec = net.MLPSpec(depth=2, width=12)
    params = net.init_params(jax.random.PRNGKey(3), spec, fm)
    path = tmp_path / "params_stage_1.npz"
    checkpoint.save_pytree(
        path, params,
        meta={"stage": 1, "scl": 1.0, "epsil": 1.0,
              "problem": "annulus_laplace",
              "chain": [net.spec_to_dict(spec)],
              "feature_kinds": ["minmax", "periodic"],
              "lb": [0.1, 0.0], "ub": [1.0, 6.283185307179586],
              "coords": ["r", "t"], "pad_features": 3,
              "hard_bc": ["(1 - r)/0.9", "(r - 0.1)*(1 - r)"]},
    )
    srv = PINNServer(str(path), "annulus_laplace")
    u = srv.predict([[0.1, 0.5], [1.0, 2.5], [0.55, 1.0]])
    assert abs(u[0] - 1.0) < 1e-6
    assert abs(u[1]) < 1e-6
    # interior point differs from the lift (the net contributes)
    assert abs(u[2] - (1 - 0.55) / 0.9) > 1e-6
    # residual endpoint works through the wrapped predictor
    f = srv.residual([[0.55, 1.0]])
    assert np.isfinite(f[0])


def test_server_rebuilds_deflation_term(tmp_path):
    """A checkpoint carrying a deflation correction (galerkin kind, the
    round-3 Newton–Galerkin path) must serve the CORRECTED predictor:
    u_served = u_raw − T(z), with T rebuilt from the JSON meta alone."""
    from tpinn.app.serve import PINNServer
    from tpinn.core import polish

    fm = net.feature_map_for(("minmax", "periodic"))
    spec = net.MLPSpec(depth=2, width=16)
    params = net.init_params(jax.random.PRNGKey(1), spec, fm)
    two_pi = float(2 * np.pi)
    defl = {"kind": "galerkin",
            "modes": [[["sin", 1], ["one", 0]],
                      [["sin", 2], ["pcos", 1]],
                      [["sin", 1], ["psin", 2]]],
            "coeffs": [3e-4, -2e-4, 1e-4],
            "linearized": False,
            "lb": [0.1, 0.0], "ub": [1.0, two_pi]}
    path = tmp_path / "params_stage_1.npz"
    checkpoint.save_pytree(
        path, params,
        meta={"stage": 1, "scl": 1.0, "epsil": 1.0,
              "problem": "annulus_laplace",
              "chain": [net.spec_to_dict(spec)],
              "deflation": defl})

    srv = PINNServer(str(path), "annulus_laplace")
    pts = np.array([[0.5, 0.3], [0.7, 4.9], [0.2, 1.1]], np.float32)
    served = np.asarray(srv.predict(pts.tolist()))

    predictor = net.make_predictor(spec, fm, jnp.array([0.1, 0.0]),
                                   jnp.array([1.0, two_pi]))
    raw = np.asarray(predictor(params, jnp.asarray(pts)))[:, 0]
    term = np.asarray(polish.deflation_term(defl)(jnp.asarray(pts)))[:, 0]
    np.testing.assert_allclose(served, raw - term, rtol=1e-5, atol=1e-7)
    assert np.abs(term).max() > 1e-5   # the term is actually non-trivial


def test_server_retroactive_deflate_noop_on_random_net(ckpt_path):
    """serve(deflate='full') on a checkpoint with no stored correction and
    an untrained net: the guards reject every family (residual not
    absorbable), the server logs the no-op and serves the raw predictor."""
    from tpinn.app.serve import PINNServer

    path, params, spec, fm = ckpt_path
    raw_srv = PINNServer(str(path), "annulus_laplace")
    srv = PINNServer(str(path), "annulus_laplace", deflate="full")
    pts = [[0.5, 0.3], [0.7, 0.9]]
    a = np.asarray(raw_srv.predict(pts))
    b = np.asarray(srv.predict(pts))
    # either no correction applied (identical) or a guarded tiny one —
    # for a random net the guards must reject, so exact equality
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
