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
