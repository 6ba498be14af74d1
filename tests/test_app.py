"""App layer: controller lifecycle, figure payloads, lite HTTP round-trip."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from tpinn.app import SessionManager, TrainingRequest
from tpinn.app.figure_data import FIGURES, figure_payload
from tpinn.utils import artifacts


def _tiny_request(**over):
    base = dict(
        equation="u_rr + 1/r*u_r + 1/r**2*u_tt",
        boundary={
            "bd_x1_min": 0.1, "bd_x1_max": 0.1, "bd_y1_min": 0,
            "bd_y1_max": 1, "bd_u1": 1,
            "bd_x2_min": 1, "bd_x2_max": 1, "bd_y2_min": 0,
            "bd_y2_max": 1, "bd_u2": 0,
        },
        domain={"x_min": 0.1, "x_max": 1, "y_min": 0, "y_max": 1},
        sample_points={"n_col": 120, "n_bd": 30, "n_add": 30},
        network_size={"depth": 16, "width": 2},
        testing_size={"x": 31, "y": 31},
        epochs={"adam": 25, "lbfgs": 12},
    )
    base.update(over)
    return TrainingRequest(**base)


def test_request_validation():
    assert _tiny_request().validate() is None
    assert "parse" in _tiny_request(equation="u_x ++").validate()
    bad_dom = _tiny_request(domain={"x_min": 1, "x_max": 0.1,
                                    "y_min": 0, "y_max": 1})
    assert "x_max" in bad_dom.validate()
    missing = _tiny_request(boundary={"bd_x1_min": 0.1})
    assert missing.validate() is not None


@pytest.mark.slow
def test_controller_runs_training(tmp_path):
    mgr = SessionManager(str(tmp_path))
    sid = mgr.new_session_id()
    err = mgr.start(sid, _tiny_request())
    assert err is None
    # double-start rejected while running
    if mgr.get(sid).status == "running":
        assert mgr.start(sid, _tiny_request()) is not None
    mgr.get(sid).thread.join(timeout=600)
    st = mgr.status(sid)
    assert st["status"] == "done", st["error"]
    assert "training finished" in st["log"]
    assert (tmp_path / sid / "loss_2.npz").exists()

    # every figure tab produces a payload from the finished artifacts
    for name in FIGURES:
        payload = figure_payload(tmp_path / sid, name)
        assert payload["type"] != "missing", name


def test_controller_surfaces_errors(tmp_path):
    mgr = SessionManager(str(tmp_path))
    sid = mgr.new_session_id()
    # domain that breaks the polar equation (r=0 → division blows up) is not
    # an error; instead force an exception via an equation referencing an
    # unknown coordinate at *training* time is impossible (validated), so
    # use an unsatisfiable network size instead:
    req = _tiny_request(network_size={"depth": 0, "width": 0})
    err = mgr.start(sid, req)
    if err is None:
        mgr.get(sid).thread.join(timeout=120)
        st = mgr.status(sid)
        assert st["status"] in ("error", "done")
        if st["status"] == "error":
            assert "TRAINING FAILED" in st["log"]


def test_figure_missing_placeholder(tmp_path):
    payload = figure_payload(tmp_path, "loss_1")
    assert payload["type"] == "missing"
    payload = figure_payload(tmp_path, "nope")
    assert payload["type"] == "missing"


def test_figure_payload_shapes(tmp_path):
    artifacts.write_loss(tmp_path / "loss_1.npz",
                         np.abs(np.random.randn(50, 6)) + 1e-3)
    p = figure_payload(tmp_path, "loss_1")
    assert p["type"] == "lines_log"
    assert len(p["series"]) == 3
    assert len(p["series"][0]["y"]) == 50

    artifacts.write_spectrum(tmp_path / "frequency_spectrum.npz",
                             np.linspace(-5, 5, 21), np.linspace(-5, 5, 21),
                             np.random.rand(21, 21))
    p = figure_payload(tmp_path, "spectrum")
    assert p["type"] == "heatmap" and p["xlim"] == [0, 5]

    artifacts.write_collocation(tmp_path / "collocation_point_1.npz",
                                np.ones((11, 11)), np.random.rand(40, 2),
                                [0, 1, 0, 1])
    p = figure_payload(tmp_path, "colloc_1")
    assert p["type"] == "heatmap_scatter" and len(p["points_x"]) == 40


@pytest.mark.slow
def test_lite_http_roundtrip(tmp_path):
    """Boot the lite server on an ephemeral port; validate + start + poll
    through real HTTP."""
    from tpinn.app import lite

    mgr = SessionManager(str(tmp_path))
    server = ThreadingHTTPServer(("127.0.0.1", 0), lite.make_handler(mgr))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"

        html = urllib.request.urlopen(base + "/").read().decode()
        assert "tpinn" in html and "Start Training" in html

        v = json.loads(urllib.request.urlopen(
            base + "/api/validate?eq=u_rr%2Bu_tt").read())
        assert v["valid"] is True
        v = json.loads(urllib.request.urlopen(
            base + "/api/validate?eq=u_rr%2B%2B").read())
        assert v["valid"] is False

        req = _tiny_request()
        body = json.dumps({
            "session": "testsess",
            "equation": req.equation, "boundary": req.boundary,
            "domain": req.domain, "scl": 1.0, "epsil": 1.0,
            "sample_points": req.sample_points,
            "network_size": req.network_size,
            "testing_size": req.testing_size, "epochs": req.epochs,
            "equation_weight": req.equation_weight,
        }).encode()
        r = json.loads(urllib.request.urlopen(
            urllib.request.Request(base + "/api/start", data=body,
                                   method="POST")).read())
        assert r.get("ok") is True

        deadline = time.time() + 600
        status = None
        while time.time() < deadline:
            status = json.loads(urllib.request.urlopen(
                base + f"/api/status?session=testsess").read())
            if status["status"] in ("done", "error"):
                break
            time.sleep(1)
        assert status["status"] == "done", status

        fig = json.loads(urllib.request.urlopen(
            base + "/api/figure?session=testsess&name=solution_1").read())
        assert fig["type"] == "dual_heatmap"
    finally:
        server.shutdown()


def test_dash_app_gated():
    """Without dash installed, the dash frontend raises a clear error."""
    import importlib
    spec = importlib.util.find_spec("dash")
    from tpinn.app import dash_app
    if spec is None:
        with pytest.raises(ImportError, match="lite"):
            dash_app.create_app()
    else:  # pragma: no cover
        app = dash_app.create_app()
        assert app is not None


@pytest.mark.slow
def test_cartesian_equation_through_ui_schema(tmp_path):
    """A user typing a cartesian equation gets cartesian coords/features —
    the reference would silently solve its hardcoded polar problem."""
    mgr = SessionManager(str(tmp_path))
    sid = mgr.new_session_id()
    req = _tiny_request(
        equation="u_xx + u_yy + 2*3.14159**2*sin(3.14159*x)*sin(3.14159*y)",
        boundary={
            "bd_x1_min": 0, "bd_x1_max": 0, "bd_y1_min": 0, "bd_y1_max": 1,
            "bd_u1": 0,
            "bd_x2_min": 1, "bd_x2_max": 1, "bd_y2_min": 0, "bd_y2_max": 1,
            "bd_u2": 0,
        },
        domain={"x_min": 0, "x_max": 1, "y_min": 0, "y_max": 1},
    )
    err = mgr.start(sid, req)
    assert err is None
    mgr.get(sid).thread.join(timeout=600)
    st = mgr.status(sid)
    assert st["status"] == "done", (st["error"], st["log"][-800:])
    # no analytic oracle for a custom equation -> no error artifact,
    # but solution/loss artifacts exist
    assert (tmp_path / sid / "solution_residual_2.npz").exists()
    assert not (tmp_path / sid / "error_1.npz").exists()


def test_preset_payloads():
    from tpinn.app.presets import preset_names, preset_payload
    names = preset_names()
    assert "heat_2d" in names and "convection_1d" in names
    assert "burgers_shock" in names
    assert "allen_cahn" in names
    # CLI-only exclusions: operator-BC presets (wave_1d's u_t velocity
    # IC), value_fn-only BCs (kdv_1d's exact edge traces), masked domains
    assert "wave_1d" not in names and "kdv_1d" not in names
    assert len(names) == 9
    p = preset_payload("heat_2d")
    assert p["equation"] == "u_t - u_xx"
    assert p["bcs"][0]["u"] == "sin(pi*x)"      # expression-valued IC
    p = preset_payload("burgers_1d")
    assert " = " in p["equation"]               # source folded via lhs=rhs
    p = preset_payload("poisson_1d")
    assert p["domain"]["y_min"] == 0.0          # 1-D lifted to (x, t)
    # recipe autofill: reference's swapped network_size keys (units in
    # "depth"), counts/epochs from the gate-meeting stage-1 spec
    t = p["train"]
    assert t["depth"] == 50 and t["width"] == 5
    assert t["adam"] == 6000 and t["n_col"] == 8000
    assert "recipe" in t["note"].lower() or "--recipe" in t["note"]


@pytest.mark.slow
def test_expression_bc_through_ui_schema(tmp_path):
    """heat equation with sin(pi*x) initial condition typed into the u box."""
    mgr = SessionManager(str(tmp_path))
    sid = mgr.new_session_id()
    req = _tiny_request(
        equation="u_t - u_xx",
        boundary={
            "bd_x1_min": 0, "bd_x1_max": 1, "bd_y1_min": 0, "bd_y1_max": 0,
            "bd_u1": "sin(pi*x)",
            "bd_x2_min": 0, "bd_x2_max": 0, "bd_y2_min": 0, "bd_y2_max": 1,
            "bd_u2": 0,
            "bd_x3_min": 1, "bd_x3_max": 1, "bd_y3_min": 0, "bd_y3_max": 1,
            "bd_u3": 0,
        },
        domain={"x_min": 0, "x_max": 1, "y_min": 0, "y_max": 1},
    )
    assert req.validate() is None
    # bad expression rejected
    bad = _tiny_request(boundary={**req.boundary, "bd_u1": "sin(pi*u)"})
    assert "must not reference u" in bad.validate()

    err = mgr.start(sid, req)
    assert err is None
    mgr.get(sid).thread.join(timeout=600)
    st = mgr.status(sid)
    assert st["status"] == "done", (st["error"], st["log"][-800:])


def test_training_request_options_whitelist():
    """Round-3 advanced options: whitelisted keys validate; junk rejects."""
    from tpinn.app.controller import TrainingRequest

    base = dict(
        equation="u_xx + u_yy",
        boundary={"bd_x1_min": 0.0, "bd_x1_max": 0.0, "bd_y1_min": 0.0,
                  "bd_y1_max": 1.0, "bd_u1": 0.0},
        domain={"x_min": 0.0, "x_max": 1.0, "y_min": 0.0, "y_max": 1.0},
    )
    ok = TrainingRequest(**base, options={"deflation": "full",
                                          "lsq_polish": "auto",
                                          "lbfgs_rounds": 3})
    assert ok.validate() is None
    bad_val = TrainingRequest(**base, options={"deflation": "sometimes"})
    assert "deflation" in bad_val.validate()
    bad_key = TrainingRequest(**base, options={"rm_rf": "/"})
    assert "unknown option" in bad_key.validate()
    bad_num = TrainingRequest(**base, options={"lr_min": "tiny"})
    assert "numeric" in bad_num.validate()


def test_solution_figure_real_axes_both_key_spellings(tmp_path):
    """load_solution_residual uses the artifact's REAL axes under both the
    stage-1 ('t_vec') and stage-2 ('t') key spellings (reference key
    drift, artifacts.write_solution_residual); files without axes fall
    back to the reference's hardcoded annulus window."""
    import numpy as np

    from tpinn.app.figure_data import load_solution_residual
    from tpinn.utils import artifacts

    r = np.linspace(0.0, 1.0, 8)
    t = np.linspace(0.0, 0.5, 8)
    U = np.random.RandomState(0).rand(8, 8)
    for stage in (1, 2):
        path = tmp_path / f"solution_residual_{stage}.npz"
        artifacts.write_solution_residual(path, r, t, U, U, stage)
        d = load_solution_residual(path)
        assert d["x"][0] == 0.0 and abs(d["x"][-1] - 1.0) < 1e-9
        assert d["y"][0] == 0.0 and abs(d["y"][-1] - 0.5) < 1e-9
    # legacy file without axes: reference hardcodes r in [0.1,1], t in [0,2pi]
    legacy = tmp_path / "legacy.npz"
    np.savez(legacy, U=U, F=U)
    d = load_solution_residual(legacy)
    assert abs(d["x"][0] - 0.1) < 1e-9
    assert abs(d["y"][-1] - 2 * np.pi) < 1e-9
