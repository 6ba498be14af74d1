"""Dash frontend wiring, driven against the in-process dash double.

The reference IS a dash app (layout.py:67-583 + callbacks/*); dash is not
installed in this image, so these tests exercise tpinn.app.dash_app against
tests/dash_double.py: layout composition, equation validation, BC groups,
toggle_all input gating (training.py:121-267), two-row tab exclusivity
(result_graph.py:102-118), and the payload→figure builders.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import dash_double  # noqa: E402


@pytest.fixture()
def app(monkeypatch, tmp_path):
    dash = dash_double.install(monkeypatch)
    from tpinn.app import dash_app

    return dash_app.create_app(data_root=str(tmp_path)), dash, dash_app


def _field_values():
    # all 17 static fields non-empty (order = dash_app.FIELD_KEYS)
    return [0.1, 1.0, 0.0, 1.0, 1.0, 1.0, 3000, 1000, 1000, 60, 6, 111, 111,
            1000, 1000, 0.05, 0.0]


def test_layout_contains_reference_components(app):
    application, dash, dash_app = app
    ids = {c.id for c in dash_double.walk(application.layout)
           if isinstance(c.id, str)}
    expected = {
        "session-id", "input-equation", "equation-tooltip", "bd-groups",
        "btn-add-bd", "btn-del-bd", "btn-start-training", "result-tabs-1",
        "result-tabs-2", "result-graph", "training-log", "log-interval",
        "fig-interval", "graph-subtitle",
    } | {f"input-{k}" for k in dash_app.FIELD_KEYS}
    missing = expected - ids
    assert not missing, f"layout missing: {missing}"
    # grammar tooltip text present (layout.py:114-121 parity)
    tips = [c for c in dash_double.walk(application.layout)
            if c.id == "equation-tooltip"]
    assert "u_rr" in str(tips[0].children) or "u_" in str(tips[0].children)
    # clientside autoscroll registered (layout.py:570-582 parity)
    assert any("scrollTop" in js for js, _ in application.clientside)


def test_equation_validation_callback(app):
    application, dash, _ = app
    cb = application.find("on_equation_change")["fn"]
    assert cb("u_rr + 1/r*u_r", "") is False      # valid -> not invalid
    assert cb("u_q + ", "") is True                # invalid -> invalid flag
    # declared unknowns (UI inverse mode) are admitted by the grammar
    assert cb("u_t - lam*u_xx", "") is True
    assert cb("u_t - lam*u_xx", "lam=0.5") is False


def test_bd_group_add_del(app):
    application, dash, dash_app = app
    cb = application.find("update_bd_groups")["fn"]
    children = [dash_app.make_bd_group(1)]
    dash.callback_context.triggered_id = "btn-add-bd"
    children = cb(1, 0, children)
    assert len(children) == 2
    dash.callback_context.triggered_id = "btn-del-bd"
    children = cb(1, 1, children)
    assert len(children) == 1
    children = cb(1, 2, children)   # min 1 group, as bd_groups.py:16-26
    assert len(children) == 1


def test_toggle_all_gating(app):
    application, dash, _ = app
    cb = application.find("toggle_all")["fn"]
    bd = [[0.1], [0.1], [0.0], [1.0], [1.0]]

    # idle + everything filled + valid equation -> only Start enabled
    out = cb(0, "u_rr + u_tt", "sess", *bd, *_field_values(), "")
    *gates, start_disabled = out
    assert start_disabled is False
    flat = []
    for g in gates:
        flat.extend(g if isinstance(g, list) else [g])
    assert not any(flat), "inputs must be enabled while idle"

    # one empty field -> Start disabled
    fields = _field_values()
    fields[3] = ""
    out = cb(0, "u_rr + u_tt", "sess", *bd, *fields, "")
    assert out[-1] is True

    # invalid equation -> Start disabled
    out = cb(0, "u_q +", "sess", *bd, *_field_values(), "")
    assert out[-1] is True

    # empty BC value -> Start disabled
    bd_bad = [[0.1], [None], [0.0], [1.0], [1.0]]
    out = cb(0, "u_rr + u_tt", "sess", *bd_bad, *_field_values(), "")
    assert out[-1] is True


def test_toggle_all_disables_everything_while_running(app, monkeypatch):
    application, dash, dash_app = app
    cb = application.find("toggle_all")["fn"]
    # make the manager report a running session
    import tpinn.app.dash_app as mod

    bd = [[0.1], [0.1], [0.0], [1.0], [1.0]]
    # reach into the closure's manager via the callback's globals is brittle;
    # instead patch SessionManager.status on the class
    from tpinn.app.controller import SessionManager

    monkeypatch.setattr(SessionManager, "status",
                        lambda self, s: {"status": "running", "log": ""})
    out = cb(0, "u_rr + u_tt", "sess", *bd, *_field_values(), "")
    *gates, start_disabled = out
    assert start_disabled is True
    flat = []
    for g in gates:
        flat.extend(g if isinstance(g, list) else [g])
    assert all(flat), "all inputs must be disabled while training runs"


def test_two_row_tab_exclusivity(app, tmp_path):
    application, dash, _ = app
    cb = application.find("update_result_graph")["fn"]

    dash.callback_context.triggered_id = "result-tabs-2"
    fig, subtitle, tab1, tab2 = cb("loss_1", "loss_2", 0, "sess")
    assert tab1 is None and tab2 == "loss_2"
    assert subtitle == "Loss 2"

    dash.callback_context.triggered_id = "result-tabs-1"
    fig, subtitle, tab1, tab2 = cb("error_1", None, 0, "sess")
    assert tab1 == "error_1" and tab2 is None

    # untrained session -> placeholder figure with a message annotation
    assert fig.annotations, "missing-artifact placeholder expected"


def test_payload_to_figure_types(app):
    _, dash, dash_app = app
    f = dash_app.payload_to_figure({"type": "missing", "message": "nope"})
    assert f.annotations[0]["text"] == "nope"
    f = dash_app.payload_to_figure(
        {"type": "heatmap", "x": [0, 1], "y": [0, 1],
         "z": [[0, 1], [1, 0]], "xlim": [0, 1], "ylim": [0, 1]}
    )
    assert f.data and f.layout["xaxis"]["range"] == [0, 1]
    f = dash_app.payload_to_figure(
        {"type": "lines_log",
         "series": [{"name": "loss", "y": [1.0, 0.1]}]}
    )
    assert f.layout["yaxes"]["type"] == "log"


def test_build_options_and_declared_params(app):
    _, _, dash_app = app
    assert dash_app._declared_params("lam=0.5, k=2") == ("lam", "k")
    assert dash_app._declared_params("") == ()
    assert dash_app._declared_params("garbage") == ()
    opts = dash_app._build_options("auto", "full", " lam=0.5 ", "heat_2d")
    assert opts == {"lsq_polish": "auto", "deflation": "full",
                    "inverse_params": "lam=0.5", "oracle": "heat_2d"}
    # oracle without inverse params is dropped (meaningless alone)
    assert dash_app._build_options("off", "off", "", "heat_2d") == {
        "lsq_polish": "off", "deflation": "off"}
