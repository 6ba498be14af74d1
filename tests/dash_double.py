"""Minimal in-process double of dash / dash_bootstrap_components / plotly.

The image has no dash installed (the reference's actual frontend stack), so
this double implements just enough of the API surface that
``tpinn.app.dash_app`` exercises — component trees, callback registration,
callback_context, pattern-matching ALL, plotly figure objects — to import
the app, walk its layout, and invoke its callbacks from tests.

Install with ``install(monkeypatch)`` (patches sys.modules) before
importing tpinn.app.dash_app.
"""

from __future__ import annotations

import sys
import types


class Component:
    """Generic dash component: records props, children, id."""

    def __init__(self, *children, **props):
        if children and "children" not in props:
            props["children"] = list(children) if len(children) > 1 \
                else children[0]
        self.props = props

    @property
    def id(self):
        return self.props.get("id")

    @property
    def children(self):
        return self.props.get("children")


def _factory(name):
    return type(name, (Component,), {})


class _IOSpec:
    def __init__(self, component_id, component_property):
        self.component_id = component_id
        self.component_property = component_property

    def __repr__(self):
        return f"{type(self).__name__}({self.component_id!r}, " \
               f"{self.component_property!r})"


class Input(_IOSpec):
    pass


class Output(_IOSpec):
    pass


class State(_IOSpec):
    pass


class _All:
    def __repr__(self):
        return "<ALL>"


ALL = _All()


class _CallbackContext:
    triggered_id = None


class DashApp:
    def __init__(self, *args, **kwargs):
        self.layout = None
        self.callbacks = []          # {fn, outputs, inputs, states}
        self.clientside = []

    def callback(self, *specs, **kwargs):
        flat = []
        for s in specs:
            flat.extend(s if isinstance(s, (list, tuple)) else [s])
        outputs = [s for s in flat if isinstance(s, Output)]
        inputs = [s for s in flat if isinstance(s, Input)]
        states = [s for s in flat if isinstance(s, State)]

        def deco(fn):
            self.callbacks.append({
                "fn": fn, "name": fn.__name__, "outputs": outputs,
                "inputs": inputs, "states": states,
            })
            return fn

        return deco

    def clientside_callback(self, js, *specs):
        self.clientside.append((js, specs))

    def find(self, name):
        for cb in self.callbacks:
            if cb["name"] == name:
                return cb
        raise KeyError(name)

    def run(self, *a, **k):  # pragma: no cover
        raise RuntimeError("double cannot serve")


def walk(component):
    """Yield every component in a layout tree."""
    stack = [component]
    while stack:
        node = stack.pop()
        if isinstance(node, Component):
            yield node
            kids = node.children
            if isinstance(kids, (list, tuple)):
                stack.extend(kids)
            elif kids is not None:
                stack.append(kids)


# --------------------------------------------------------------------------
# plotly double
# --------------------------------------------------------------------------


class Figure:
    def __init__(self, data=None):
        if data is None:
            data = []
        self.data = list(data) if isinstance(data, (list, tuple)) else [data]
        self.annotations = []
        self.layout = {}

    def add_annotation(self, **kw):
        self.annotations.append(kw)

    def add_trace(self, trace, **kw):
        self.data.append(trace)

    def update_layout(self, **kw):
        self.layout.update(kw)

    def update_yaxes(self, **kw):
        self.layout.setdefault("yaxes", {}).update(kw)

    def update_xaxes(self, **kw):
        self.layout.setdefault("xaxes", {}).update(kw)


class _Trace:
    def __init__(self, **kw):
        self.props = kw


def _make_modules():
    dash = types.ModuleType("dash")
    dcc = types.ModuleType("dash.dcc")
    html = types.ModuleType("dash.html")
    for name in ("Store", "Tabs", "Tab", "Graph", "Interval", "Loading",
                 "Dropdown"):
        setattr(dcc, name, _factory(name))
    for name in ("Div", "H3", "Pre", "Span", "P", "Label"):
        setattr(html, name, _factory(name))
    dash.Dash = DashApp
    dash.dcc = dcc
    dash.html = html
    dash.Input = Input
    dash.Output = Output
    dash.State = State
    dash.ALL = ALL
    dash.callback_context = _CallbackContext

    dbc = types.ModuleType("dash_bootstrap_components")
    for name in ("Input", "Button", "Tooltip", "Card", "Row", "Col"):
        setattr(dbc, name, _factory("Dbc" + name))
    dbc.themes = types.SimpleNamespace(BOOTSTRAP="bootstrap")

    plotly = types.ModuleType("plotly")
    go = types.ModuleType("plotly.graph_objects")
    go.Figure = Figure
    for name in ("Heatmap", "Scatter", "Contour"):
        setattr(go, name, type(name, (_Trace,), {}))
    subplots = types.ModuleType("plotly.subplots")
    subplots.make_subplots = lambda **kw: Figure()
    plotly.graph_objects = go
    plotly.subplots = subplots

    return {
        "dash": dash, "dash.dcc": dcc, "dash.html": html,
        "dash_bootstrap_components": dbc,
        "plotly": plotly, "plotly.graph_objects": go,
        "plotly.subplots": subplots,
    }


def install(monkeypatch):
    """Patch sys.modules with the double; returns the fake dash module."""
    mods = _make_modules()
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    # tpinn.app.dash_app must re-import against the double
    monkeypatch.delitem(sys.modules, "tpinn.app.dash_app", raising=False)
    return mods["dash"]
