"""Golden figure-payload fixtures (VERDICT r3 next-#7).

Real dash / a real browser cannot run in this image, so the figure-payload
CONTRACT is frozen instead: committed tiny-run artifacts
(``tests/goldens/artifacts/``) → ``figure_data.figure_payload`` for every
one of the 11 tabs (result_graph.py:62-87 map) must reproduce the committed
structural goldens (``tests/goldens/payloads.json``) exactly — field names,
types, shapes, and 6-significant-digit numeric summaries.  Any drift in the
loaders, the upsampling semantics, or the payload schema fails here before
it can silently break either frontend.

The dash converter half of the contract is covered too: every golden
payload must build a plotly figure under the double with the trace
structure its type promises.

Regenerate after an INTENTIONAL contract change with
``python scripts/make_goldens.py`` (and say why in the commit).
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import dash_double  # noqa: E402

GOLDDIR = Path(__file__).resolve().parent / "goldens"
ARTIFACTS = GOLDDIR / "artifacts"


def _goldens():
    return json.loads((GOLDDIR / "payloads.json").read_text())


def test_all_eleven_tabs_have_goldens():
    from tpinn.app import figure_data

    assert sorted(_goldens()) == sorted(figure_data.FIGURES)
    assert len(figure_data.FIGURES) == 11


@pytest.mark.parametrize("tab", sorted(json.loads(
    (GOLDDIR / "payloads.json").read_text())))
def test_payload_matches_golden(tab):
    from make_goldens import summarize_dict
    from tpinn.app import figure_data

    payload = figure_data.figure_payload(ARTIFACTS, tab)
    assert payload["type"] != "missing", payload
    assert summarize_dict(payload) == _goldens()[tab]


def test_missing_artifact_placeholder():
    from tpinn.app import figure_data

    out = figure_data.figure_payload(ARTIFACTS, "nope")
    assert out["type"] == "missing"
    out = figure_data.figure_payload("/nonexistent-dir", "loss_1")
    assert out["type"] == "missing"
    assert "not yet been generated" in out["message"]


_EXPECTED_TRACES = {
    "heatmap": ["heatmap"],
    "heatmap_scatter": ["heatmap", "scatter"],
    "dual_heatmap": ["heatmap", "heatmap"],
    "lines_log": ["scatter", "scatter", "scatter"],
    "lines_log_pair": ["scatter", "scatter"],
}


def test_every_golden_payload_builds_a_dash_figure(monkeypatch):
    dash_double.install(monkeypatch)
    from tpinn.app import dash_app, figure_data

    for tab in sorted(figure_data.FIGURES):
        payload = figure_data.figure_payload(ARTIFACTS, tab)
        fig = dash_app.payload_to_figure(payload)
        kinds = [type(t).__name__.lower() for t in fig.data]
        assert kinds == _EXPECTED_TRACES[payload["type"]], (tab, kinds)
