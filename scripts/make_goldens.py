"""Regenerate the committed golden figure-payload fixtures.

Freezes the figure-payload CONTRACT (tab → {type, fields, shapes, numeric
summaries}) against the committed tiny-run artifacts in
``tests/goldens/artifacts/`` so the loaders (tpinn/app/figure_data.py) and
the frontends' converters cannot drift while real-dash / real-browser
verification stays environment-blocked (VERDICT r3 next-#7).

The artifacts were produced by one deterministic tiny CPU training
(annulus_laplace, 2 stages, seed defaults — the /verify recipe) and are
committed, so the goldens are stable regardless of who reruns training.

Usage:  python scripts/make_goldens.py        # rewrites payloads.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

ARTIFACTS = ROOT / "tests" / "goldens" / "artifacts"
GOLDEN = ROOT / "tests" / "goldens" / "payloads.json"


def _sig(v, digits=6):
    """Round to `digits` significant figures: payload floats are f32-exact
    in JSON, but the golden stores a readable summary."""
    return float(f"{float(v):.{digits}g}")


def summarize(value):
    """Structural + numeric summary of one payload field."""
    if isinstance(value, str):
        return {"kind": "str", "value": value}
    if isinstance(value, (int, float)):
        return {"kind": "scalar", "value": _sig(value)}
    if isinstance(value, list):
        if value and isinstance(value[0], dict):       # series list
            return {"kind": "records", "len": len(value),
                    "items": [summarize_dict(v) for v in value]}
        if value and isinstance(value[0], str):        # e.g. titles
            return {"kind": "strlist", "value": list(value)}
        import numpy as np

        a = np.asarray(value, dtype=np.float64)
        return {
            "kind": "array", "shape": list(a.shape),
            "min": _sig(a.min()), "max": _sig(a.max()),
            "first": _sig(a.ravel()[0]), "last": _sig(a.ravel()[-1]),
        }
    if isinstance(value, dict):
        return summarize_dict(value)
    return {"kind": type(value).__name__}


def summarize_dict(d):
    return {k: summarize(d[k]) for k in sorted(d)}


def main():
    from tpinn.app import figure_data

    goldens = {}
    for tab in sorted(figure_data.FIGURES):
        payload = figure_data.figure_payload(ARTIFACTS, tab)
        assert payload["type"] != "missing", (tab, payload)
        goldens[tab] = summarize_dict(payload)
    GOLDEN.write_text(json.dumps(goldens, indent=1, sort_keys=True) + "\n")
    print(f"wrote {GOLDEN} ({GOLDEN.stat().st_size} bytes, "
          f"{len(goldens)} tabs)")


if __name__ == "__main__":
    main()
