"""Print REPORT-ready markdown rows for accuracy runs.

Usage: python scripts/acc_rows.py [tag ...]     (default: every out/acc/*.json)

Each row: tag | problem | rel_l2 (pre-correction -> final when the
checkpoint meta carries rel_l2_before) | wall | backend/fell_back.
"""
import glob
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def correction_pair(tag, rec):
    """(before, kind) from the run's final-stage checkpoint meta, if any."""
    art = ROOT / "out" / "acc" / f"{tag}_artifacts"
    cands = sorted(art.glob("params_stage_*.npz"), reverse=True)
    if not cands:
        return None, None
    try:
        import numpy as np

        raw = np.load(cands[0])
        if "__meta__" not in raw:
            return None, None
        meta = json.loads(bytes(raw["__meta__"]).decode())
        d = meta.get("deflation")
        if not d:
            return None, None
        return d.get("rel_l2_before"), d.get("kind")
    except Exception:
        return None, None


def main():
    tags = sys.argv[1:]
    if not tags:
        tags = sorted(p.stem for p in (ROOT / "out" / "acc").glob("*.json"))
    for tag in tags:
        p = ROOT / "out" / "acc" / f"{tag}.json"
        if not p.exists():
            print(f"| {tag} | — missing |")
            continue
        r = json.loads(p.read_text())
        before, kind = correction_pair(tag, r)
        acc = (f"{before:.2e} → **{r['rel_l2']:.2e}** ({kind})"
               if before else f"**{r['rel_l2']:.2e}**")
        flag = "" if not r.get("fell_back") else " ⚠ fell back"
        print(f"| {tag} | {r['problem']} | {acc} | {r['wall_secs']:.0f}s "
              f"| {r.get('backend', '?')}{flag} |")


if __name__ == "__main__":
    main()
