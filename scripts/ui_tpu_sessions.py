"""Drive the lite web UI end-to-end on the REAL backend: one time-marching
session and one inverse-identification session over HTTP (VERDICT-r4 ask
#6 — the composite 11-artifact march set had never been produced by a TPU
run; reference contract: callbacks/training.py:18-119 + result_graph.py).

Boots the lite server in-process on an ephemeral port (the same harness as
tests/test_app.py), POSTs /api/start with the reference request schema
plus the round-4 `options` extensions (march / inverse_params), polls
/api/status, then fetches every figure tab and writes a summary record to
<out>/ui_sessions.json.  Exit 75 (EX_TEMPFAIL) if the backend probe
fails, matching scripts/accuracy.py's queue discipline.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def post(base, path, payload):
    body = json.dumps(payload).encode()
    req = urllib.request.Request(base + path, data=body, method="POST")
    return json.loads(urllib.request.urlopen(req).read())


def get(base, path):
    return json.loads(urllib.request.urlopen(base + path).read())


def wait_done(base, session, timeout):
    deadline = time.time() + timeout
    status = None
    while time.time() < deadline:
        status = get(base, f"/api/status?session={session}")
        if status["status"] in ("done", "error"):
            return status
        time.sleep(2)
    return status


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out/ui_tpu")
    ap.add_argument("--platform", default=None,
                    help="force a platform (default: the real backend)")
    ap.add_argument("--adam", type=int, default=3000)
    ap.add_argument("--lbfgs", type=int, default=1000)
    ap.add_argument("--march", type=int, default=4)
    ap.add_argument("--timeout", type=float, default=2400.0,
                    help="per-session wall timeout (s)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))

    if args.platform != "cpu":
        from tpinn.utils.backendprobe import probe_backend

        if not probe_backend(require="tpu" if not args.platform else None):
            print("backend probe failed; aborting", file=sys.stderr)
            raise SystemExit(75)

    from tpinn.app import lite
    from tpinn.app.controller import SessionManager
    from tpinn.app.figure_data import FIGURES

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    mgr = SessionManager(str(out))
    server = ThreadingHTTPServer(("127.0.0.1", 0), lite.make_handler(mgr))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    summary = {"backend": jax.default_backend(), "sessions": {}}

    common = {
        "scl": 1.0, "epsil": 1.0,
        "sample_points": {"n_col": 4096, "n_bd": 512, "n_add": 1024},
        "network_size": {"depth": 64, "width": 4},   # UI order: ref calls
        "testing_size": {"x": 101, "y": 101},        # depth=width field swap
        "epochs": {"adam": args.adam, "lbfgs": args.lbfgs},
        "equation_weight": {"f": 1.0, "df": 0},
    }

    # ---- session 1: time-marching heat slab (march composite set) ----
    march_req = dict(common)
    march_req.update({
        "session": "march_tpu",
        "equation": "u_t - 0.25*u_xx",
        # IC u(x,0)=sin(pi x) marches through N windows; homogeneous edges
        "boundary": {
            "bd_x1_min": 0.0, "bd_x1_max": 1.0, "bd_y1_min": 0.0,
            "bd_y1_max": 0.0, "bd_u1": "sin(pi*x)",
            "bd_x2_min": 0.0, "bd_x2_max": 0.0, "bd_y2_min": 0.0,
            "bd_y2_max": 1.0, "bd_u2": 0.0,
            "bd_x3_min": 1.0, "bd_x3_max": 1.0, "bd_y3_min": 0.0,
            "bd_y3_max": 1.0, "bd_u3": 0.0,
        },
        "domain": {"x_min": 0.0, "x_max": 1.0, "y_min": 0.0, "y_max": 1.0},
        "options": {"march": args.march},
    })
    r = post(base, "/api/start", march_req)
    assert r.get("ok"), r
    t0 = time.time()
    status = wait_done(base, "march_tpu", args.timeout)
    figs = {name: get(base, f"/api/figure?session=march_tpu&name={name}")
            for name in FIGURES}
    summary["sessions"]["march_tpu"] = {
        "status": status["status"], "error": status.get("error"),
        "wall_secs": round(time.time() - t0, 1),
        "march": args.march,
        "figures": {n: p.get("type") for n, p in figs.items()},
        "log_tail": (status.get("log") or "")[-400:],
    }
    print("march_tpu:", status["status"],
          {n: p.get("type") for n, p in figs.items()})

    # ---- session 2: inverse identification (heat diffusivity) ----
    inv_req = dict(common)
    inv_req.update({
        "session": "inverse_tpu",
        "equation": "u_t - lam*u_xx",
        "boundary": {
            "bd_x1_min": 0.0, "bd_x1_max": 1.0, "bd_y1_min": 0.0,
            "bd_y1_max": 0.0, "bd_u1": "sin(pi*x)",
            "bd_x2_min": 0.0, "bd_x2_max": 0.0, "bd_y2_min": 0.0,
            "bd_y2_max": 1.0, "bd_u2": 0.0,
            "bd_x3_min": 1.0, "bd_x3_max": 1.0, "bd_y3_min": 0.0,
            "bd_y3_max": 1.0, "bd_u3": 0.0,
        },
        "domain": {"x_min": 0.0, "x_max": 1.0, "y_min": 0.0, "y_max": 1.0},
        "options": {"inverse_params": "lam=0.3", "oracle": "heat_2d",
                    "n_obs": 200},
    })
    r = post(base, "/api/start", inv_req)
    assert r.get("ok"), r
    t0 = time.time()
    status = wait_done(base, "inverse_tpu", args.timeout)
    figs = {name: get(base, f"/api/figure?session=inverse_tpu&name={name}")
            for name in FIGURES}
    summary["sessions"]["inverse_tpu"] = {
        "status": status["status"], "error": status.get("error"),
        "wall_secs": round(time.time() - t0, 1),
        "figures": {n: p.get("type") for n, p in figs.items()},
        "log_tail": (status.get("log") or "")[-400:],
    }
    print("inverse_tpu:", status["status"],
          {n: p.get("type") for n, p in figs.items()})

    server.shutdown()
    (out / "ui_sessions.json").write_text(json.dumps(summary, indent=1))
    ok = all(s["status"] == "done"
             for s in summary["sessions"].values())
    print("SUMMARY", "ok" if ok else "FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
