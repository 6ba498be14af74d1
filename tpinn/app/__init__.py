"""tpinn.app — web application layer.

Two frontends over one controller:

- ``tpinn.app.lite``  — dependency-free web UI (stdlib http.server +
  vanilla-JS canvas rendering).  Runs anywhere Python runs; this is the
  default in environments without dash/plotly (like this image).
- ``tpinn.app.dash_app`` — a Dash UI preserving the reference's layout,
  callbacks, and figure behavior (pinn_app/layout.py, callbacks/*,
  figures.py); imported lazily and only usable when dash + plotly are
  installed.

Both speak the same artifact contract (11 .npz files per session directory,
SURVEY §2b.13) through ``tpinn.app.controller`` and
``tpinn.app.figure_data``.
"""

from tpinn.app.controller import SessionManager, TrainingRequest  # noqa: F401
