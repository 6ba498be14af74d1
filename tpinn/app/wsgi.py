"""WSGI entry point for production serving of the Dash frontend.

The reference exposes ``server = app.server`` for gunicorn (wsgi.py:19-21).
Same here — requires dash+plotly (see tpinn.app.dash_app); in environments
without them, run the dependency-free UI instead:

    python -m tpinn.app.lite           # stdlib HTTP server
    gunicorn tpinn.app.wsgi:server     # dash, when installed
"""

from tpinn.app.dash_app import create_app

app = create_app()
server = app.server
