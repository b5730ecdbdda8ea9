"""Config loading: route tables and pipeline options.

The reference configures itself from env vars (``main.go:21-53``:
``LISTEN``, ``SHARED_KEY``, ``MIRROR_LISTEN``) and its clients declare
routing as fluent-bit ``[OUTPUT] Match <pattern>`` blocks
(``contrib/config/A.cfg``). Here the same surface is a small config
file (JSON, or fluent-bit-style INI) describing the ordered match
table and sink names.

JSON form::

    {"routes": [{"match": "err.**", "sink": "errors"},
                {"match": "**",     "sink": "catchall"}]}

fluent-bit-style INI form (order preserved)::

    [OUTPUT]
        Match err.**
        Name  errors
    [OUTPUT]
        Match **
        Name  catchall
"""

from __future__ import annotations

import json


def load_routes(path: str) -> list[tuple[str, str]]:
    text = open(path).read()
    if path.endswith(".json"):
        data = json.loads(text)
        return [(r["match"], r["sink"]) for r in data["routes"]]
    return parse_fluentbit_outputs(text)


def parse_fluentbit_outputs(text: str) -> list[tuple[str, str]]:
    """Minimal fluent-bit config reader: ordered [OUTPUT] sections with
    ``Match`` and ``Name`` keys (≙ reference contrib/config/A.cfg)."""
    routes: list[tuple[str, str]] = []
    section = None
    match = name = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("["):
            if section == "OUTPUT" and match is not None:
                routes.append((match, name or f"sink{len(routes)}"))
            section = line.strip("[]").upper()
            match = name = None
            continue
        if section == "OUTPUT":
            parts = line.split(None, 1)
            if len(parts) == 2:
                key, val = parts[0].lower(), parts[1].strip()
                if key == "match":
                    match = val
                elif key == "name":
                    name = val
    if section == "OUTPUT" and match is not None:
        routes.append((match, name or f"sink{len(routes)}"))
    return routes
