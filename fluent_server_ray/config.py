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
import re


def load_routes(path: str) -> list[tuple[str, str]]:
    text = open(path).read()
    if path.endswith(".json"):
        data = json.loads(text)
        return [(r["match"], r["sink"]) for r in data["routes"]]
    return parse_fluentbit_outputs(text)


def fluentbit_match_to_regex(pattern: str) -> str:
    """fluent-bit ``Match`` wildcard → anchored regex.

    fluent-bit's ``*`` matches ANY run of characters (dots included):
    ``Match *`` matches every tag, ``Match a.*`` matches ``a.b.c``.
    That is NOT fluentd glob semantics (where ``*`` is one dotted
    part), so these patterns are translated to raw regexes — which the
    router passes through verbatim (``route.glob_to_regex`` treats a
    leading ``^`` as pre-compiled regex)."""
    return "^" + ".*".join(re.escape(seg) for seg in pattern.split("*")) + "$"


def parse_fluentbit_outputs(text: str) -> list[tuple[str, str]]:
    """Minimal fluent-bit config reader: ordered [OUTPUT] sections with
    ``Match`` and ``Name`` keys (≙ reference contrib/config/A.cfg).
    ``Match`` wildcards keep fluent-bit semantics (``*`` = any chars)
    via :func:`fluentbit_match_to_regex`."""
    routes: list[tuple[str, str]] = []
    section = None
    match = name = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("["):
            if section == "OUTPUT" and match is not None:
                routes.append(
                    (fluentbit_match_to_regex(match),
                     name or f"sink{len(routes)}")
                )
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
        routes.append(
            (fluentbit_match_to_regex(match), name or f"sink{len(routes)}")
        )
    return routes
