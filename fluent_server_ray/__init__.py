"""fluent_server_ray — a Ray-Data-native log/telemetry pipeline engine.

A from-scratch, Ray-Data-first reimplementation of the data-processing
capabilities of the ``athoune/fluent-server`` reference (a fluentd
forward-protocol server): tag-based parse → enrich → route → aggregate
over Parquet transcript tables, expressed as ``ray.data.Dataset``
pipelines (``map_batches`` over zero-copy Arrow batches, actor pools for
stateful stages, ``groupby``/``sort`` for the wide steps).

The reference's event model — ``(tag, timestamp, record)`` triples
(reference ``message/message.go:11-15``) — maps to one logical table of
transcript turns ``(conv_id, turn_idx, role, text, tool, ts)``; the
``tag`` is derived by parsing, mirroring how fluent-bit assigns tags
client-side (reference ``contrib/config/A.cfg``).

Nothing in this package calls ``ray.init()`` — the caller (driver,
pytest fixture, bench.py) owns the Ray session.
"""

__version__ = "0.1.0"
