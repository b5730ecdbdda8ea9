"""Stateful lookup-enrichment stage (actor pool + broadcast small side).

The Ray-native restatement of the reference's lookup-shaped operations:
the user→secret resolver (reference ``options/options.go:16``, used at
``message/ping.go:76-95``) and fluentd's ``record_transformer``-style
enrichment. The small side (a ``conv_id → tenant`` map) is broadcast
ONCE via ``ray.put`` on the driver; each actor fetches it in
``__init__`` (once per worker, ≙ the per-session reader factory,
reference ``message/session.go:57-60``) and builds an Arrow dictionary
for vectorized ``index_in`` + ``take`` lookups per batch — no shuffle,
no per-batch re-shipping, no Python row loop.

Missing keys enrich to ``DEFAULT_TENANT`` (≙ the unknown-user path,
reference ``message/ping.go:84-86``).

At 100 TB scale this is the broadcast-join pattern: the lookup table
(≤ a few GB) lives once per node in the object store; only the fact
table streams.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_TENANT = "unknown"

# DuckDB mirror of the *default* tenant map built by build_tenant_map():
# conv 'conv-<u>' → 'tenant-<u%7>', except u%7==3 which is absent from
# the map and therefore enriches to the default.
TENANT_SQL_EXPR = (
    "CASE WHEN CAST(substr(conv_id, 6) AS BIGINT) % 7 = 3 THEN 'unknown' "
    "ELSE 'tenant-' || CAST(CAST(substr(conv_id, 6) AS BIGINT) % 7 AS VARCHAR) END"
)


def build_tenant_map(max_users: int = 100_000) -> dict[str, str]:
    """Deterministic demo tenant table: covers ~6/7 of conv ids."""
    return {
        f"conv-{u}": f"tenant-{u % 7}" for u in range(max_users) if u % 7 != 3
    }


class EnrichStage:
    """``map_batches(EnrichStage, fn_constructor_kwargs={'lookup_ref': ref},
    concurrency=(min,max))`` — dictionary enrichment actor.

    ``lookup_ref`` may be a ``ray.ObjectRef`` to a ``dict[str, str]``
    (the broadcast path) or a plain dict (tests / local use).
    """

    def __init__(
        self,
        lookup_ref=None,
        key_col: str = "conv_id",
        out_col: str = "tenant",
        default: str = DEFAULT_TENANT,
    ) -> None:
        import ray

        lookup = (
            ray.get(lookup_ref)
            if isinstance(lookup_ref, ray.ObjectRef)
            else (lookup_ref or {})
        )
        # Arrow-side dictionary: one keys array + one values array;
        # per-batch lookup is index_in (hash join against this array).
        self.keys = pa.array(list(lookup.keys()), type=pa.string())
        self.values = pa.array(list(lookup.values()), type=pa.string())
        self.key_col = key_col
        self.out_col = out_col
        self.default = default

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[self.key_col], value_set=self.keys)
        enriched = pc.take(self.values, idx)  # null idx → null value
        enriched = pc.fill_null(enriched, self.default)
        return batch.append_column(self.out_col, enriched)


def apply_enrich(ds, lookup, batch_size: int = 32768, concurrency=(1, 8)):
    """Broadcast ``lookup`` (dict) once and attach the enrichment actor pool."""
    import ray

    ref = ray.put(lookup) if isinstance(lookup, dict) else lookup
    return ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs={"lookup_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
