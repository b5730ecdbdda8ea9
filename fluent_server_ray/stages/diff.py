"""Keyed dataset diffing — the pipeline-regression check.

When a curation pipeline changes (new scrub pattern, retuned gate),
the operational question is "what exactly did the output lose, gain,
or alter" — row counts hide compensating errors. ``diff_by_key``
reports per-key status between two dataset versions:

- ``removed``: key only in the left (old) side
- ``added``: key only in the right (new) side
- ``changed``: key in both, content differs
- identical rows are omitted (at 100 TB the diff is the small output;
  the identical mass must never leave the join tasks)

Content equality is an md5 over the content column (same per-row C
hash precedent as ``textstats.fingerprint_batch``; DuckDB mirrors it
with its own ``md5``). The digests ride as HEX STRINGS through the
outer join — an int64 hash would degrade to float64 on the null-padded
fill side (joins.bucketed_hash_join's NaN-capable dtype policy) and
corrupt comparisons past 2^53. Keys are assumed unique per side
(upsert-compact with ``aggregate.latest_by_key`` first if not).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def _digest(ds, key: str, content_col: str, out_name: str):
    from fluent_server_ray.stages.aggregate import skip_empty

    def fn(t: pa.Table) -> pa.Table:
        texts = t[content_col].to_pylist()
        hs = [None if s is None
              else hashlib.md5(s.encode("utf-8")).hexdigest()
              for s in texts]
        return pa.table({
            key: t[key],
            out_name: pa.array(hs, type=pa.string()),
        })

    return ds.map_batches(skip_empty(fn), batch_format="pyarrow",
                          zero_copy_batch=True)


def diff_by_key(left, right, key: str = "doc_id",
                content_col: str = "text", n_buckets: int = 64):
    """Per-key diff of two dataset versions (see module docstring).
    Returns a Dataset (key, status) with status ∈ {added, removed,
    changed}, identical keys dropped inside the join tasks."""
    from fluent_server_ray.stages.joins import bucketed_hash_join

    l = _digest(left, key, content_col, "h_old")
    r = _digest(right, key, content_col, "h_new")
    both = bucketed_hash_join(l, r, key=key, n_buckets=n_buckets,
                              how="outer")

    def classify(t: pa.Table) -> pa.Table:
        old = t["h_old"]
        new = t["h_new"]
        removed = pc.is_null(new)
        added = pc.is_null(old)
        changed = pc.and_(pc.and_(pc.is_valid(old), pc.is_valid(new)),
                          pc.not_equal(old, new))
        status = pc.if_else(
            removed, pa.scalar("removed"),
            pc.if_else(added, pa.scalar("added"),
                       pc.if_else(changed, pa.scalar("changed"),
                                  pa.scalar(None, type=pa.string()))),
        )
        out = pa.table({key: t[key], "status": status})
        return out.filter(pc.is_valid(status))

    from fluent_server_ray.stages.aggregate import skip_empty

    return both.map_batches(skip_empty(classify), batch_format="pyarrow",
                            zero_copy_batch=True)


def diff_by_key_sql(left_sql: str, right_sql: str, key: str = "doc_id",
                    content_col: str = "text") -> str:
    """FULL OUTER JOIN mirror over two inline relation definitions."""
    return f"""
WITH l AS (
  SELECT {key}, md5({content_col}) AS h_old FROM ({left_sql})
), r AS (
  SELECT {key}, md5({content_col}) AS h_new FROM ({right_sql})
), j AS (
  SELECT COALESCE(l.{key}, r.{key}) AS {key}, l.h_old, r.h_new
  FROM l FULL OUTER JOIN r ON l.{key} = r.{key}
)
SELECT {key},
  CASE WHEN h_new IS NULL THEN 'removed'
       WHEN h_old IS NULL THEN 'added'
       ELSE 'changed' END AS status
FROM j
WHERE h_new IS NULL OR h_old IS NULL OR h_old <> h_new
ORDER BY {key}
""".strip()
