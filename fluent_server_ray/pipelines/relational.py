"""Relational operator coverage: joins, aggregates, top-k, set ops.

The reference has no data-data joins (SURVEY.md §2.4) — its
lookup-shaped ops are broadcast dictionaries — but a complete engine
needs the standard relational repertoire over the warehouse tables.
Patterns:

- **broadcast hash join** (small dim side via ``ray.put`` of Arrow
  arrays + ``index_in`` per batch — no shuffle; the fluentd
  "record_transformer with a lookup table" shape, ≙ reference
  ``options/options.go:16``'s user→secret resolver generalized);
- **grouped aggregates** with integer-exact money math: per-row
  ``round(x*100)`` to cents (bit-identical in any engine), integer
  sums only — float reduction order never leaks into results;
- **top-k** = per-batch partial top-k combiner → driver merge
  (never a global sort for k rows);
- **distinct** via grouped-count keys (combiner + tiny final merge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from fluent_server_ray.sources.pq import read_parquet_clean


def _cents(col) -> pa.Array:
    """round(x*100) → int64 cents; per-row double math is deterministic
    across engines, integer sums are exact. round_mode matches SQL
    round() (half away from zero; Arrow's default is half-to-even)."""
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ---------------------------------------------------------------- Q1-ish

def lineitem_agg(sf_dir: str):
    """Grouped pricing summary (TPC-H Q1 shape) with cents-exact sums."""
    import ray.data as rd

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
        )
        prep = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_cents": _cents(t["l_quantity"]),
                "price_cents": _cents(t["l_extendedprice"]),
                "disc_price_cents": _cents(disc_price),
            }
        )
        out = prep.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("price_cents", "sum"),
             ("disc_price_cents", "sum"), ([], "count_all")]
        )
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_cents",
             "sum_price_cents", "sum_disc_price_cents", "n"]
        )

    partials = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    out = partials.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("sum_qty_cents", "sum"), ("sum_price_cents", "sum"),
         ("sum_disc_price_cents", "sum"), ("n", "sum")]
    )
    out = out.rename_columns(
        ["l_returnflag", "l_linestatus", "sum_qty_cents",
         "sum_price_cents", "sum_disc_price_cents", "n"]
    )
    # Arrow group_by output order is nondeterministic; pin it (and keep
    # the SQL mirror's ORDER BY identical) so value hashes are stable.
    return out.sort_by([("l_returnflag", "ascending"),
                        ("l_linestatus", "ascending")])


def lineitem_agg_sql() -> str:
    # sums are CAST back to BIGINT: DuckDB's sum(BIGINT) yields HUGEINT,
    # which lands in pandas as float64 and breaks dtype-exact comparison
    # with the engine's int64 sums.
    return """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_disc_price_cents,
  count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip()


# ------------------------------------------------- broadcast dim joins

# Above this many customer rows the dim side no longer broadcasts: fall
# back to one bucketed shuffle join of orders⋈customer (nation, 25 rows,
# always broadcasts). ~64B/row → ~1.3 GB of broadcast state at the cap.
BROADCAST_DIM_MAX_ROWS = 20_000_000


def orders_by_nation(sf_dir: str,
                     broadcast_threshold: int = BROADCAST_DIM_MAX_ROWS):
    """orders ⋈ customer ⋈ nation → grouped totals per nation.

    Small-dim path: the two dims pre-join on the driver with vectorized
    Arrow kernels (``index_in``/``take`` — no Python row loop) and ship
    once via ``ray.put``; the fact table streams. Above
    ``broadcast_threshold`` customer rows, orders⋈customer runs as one
    bucketed shuffle join instead, and only nation broadcasts.
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    cust_rows = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    if cust_rows <= broadcast_threshold:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        # vectorized dim pre-join: nation name per customer in two kernels
        nidx = pc.index_in(cust["c_nationkey"], value_set=nation["n_nationkey"])
        cust_names = pc.take(nation["n_name"], nidx).combine_chunks()
        dim_ref = ray.put((cust["c_custkey"].combine_chunks(), cust_names))

        def partial(t: pa.Table) -> pa.Table:
            keys, nation_of_cust = ray.get(dim_ref)
            idx = pc.index_in(t["o_custkey"], value_set=keys)
            n_name = pc.take(nation_of_cust, idx)
            prep = pa.table(
                {"n_name": n_name, "price_cents": _cents(t["o_totalprice"])}
            )
            # drop dangling custkeys (null n_name): INNER-join semantics,
            # identical to the bucketed-join path and the SQL oracle —
            # otherwise the two paths answer differently on FK-violating
            # input depending on which side of broadcast_threshold the
            # dim count falls
            prep = prep.filter(pc.is_valid(prep["n_name"]))
            out = prep.group_by(["n_name"]).aggregate(
                [("price_cents", "sum"), ([], "count_all")]
            )
            return out.rename_columns(["n_name", "sum_price_cents", "n_orders"])

        joined = ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    else:
        # big-dim fallback: one co-located shuffle on the customer key
        from fluent_server_ray.stages.joins import bucketed_hash_join

        cust_ds = read_parquet_clean(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        nation_ref = ray.put(
            (nation["n_nationkey"].combine_chunks(),
             nation["n_name"].combine_chunks())
        )
        j = bucketed_hash_join(ds, cust_ds, key="o_custkey",
                               right_key="c_custkey", n_buckets=32)

        def partial(t: pa.Table) -> pa.Table:
            nkeys, nnames = ray.get(nation_ref)
            idx = pc.index_in(t["c_nationkey"], value_set=nkeys)
            prep = pa.table(
                {"n_name": pc.take(nnames, idx),
                 "price_cents": _cents(t["o_totalprice"])}
            )
            prep = prep.filter(pc.is_valid(prep["n_name"]))  # inner semantics
            out = prep.group_by(["n_name"]).aggregate(
                [("price_cents", "sum"), ([], "count_all")]
            )
            return out.rename_columns(["n_name", "sum_price_cents", "n_orders"])

        joined = j.map_batches(partial, batch_format="pyarrow")

    partials = pa.concat_tables(
        joined.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    out = partials.group_by(["n_name"]).aggregate(
        [("sum_price_cents", "sum"), ("n_orders", "sum")]
    )
    out = out.rename_columns(["n_name", "sum_price_cents", "n_orders"])
    return out.sort_by([("n_name", "ascending")])


def orders_by_nation_sql() -> str:
    return """
SELECT n.n_name,
  CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_price_cents,
  count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
""".strip()


# ------------------------------------------------------------- top-k

def top_orders(sf_dir: str, k: int = 10):
    """Top-k orders by price: per-batch partial top-k → driver merge.
    Deterministic tie-break on o_orderkey."""
    import ray.data as rd

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def local_topk(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        t2 = pa.table({"o_orderkey": t["o_orderkey"], "price_cents": cents})
        idx = pc.select_k_unstable(
            t2, k=min(k, len(t2)),
            sort_keys=[("price_cents", "descending"), ("o_orderkey", "ascending")],
        )
        return t2.take(idx)

    partials = pa.concat_tables(
        ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).to_pandas()
    out = partials.sort_values(
        ["price_cents", "o_orderkey"], ascending=[False, True]
    ).head(k)
    return out.reset_index(drop=True)


def top_orders_sql(k: int = 10) -> str:
    return f"""
SELECT o_orderkey, CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT {k}
""".strip()


# ------------------------------------------------- distinct / set ops

def distinct_event_types(sf_dir: str):
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import grouped_counts

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type"])
    counts = grouped_counts(ds, ["event_type"])
    return counts.select(["event_type"]).to_pandas().sort_values(
        "event_type").reset_index(drop=True)


def distinct_event_types_sql() -> str:
    return "SELECT DISTINCT event_type FROM events"


def union_high_low_value(sf_dir: str):
    """UNION ALL of two filtered projections (reference: many input
    connections merging into one stream, server/server.go:97-115).

    Both predicates are pushed into the read (pyarrow dataset filter →
    Parquet row-group pruning + scan-level filtering), so non-matching
    data never leaves storage — the prune-at-the-read pattern."""
    import pyarrow.dataset as pads
    import ray.data as rd

    cols = ["event_id", "event_type", "value"]
    path = f"{sf_dir}/events.parquet"
    hi = read_parquet_clean(path, columns=cols,
                         filter=pads.field("value") > 150.0,
                         filter_refs=["value"])
    lo = read_parquet_clean(path, columns=cols,
                         filter=pads.field("value") < 10.0,
                         filter_refs=["value"])
    u = hi.union(lo)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": _cents(t["value"]),
            }
        )

    return u.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def union_high_low_value_sql() -> str:
    return """
SELECT event_id, event_type, CAST(round(value * 100.0) AS BIGINT) AS value_cents
FROM events WHERE value > 150.0
UNION ALL
SELECT event_id, event_type, CAST(round(value * 100.0) AS BIGINT) AS value_cents
FROM events WHERE value < 10.0
""".strip()


# ------------------------------------------- large-large bucketed join

def revenue_by_priority(sf_dir: str, use_native: bool = False):
    """orders ⋈ lineitem (both large) → revenue per order priority.

    One co-located shuffle on the order key via the explicit bucketed
    hash join (or Ray's native hash join with use_native=True), then a
    combiner-style grouped aggregate of integer cents.
    """
    import ray.data as rd

    from fluent_server_ray.stages.joins import bucketed_hash_join, native_join

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    if use_native:
        joined = native_join(
            orders, lineitem.add_column(
                "o_orderkey", lambda df: df["l_orderkey"], batch_format="pandas"
            ), "o_orderkey", n_partitions=16,
        )
    else:
        joined = bucketed_hash_join(
            orders, lineitem, key="o_orderkey", right_key="l_orderkey",
            n_buckets=16,
        )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        prep = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "rev_cents": _cents(rev),
            }
        )
        out = prep.group_by(["o_orderpriority"]).aggregate(
            [("rev_cents", "sum"), ([], "count_all")]
        )
        return out.rename_columns(["o_orderpriority", "sum_rev_cents", "n_items"])

    partials = pa.concat_tables(
        joined.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    out = partials.group_by(["o_orderpriority"]).aggregate(
        [("sum_rev_cents", "sum"), ("n_items", "sum")]
    )
    out = out.rename_columns(["o_orderpriority", "sum_rev_cents", "n_items"])
    return out.sort_by([("o_orderpriority", "ascending")])


def revenue_by_priority_sql() -> str:
    return """
SELECT o.o_orderpriority,
  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_rev_cents,
  count(*) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""".strip()


# ---------------------------------------- at-least-once replay dedup

def dedup_replayed_turns(sf_dir: str, n_buckets: int = 1024):
    """O3: exact dedup of a replayed (at-least-once) transcript stream.

    Simulates a client re-sending every chunk (union of the input with
    itself — reference clients replay unacked chunks,
    message/mode.go:56-68). Combiner-first (the ``exact_dedup`` shape,
    stages/dedup.py): each block collapses to its distinct
    (conv_id, turn_idx, text) rows BEFORE the shuffle, then one groupby
    on ``siphash(conv_id) % n_buckets`` — a few thousand balanced
    buckets, each deduped with one vectorized ``drop_duplicates`` —
    instead of millions of per-turn pandas groups. The preferred
    production path is manifest-level skip (state/lineage.py); this is
    the shuffle fallback when lineage is unavailable.
    """
    import pandas as pd

    from fluent_server_ray.sources.transcripts import read_transcripts

    once = read_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "text"]
    )
    replayed = once.union(
        read_transcripts(sf_dir).select_columns(["conv_id", "turn_idx", "text"])
    )

    from fluent_server_ray.stages.aggregate import hash_bucket_array

    def partial(t: pa.Table) -> pa.Table:
        u = t.group_by(["conv_id", "turn_idx", "text"]).aggregate([])
        return u.append_column(
            "_bucket", pa.array(hash_bucket_array(u["conv_id"], n_buckets))
        )

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        # distinct over ALL THREE columns, matching the SQL DISTINCT:
        # a replay that somehow carried a DIFFERENT text for the same
        # (conv_id, turn_idx) — corruption the chunk-id contract says
        # cannot happen — must surface as two rows, not collapse to a
        # nondeterministically-chosen winner
        return g.drop_duplicates(["conv_id", "turn_idx", "text"])[
            ["conv_id", "turn_idx", "text"]
        ]

    return (
        replayed.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(bucket_distinct, batch_format="pandas")
    )


def dedup_replayed_turns_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH "
        + TRANSCRIPTS_SQL_CTE
        + """
SELECT DISTINCT conv_id, turn_idx, text FROM (
  SELECT conv_id, turn_idx, text FROM transcripts
  UNION ALL
  SELECT conv_id, turn_idx, text FROM transcripts
)
""".rstrip()
    )


# --------------------------------------------------- anti join (semi/anti)

ANTI_JOIN_PRICE = 450_000.0


def _customers_key_filter(sf_dir: str, min_price: float,
                          keep_matches: bool, use_bloom: bool = False):
    """Shared semi/anti-join body: distinct high-value-order custkeys
    broadcast once, customer scan streamed through one vectorized
    ``is_in`` per batch (``keep_matches=True`` → semi join, ``False``
    → anti join). The price predicate is pushed into the read.

    ``use_bloom=True`` (the 100 TB key-set path, equality pinned in
    tests): per-block Bloom partials over the right keys merge into one
    fixed-size filter (``sketches.BloomFilter`` — OR-mergeable,
    deterministic SipHash) that broadcasts instead of the keys.
    ``contains == False`` is definite NOT-in-keys — those rows resolve
    immediately (kept by the anti join, dropped by the semi join);
    only the ~|matches| + fp Bloom-positive rows take the exact
    residual check (here a broadcast is_in over the shrunken candidate
    set; at full scale, a bucketed hash join against the distinct keys
    so the exact key array never broadcasts at all).
    """
    import pyarrow.dataset as pads
    import ray

    from fluent_server_ray.stages.aggregate import grouped_counts

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_totalprice") > min_price,
    )
    # distinct keys via the combiner pattern (small result to driver)
    keys_tbl = grouped_counts(orders, ["o_custkey"])
    key_arr = keys_tbl["o_custkey"].combine_chunks()
    key_ref = ray.put(key_arr)

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    if use_bloom:
        from fluent_server_ray.stages.sketches import BloomFilter

        bloom = BloomFilter(max(64, len(key_arr)), fpr=0.01)
        bloom.add(key_arr.to_numpy(zero_copy_only=False))
        bloom_ref = ray.put(bloom)

        def fn(t: pa.Table) -> pa.Table:
            bf = ray.get(bloom_ref)
            maybe = bf.contains(
                t["c_custkey"].to_numpy(zero_copy_only=False)
            )
            definite_not = t.filter(pa.array(~maybe))
            candidates = t.filter(pa.array(maybe))
            parts = [] if keep_matches else [definite_not]
            if len(candidates):
                # exact residual check on the Bloom-positive rows only
                keys = ray.get(key_ref)
                inset = pc.is_in(candidates["c_custkey"], value_set=keys)
                parts.append(candidates.filter(
                    inset if keep_matches else pc.invert(inset)
                ))
            return pa.concat_tables(parts) if parts else t.slice(0, 0)
    else:
        def fn(t: pa.Table) -> pa.Table:
            keys = ray.get(key_ref)
            inset = pc.is_in(t["c_custkey"], value_set=keys)
            return t.filter(inset if keep_matches else pc.invert(inset))

    out = cust.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    # an all-filtered result must keep its schema (a bare to_pandas of
    # an empty Dataset loses it); concat of per-batch tables preserves it
    tables = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    if tables:
        return pa.concat_tables(tables)
    return pa.table(
        {"c_custkey": pa.array([], type=pa.int64()),
         "c_name": pa.array([], type=pa.string())}
    )


def customers_without_orders(sf_dir: str, min_price: float = ANTI_JOIN_PRICE,
                             use_bloom: bool = False):
    """Anti join: customers having no high-value order. See
    :func:`_customers_key_filter` for the shared shape and the
    ``use_bloom`` big-key-set path."""
    return _customers_key_filter(sf_dir, min_price, keep_matches=False,
                                 use_bloom=use_bloom)


def customers_without_orders_sql(min_price: float = ANTI_JOIN_PRICE) -> str:
    return f"""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > {min_price})
""".strip()


def customers_with_orders(sf_dir: str, min_price: float = ANTI_JOIN_PRICE,
                          use_bloom: bool = False):
    """SEMI join — the existence-filter dual of
    :func:`customers_without_orders`: customers having at least one
    high-value order, with no order columns joined in (never a full
    join + distinct, which would expand |matches| rows before
    collapsing them). Shares :func:`_customers_key_filter` with the
    anti join (a Bloom definite-negative DROPS immediately here)."""
    return _customers_key_filter(sf_dir, min_price, keep_matches=True,
                                 use_bloom=use_bloom)


def customers_with_orders_sql(min_price: float = ANTI_JOIN_PRICE) -> str:
    # ORDER BY: DuckDB executes the IN as a parallel hash semi join and
    # emits rows in probe-partition order; the engine's output is the
    # customer scan order (ascending c_custkey) — pin the total order
    # so the row-order-sensitive driver hash agrees.
    return f"""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > {min_price})
ORDER BY c_custkey
""".strip()


def customer_order_profile(sf_dir: str, n_buckets: int = 32):
    """LEFT OUTER join through the bucketed hash join: every customer
    with their order count and total spend (cents), customers with no
    orders kept with NULL stats — the non-inner join path as a
    first-class pipeline (fill-side ints surface as float64-with-NaN
    per ``joins.canonical_dtype_map``; the oracle casts to match).

    Shape: the orders side pre-aggregates per custkey via the
    ``grouped_agg(final='ray')`` combiner (key cardinality O(customers)
    — partials never funnel through the driver), then ONE co-located
    exchange joins it to the customer scan. Money math is integer
    cents (:func:`_cents`) — float reduction order never leaks."""
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import bucketed_hash_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": _cents(t["o_totalprice"])})

    agg = grouped_agg(
        orders.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], [("cents", "sum"), ("cents", "count")],
        final="ray",
    )
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_name"])
    joined = bucketed_hash_join(cust, agg, key="c_custkey",
                                right_key="o_custkey", how="left",
                                n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "n_orders": pc.cast(t["cents_count"], pa.float64()),
                "total_cents": pc.cast(t["cents_sum"], pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True).sort("c_custkey")


def customer_order_profile_sql() -> str:
    return """
WITH agg AS (
  SELECT o_custkey, count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS total_cents
  FROM orders GROUP BY 1
)
SELECT c_custkey, c_name,
  CAST(a.n_orders AS DOUBLE) AS n_orders,
  CAST(a.total_cents AS DOUBLE) AS total_cents
FROM customer c LEFT JOIN agg a ON c.c_custkey = a.o_custkey
ORDER BY c_custkey
""".strip()


def order_count_distribution(sf_dir: str, n_buckets: int = 32) -> pa.Table:
    """Customer-distribution query (the TPC-H Q13 shape): how many
    customers placed exactly N orders, INCLUDING the zero-order
    customers a plain GROUP BY over orders can never see.

    Two-level aggregate around one co-located exchange: per-custkey
    order counts via the ``grouped_agg(final='ray')`` combiner (key
    cardinality O(customers) — never a driver merge), LEFT bucketed
    join to the customer key scan (zero-order customers surface as the
    fill side's NULL → 0), then the count-of-counts is a bounded
    ``grouped_counts`` (distinct order counts are tiny). Output:
    (c_count, custdist) sorted by custdist DESC, c_count DESC —
    Q13's ordering."""
    from fluent_server_ray.stages.aggregate import grouped_agg, grouped_counts
    from fluent_server_ray.stages.joins import bucketed_hash_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"])
    per_cust = grouped_agg(orders, ["o_custkey"],
                           [("o_custkey", "count")], final="ray")
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    joined = bucketed_hash_join(cust, per_cust, key="c_custkey",
                                right_key="o_custkey", how="left",
                                n_buckets=n_buckets)

    def c_count(t: pa.Table) -> pa.Table:
        # fill-side count is float64-with-NaN after a non-inner join
        # (joins.canonical_dtype_map); NULL = no orders = 0
        n = pc.cast(pc.fill_null(t["o_custkey_count"], 0.0), pa.int64())
        return pa.table({"c_count": n})

    counts = joined.map_batches(c_count, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = grouped_counts(counts, ["c_count"], final="driver")
    out = out.rename_columns(["c_count", "custdist"])
    return out.sort_by([("custdist", "descending"),
                        ("c_count", "descending")])


def order_count_distribution_sql() -> str:
    return """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""".strip()


def rollup_order_counts(sf_dir: str) -> pa.Table:
    """Multi-level aggregate (SQL ``GROUP BY ROLLUP``): order counts at
    (priority, status), (priority) and grand-total levels, rolled
    columns NULL — the report-cube shape warehouses expect. ONE pass
    computes the finest-level combiner counts; the coarser levels are
    pure re-aggregations of that bounded partial table (|priorities| ×
    |statuses| rows) — the input is never rescanned or reshuffled."""
    from fluent_server_ray.stages.aggregate import grouped_counts

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderpriority", "o_orderstatus"])
    fine = grouped_counts(ds, ["o_orderpriority", "o_orderstatus"])
    n = fine["n"]
    levels = [fine]
    # (priority) level
    byp = fine.group_by(["o_orderpriority"]).aggregate([("n", "sum")])
    levels.append(
        pa.table(
            {
                "o_orderpriority": byp["o_orderpriority"],
                "o_orderstatus": pa.nulls(len(byp), pa.string()),
                "n": byp["n_sum"],
            }
        )
    )
    # grand total
    levels.append(
        pa.table(
            {
                "o_orderpriority": pa.nulls(1, pa.string()),
                "o_orderstatus": pa.nulls(1, pa.string()),
                "n": pa.array([pc.sum(n).as_py() or 0], type=pa.int64()),
            }
        )
    )
    out = pa.concat_tables(levels)
    order = pc.sort_indices(
        out,
        sort_keys=[("o_orderpriority", "ascending"),
                   ("o_orderstatus", "ascending")],
        null_placement="at_end",
    )
    return out.take(order)


def rollup_order_counts_sql() -> str:
    return """
SELECT o_orderpriority, o_orderstatus, count(*) AS n
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority NULLS LAST, o_orderstatus NULLS LAST
""".strip()


# ------------------------------------------- per-key top-k (window rank)

def top_orders_per_customer(sf_dir: str, k: int = 2):
    """Top-k orders per customer by price (window-rank shape).

    Combiner-first: per-batch top-k per customer (sorted pandas
    group-head — top-k under an order is associative), then the same
    merge over partials; raw rows shuffle only as the small partials.
    Deterministic tie-break (price desc, orderkey asc).
    """
    import pandas as pd
    import ray.data as rd

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        ).to_pandas()
        df = df.sort_values(
            ["o_custkey", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
        )
        return pa.Table.from_pandas(
            df.groupby("o_custkey", sort=False).head(k), preserve_index=False
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # one segmented rank over every customer in the bucket (a
        # native groupby(o_custkey) would dispatch one pandas group per
        # customer — per-group overhead at O(customers) cardinality)
        g = g.sort_values(["o_custkey", "price_cents", "o_orderkey"],
                          ascending=[True, False, True])
        rank = g.groupby("o_custkey", sort=False).cumcount() + 1
        g = g.assign(rank=rank.astype("int64"))
        return g.loc[g["rank"] <= k,
                     ["o_custkey", "o_orderkey", "price_cents", "rank"]]

    from fluent_server_ray.stages.assembly import _with_bucket

    bucketed = _with_bucket(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "o_custkey", 64,
    )
    return bucketed.groupby("_bucket").map_groups(merge,
                                                  batch_format="pandas")


def top_orders_per_customer_sql(k: int = 2) -> str:
    return f"""
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
    CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY round(o_totalprice * 100.0) DESC, o_orderkey)
      AS rank
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
""".strip()


# ---------------------------------------- TPC-H Q3 shape (chained joins)

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"


def shipping_priority(sf_dir: str, k: int = 10, n_buckets: int = 32):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem → top-k orders by
    revenue within a market segment and date window — the canonical
    chained-join + top-k pipeline.

    Scale shape: segment/date filters are PUSHED to the reads (row
    groups that can't match never leave storage); two chained bucketed
    hash joins (one custkey exchange, one orderkey exchange — each side
    shuffled exactly once); revenue collapses per batch via the Arrow
    group_by combiner keyed on the join's co-location key, merges
    through Ray's distributed groupby (key cardinality is O(orders) —
    never a driver merge), and the global top-k is a per-block local
    top-k + O(blocks·k) driver merge. Ties broken (revenue DESC,
    o_orderkey ASC) for a deterministic result set.
    """
    import pyarrow.dataset as pads

    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import bucketed_hash_join

    cutoff = pd.Timestamp(Q3_CUTOFF)
    # filter refs are covered by columns= on every read so the pinned
    # schema survives even when a filter eliminates ALL rows (an
    # empty-after-filter dataset with no schema would crash the join's
    # key-dtype check instead of producing a typed empty result)
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=pads.field("c_mktsegment") == Q3_SEGMENT,
        filter_refs=["c_mktsegment"],
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < cutoff,
        filter_refs=["o_orderdate"],
    )
    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > cutoff,
        filter_refs=["l_shipdate"],
    )

    def empty_result() -> pa.Table:
        return pa.table({
            "o_orderkey": pa.array([], type=pa.int64()),
            "rev_cents_sum": pa.array([], type=pa.int64()),
            "o_orderdate": pa.array([], type=pa.timestamp("us")),
            "o_orderpriority": pa.array([], type=pa.string()),
        })

    co = bucketed_hash_join(cust, orders, key="c_custkey",
                            right_key="o_custkey", n_buckets=n_buckets)
    # materialize: the join feeds BOTH the emptiness check and the
    # second join — the old identity-wrap .schema() probe executed the
    # whole first join once and the second join re-ran it (2× the most
    # expensive stage). Pinned blocks serve the probe for free and the
    # second join's cogrouped schema resolve reuses them too.
    co = co.materialize()
    from fluent_server_ray.stages.joins import arrow_schema

    if arrow_schema(co) is None:
        # a filter that matched nothing emptied the first join: typed
        # empty result, not an input to another join
        return empty_result()
    col = bucketed_hash_join(co, lineitem, key="o_orderkey",
                             right_key="l_orderkey", n_buckets=n_buckets)

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"],
            "rev_cents": _cents(r),
        })

    per_order = grouped_agg(
        col.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderkey", "o_orderdate", "o_orderpriority"],
        aggs=[("rev_cents", "sum")],
        final="ray",
    )

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("rev_cents_sum", "descending"),
                          ("o_orderkey", "ascending")]
        )
        return t.take(idx[:k])

    blocks = [
        b for b in per_order.map_batches(
            local_topk, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not blocks:  # zero matching rows: typed empty result, not a crash
        return empty_result()
    merged = pa.concat_tables(blocks)
    idx = pc.sort_indices(
        merged, sort_keys=[("rev_cents_sum", "descending"),
                           ("o_orderkey", "ascending")]
    )
    out = merged.take(idx[:k])
    return out.select(
        ["o_orderkey", "rev_cents_sum", "o_orderdate", "o_orderpriority"]
    )


def shipping_priority_sql(k: int = 10) -> str:
    return f"""
SELECT o.o_orderkey,
  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
      AS BIGINT)) AS BIGINT) AS rev_cents_sum,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY rev_cents_sum DESC, o.o_orderkey
LIMIT {k}
""".strip()


# ------------------------------------------ referential integrity audit

FK_EDGES: list[tuple[str, str, str, str, str]] = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]


def _fk_stats_broadcast(child, fk_col: str, parent_keys) -> tuple[int, int, int]:
    """Small-parent fast path: the parent's distinct key set broadcasts
    ONCE via ``ray.put`` and every child batch counts its own rows /
    nulls / misses — one corpus pass, zero shuffles, a 3-int partial
    per block merged on the driver."""
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    ref = ray.put(pa.array(np.unique(parent_keys).astype(np.int64)))

    def part(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        col = t[fk_col]
        valid = pc.cast(col.drop_null(), pa.int64())
        miss = pc.index_in(valid, value_set=keys).null_count
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "n_null": pa.array([col.null_count], pa.int64()),
            "o": pa.array([miss], pa.int64()),
        })

    parts = list(
        child.map_batches(skip_empty(part), batch_format="pyarrow",
                          zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    n = sum(int(p["n"].to_numpy().sum()) for p in parts)
    n_null = sum(int(p["n_null"].to_numpy().sum()) for p in parts)
    o = sum(int(p["o"].to_numpy().sum()) for p in parts)
    return n, n_null, o


def _fk_stats(child, fk_col: str, parent, pk_col: str,
              n_buckets: int = 32) -> tuple[int, int, int]:
    """(n_rows, n_null, n_orphans) for one FK edge, fully distributed
    — the BIG-parent path (orders/part-sized dimensions at 100 TB,
    where a broadcast set would blow worker heaps).

    ONE pass over the child column: each batch emits its distinct
    (key, count) rows plus two SENTINEL rows (key -1 = batch rows,
    key -2 = null keys; ids are asserted non-negative, the TPC-H-style
    key domain). The merged distinct-key table then LEFT-joins the
    parent's distinct keys in one bucket exchange; orphan mass =
    Σ count where no parent matched — only distinct keys ever shuffle,
    never child rows.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def fkc(t: pa.Table) -> pa.Table:
        n = t.num_rows
        col = t[fk_col]
        n_null = col.null_count
        valid = pc.cast(col.drop_null(), pa.int64())
        if len(valid) and pc.min(valid).as_py() < 0:
            raise ValueError(
                f"_fk_stats: negative {fk_col} collides with the "
                f"sentinel keys — remap ids first")
        out = (pa.table({"k": valid}).group_by("k")
               .aggregate([([], "count_all")]).rename_columns(["k", "cnt"]))
        sent = pa.table({"k": pa.array([-1, -2], pa.int64()),
                         "cnt": pa.array([n, n_null], pa.int64())})
        return pa.concat_tables([out, sent])

    merged = grouped_agg(
        child.map_batches(skip_empty(fkc), batch_format="pyarrow",
                          zero_copy_batch=True),
        keys=["k"], aggs=[("cnt", "sum")], final="ray").materialize()

    def keep_sent(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["k"], 0))

    def keep_real(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["k"], 0))

    sent = merged.map_batches(keep_sent, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    n_rows = int(sent.loc[sent.k == -1, "cnt_sum"].sum())
    n_null = int(sent.loc[sent.k == -2, "cnt_sum"].sum())
    real = merged.map_batches(skip_empty(keep_real), batch_format="pyarrow",
                              zero_copy_batch=True)

    def pk(t: pa.Table) -> pa.Table:
        out = (pa.table({"k": pc.cast(t[pk_col].drop_null(), pa.int64())})
               .group_by("k").aggregate([]))
        return out.append_column(
            "hit", pa.array(np.ones(out.num_rows, dtype=np.int64)))

    parentd = grouped_agg(
        parent.map_batches(skip_empty(pk), batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["k"], aggs=[("hit", "max")], final="ray")

    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns(["k", "hit"])

    j = bucketed_hash_join(
        real,
        parentd.map_batches(rn, batch_format="pyarrow",
                            zero_copy_batch=True),
        key="k", how="left", n_buckets=n_buckets)

    def orphan_partial(t: pa.Table) -> pa.Table:
        hit = t["hit"].to_numpy(zero_copy_only=False)
        cnt = t["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        miss = int(cnt[np.isnan(hit)].sum())
        return pa.table({"o": pa.array([miss], pa.int64())})

    parts = list(
        j.map_batches(skip_empty(orphan_partial), batch_format="pyarrow",
                      zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    n_orphans = int(sum(p["o"].to_numpy().sum() for p in parts)) if parts \
        else 0
    return n_rows, n_null, n_orphans


def fk_integrity_audit(sf_dir: str,
                       broadcast_max_rows: int = 4_000_000) -> pa.Table:
    """Referential-integrity audit over every FK edge of the warehouse
    — the data-quality gate a pipeline runs before training joins (an
    orphan FK silently drops rows from every downstream inner join).
    Per edge: child row count, NULL keys, and orphans (non-null keys
    with no parent). Exact, size-adaptive: a parent whose parquet
    metadata row count fits ``broadcast_max_rows`` broadcasts its key
    set (one child pass, zero shuffles); bigger parents take the
    distinct-key bucketed anti-join. Only distinct keys ever shuffle.

    Returns a pyarrow Table (fk, n_rows, n_null, n_orphans) sorted.
    """
    import pyarrow.parquet as pq

    rows = []
    for fk_name, child_t, fk_col, parent_t, pk_col in FK_EDGES:
        child = read_parquet_clean(f"{sf_dir}/{child_t}.parquet",
                                   columns=[fk_col])
        parent_path = f"{sf_dir}/{parent_t}.parquet"
        if pq.read_metadata(parent_path).num_rows <= broadcast_max_rows:
            keys = pq.read_table(parent_path, columns=[pk_col]
                                 )[pk_col].drop_null().to_numpy()
            n_rows, n_null, n_orphans = _fk_stats_broadcast(
                child, fk_col, keys)
        else:
            parent = read_parquet_clean(parent_path, columns=[pk_col])
            n_rows, n_null, n_orphans = _fk_stats(child, fk_col,
                                                  parent, pk_col)
        rows.append((fk_name, n_rows, n_null, n_orphans))
    rows.sort()
    return pa.table({
        "fk": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_null": pa.array([r[2] for r in rows], pa.int64()),
        "n_orphans": pa.array([r[3] for r in rows], pa.int64()),
    })


def fk_integrity_audit_sql() -> str:
    selects = []
    for fk_name, child_t, fk_col, parent_t, pk_col in sorted(FK_EDGES):
        selects.append(f"""
SELECT '{fk_name}' AS fk,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(*) FILTER (WHERE c.{fk_col} IS NULL) AS BIGINT) AS n_null,
  CAST(count(*) FILTER (WHERE c.{fk_col} IS NOT NULL
                        AND p.{pk_col} IS NULL) AS BIGINT) AS n_orphans
FROM {child_t} c LEFT JOIN {parent_t} p ON c.{fk_col} = p.{pk_col}
""".strip())
    return "\nUNION ALL\n".join(selects) + "\nORDER BY fk"


# ------------------------------------------- calendar-month rollup

def monthly_revenue(sf_dir: str) -> pa.Table:
    """Calendar-MONTH revenue seasonality over lineitem — the
    calendar-aware window the fixed-width tumbling operators can't
    express (months are 28-31 days; ``ts // width`` cannot produce
    them). Buckets come from Arrow's temporal kernels (``pc.year`` /
    ``pc.month`` — proper calendar math, mirroring SQL date_trunc),
    revenue rides as the shared exact-cents contract (per-row double
    expression → round-half-away → int64 sums).

    Returns (month yyyymm, n_items, revenue_cents) sorted by month.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"]
        ym = pc.add(pc.multiply(pc.cast(pc.year(d), pa.int64()), 100),
                    pc.cast(pc.month(d), pa.int64()))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(1.0, t["l_discount"]))
        return pa.table({"month": ym, "rev_cents": _cents(rev)})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["month"], aggs=[("rev_cents", "sum"), ("rev_cents", "count")],
        final="driver")
    out = pa.table({
        "month": agg["month"],
        "n_items": agg["rev_cents_count"],
        "revenue_cents": agg["rev_cents_sum"],
    })
    return out.sort_by([("month", "ascending")])


def monthly_revenue_sql() -> str:
    return """
SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
    AS month,
  CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem GROUP BY 1 ORDER BY 1
""".strip()


def cube_order_counts(sf_dir: str) -> pa.Table:
    """Full CUBE aggregate (SQL ``GROUP BY CUBE``): order counts at
    (priority, status), (priority), (status) and grand-total levels —
    the complete OLAP marginal set where :func:`rollup_order_counts`
    emits only the hierarchy's prefix levels. Same one-pass shape: the
    finest combiner counts compute once; every coarser level is a
    re-aggregation of that bounded partial table."""
    from fluent_server_ray.stages.aggregate import grouped_counts

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderpriority", "o_orderstatus"])
    fine = grouped_counts(ds, ["o_orderpriority", "o_orderstatus"])

    # lvl = SQL GROUPING(priority, status) bitmask: without it, a
    # marginal row is indistinguishable from a fine row whose rolled
    # dimension is genuinely NULL — same-key ties would sort
    # engine-defined and break the mirror on NULL-bearing dims
    def lvl(t: pa.Table, v: int) -> pa.Table:
        return t.append_column(
            "lvl", pa.array([v] * len(t), pa.int64()))

    levels = [lvl(fine, 0)]
    byp = fine.group_by(["o_orderpriority"]).aggregate([("n", "sum")])
    levels.append(lvl(pa.table({
        "o_orderpriority": byp["o_orderpriority"],
        "o_orderstatus": pa.nulls(len(byp), pa.string()),
        "n": byp["n_sum"],
    }), 1))
    bys = fine.group_by(["o_orderstatus"]).aggregate([("n", "sum")])
    levels.append(lvl(pa.table({
        "o_orderpriority": pa.nulls(len(bys), pa.string()),
        "o_orderstatus": bys["o_orderstatus"],
        "n": bys["n_sum"],
    }), 2))
    levels.append(lvl(pa.table({
        "o_orderpriority": pa.nulls(1, pa.string()),
        "o_orderstatus": pa.nulls(1, pa.string()),
        "n": pa.array([pc.sum(fine["n"]).as_py() or 0],
                      type=pa.int64()),
    }), 3))
    out = pa.concat_tables(levels)
    order = pc.sort_indices(
        out,
        sort_keys=[("lvl", "ascending"),
                   ("o_orderpriority", "ascending"),
                   ("o_orderstatus", "ascending")],
        null_placement="at_end",
    )
    return out.take(order)


def cube_order_counts_sql() -> str:
    return """
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS lvl
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY lvl, o_orderpriority NULLS LAST, o_orderstatus NULLS LAST
""".strip()


# ------------------------------------------- TPC-H classic join shapes

def small_qty_revenue(sf_dir: str, n_buckets: int = 32) -> pa.Table:
    """Small-quantity-order revenue per brand (TPC-H Q17 shape):
    revenue of lineitems whose quantity is below 20% of their part's
    average quantity.

    Exact-integer predicate: ``qty < 0.2 * avg(qty)`` over a part's
    lineitems ⟺ ``5·qty_cents·cnt < sum_qty_cents`` — both sides int64
    (qty_cents ≤ ~5e3, cnt per part ≤ ~3e7 even at 100 TB → ≤ 7.5e11),
    so the engine and the SQL mirror can never disagree at the
    boundary.

    Shape: the per-part average and the small-row filter both live
    inside ONE partkey-bucket exchange (every lineitem of a part
    co-locates, so the avg is bucket-local — no stats join, no second
    scan); the bucket emits per-part (revenue, count) partials, which
    join part's brand through the bucketed hash join and collapse to
    the ~|brands| driver merge. 2 bounded exchanges total; the full
    lineitem is shuffled once (the predicate needs every row against
    its part's avg — irreducible for exact Q17 semantics).
    """
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import _with_bucket, \
        bucketed_hash_join
    from fluent_server_ray.stages.groups import map_buckets

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "qty_cents": _cents(t["l_quantity"]),
            "price_cents": _cents(t["l_extendedprice"]),
        })

    rows = _with_bucket(
        li.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True),
        "l_partkey", n_buckets)

    per_part_schema = pa.schema([
        pa.field("l_partkey", pa.int64()),
        pa.field("rev_cents", pa.int64()),
        pa.field("n_small", pa.int64()),
    ])

    def small_rev(g: pd.DataFrame) -> pd.DataFrame:
        st = g.groupby("l_partkey")["qty_cents"].agg(s="sum", c="count")
        m = g.merge(st, on="l_partkey")
        sm = m[5 * m["qty_cents"] * m["c"] < m["s"]]
        if sm.empty:
            return pd.DataFrame(
                {"l_partkey": [], "rev_cents": [], "n_small": []})
        return (sm.groupby("l_partkey")["price_cents"]
                .agg(rev_cents="sum", n_small="count").reset_index())

    per_part = map_buckets(rows, small_rev, per_part_schema)

    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"])
    joined = bucketed_hash_join(per_part, part, key="l_partkey",
                                right_key="p_partkey",
                                n_buckets=n_buckets)
    out = grouped_agg(joined, ["p_brand"],
                      [("rev_cents", "sum"), ("n_small", "sum")])
    return pa.table({
        "p_brand": out["p_brand"],
        "revenue_cents": out["rev_cents_sum"],
        "n_small": out["n_small_sum"],
    })


def small_qty_revenue_sql() -> str:
    return """
WITH st AS (
  SELECT l_partkey,
    sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS s,
    count(*) AS c
  FROM lineitem GROUP BY 1
), small AS (
  SELECT l.l_partkey,
    CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS pc
  FROM lineitem l JOIN st USING (l_partkey)
  WHERE 5 * CAST(round(l.l_quantity * 100.0) AS BIGINT) * c < s
)
SELECT p_brand, CAST(sum(pc) AS BIGINT) AS revenue_cents,
  count(*) AS n_small
FROM small JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1
""".strip()


# sum-of-quantity cutoff (cents) for the large-volume-order screen:
# ~0.3% of orders at the synthetic generator's quantity distribution
BIG_VOLUME_QTY_CENTS = 30_000


def big_volume_customers(sf_dir: str,
                         min_qty_cents: int = BIG_VOLUME_QTY_CENTS,
                         n_buckets: int = 32) -> pa.Table:
    """Large-volume customers (TPC-H Q18 shape): orders whose summed
    lineitem quantity exceeds the cutoff, with the owning customer
    joined in.

    Shape: per-order quantity sums via the distributed combiner
    (``grouped_agg(final='ray')`` — the orderkey space is O(rows), so
    the merge is Ray's groupby, never the driver); the HAVING filter
    drops ~99.7% of orders BEFORE either join; the survivors join
    orders then customer through two bucketed hash joins. The result
    is cutoff-bounded (a fixed tail quantile of orders) — only that
    bounded set is collected and sorted on the driver."""
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import bucketed_hash_join

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "qty_cents": _cents(t["l_quantity"])})

    oq = grouped_agg(
        li.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], [("qty_cents", "sum")], final="ray")

    def keep_big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["qty_cents_sum"], min_qty_cents))

    big = oq.map_batches(keep_big, batch_format="pyarrow",
                         zero_copy_batch=True)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def oproj(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_orderdate": t["o_orderdate"],
            "total_price_cents": _cents(t["o_totalprice"]),
        })

    j1 = bucketed_hash_join(
        big, orders.map_batches(oproj, batch_format="pyarrow",
                                zero_copy_batch=True),
        key="l_orderkey", right_key="o_orderkey", n_buckets=n_buckets)
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_name"])
    j2 = bucketed_hash_join(j1, cust, key="o_custkey",
                            right_key="c_custkey", n_buckets=n_buckets)

    tables = list(j2.iter_batches(batch_size=None, batch_format="pyarrow"))
    out_fields = [("c_custkey", pa.int64()), ("c_name", pa.string()),
                  ("o_orderkey", pa.int64()),
                  ("o_orderdate", pa.timestamp("us")),
                  ("total_price_cents", pa.int64()),
                  ("sum_qty_cents", pa.int64())]
    if not tables:
        return pa.schema(out_fields).empty_table()
    t = pa.concat_tables(tables)
    t = pa.table({
        "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
        "c_name": t["c_name"],
        "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
        "o_orderdate": t["o_orderdate"],
        "total_price_cents": pc.cast(t["total_price_cents"], pa.int64()),
        "sum_qty_cents": pc.cast(t["qty_cents_sum"], pa.int64()),
    })
    return t.take(pc.sort_indices(
        t, sort_keys=[("sum_qty_cents", "descending"),
                      ("o_orderkey", "ascending")]))


def big_volume_customers_sql(
        min_qty_cents: int = BIG_VOLUME_QTY_CENTS) -> str:
    return f"""
WITH oq AS (
  SELECT l_orderkey,
    CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
      AS sum_qty_cents
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity * 100.0) AS BIGINT)) > {min_qty_cents}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
  CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS total_price_cents,
  oq.sum_qty_cents
FROM oq JOIN orders o ON o.o_orderkey = oq.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY oq.sum_qty_cents DESC, o.o_orderkey
""".strip()


# recency cutoff for the dormant-customer screen (the synthetic
# orderdate range is 1995-01-01 .. 2001-08-01; this keeps a non-trivial
# dormant set at every sf)
DORMANT_CUTOFF = "2000-06-01 00:00:00"


def dormant_high_balance_customers(sf_dir: str,
                                   cutoff: str = DORMANT_CUTOFF
                                   ) -> pa.Table:
    """Dormant high-balance customers per market segment (TPC-H Q22
    shape, recency-adapted — the schema has no phone column): customers
    whose account balance exceeds the average POSITIVE balance and who
    placed no order on/after the cutoff date.

    Exact-integer predicate: ``bal > avg(pos bal)`` ⟺
    ``bal_cents · n_pos > sum_pos_cents`` (int64 both sides). Shape:
    one combiner pass collapses customer to the two global positive
    scalars; the recent-buyer custkeys (date predicate pushed into the
    read) reduce to a distinct set broadcast once via ``ray.put``; the
    customer scan then streams through one vectorized
    threshold+anti-``is_in`` filter into per-batch segment partials.
    At a key-set scale where the broadcast no longer fits, swap the
    is_in for the Bloom-prefilter path (:func:`_customers_key_filter`
    ``use_bloom=True``) — same screen, fixed-size broadcast."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray

    from fluent_server_ray.stages.aggregate import grouped_counts

    cut = _dt.datetime.fromisoformat(cutoff)
    recent = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_orderdate") >= cut)
    key_arr = grouped_counts(recent, ["o_custkey"])["o_custkey"] \
        .combine_chunks()
    key_ref = ray.put(key_arr)

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def pos_partial(t: pa.Table) -> pa.Table:
        bal = _cents(t["c_acctbal"])
        pos = pc.greater(bal, 0)
        kept = bal.filter(pos)
        return pa.table({
            "s": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
            "c": pa.array([len(kept)], pa.int64()),
        })

    parts = pa.concat_tables(
        cust.map_batches(pos_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    sum_pos = pc.sum(parts["s"]).as_py() or 0
    n_pos = pc.sum(parts["c"]).as_py() or 0

    out_fields = [("c_mktsegment", pa.string()),
                  ("n_cust", pa.int64()), ("bal_cents", pa.int64())]
    if n_pos == 0:  # SQL: x * 0 > NULL is never true
        return pa.schema(out_fields).empty_table()

    def seg_partial(t: pa.Table) -> pa.Table:
        bal = _cents(t["c_acctbal"])
        keep = pc.and_(
            pc.greater(pc.multiply(bal, n_pos), sum_pos),
            pc.invert(pc.is_in(t["c_custkey"],
                               value_set=ray.get(key_ref))))
        kept = pa.table({"c_mktsegment": t["c_mktsegment"],
                         "bal_cents": bal}).filter(keep)
        return kept.group_by(["c_mktsegment"]).aggregate(
            [("bal_cents", "sum"), ([], "count_all")]
        ).rename_columns(["c_mktsegment", "bal_cents", "n"])

    segs = pa.concat_tables(
        cust.map_batches(seg_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not len(segs):
        return pa.schema(out_fields).empty_table()
    out = segs.group_by(["c_mktsegment"]).aggregate(
        [("n", "sum"), ("bal_cents", "sum")]
    ).rename_columns(["c_mktsegment", "n_cust", "bal_cents"])
    return out.sort_by([("c_mktsegment", "ascending")])


def dormant_high_balance_customers_sql(
        cutoff: str = DORMANT_CUTOFF) -> str:
    return f"""
WITH pos AS (
  SELECT sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS s,
    count(*) AS c
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n_cust,
  CAST(sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
    AS bal_cents
FROM customer, pos
WHERE CAST(round(c_acctbal * 100.0) AS BIGINT) * pos.c > pos.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = customer.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY 1 ORDER BY 1
""".strip()


# quarter window for the top-supplier screen (orderdates span
# 1995-01-01 .. 2001-08-01 in the synthetic corpus)
TOP_SUPPLIER_FROM = "1996-01-01 00:00:00"
TOP_SUPPLIER_TO = "1996-04-01 00:00:00"


def top_supplier_revenue(sf_dir: str,
                         date_from: str = TOP_SUPPLIER_FROM,
                         date_to: str = TOP_SUPPLIER_TO,
                         n_buckets: int = 32) -> pa.Table:
    """Top supplier(s) by quarterly revenue (TPC-H Q15 shape): the
    supplier(s) whose summed ``extendedprice·(1−discount)`` over the
    ship-date window attains the GLOBAL maximum (ties all kept — Q15's
    view-max semantics).

    Shape: the date predicate pushes into the read; per-supplier
    revenue sums through the distributed combiner (supplier keyspace
    is dim-table-sized but unbounded at open scale → ``final='ray'``);
    the global max reduces via per-batch partials (one int64 per
    block); only the argmax row(s) join supplier through the bucketed
    hash join. Cents-exact money math throughout."""
    import datetime as _dt

    import pyarrow.dataset as pads

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    f = _dt.datetime.fromisoformat(date_from)
    to = _dt.datetime.fromisoformat(date_to)
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= f)
        & (pads.field("l_shipdate") < to))

    def proj(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        return pa.table({"l_suppkey": t["l_suppkey"],
                         "rev_cents": _cents(disc)})

    rev = grouped_agg(
        li.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True),
        ["l_suppkey"], [("rev_cents", "sum")], final="ray"
    ).materialize()  # two consumers: max partial + argmax filter

    def max_partial(t: pa.Table) -> pa.Table:
        return pa.table({"m": pa.array(
            [pc.max(t["rev_cents_sum"]).as_py()], pa.int64())})

    parts = [b for b in rev.map_batches(
        skip_empty(max_partial), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
    out_fields = [("s_suppkey", pa.int64()), ("s_name", pa.string()),
                  ("total_revenue_cents", pa.int64())]
    vals = [pc.max(p["m"]).as_py() for p in parts if len(p)]
    vals = [v for v in vals if v is not None]
    if not vals:
        return pa.schema(out_fields).empty_table()
    mx = max(vals)

    top = rev.map_batches(
        lambda t: t.filter(pc.equal(t["rev_cents_sum"], mx)),
        batch_format="pyarrow", zero_copy_batch=True)
    sup = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_name"])
    j = bucketed_hash_join(top, sup, key="l_suppkey",
                           right_key="s_suppkey", n_buckets=n_buckets)
    tables = list(j.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        return pa.schema(out_fields).empty_table()
    t = pa.concat_tables(tables)
    out = pa.table({
        "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
        "s_name": t["s_name"],
        "total_revenue_cents": pc.cast(t["rev_cents_sum"], pa.int64()),
    })
    return out.sort_by([("s_suppkey", "ascending")])


def top_supplier_revenue_sql(date_from: str = TOP_SUPPLIER_FROM,
                             date_to: str = TOP_SUPPLIER_TO) -> str:
    return f"""
WITH rev AS MATERIALIZED (
  SELECT l_suppkey,
    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                  AS BIGINT)) AS BIGINT) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_from}'
    AND l_shipdate < TIMESTAMP '{date_to}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, rev.total AS total_revenue_cents
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.total = (SELECT max(total) FROM rev)
ORDER BY s.s_suppkey
""".strip()


def part_basket_pairs(sf_dir: str, k: int = 25,
                      n_buckets: int = 64) -> pa.Table:
    """Market-basket co-purchase pairs: the top-``k`` part pairs by
    the number of ORDERS whose lineitems contain both (the per-basket
    sibling of the per-user ``item_cooccurrence`` — baskets are
    orders, not user histories).

    Shape: one orderkey-bucket exchange co-locates each order's lines;
    inside a bucket the distinct part set per order self-merges into
    canonical (a < b) pairs — O(lines²) per ORDER, bounded by the
    order schema (~7 lines), never corpus-quadratic. The unbounded
    pair space merges via the distributed groupby; the global top-k is
    a per-block partial top-k + an O(blocks·k) driver merge (ties
    broken by (part_a, part_b) — fully deterministic)."""
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import _with_bucket

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    bucketed = _with_bucket(li, "l_orderkey", n_buckets)

    pair_schema = pa.schema([pa.field("part_a", pa.int64()),
                             pa.field("part_b", pa.int64()),
                             pa.field("n", pa.int64())])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        if m.empty:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []})
        out = (m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False)
               .size())
        out.columns = ["part_a", "part_b", "n"]
        return out

    parts = map_buckets(bucketed, per_bucket, pair_schema)
    merged = grouped_agg(parts, ["part_a", "part_b"], [("n", "sum")],
                         final="ray")

    def topk_partial(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("n_sum", "descending"), ("part_a", "ascending"),
            ("part_b", "ascending")])
        return t.take(idx[:k])

    tables = list(
        merged.map_batches(skip_empty(topk_partial),
                           batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        return pair_schema.empty_table()
    t = pa.concat_tables(tables)
    idx = pc.sort_indices(t, sort_keys=[
        ("n_sum", "descending"), ("part_a", "ascending"),
        ("part_b", "ascending")])
    t = t.take(idx[:k])
    return pa.table({"part_a": pc.cast(t["part_a"], pa.int64()),
                     "part_b": pc.cast(t["part_b"], pa.int64()),
                     "n": pc.cast(t["n_sum"], pa.int64())})


def part_basket_pairs_sql(k: int = 25) -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
  CAST(count(*) AS BIGINT) AS n
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 ORDER BY n DESC, part_a, part_b LIMIT {k}
""".strip()


# ------------------------------------------------- Q5 local supplier volume

Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01 00:00:00"
Q5_TO = "1997-01-01 00:00:00"


def local_supplier_volume(sf_dir: str, region: str = Q5_REGION,
                          date_from: str = Q5_FROM, date_to: str = Q5_TO,
                          n_buckets: int = 32) -> pa.Table:
    """Local supplier volume (TPC-H Q5 shape): per-nation revenue for
    orders in a year where the CUSTOMER and the line's SUPPLIER share a
    nation inside one region — the classic multi-join with a
    cross-path equality constraint (c_nationkey = s_nationkey).

    Scale shape: nation⋈region resolves driver-side (≤ a few hundred
    rows by schema); supplier is a bounded dim table even against a
    100 TB fact corpus, so its (suppkey → nationkey) map — pre-filtered
    to the region — broadcasts ONCE via ``ray.put`` and the
    supplier-nation constraint applies map-side with one ``index_in``
    per batch (no third shuffle). The two fact-sized joins
    (orders⋈customer on custkey, →⋈lineitem on orderkey) are bucketed
    hash joins — each side shuffled exactly once. The date predicate
    pushes into the orders read; revenue collapses per batch into
    nation-keyed partials (≤ |nations| rows per block) and merges on
    the driver. Cents-exact money math."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import arrow_schema, bucketed_hash_join

    out_fields = [("n_name", pa.string()), ("revenue_cents", pa.int64())]

    reg = _pq.read_table(f"{sf_dir}/region.parquet",
                         columns=["r_regionkey", "r_name"])
    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nat = _pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name", "n_regionkey"])
    nat = nat.filter(pc.is_in(nat["n_regionkey"], value_set=rkeys))
    if not len(nat):
        return pa.schema(out_fields).empty_table()
    nat_keys = pa.array(
        sorted(pc.cast(nat["n_nationkey"], pa.int64()).to_pylist()),
        pa.int64())
    name_of = dict(zip(nat["n_nationkey"].to_pylist(),
                       nat["n_name"].to_pylist()))

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sup = sup.filter(pc.is_in(pc.cast(sup["s_nationkey"], pa.int64()),
                              value_set=nat_keys))
    sup_ref = ray.put((
        pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks(),
        pc.cast(sup["s_nationkey"], pa.int64()).combine_chunks(),
    ))
    natkeys_ref = ray.put(nat_keys)

    f = _dt.datetime.fromisoformat(date_from)
    to = _dt.datetime.fromisoformat(date_to)
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= f)
        & (pads.field("o_orderdate") < to),
        filter_refs=["o_orderdate"],
    )
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])

    def cust_in_region(t: pa.Table) -> pa.Table:
        ks = ray.get(natkeys_ref)
        return t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                                 value_set=ks))

    cust = cust.map_batches(cust_in_region, batch_format="pyarrow",
                            zero_copy_batch=True)

    oc = bucketed_hash_join(orders, cust, key="o_custkey",
                            right_key="c_custkey",
                            n_buckets=n_buckets).materialize()
    if arrow_schema(oc) is None:
        return pa.schema(out_fields).empty_table()
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    ocl = bucketed_hash_join(oc, li, key="o_orderkey",
                             right_key="l_orderkey", n_buckets=n_buckets)

    def rev_partial(t: pa.Table) -> pa.Table:
        skey, snat = ray.get(sup_ref)
        pos = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()),
                          value_set=skey)
        s_nat = pc.take(snat, pos)  # NULL where supplier outside region
        keep = pc.equal(s_nat, pc.cast(t["c_nationkey"], pa.int64()))
        t = t.filter(pc.fill_null(keep, False))
        if not len(t):
            return pa.table({"n_nationkey": pa.array([], pa.int64()),
                             "rev_cents": pa.array([], pa.int64())})
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        prep = pa.table({
            "n_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            "rev_cents": _cents(disc),
        })
        out = prep.group_by(["n_nationkey"]).aggregate([("rev_cents",
                                                         "sum")])
        return out.rename_columns(["n_nationkey", "rev_cents"])

    agg = grouped_agg(
        ocl.map_batches(rev_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["n_nationkey"], [("rev_cents", "sum")])
    if not len(agg):
        return pa.schema(out_fields).empty_table()
    names = pa.array([name_of[k] for k in agg["n_nationkey"].to_pylist()],
                     pa.string())
    out = pa.table({"n_name": names,
                    "revenue_cents": pc.cast(agg["rev_cents_sum"],
                                             pa.int64())})
    return out.sort_by([("revenue_cents", "descending"),
                        ("n_name", "ascending")])


def local_supplier_volume_sql(region: str = Q5_REGION,
                              date_from: str = Q5_FROM,
                              date_to: str = Q5_TO) -> str:
    return f"""
SELECT n.n_name,
  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
      AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
  AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{region}'
  AND o.o_orderdate >= TIMESTAMP '{date_from}'
  AND o.o_orderdate < TIMESTAMP '{date_to}'
GROUP BY n.n_name
ORDER BY revenue_cents DESC, n_name
""".strip()


# --------------------------------------------------- Q10 returned items

Q10_FROM = "1996-07-01 00:00:00"
Q10_TO = "1996-10-01 00:00:00"


def returned_item_customers(sf_dir: str, k: int = 20,
                            date_from: str = Q10_FROM,
                            date_to: str = Q10_TO,
                            n_buckets: int = 32) -> pa.Table:
    """Returned-item reporting (TPC-H Q10 shape): top-``k`` customers
    by revenue lost to returned lines (``l_returnflag='R'``) on orders
    placed in a quarter, annotated with nation name and balance.

    Scale shape: the quarter predicate pushes into the orders read and
    the returnflag predicate into the lineitem read; ONE orderkey-
    bucketed join co-locates them; per-customer revenue merges through
    the distributed combiner (customer keyspace unbounded →
    ``final='ray'``); the global top-k is per-block partial top-k + an
    O(blocks·k) driver merge. Only the k winners look up their
    customer/nation attributes — a driver-side filtered read of k keys,
    never a fact-sized join. Ties broken (rev DESC, c_custkey ASC)."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import arrow_schema, bucketed_hash_join

    out_fields = [("c_custkey", pa.int64()), ("c_name", pa.string()),
                  ("rev_cents", pa.int64()), ("c_acctbal_cents", pa.int64()),
                  ("n_name", pa.string())]

    f = _dt.datetime.fromisoformat(date_from)
    to = _dt.datetime.fromisoformat(date_to)
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= f)
        & (pads.field("o_orderdate") < to),
        filter_refs=["o_orderdate"],
    )
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=pads.field("l_returnflag") == "R",
        filter_refs=["l_returnflag"],
    )
    j = bucketed_hash_join(orders, li, key="o_orderkey",
                           right_key="l_orderkey", n_buckets=n_buckets)

    def rev_partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        prep = pa.table({"c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                         "rev_cents": _cents(disc)})
        out = prep.group_by(["c_custkey"]).aggregate([("rev_cents", "sum")])
        return out.rename_columns(["c_custkey", "rev_cents"])

    per_cust = grouped_agg(
        j.map_batches(rev_partial, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["c_custkey"], [("rev_cents", "sum")], final="ray")

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("rev_cents_sum", "descending"), ("c_custkey", "ascending")])
        return t.take(idx[:k])

    blocks = [b for b in per_cust.map_batches(
        skip_empty(local_topk), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")
        if b.num_rows]
    if not blocks:
        return pa.schema(out_fields).empty_table()
    merged = pa.concat_tables(blocks)
    idx = pc.sort_indices(merged, sort_keys=[
        ("rev_cents_sum", "descending"), ("c_custkey", "ascending")])
    top = merged.take(idx[:k])

    # k-row attribute lookup: filtered driver-side read, never a join
    keys = pc.cast(top["c_custkey"], pa.int64())
    cust = _pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name", "c_acctbal",
                                   "c_nationkey"])
    cust = cust.filter(pc.is_in(pc.cast(cust["c_custkey"], pa.int64()),
                                value_set=keys))
    nat = _pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(),
                       nat["n_name"].to_pylist()))
    attr = {int(ck): (nm, int(bal), name_of[nk]) for ck, nm, bal, nk in zip(
        cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist(),
        _cents(cust["c_acctbal"]).to_pylist(),
        cust["c_nationkey"].to_pylist())}
    # inner-join semantics: an orphan o_custkey (no customer row —
    # FK-violating corpus) drops here exactly like the SQL mirror
    mask = pc.is_in(keys, value_set=pc.cast(cust["c_custkey"], pa.int64()))
    top = top.filter(mask)
    ck = [int(c) for c in
          pc.cast(top["c_custkey"], pa.int64()).to_pylist()]
    return pa.table({
        "c_custkey": pa.array(ck, pa.int64()),
        "c_name": pa.array([attr[c][0] for c in ck], pa.string()),
        "rev_cents": pc.cast(top["rev_cents_sum"], pa.int64()),
        "c_acctbal_cents": pa.array([attr[c][1] for c in ck], pa.int64()),
        "n_name": pa.array([attr[c][2] for c in ck], pa.string()),
    })


def returned_item_customers_sql(k: int = 20, date_from: str = Q10_FROM,
                                date_to: str = Q10_TO) -> str:
    return f"""
SELECT c.c_custkey, c.c_name,
  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
      AS BIGINT)) AS BIGINT) AS rev_cents,
  CAST(round(c.c_acctbal * 100.0) AS BIGINT) AS c_acctbal_cents,
  n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{date_from}'
  AND o.o_orderdate < TIMESTAMP '{date_to}'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY rev_cents DESC, c_custkey LIMIT {k}
""".strip()


# ----------------------------------------------------- Q14 promo revenue

Q14_FROM = "1996-03-01 00:00:00"
Q14_TO = "1996-04-01 00:00:00"


def promo_revenue_share(sf_dir: str, date_from: str = Q14_FROM,
                        date_to: str = Q14_TO) -> pa.Table:
    """Promotion revenue share (TPC-H Q14 shape): the fraction of one
    month's discounted revenue earned by PROMO-type parts.

    Scale shape: part is a bounded dim table, so its promo-partkey set
    broadcasts ONCE via ``ray.put`` and the part "join" is one
    vectorized ``is_in`` per lineitem batch — no shuffle at all; the
    ship-date predicate pushes into the read; each block emits a 2-int
    partial (promo cents, total cents) and the driver sums. The share
    is ONE float64 division over exact integer sums — bit-identical to
    the SQL mirror."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_type"])
    promo = part.filter(pc.equal(part["p_type"], "PROMO"))
    promo_ref = ray.put(pc.cast(promo["p_partkey"],
                                pa.int64()).combine_chunks())

    f = _dt.datetime.fromisoformat(date_from)
    to = _dt.datetime.fromisoformat(date_to)
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= f)
        & (pads.field("l_shipdate") < to))

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        cents = _cents(disc)
        is_promo = pc.is_in(pc.cast(t["l_partkey"], pa.int64()),
                            value_set=ray.get(promo_ref))
        p = pc.sum(pc.if_else(is_promo, cents, pa.scalar(0, pa.int64())))
        s = pc.sum(cents)
        return pa.table({
            "promo_cents": pa.array([p.as_py() or 0], pa.int64()),
            "total_cents": pa.array([s.as_py() or 0], pa.int64()),
        })

    parts = li.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True)
    promo_c = 0
    total_c = 0
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            promo_c += pc.sum(b["promo_cents"]).as_py() or 0
            total_c += pc.sum(b["total_cents"]).as_py() or 0
    share = (100.0 * float(promo_c) / float(total_c)) if total_c else None
    return pa.table({
        "promo_cents": pa.array([promo_c], pa.int64()),
        "total_cents": pa.array([total_c], pa.int64()),
        "promo_share_pct": pa.array([share], pa.float64()),
    })


def promo_revenue_share_sql(date_from: str = Q14_FROM,
                            date_to: str = Q14_TO) -> str:
    return f"""
WITH x AS (
  SELECT CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
              AS BIGINT) AS cents,
         (p.p_type = 'PROMO') AS is_promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{date_from}'
    AND l.l_shipdate < TIMESTAMP '{date_to}'
)
SELECT
  CAST(coalesce(sum(cents) FILTER (WHERE is_promo), 0) AS BIGINT)
    AS promo_cents,
  CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents,
  100.0 * CAST(coalesce(sum(cents) FILTER (WHERE is_promo), 0) AS DOUBLE)
    / CAST(sum(cents) AS DOUBLE) AS promo_share_pct
FROM x
""".strip()


# ------------------------------------------------ Q6 forecast revenue

Q6_FROM = "1996-01-01 00:00:00"
Q6_TO = "1997-01-01 00:00:00"


def forecast_revenue_delta(sf_dir: str, date_from: str = Q6_FROM,
                           date_to: str = Q6_TO,
                           disc_lo: float = 0.03, disc_hi: float = 0.07,
                           max_qty: float = 25.0) -> pa.Table:
    """Forecasting-revenue-change screen (TPC-H Q6 shape): the revenue
    increase if discounts in a band were eliminated — sum of
    ``extendedprice·discount`` over one shipping year, a discount
    band, and a quantity cap.

    Scale shape: the date predicate pushes into the read; the
    discount/quantity predicates are one vectorized mask per batch;
    each block emits a 2-int partial (cents, rows) and the driver
    sums. Band compares happen on the stored doubles — identical
    comparisons both engines."""
    import datetime as _dt

    import pyarrow.dataset as pads

    from fluent_server_ray.stages.aggregate import skip_empty

    f = _dt.datetime.fromisoformat(date_from)
    to = _dt.datetime.fromisoformat(date_to)
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=(pads.field("l_shipdate") >= f)
        & (pads.field("l_shipdate") < to))

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["l_discount"], disc_lo),
                    pc.less_equal(t["l_discount"], disc_hi)),
            pc.less(t["l_quantity"], max_qty))
        t = t.filter(keep)
        cents = _cents(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        s = pc.sum(cents).as_py() or 0
        return pa.table({"rev": pa.array([int(s)], pa.int64()),
                         "n": pa.array([len(t)], pa.int64())})

    rev = n = 0
    for b in li.map_batches(skip_empty(partial), batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            rev += int(pc.sum(b["rev"]).as_py() or 0)
            n += int(pc.sum(b["n"]).as_py() or 0)
    return pa.table({"revenue_cents": pa.array([rev], pa.int64()),
                     "n_lines": pa.array([n], pa.int64())})


def forecast_revenue_delta_sql(date_from: str = Q6_FROM,
                               date_to: str = Q6_TO,
                               disc_lo: float = 0.03,
                               disc_hi: float = 0.07,
                               max_qty: float = 25.0) -> str:
    return f"""
SELECT
  CAST(coalesce(sum(CAST(round(l_extendedprice * l_discount * 100.0)
                         AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{date_from}'
  AND l_shipdate < TIMESTAMP '{date_to}'
  AND l_discount >= {disc_lo} AND l_discount <= {disc_hi}
  AND l_quantity < {max_qty}
""".strip()


# -------------------------------------------- Q7 volume shipping

Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_8"


def nation_volume_shipping(sf_dir: str, nation_a: str = Q7_NATION_A,
                           nation_b: str = Q7_NATION_B,
                           n_buckets: int = 32) -> pa.Table:
    """Volume shipping between two nations (TPC-H Q7 shape): yearly
    revenue on lines where the supplier sits in one named nation and
    the ordering customer in the other (both directions reported).

    Scale shape: the two nation ids resolve driver-side; the supplier
    (suppkey → nationkey) map — filtered to the pair — broadcasts once
    and applies map-side (``index_in`` per batch); customers filter
    map-side to the pair's nations; the two fact joins
    (orders⋈customer, →⋈lineitem) are bucketed hash joins; revenue
    collapses per batch into (supp_nation, cust_nation, year) partials
    (≤ 2·|years| rows per block) and merges on the driver."""
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import arrow_schema, bucketed_hash_join

    out_fields = [("supp_nation", pa.string()),
                  ("cust_nation", pa.string()),
                  ("l_year", pa.int64()),
                  ("revenue_cents", pa.int64())]

    nat = _pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    name_of = dict(zip(pc.cast(nat["n_nationkey"],
                               pa.int64()).to_pylist(),
                       nat["n_name"].to_pylist()))
    key_of = {v: k for k, v in name_of.items()}
    if nation_a not in key_of or nation_b not in key_of:
        return pa.schema(out_fields).empty_table()
    ka, kb = key_of[nation_a], key_of[nation_b]
    pair_keys = pa.array(sorted({ka, kb}), pa.int64())

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sup = sup.filter(pc.is_in(pc.cast(sup["s_nationkey"], pa.int64()),
                              value_set=pair_keys))
    sup_ref = ray.put((
        pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks(),
        pc.cast(sup["s_nationkey"], pa.int64()).combine_chunks()))
    pair_ref = ray.put(pair_keys)

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])

    def cust_in_pair(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                                 value_set=ray.get(pair_ref)))

    cust = cust.map_batches(cust_in_pair, batch_format="pyarrow",
                            zero_copy_batch=True)
    oc = bucketed_hash_join(orders, cust, key="o_custkey",
                            right_key="c_custkey",
                            n_buckets=n_buckets).materialize()
    if arrow_schema(oc) is None:
        return pa.schema(out_fields).empty_table()
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"])
    ocl = bucketed_hash_join(oc, li, key="o_orderkey",
                             right_key="l_orderkey", n_buckets=n_buckets)

    def rev_partial(t: pa.Table) -> pa.Table:
        skey, snat = ray.get(sup_ref)
        pos = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()),
                          value_set=skey)
        s_nat = pc.take(snat, pos)
        c_nat = pc.cast(t["c_nationkey"], pa.int64())
        # cross pair only: (A,B) or (B,A) — equal nations excluded
        keep = pc.and_(pc.is_valid(s_nat), pc.not_equal(s_nat, c_nat))
        t2 = pa.table({
            "s_nat": s_nat, "c_nat": c_nat,
            "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "rev_cents": _cents(pc.multiply(
                t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))),
        }).filter(keep)
        if not len(t2):
            return pa.table({
                "s_nat": pa.array([], pa.int64()),
                "c_nat": pa.array([], pa.int64()),
                "l_year": pa.array([], pa.int64()),
                "rev_cents": pa.array([], pa.int64())})
        out = t2.group_by(["s_nat", "c_nat", "l_year"]).aggregate(
            [("rev_cents", "sum")])
        return out.rename_columns(["s_nat", "c_nat", "l_year",
                                   "rev_cents"])

    agg = grouped_agg(
        ocl.map_batches(rev_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["s_nat", "c_nat", "l_year"], [("rev_cents", "sum")])
    if not len(agg):
        return pa.schema(out_fields).empty_table()
    out = pa.table({
        "supp_nation": pa.array(
            [name_of[k] for k in agg["s_nat"].to_pylist()], pa.string()),
        "cust_nation": pa.array(
            [name_of[k] for k in agg["c_nat"].to_pylist()], pa.string()),
        "l_year": pc.cast(agg["l_year"], pa.int64()),
        "revenue_cents": pc.cast(agg["rev_cents_sum"], pa.int64()),
    })
    return out.sort_by([("supp_nation", "ascending"),
                        ("cust_nation", "ascending"),
                        ("l_year", "ascending")])


def nation_volume_shipping_sql(nation_a: str = Q7_NATION_A,
                               nation_b: str = Q7_NATION_B) -> str:
    return f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
      AS BIGINT)) AS BIGINT) AS revenue_cents
FROM supplier s
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ((ns.n_name = '{nation_a}' AND nc.n_name = '{nation_b}')
    OR (ns.n_name = '{nation_b}' AND nc.n_name = '{nation_a}'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""".strip()


# -------------------------------------------- Q8 national market share

Q8_REGION = "AMERICA"
Q8_TYPE = "ECONOMY"
Q8_NATION = "NATION_21"


def nation_market_share(sf_dir: str, region: str = Q8_REGION,
                        p_type: str = Q8_TYPE,
                        nation: str = Q8_NATION,
                        n_buckets: int = 32) -> pa.Table:
    """National market share (TPC-H Q8 shape): per order-year, the
    share of one region's revenue on one part type that is supplied by
    one named nation.

    Scale shape: region-nation set, the typed part-key set, and the
    full supplier (suppkey → nationkey) map broadcast once (all dim
    tables); customers filter map-side to the region; two bucketed
    fact joins (orders⋈customer carries o_orderdate; →⋈lineitem); the
    part filter and supplier lookup are vectorized per batch; each
    block emits (year, is_target) 2-key partials and the share is ONE
    float64 division per year over exact integer sums."""
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.joins import arrow_schema, bucketed_hash_join

    out_fields = [("o_year", pa.int64()), ("target_cents", pa.int64()),
                  ("total_cents", pa.int64()), ("mkt_share", pa.float64())]

    reg = _pq.read_table(f"{sf_dir}/region.parquet",
                         columns=["r_regionkey", "r_name"])
    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nat = _pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name", "n_regionkey"])
    region_nat = nat.filter(pc.is_in(nat["n_regionkey"], value_set=rkeys))
    if not len(region_nat):
        return pa.schema(out_fields).empty_table()
    region_keys = pa.array(sorted(pc.cast(
        region_nat["n_nationkey"], pa.int64()).to_pylist()), pa.int64())
    tgt = nat.filter(pc.equal(nat["n_name"], nation))
    target_key = (pc.cast(tgt["n_nationkey"], pa.int64()).to_pylist()
                  or [-1])[0]

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_type"])
    pkeys = pc.cast(part.filter(pc.equal(part["p_type"], p_type))
                    ["p_partkey"], pa.int64()).combine_chunks()
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    refs = ray.put((
        region_keys, pkeys,
        pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks(),
        pc.cast(sup["s_nationkey"], pa.int64()).combine_chunks()))

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])

    def cust_in_region(t: pa.Table) -> pa.Table:
        rk, _, _, _ = ray.get(refs)
        return t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                                 value_set=rk))

    cust = cust.map_batches(cust_in_region, batch_format="pyarrow",
                            zero_copy_batch=True)
    oc = bucketed_hash_join(orders, cust, key="o_custkey",
                            right_key="c_custkey",
                            n_buckets=n_buckets).materialize()
    if arrow_schema(oc) is None:
        return pa.schema(out_fields).empty_table()
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])
    ocl = bucketed_hash_join(oc, li, key="o_orderkey",
                             right_key="l_orderkey", n_buckets=n_buckets)

    def rev_partial(t: pa.Table) -> pa.Table:
        _, pk, skey, snat = ray.get(refs)
        t = t.filter(pc.is_in(pc.cast(t["l_partkey"], pa.int64()),
                              value_set=pk))
        empty = pa.table({"o_year": pa.array([], pa.int64()),
                          "is_target": pa.array([], pa.int64()),
                          "rev_cents": pa.array([], pa.int64())})
        if not len(t):
            return empty
        pos = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()),
                          value_set=skey)
        s_nat = pc.take(snat, pos)
        t = t.filter(pc.is_valid(s_nat))  # inner join: orphan supplier
        if not len(t):
            return empty
        pos = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()),
                          value_set=skey)
        s_nat = pc.take(snat, pos)
        prep = pa.table({
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            "is_target": pc.cast(pc.equal(s_nat, target_key), pa.int64()),
            "rev_cents": _cents(pc.multiply(
                t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))),
        })
        out = prep.group_by(["o_year", "is_target"]).aggregate(
            [("rev_cents", "sum")])
        return out.rename_columns(["o_year", "is_target", "rev_cents"])

    agg = grouped_agg(
        ocl.map_batches(rev_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["o_year", "is_target"], [("rev_cents", "sum")])
    if not len(agg):
        return pa.schema(out_fields).empty_table()
    acc: dict[int, list[int]] = {}
    for y, flag, s in zip(agg["o_year"].to_pylist(),
                          agg["is_target"].to_pylist(),
                          agg["rev_cents_sum"].to_pylist()):
        cur = acc.setdefault(int(y), [0, 0])
        cur[1] += int(s)
        if flag:
            cur[0] += int(s)
    years = sorted(acc)
    return pa.table({
        "o_year": pa.array(years, pa.int64()),
        "target_cents": pa.array([acc[y][0] for y in years], pa.int64()),
        "total_cents": pa.array([acc[y][1] for y in years], pa.int64()),
        "mkt_share": pa.array(
            [float(acc[y][0]) / float(acc[y][1]) if acc[y][1] else None
             for y in years], pa.float64()),
    })


def nation_market_share_sql(region: str = Q8_REGION,
                            p_type: str = Q8_TYPE,
                            nation: str = Q8_NATION) -> str:
    return f"""
WITH x AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
         AS BIGINT) AS cents,
    (ns.n_name = '{nation}') AS is_target
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  WHERE r.r_name = '{region}' AND p.p_type = '{p_type}'
)
SELECT o_year,
  CAST(coalesce(sum(cents) FILTER (WHERE is_target), 0) AS BIGINT)
    AS target_cents,
  CAST(sum(cents) AS BIGINT) AS total_cents,
  CAST(coalesce(sum(cents) FILTER (WHERE is_target), 0) AS DOUBLE)
    / CAST(sum(cents) AS DOUBLE) AS mkt_share
FROM x GROUP BY o_year ORDER BY o_year
""".strip()


# ------------------------------------------- Q4 order priority checking

Q4_FROM = "1996-01-01 00:00:00"
Q4_TO = "1996-04-01 00:00:00"
Q4_LATE_DAYS = 90


def late_order_priority_counts(sf_dir: str, date_from: str = Q4_FROM,
                               date_to: str = Q4_TO,
                               late_days: int = Q4_LATE_DAYS,
                               n_buckets: int = 32) -> pa.Table:
    """Order-priority checking (TPC-H Q4 shape): per-priority count of
    orders placed in a quarter with at least one line shipped more than
    ``late_days`` after the order date — the classic EXISTS semi-join.

    Exact-integer predicate: both timestamps cast to int64 microseconds
    and compared against an integer day offset, so the engine and the
    SQL mirror (`l_shipdate > o_orderdate + INTERVAL d DAY`) can never
    disagree at the boundary.

    Scale shape: the quarter predicate pushes into the orders read; ONE
    orderkey-bucketed hash join co-locates lines with their order; the
    late filter drops everything else BEFORE the distinct exchange, so
    the semi-join dedup shuffles only (orderkey, priority) pairs of
    late rows, pre-collapsed per batch (unbounded keyspace →
    ``grouped_agg(final='ray')``); the per-priority count is a bounded
    combiner (≤5 keys)."""
    import datetime as _dt

    import pyarrow.dataset as pads

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    grouped_counts,
                                                    skip_empty)
    from fluent_server_ray.stages.joins import bucketed_hash_join

    f = _dt.datetime.fromisoformat(date_from)
    to = _dt.datetime.fromisoformat(date_to)
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= f)
        & (pads.field("o_orderdate") < to),
        filter_refs=["o_orderdate"])
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    joined = bucketed_hash_join(orders, li, key="o_orderkey",
                                right_key="l_orderkey",
                                n_buckets=n_buckets)
    off_us = int(late_days) * 86_400_000_000

    def late_pairs(t: pa.Table) -> pa.Table:
        ship = pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")),
                       pa.int64())
        odate = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                        pa.int64())
        keep = pc.greater(ship, pc.add(odate, off_us))
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_orderpriority": pc.cast(t["o_orderpriority"], pa.string()),
            "one": pa.array(np.ones(len(t), np.int64)),
        })

    pairs = joined.map_batches(skip_empty(late_pairs),
                               batch_format="pyarrow",
                               zero_copy_batch=True)
    distinct = grouped_agg(pairs, ["o_orderkey", "o_orderpriority"],
                           [("one", "max")], final="ray")
    out = grouped_counts(distinct, ["o_orderpriority"])
    out = pa.table({
        "o_orderpriority": out["o_orderpriority"],
        "n_late_orders": pc.cast(out["n"], pa.int64()),
    })
    return out.sort_by([("o_orderpriority", "ascending")])


def late_order_priority_counts_sql(date_from: str = Q4_FROM,
                                   date_to: str = Q4_TO,
                                   late_days: int = Q4_LATE_DAYS) -> str:
    return f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
  AND o.o_orderdate < TIMESTAMP '{date_to}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""".strip()


# ------------------------------------------ Q19 disjunctive band revenue

Q19_BANDS: tuple[tuple[str, int, int, float, float], ...] = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#1", 1, 15, 1.0, 11.0),
    ("Brand#2", 1, 25, 10.0, 20.0),
    ("Brand#3", 1, 35, 20.0, 30.0),
)


def disjunctive_band_revenue(sf_dir: str,
                             bands=Q19_BANDS) -> pa.Table:
    """Discounted revenue under an OR-of-ANDs predicate (TPC-H Q19
    shape): each disjunct constrains part brand, part size band and
    line quantity band; revenue is summed over lines matching ANY
    disjunct.

    Scale shape: part is a bounded dim table — its (partkey → brand,
    size) attributes broadcast ONCE via ``ray.put`` and every disjunct
    evaluates map-side as a vectorized mask (one ``index_in`` per
    batch, no join, no shuffle); each block emits a 2-int partial and
    the driver sums. Quantity compares happen on the stored doubles —
    identical comparisons both engines."""
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand", "p_size"])
    part_ref = ray.put((
        pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
        part["p_brand"].combine_chunks(),
        pc.cast(part["p_size"], pa.int64()).combine_chunks(),
    ))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pkey, brand, size = ray.get(part_ref)
        pos = pc.index_in(pc.cast(t["l_partkey"], pa.int64()),
                          value_set=pkey)
        b = pc.take(brand, pos)
        s = pc.take(size, pos)
        qty = t["l_quantity"]
        keep = None
        for br, lo, hi, qlo, qhi in bands:
            m = pc.and_(
                pc.and_(pc.equal(b, br),
                        pc.and_(pc.greater_equal(s, lo),
                                pc.less_equal(s, hi))),
                pc.and_(pc.greater_equal(qty, qlo),
                        pc.less_equal(qty, qhi)))
            keep = m if keep is None else pc.or_(keep, m)
        t = t.filter(pc.fill_null(keep, False))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(1.0, t["l_discount"]))
        rev = int(pc.sum(_cents(disc)).as_py() or 0)
        return pa.table({"rev": pa.array([rev], pa.int64()),
                         "n": pa.array([len(t)], pa.int64())})

    rev = n = 0
    for blk in li.map_batches(skip_empty(partial), batch_format="pyarrow",
                              zero_copy_batch=True).iter_batches(
                                  batch_size=None, batch_format="pyarrow"):
        if blk.num_rows:
            rev += int(pc.sum(blk["rev"]).as_py() or 0)
            n += int(pc.sum(blk["n"]).as_py() or 0)
    return pa.table({"revenue_cents": pa.array([rev], pa.int64()),
                     "n_lines": pa.array([n], pa.int64())})


def disjunctive_band_revenue_sql(bands=Q19_BANDS) -> str:
    disj = "\n   OR ".join(
        f"(p.p_brand = '{br}' AND p.p_size BETWEEN {lo} AND {hi}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for br, lo, hi, qlo, qhi in bands)
    return f"""
SELECT
  CAST(coalesce(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
      * 100.0) AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {disj}
""".strip()


# ---------------------------------------------- Q9 product-type profit

Q9_NAME_WORD = "widget"


def nation_year_profit(sf_dir: str,
                       name_word: str = Q9_NAME_WORD) -> pa.Table:
    """Product-type profit measure (TPC-H Q9 shape): per (supplier
    nation, ship year) profit over parts whose name contains a word,
    with profit = discounted revenue minus a retail-priced quantity
    cost (`p_retailprice·l_quantity·0.5` stands in for the missing
    partsupp supplycost — the testdata schema carries no partsupp).

    Exact-integer money: revenue and cost each round to cents per row
    with the same float tree as the SQL mirror
    (``round(ep*(1-d)*100)``, ``round((retail*qty)*50)``), then only
    integer sums.

    Scale shape: part and supplier are bounded dim tables — the
    name-matched (partkey → retailprice) map and the (suppkey →
    nation name) map broadcast ONCE via ``ray.put``; the part filter
    and both lookups apply map-side (two ``index_in`` per batch, no
    join, no shuffle); blocks collapse to (nation, year)-keyed partials
    (≤ |nations|·|years| rows per block) and merge on the driver."""
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name",
                                   "p_retailprice"])
    part = part.filter(pc.match_substring(part["p_name"], name_word))
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nat = _pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat["n_nationkey"].to_pylist(),
                       nat["n_name"].to_pylist()))
    snames = pa.array([name_of[k] for k in
                       sup["s_nationkey"].to_pylist()], pa.string())
    bcast = ray.put((
        pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
        part["p_retailprice"].combine_chunks(),
        pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks(),
        snames,
    ))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        pkey, retail, skey, snat = ray.get(bcast)
        pos = pc.index_in(pc.cast(t["l_partkey"], pa.int64()),
                          value_set=pkey)
        keep = pc.is_valid(pos)
        t = t.filter(keep)
        pos = pos.filter(keep)
        r = pc.take(retail, pos)
        spos = pc.index_in(pc.cast(t["l_suppkey"], pa.int64()),
                           value_set=skey)
        nation = pc.take(snat, spos)
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(1.0, t["l_discount"])))
        cost = pc.cast(
            pc.round(pc.multiply(pc.multiply(r, t["l_quantity"]), 50.0),
                     round_mode="half_towards_infinity"), pa.int64())
        prep = pa.table({
            "n_name": nation,
            "o_year": pc.cast(pc.year(pc.cast(t["l_shipdate"],
                                              pa.timestamp("us"))),
                              pa.int64()),
            "profit_cents": pc.subtract(rev, cost),
        })
        out = prep.group_by(["n_name", "o_year"]).aggregate(
            [("profit_cents", "sum")])
        return out.rename_columns(["n_name", "o_year", "profit_cents"])

    out = grouped_agg(li.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["n_name", "o_year"], [("profit_cents", "sum")])
    out = pa.table({
        "n_name": out["n_name"],
        "o_year": pc.cast(out["o_year"], pa.int64()),
        "profit_cents": pc.cast(out["profit_cents_sum"], pa.int64()),
    })
    return out.sort_by([("n_name", "ascending"),
                        ("o_year", "descending")])


def nation_year_profit_sql(name_word: str = Q9_NAME_WORD) -> str:
    return f"""
SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
  CAST(sum(
    CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
    - CAST(round(p_retailprice * l_quantity * 50.0) AS BIGINT))
  AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_name LIKE '%{name_word}%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1, 2
ORDER BY n_name, o_year DESC
""".strip()


# --------------------------------------- Q11 important-part screen

def part_revenue_important(sf_dir: str, num: int = 5,
                           den: int = 4) -> pa.Table:
    """Important-part identification (TPC-H Q11 shape): parts whose
    total discounted revenue exceeds ``num/den``× the mean per-part
    revenue — a grouped rollup filtered by a global scalar threshold
    computed from the same rollup.

    The threshold compare is pure integers (``den · n_parts · rev >
    num · total``), so it is scale-free (unlike Q11's fixed fraction,
    which degenerates as the part count grows) and can never disagree
    with the SQL mirror at the boundary.

    Scale shape: one lineitem scan collapsing to per-part partials
    (part keyspace is dim-bounded, so the merged rollup and the scalar
    threshold live on the driver); no join, no fact shuffle."""
    from fluent_server_ray.stages.aggregate import grouped_agg

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        prep = pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "rev": _cents(pc.multiply(t["l_extendedprice"],
                                      pc.subtract(1.0, t["l_discount"]))),
        })
        out = prep.group_by(["l_partkey"]).aggregate([("rev", "sum")])
        return out.rename_columns(["l_partkey", "rev"])

    rolled = grouped_agg(li.map_batches(partial, batch_format="pyarrow",
                                        zero_copy_batch=True),
                         ["l_partkey"], [("rev", "sum")])
    revs = rolled["rev_sum"].to_pylist()
    n_parts = len(revs)
    total = sum(int(r) for r in revs)  # python ints: no 2^53 ceiling
    keep = pa.array([den * n_parts * int(r) > num * total for r in revs],
                    pa.bool_())
    out = pa.table({
        "l_partkey": pc.cast(rolled["l_partkey"], pa.int64()),
        "revenue_cents": pc.cast(rolled["rev_sum"], pa.int64()),
    }).filter(keep)
    return out.sort_by([("revenue_cents", "descending"),
                        ("l_partkey", "ascending")])


def part_revenue_important_sql(num: int = 5, den: int = 4) -> str:
    return f"""
WITH pr AS (
  SELECT l_partkey,
    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
        AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, revenue_cents
FROM pr
WHERE {den} * (SELECT count(*) FROM pr) * revenue_cents
      > {num} * (SELECT sum(revenue_cents) FROM pr)
ORDER BY revenue_cents DESC, l_partkey
""".strip()


# ----------------------------------- Q16 supplier counts by part attrs

Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "PROMO"
Q16_EXCL_BAL = 2000.0


def part_attr_supplier_counts(sf_dir: str,
                              excl_brand: str = Q16_EXCL_BRAND,
                              excl_type: str = Q16_EXCL_TYPE,
                              excl_bal: float = Q16_EXCL_BAL) -> pa.Table:
    """Parts/supplier relationship (TPC-H Q16 shape): how many distinct
    suppliers shipped parts of each (brand, type, size), excluding one
    brand, one type, and suppliers below an account-balance floor (the
    NOT-IN exclusion list — the testdata carries no supplier comments,
    so the balance stands in for Q16's complaint filter).

    Scale shape: part and the exclusion list are bounded dim tables,
    broadcast ONCE via ``ray.put``; the attribute lookup, both part
    exclusions and the supplier NOT-IN apply map-side; each batch
    pre-collapses to distinct (brand, type, size, suppkey) tuples, the
    distinct exchange is over that dim×dim-bounded keyspace
    (``grouped_agg(final='ray')``), and the per-attr count is a bounded
    combiner."""
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    grouped_counts,
                                                    skip_empty)

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand", "p_type",
                                   "p_size"])
    part = part.filter(pc.and_(
        pc.not_equal(part["p_brand"], excl_brand),
        pc.not_equal(part["p_type"], excl_type)))
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    excl = sup.filter(pc.less(sup["s_acctbal"], excl_bal))
    bcast = ray.put((
        pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
        part["p_brand"].combine_chunks(),
        part["p_type"].combine_chunks(),
        pc.cast(part["p_size"], pa.int64()).combine_chunks(),
        pc.cast(excl["s_suppkey"], pa.int64()).combine_chunks(),
    ))

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        pkey, brand, ptype, size, bad = ray.get(bcast)
        pos = pc.index_in(pc.cast(t["l_partkey"], pa.int64()),
                          value_set=pkey)
        supp = pc.cast(t["l_suppkey"], pa.int64())
        keep = pc.and_(pc.is_valid(pos),
                       pc.invert(pc.is_in(supp, value_set=bad)))
        pos = pos.filter(keep)
        supp = supp.filter(keep)
        prep = pa.table({
            "p_brand": pc.take(brand, pos),
            "p_type": pc.take(ptype, pos),
            "p_size": pc.take(size, pos),
            "l_suppkey": supp,
            "one": pa.array(np.ones(len(supp), np.int64)),
        })
        out = prep.group_by(
            ["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate(
                [("one", "max")])
        return out.rename_columns(
            ["p_brand", "p_type", "p_size", "l_suppkey", "one"])

    pairs = li.map_batches(skip_empty(distinct_partial),
                           batch_format="pyarrow", zero_copy_batch=True)
    distinct = grouped_agg(pairs,
                           ["p_brand", "p_type", "p_size", "l_suppkey"],
                           [("one", "max")], final="ray")
    out = grouped_counts(distinct, ["p_brand", "p_type", "p_size"])
    out = pa.table({
        "p_brand": out["p_brand"],
        "p_type": out["p_type"],
        "p_size": pc.cast(out["p_size"], pa.int64()),
        "supplier_cnt": pc.cast(out["n"], pa.int64()),
    })
    return out.sort_by([("supplier_cnt", "descending"),
                        ("p_brand", "ascending"),
                        ("p_type", "ascending"),
                        ("p_size", "ascending")])


def part_attr_supplier_counts_sql(excl_brand: str = Q16_EXCL_BRAND,
                                  excl_type: str = Q16_EXCL_TYPE,
                                  excl_bal: float = Q16_EXCL_BAL) -> str:
    return f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{excl_brand}' AND p_type <> '{excl_type}'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {excl_bal})
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""".strip()


# ------------------------------------ Q20 excess-share part shippers

Q20_FROM = "1997-01-01 00:00:00"
Q20_TO = "1998-01-01 00:00:00"


def excess_share_suppliers(sf_dir: str, name_word: str = Q9_NAME_WORD,
                           date_from: str = Q20_FROM,
                           date_to: str = Q20_TO,
                           n_buckets: int = 32) -> pa.Table:
    """Dominant-shipper screen (TPC-H Q20 shape): suppliers that
    shipped MORE THAN HALF of some name-matched part's total quantity
    in a shipping year — the nested-IN with a correlated per-part
    threshold (Q20's ``availqty > 0.5·sum(qty)`` recast against the
    shipped side; the testdata carries no partsupp).

    Exact-integer predicate: ``2·supp_part_qty_cents >
    part_total_qty_cents`` — both int64.

    Scale shape: the year predicate pushes into the read and the
    name-matched partkey set broadcasts ONCE; each batch pre-collapses
    to (partkey, suppkey) quantity partials; ONE partkey-bucket
    exchange co-locates a part's partials so its total and the 50%
    screen are bucket-local; survivors are distinct suppkeys (dim-
    bounded → driver dedup + name lookup)."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import _with_bucket

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name"])
    part = part.filter(pc.match_substring(part["p_name"], name_word))
    pkeys_ref = ray.put(
        pc.cast(part["p_partkey"], pa.int64()).combine_chunks())

    f = _dt.datetime.fromisoformat(date_from)
    to = _dt.datetime.fromisoformat(date_to)
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=(pads.field("l_shipdate") >= f)
        & (pads.field("l_shipdate") < to))

    def qty_partial(t: pa.Table) -> pa.Table:
        pkeys = ray.get(pkeys_ref)
        keep = pc.is_in(pc.cast(t["l_partkey"], pa.int64()),
                        value_set=pkeys)
        t = t.filter(keep)
        prep = pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "qty_cents": _cents(t["l_quantity"]),
        })
        out = prep.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("qty_cents", "sum")])
        return out.rename_columns(["l_partkey", "l_suppkey",
                                   "qty_cents"])

    partials = _with_bucket(
        li.map_batches(skip_empty(qty_partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        "l_partkey", n_buckets)

    winner_schema = pa.schema([pa.field("l_suppkey", pa.int64())])

    def dominant(g: pd.DataFrame) -> pd.DataFrame:
        sp = (g.groupby(["l_partkey", "l_suppkey"])["qty_cents"].sum()
              .reset_index())
        tot = sp.groupby("l_partkey")["qty_cents"].transform("sum")
        win = sp[2 * sp["qty_cents"] > tot]
        return pd.DataFrame(
            {"l_suppkey": win["l_suppkey"].unique().astype("int64")})

    winners = map_buckets(partials, dominant, winner_schema)
    supp_ids = sorted({int(s) for b in winners.iter_batches(
        batch_size=None, batch_format="pyarrow")
        for s in b["l_suppkey"].to_pylist()})
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    name_of = dict(zip(pc.cast(sup["s_suppkey"],
                               pa.int64()).to_pylist(),
                       sup["s_name"].to_pylist()))
    return pa.table({
        "s_suppkey": pa.array(supp_ids, pa.int64()),
        "s_name": pa.array([name_of[s] for s in supp_ids], pa.string()),
    })


def excess_share_suppliers_sql(name_word: str = Q9_NAME_WORD,
                               date_from: str = Q20_FROM,
                               date_to: str = Q20_TO) -> str:
    return f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey,
    sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS s
  FROM lineitem JOIN part ON p_partkey = l_partkey
    AND p_name LIKE '%{name_word}%'
  WHERE l_shipdate >= TIMESTAMP '{date_from}'
    AND l_shipdate < TIMESTAMP '{date_to}'
  GROUP BY 1, 2
), pt AS (SELECT l_partkey, sum(s) AS tot FROM sp GROUP BY 1)
SELECT DISTINCT s_suppkey, s_name
FROM sp JOIN pt USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE 2 * s > tot
ORDER BY s_suppkey
""".strip()


# ------------------------------------ Q2 groupwise-min regional price

Q2_REGION = "ASIA"


def part_min_price_supplier(sf_dir: str,
                            region: str = Q2_REGION) -> pa.Table:
    """Minimum-cost supplier (TPC-H Q2 shape): for every part, the
    supplier(s) inside one region offering the lowest observed line
    price — the classic groupwise-min with a join-back that keeps ALL
    tying suppliers (the testdata carries no partsupp, so the observed
    ``min(l_extendedprice)`` per (part, supplier) stands in for the
    supply cost).

    Scale shape: region→nation→supplier resolves driver-side (bounded
    dims) and the regional suppkey set broadcasts ONCE; the lineitem
    scan collapses per batch to (part, supplier) min-price partials —
    a dim×dim-bounded keyspace — which merge on the driver where the
    per-part min and the tie join-back are a tiny Arrow pass. No fact
    shuffle, no join."""
    import pyarrow.parquet as _pq
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    out_fields = [("p_partkey", pa.int64()), ("p_name", pa.string()),
                  ("s_suppkey", pa.int64()), ("s_name", pa.string()),
                  ("min_price_cents", pa.int64())]
    reg = _pq.read_table(f"{sf_dir}/region.parquet",
                         columns=["r_regionkey", "r_name"])
    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nat = _pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_regionkey"])
    nkeys = nat.filter(pc.is_in(nat["n_regionkey"],
                                value_set=rkeys))["n_nationkey"]
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name", "s_nationkey"])
    sup = sup.filter(pc.is_in(sup["s_nationkey"], value_set=nkeys))
    if not len(sup):
        return pa.schema(out_fields).empty_table()
    skeys_ref = ray.put(
        pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks())

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey",
                                     "l_extendedprice"])

    def min_partial(t: pa.Table) -> pa.Table:
        skeys = ray.get(skeys_ref)
        keep = pc.is_in(pc.cast(t["l_suppkey"], pa.int64()),
                        value_set=skeys)
        t = t.filter(keep)
        prep = pa.table({
            "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "price": _cents(t["l_extendedprice"]),
        })
        out = prep.group_by(["p_partkey", "s_suppkey"]).aggregate(
            [("price", "min")])
        return out.rename_columns(["p_partkey", "s_suppkey", "price"])

    sp = grouped_agg(li.map_batches(skip_empty(min_partial),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True),
                     ["p_partkey", "s_suppkey"], [("price", "min")])
    if not len(sp):
        return pa.schema(out_fields).empty_table()
    pm = sp.group_by(["p_partkey"]).aggregate([("price_min", "min")])
    pos = pc.index_in(sp["p_partkey"], value_set=pm["p_partkey"])
    part_min = pc.take(pm["price_min_min"], pos)
    sp = sp.filter(pc.equal(sp["price_min"], part_min))

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name"])
    pname_of = dict(zip(pc.cast(part["p_partkey"],
                                pa.int64()).to_pylist(),
                        part["p_name"].to_pylist()))
    sname_of = dict(zip(pc.cast(sup["s_suppkey"],
                                pa.int64()).to_pylist(),
                        sup["s_name"].to_pylist()))
    out = pa.table({
        "p_partkey": sp["p_partkey"],
        "p_name": pa.array([pname_of[k] for k in
                            sp["p_partkey"].to_pylist()], pa.string()),
        "s_suppkey": sp["s_suppkey"],
        "s_name": pa.array([sname_of[k] for k in
                            sp["s_suppkey"].to_pylist()], pa.string()),
        "min_price_cents": pc.cast(sp["price_min"], pa.int64()),
    })
    return out.sort_by([("p_partkey", "ascending"),
                        ("s_suppkey", "ascending")])


def part_min_price_supplier_sql(region: str = Q2_REGION) -> str:
    return f"""
WITH sp AS (
  SELECT l_partkey, l_suppkey,
    min(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS spmin
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{region}'
  GROUP BY 1, 2
), pm AS (SELECT l_partkey, min(spmin) AS pmin FROM sp GROUP BY 1)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
  CAST(sp.spmin AS BIGINT) AS min_price_cents
FROM sp JOIN pm USING (l_partkey)
JOIN part p ON p.p_partkey = sp.l_partkey
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
WHERE sp.spmin = pm.pmin
ORDER BY p.p_partkey, s.s_suppkey
""".strip()


# ----------------------------------------- Q21 sole-late supplier blame

Q21_LATE_DAYS = 60


def sole_late_supplier_counts(sf_dir: str,
                              late_days: int = Q21_LATE_DAYS,
                              n_buckets: int = 32) -> pa.Table:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): for
    multi-supplier orders where EXACTLY ONE supplier shipped late
    (> ``late_days`` after the order date), count the orders each such
    supplier is solely to blame for — the EXISTS(other supplier) AND
    NOT EXISTS(other late supplier) double correlation.

    Exact-integer predicate: int64-microsecond compare against an
    integer day offset, identical to the mirror's INTERVAL arithmetic.

    Scale shape: ONE orderkey-bucketed join attaches the order date;
    each batch pre-collapses to (orderkey, suppkey, any_late)
    partials; ONE orderkey-bucket exchange co-locates an order's
    partials so the distinct/sole-late screen is bucket-local and
    emits per-supplier partial counts (supplier keyspace dim-bounded →
    driver merge + name lookup)."""
    import pyarrow.parquet as _pq

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.groups import map_buckets
    from fluent_server_ray.stages.joins import _with_bucket, \
        bucketed_hash_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_shipdate"])
    joined = bucketed_hash_join(orders, li, key="o_orderkey",
                                right_key="l_orderkey",
                                n_buckets=n_buckets)
    off_us = int(late_days) * 86_400_000_000

    def late_partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")),
                       pa.int64())
        odate = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                        pa.int64())
        late = pc.cast(pc.greater(ship, pc.add(odate, off_us)),
                       pa.int64())
        prep = pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "late": late,
        })
        out = prep.group_by(["o_orderkey", "l_suppkey"]).aggregate(
            [("late", "max")])
        return out.rename_columns(["o_orderkey", "l_suppkey", "late"])

    partials = _with_bucket(
        joined.map_batches(skip_empty(late_partial),
                           batch_format="pyarrow", zero_copy_batch=True),
        "o_orderkey", n_buckets)

    blame_schema = pa.schema([pa.field("l_suppkey", pa.int64()),
                              pa.field("numwait", pa.int64())])

    def sole_blame(g: pd.DataFrame) -> pd.DataFrame:
        per = (g.groupby(["o_orderkey", "l_suppkey"])["late"].max()
               .reset_index())
        stats = per.groupby("o_orderkey").agg(
            ns=("l_suppkey", "nunique"), nl=("late", "sum"))
        ok = stats[(stats["ns"] >= 2) & (stats["nl"] == 1)].index
        hit = per[per["o_orderkey"].isin(ok) & (per["late"] == 1)]
        if hit.empty:
            return pd.DataFrame({"l_suppkey": [], "numwait": []})
        return (hit.groupby("l_suppkey").size()
                .rename("numwait").reset_index())

    blamed = map_buckets(partials, sole_blame, blame_schema)
    out = grouped_agg(blamed, ["l_suppkey"], [("numwait", "sum")])
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    name_of = dict(zip(pc.cast(sup["s_suppkey"],
                               pa.int64()).to_pylist(),
                       sup["s_name"].to_pylist()))
    out = pa.table({
        "s_suppkey": pc.cast(out["l_suppkey"], pa.int64()),
        "s_name": pa.array([name_of[k] for k in
                            out["l_suppkey"].to_pylist()], pa.string()),
        "numwait": pc.cast(out["numwait_sum"], pa.int64()),
    })
    return out.sort_by([("numwait", "descending"),
                        ("s_suppkey", "ascending")])


def sole_late_supplier_counts_sql(late_days: int = Q21_LATE_DAYS) -> str:
    return f"""
WITH j AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
    (l_shipdate > o_orderdate + INTERVAL {late_days} DAY) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
), per AS (
  SELECT ok, count(DISTINCT sk) AS ns,
    count(DISTINCT sk) FILTER (WHERE late) AS nl,
    min(sk) FILTER (WHERE late) AS lsk
  FROM j GROUP BY ok
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per JOIN supplier ON s_suppkey = lsk
WHERE ns >= 2 AND nl = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey
""".strip()


def nation_customer_hhi(sf_dir: str) -> pa.Table:
    """Customer-concentration HHI per nation — the antitrust-style
    market-structure readout: per nation, the Herfindahl–Hirschman
    index of its customers' order-value shares ``HHI = Σ(x_i/S)² =
    SS/S²`` (1/n = perfectly even, 1 = one-customer nation) — the
    squared-share sibling of the Gini/Hoover inequality family.

    Exact contract: per-customer cents totals merge distributed
    (customer keys are unbounded — ``final='ray'``); the nation lookup
    broadcasts once (``ray.put``); per-nation SS splits hi/lo so int64
    partials never wrap; HHI is the shared float tree
    ``(_split_float(SS) / float(S)) / float(S)`` — SS passes 2^63 at
    sf0.1 scale, so both engines float it via the split tree, and the
    repeated division avoids S² entirely (NULL when S = 0). Customers with
    no orders don't enter (contract). The customer dim broadcasts
    (small-dim path — swap in ``joins.bucketed_hash_join`` above the
    row threshold, cf. ``orders_by_nation``'s conditional). Output:
    (n_name, n_customers, total_cents, hhi) sorted by name.
    """
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.features import _SS_SPLIT

    import pyarrow.parquet as _pq

    # vectorized small-dim load (no python row loops — the
    # orders_by_nation idiom): driver-local read, Arrow arrays out
    nation = _pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
    nkeys = nation["n_nationkey"].cast(pa.int64()).combine_chunks()
    nnames = nation["n_name"].combine_chunks()
    cust = _pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])
    ckeys = cust["c_custkey"].cast(pa.int64()).combine_chunks()
    cnat = cust["c_nationkey"].cast(pa.int64()).combine_chunks()
    dim_ref = ray.put((ckeys, cnat, nkeys, nnames))

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"])

    def per_cust(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t["o_custkey"]),
                       pc.is_valid(t["o_totalprice"]))
        t = t.filter(keep)
        prep = pa.table({"cust": pc.cast(t["o_custkey"], pa.int64()),
                         "c": _cents(t["o_totalprice"])})
        out = prep.group_by(["cust"]).aggregate([("c", "sum")])
        return out.rename_columns(["cust", "c"])

    per_customer = grouped_agg(
        orders.map_batches(skip_empty(per_cust), batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["cust"], aggs=[("c", "sum")], final="ray")

    def nation_partials(t: pa.Table) -> pa.Table:
        ck, cn, nk, nn = ray.get(dim_ref)
        idx = pc.index_in(t["cust"], value_set=ck)
        nat = pc.take(cn, idx)
        nidx = pc.index_in(nat, value_set=nk)
        x = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and float(np.abs(x).max()) >= 2.0 ** 31:
            raise ValueError("nation_customer_hhi: per-customer cents "
                             "exceed the int64-safe square range — "
                             "rescale upstream")
        sq = x * x
        prep = pa.table({
            "n_name": pc.take(nn, nidx),
            "s": pa.array(x),
            "ss_hi": pa.array(sq // _SS_SPLIT),
            "ss_lo": pa.array(sq % _SS_SPLIT),
            "one": pa.array(np.ones(len(x), np.int64)),
        }).filter(pc.is_valid(pc.take(nn, nidx)))   # inner semantics
        out = prep.group_by(["n_name"]).aggregate(
            [("s", "sum"), ("ss_hi", "sum"), ("ss_lo", "sum"),
             ("one", "sum")])
        return out.rename_columns(["n_name", "s", "ss_hi", "ss_lo",
                                   "one"])

    agg = grouped_agg(
        per_customer.map_batches(skip_empty(nation_partials),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True),
        ["n_name"], [("s", "sum"), ("ss_hi", "sum"), ("ss_lo", "sum"),
                     ("one", "sum")], final="driver").to_pandas()

    from fluent_server_ray.stages.features import _split_float

    out = {"n": [], "cnt": [], "s": [], "h": []}
    for _, r in agg.sort_values("n_name").iterrows():
        s = int(r["s_sum"])
        ss = int(r["ss_hi_sum"]) * _SS_SPLIT + int(r["ss_lo_sum"])
        out["n"].append(r["n_name"])
        out["cnt"].append(int(r["one_sum"]))
        out["s"].append(s)
        # (SS/S)/S, not SS/S²: S² can top 2^64 where DuckDB's
        # hugeint→double cast double-rounds. SS itself passes 2^63 at
        # sf0.1 (found by the round-5 sf0.1 battery — the old loud
        # guard), so both engines float it via the shared split tree.
        out["h"].append((_split_float(ss) / float(s)) / float(s)
                        if s != 0 else None)
    return pa.table({
        "n_name": pa.array(out["n"], pa.string()),
        "n_customers": pa.array(out["cnt"], pa.int64()),
        "total_cents": pa.array(out["s"], pa.int64()),
        "hhi": pa.array(out["h"], pa.float64()),
    })


def nation_customer_hhi_sql() -> str:
    from fluent_server_ray.stages.features import _split_float_sql

    ss_f = _split_float_sql("ss")
    return f"""
WITH pc AS (
  SELECT o_custkey,
    SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), j AS (
  SELECT n.n_name, pc.c
  FROM pc
  JOIN customer cu ON cu.c_custkey = pc.o_custkey
  JOIN nation n ON n.n_nationkey = cu.c_nationkey
), agg AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
    CAST(sum(c) AS BIGINT) AS total_cents,
    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM j GROUP BY 1
)
SELECT n_name, n_customers, total_cents,
  CASE WHEN total_cents != 0 THEN
    {ss_f} / CAST(total_cents AS DOUBLE)
    / CAST(total_cents AS DOUBLE)
  END AS hhi
FROM agg ORDER BY n_name
""".strip()
