"""Deterministic key-stratified sampling — training-data curation.

Sampling for corpus curation must be (a) deterministic across runs,
nodes and engines (no RNG in the data plane — the same discipline as
the reference's entropy-free event path; cf. SURVEY §2.7 F3), and
(b) stratified by a KEY so logical units stay whole: sampling
conversations must keep or drop every turn of a conversation together,
never shred it.

Rule: keep a key iff the first byte of ``md5(key)`` is below a
threshold — ``frac ≈ threshold/256``. md5 is identical in every
language and in DuckDB, and fixed-length lowercase hex compares
lexicographically as numerically, so the SQL mirror is literally
``substr(md5(key), 1, 2) < '<hex>'`` — the Ray stage and the oracle
cannot drift.

Vectorization: md5 runs once per DISTINCT key per batch (dictionary
encode → hash uniques → take), not per row — a conversation's turns
share one digest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _keep_mask(keys: pa.Array, hex_threshold: str) -> pa.Array:
    # NULL keys are NEVER kept (SQL: md5(NULL) is NULL, the comparison
    # fails) — do not conflate them with the real empty-string key,
    # whose md5('') the mirror also computes
    enc = pc.dictionary_encode(pc.cast(keys, pa.string()))
    uniq = enc.dictionary.to_pylist()
    keep_per_value = pa.array(
        np.fromiter(
            (hashlib.md5(u.encode()).hexdigest()[:2] < hex_threshold
             for u in uniq),
            dtype=bool, count=len(uniq),
        )
    )
    return pc.fill_null(pc.take(keep_per_value, enc.indices), False)


def sample_by_key(ds, key_col: str, hex_threshold: str | None = "40"):
    """Keep all rows whose ``key_col`` hashes under the threshold
    (``'40'`` ≈ 25%, ``'80'`` ≈ 50% of keys — of KEYS, not rows: a hot
    key contributes all or none of its rows).

    ``hex_threshold=None`` is the keep-all sentinel (the stage becomes
    a no-op) — two hex chars cannot express 100%: even ``'ff'`` drops
    keys whose md5 starts with ``'ff'`` (~1/256)."""
    if hex_threshold is None:
        return ds
    if not (len(hex_threshold) == 2
            and all(c in "0123456789abcdef" for c in hex_threshold)):
        raise ValueError(
            "hex_threshold must be two lowercase hex chars, or None to keep all"
        )

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        arr = t[key_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return t.filter(_keep_mask(arr, hex_threshold))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_by_key_sql_predicate(key_col: str,
                                hex_threshold: str | None = "40") -> str:
    """The DuckDB WHERE predicate mirroring :func:`sample_by_key`."""
    if hex_threshold is None:  # keep-all sentinel, same as the stage
        return "TRUE"
    return (
        f"substr(md5(COALESCE(CAST({key_col} AS VARCHAR), '')), 1, 2)"
        f" < '{hex_threshold}'"
    )


def _md5_hex(ids) -> list[str]:
    """md5 hex digests of stringified ids — the shared deterministic
    rank key of every order-sensitive sampler here (engine-independent:
    DuckDB's ``md5(CAST(id AS VARCHAR))`` is byte-identical).

    Raises on a NULL id: the SQL mirrors rank ``md5(NULL)`` as NULL
    (NULLS LAST), which no finite engine-side hash can reproduce — a
    loud error beats a silently divergent sample order."""
    if any(v is None or v != v for v in ids):  # None, or float NaN from
        # a nully int column round-tripped through pandas
        raise ValueError(
            "md5 rank key got a NULL id — rank-based samplers require "
            "non-NULL ids (SQL would NULLS-LAST these rows)"
        )
    return [hashlib.md5(str(v).encode()).hexdigest() for v in ids]


def per_key_cap(ds, key_col: str = "source", id_col: str = "doc_id",
                cap: int = 10, n_buckets: int = 64):
    """Quota sampling: keep at most ``cap`` rows per key, chosen
    deterministically (rank by ``(md5(id), id)`` within the key) — the
    domain-balancing step of web-corpus curation (cap documents per
    source/domain so one crawl host cannot dominate the training mix).

    Physical shape: ONE hash-bucket exchange on the key (a key's rows
    must co-locate to rank) followed by a segmented pandas
    cumcount over the whole bucket — never per-key Python. At 100 TB,
    parallelism = n_buckets and a hot domain is bounded by its bucket;
    rows carry only (id, key), never payloads — join the survivors
    back by id to materialize text.

    Output: (id_col, key_col) of survivors, sorted by id.
    """
    import pandas as pd  # noqa: F401 (per_bucket runs under pandas)

    from fluent_server_ray.stages.assembly import _with_bucket

    def per_bucket(g):
        g = g.assign(_h=_md5_hex(g[id_col]))
        g = g.sort_values([key_col, "_h", id_col])
        keep = g.groupby(key_col, sort=False).cumcount() < cap
        return g.loc[keep, [id_col, key_col]]

    bucketed = _with_bucket(ds.select_columns([id_col, key_col]),
                            key_col, n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(id_col)


def per_key_cap_sql(key_col: str = "source", id_col: str = "doc_id",
                    cap: int = 10, table: str = "documents") -> str:
    h = f"md5(CAST({id_col} AS VARCHAR))"
    return (
        f"SELECT {id_col}, {key_col} FROM {table} "
        f"QUALIFY row_number() OVER (PARTITION BY {key_col}"
        f" ORDER BY {h}, {id_col}) <= {cap} ORDER BY {id_col}"
    )


def shuffle_order(ds, id_col: str = "doc_id"):
    """Deterministic global corpus shuffle for training order: sort by
    ``md5(id)`` — a seedless, engine-independent permutation (the same
    entropy-free-data-plane discipline as :func:`sample_by_key`; an
    epoch seed just concatenates into the hashed string). Output:
    (id, skey) in shuffled order.

    Scale shape: ONE distributed range-sort on a 32-byte key — the
    all-to-all exchange is the operator's purpose (a global shuffle IS
    a full repartition); only (id, skey) move, and consumers join
    payloads back by id or iterate this as the sample-order manifest.
    """

    def key(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string()).to_pylist()
        return pa.table(
            {id_col: t[id_col],
             "skey": pa.array(_md5_hex(ids), type=pa.string())}
        )

    keyed = ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.sort(["skey", id_col])


def shuffle_order_sql(id_col: str = "doc_id",
                      table: str = "documents") -> str:
    h = f"md5(CAST({id_col} AS VARCHAR))"
    return (
        f"SELECT {id_col}, {h} AS skey FROM {table} ORDER BY skey, {id_col}"
    )


def bottomk_sample(ds, id_col: str = "doc_id", k: int = 50) -> pa.Table:
    """Deterministic uniform corpus sample: the ``k`` rows with the
    smallest ``md5(id)`` (bottom-k minwise sampling — the same family
    as the IVF trainer's sampler, ``similarity._bottomk_sample_matrix``,
    exposed as a first-class row sampler for corpus
    preview/QA). Per-block bottom-k partials (k rows per block), one
    O(blocks·k) driver merge — no sort, no shuffle. Returns a small
    pyarrow Table (id, skey) ordered by skey."""

    def partial(t: pa.Table):
        if len(t) == 0:
            return
        ids = pc.cast(t[id_col], pa.string()).to_pylist()
        p = pa.table(
            {id_col: t[id_col],
             "skey": pa.array(_md5_hex(ids), type=pa.string())}
        )
        order = pc.sort_indices(
            p, sort_keys=[("skey", "ascending"), (id_col, "ascending")]
        )
        yield p.take(order[:k])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    tables = list(parts.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        sch = ds.schema(fetch_if_missing=True)
        id_type = (dict(zip(sch.names, sch.types))[id_col]
                   if sch is not None else pa.int64())
        return pa.table({id_col: pa.array([], type=id_type),
                         "skey": pa.array([], type=pa.string())})
    merged = pa.concat_tables(tables)
    order = pc.sort_indices(
        merged, sort_keys=[("skey", "ascending"), (id_col, "ascending")]
    )
    return merged.take(order[:k])


def bottomk_sample_sql(id_col: str = "doc_id", k: int = 50,
                       table: str = "documents") -> str:
    h = f"md5(CAST({id_col} AS VARCHAR))"
    return (
        f"SELECT {id_col}, {h} AS skey FROM {table}"
        f" ORDER BY skey, {id_col} LIMIT {k}"
    )


WEIGHT_CHARS_FULL = 512  # n_chars at (and beyond) which keep-prob ≈ 1


def _md5_first_byte(id_col_arr) -> "np.ndarray":
    """The deterministic sampling coin: md5(id)'s first byte as int64,
    shared by every per-row keep/drop stage. A NULL id yields the
    sentinel 1<<30 — larger than any expressible threshold, so the row
    is always dropped, exactly like the SQL mirrors where
    ``md5(NULL)`` is NULL and the comparison fails."""
    ids = pc.cast(id_col_arr, pa.string()).to_pylist()
    # digest()[0] == int(hexdigest()[:2], 16), minus the hex-string
    # detour (~24% faster; ~660 ns/id — per-DOCUMENT, not per-turn:
    # every coin stage here samples document/conversation-grained ids,
    # so at corpus scale the coin is noise next to reading the doc)
    return np.fromiter(
        ((1 << 30) if s is None
         else hashlib.md5(s.encode()).digest()[0]
         for s in ids),
        dtype=np.int64, count=len(ids),
    )


def weighted_sample(ds, id_col: str = "doc_id",
                    weight_col: str = "n_chars",
                    full_at: int = WEIGHT_CHARS_FULL):
    """Quality-weighted deterministic downsampling: keep a row with
    probability ``min(weight, full_at-1)/full_at`` — higher-quality
    (here: longer) documents survive preferentially, the weighted
    flavor of the curation gate. The coin is ``md5(id)``'s first byte
    vs a PER-ROW threshold, so the decision is a pure function of
    (id, weight): deterministic across runs/engines, quantized to
    1/256 (the md5-first-byte granularity — documented contract, and
    exactly what the SQL mirror computes via ``printf('%02x', …)``).
    Pure map stage, no shuffle. Output: (id, weight) of survivors."""

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.select([id_col, weight_col])
        first_byte = _md5_first_byte(t[id_col])
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        thresh = (np.minimum(w, full_at - 1) * 256) // full_at
        return t.select([id_col, weight_col]).filter(
            pa.array(first_byte < thresh)
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample_sql(id_col: str = "doc_id",
                        weight_col: str = "n_chars",
                        full_at: int = WEIGHT_CHARS_FULL,
                        table: str = "documents") -> str:
    h = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 2)"
    thresh = (f"printf('%02x', CAST((LEAST({weight_col}, {full_at - 1})"
              f" * 256) // {full_at} AS BIGINT))")
    return (
        f"SELECT {id_col}, {weight_col} FROM {table}"
        f" WHERE {h} < {thresh}"
    )


def mixture_sample(ds, fractions: dict[str, float],
                   key_col: str = "source", id_col: str = "doc_id"):
    """Training-mixture sampling: keep each row with its SOURCE's
    declared fraction — the "30% web, 100% books, 5% logs" data-mixing
    step every pretraining pipeline runs. The coin is ``md5(id)``'s
    first byte vs a per-source threshold (pure function of (id,
    source): deterministic across runs/engines/shards; quantized to
    1/256 like :func:`weighted_sample` — a declared fraction ``f``
    keeps exactly the ids whose coin < round(f*256)). Sources not in
    ``fractions`` are dropped (explicit mixture = explicit universe);
    a fraction ≥ 1.0 keeps all rows of that source. Pure map stage, no
    shuffle. Output: (id, key) of survivors."""
    for k, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction out of [0,1] for {k!r}: {f}")
    groups = sorted(fractions)
    groups_arr = pa.array(groups, type=pa.string())
    thresh = np.array([int(round(fractions[g] * 256)) for g in groups],
                      dtype=np.int64)

    def fn(t: pa.Table) -> pa.Table:
        out = t.select([id_col, key_col])
        if len(t) == 0:
            return out
        first_byte = _md5_first_byte(t[id_col])
        idx = pc.index_in(t[key_col], groups_arr)
        pos = idx.to_numpy(zero_copy_only=False)  # float64 w/ NaN
        row_thresh = np.zeros(len(t), dtype=np.int64)  # undeclared → drop
        hit = ~np.isnan(pos.astype(np.float64))
        row_thresh[hit] = thresh[pos[hit].astype(np.int64)]
        # threshold 256 = the keep-all branch: no coin at all (the SQL
        # mirror's bare `key = 'x'` predicate keeps even NULL-id rows)
        keep = (row_thresh >= 256) | (first_byte < row_thresh)
        return out.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample_sql(fractions: dict[str, float],
                       key_col: str = "source", id_col: str = "doc_id",
                       table: str = "documents") -> str:
    h = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 2)"
    preds = []
    for k in sorted(fractions):
        esc = k.replace("'", "''")
        t = int(round(fractions[k] * 256))
        if t >= 256:  # keep-all: no 2-hex-char threshold can express it
            preds.append(f"{key_col} = '{esc}'")
        elif t <= 0:
            continue  # keep-none: source contributes no predicate
        else:
            preds.append(
                f"({key_col} = '{esc}' AND {h} < printf('%02x', {t}))"
            )
    where = " OR ".join(preds) if preds else "FALSE"
    return f"SELECT {id_col}, {key_col} FROM {table} WHERE {where}"


def rebalance_by_key(ds, group_col: str = "source",
                     id_col: str = "doc_id", scale: int = 65_536):
    """Distribution rebalancing: deterministically downsample every
    group to (approximately) the SMALLEST group's mass — the "flatten
    the source mix" step of training-data assembly (uniform-mixing
    special case of temperature sampling; arbitrary targets are the
    same shape with a target table instead of min).

    Two passes, statistic-then-map: pass 1 is a bounded grouped count
    (combiner); the per-group keep-rate becomes an INTEGER md5-prefix
    threshold k = (min_n · scale) // n_g — integer arithmetic, so the
    SQL mirror derives the identical threshold — and pass 2 keeps rows
    whose ``md5(id)`` 4-hex prefix sorts below ``%04x % k`` (the
    smallest group, k == scale, keeps everything: no '10000' string —
    DuckDB lpad/compare on a 5-char hex would order WRONG against
    2-char prefixes, so keep-all short-circuits explicitly). Output
    (id, group) for survivors."""
    from fluent_server_ray.stages.aggregate import grouped_counts

    counts = grouped_counts(
        ds.map_batches(lambda t: t.select([group_col]),
                       batch_format="pyarrow", zero_copy_batch=True),
        [group_col],
    )
    if len(counts) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            group_col: pa.array([], type=pa.string()),
        }))
    ns = {g: int(n) for g, n in zip(counts[group_col].to_pylist(),
                                    counts["n"].to_pylist())}
    min_n = min(ns.values())
    thr = {g: (min_n * scale) // n for g, n in ns.items()}

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hexes = _md5_hex(ids)
        gs = t[group_col].to_pylist()
        mask = pa.array([
            thr.get(g, 0) >= scale or h[:4] < format(thr.get(g, 0), "04x")
            for g, h in zip(gs, hexes)
        ])
        return t.select([id_col, group_col]).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def rebalance_by_key_sql(group_col: str = "source",
                         id_col: str = "doc_id", scale: int = 65_536,
                         table: str = "documents") -> str:
    return f"""
WITH c AS (
  SELECT {group_col}, count(*) AS n FROM {table} GROUP BY {group_col}
), m AS (
  SELECT min(n) AS mn FROM c
), t AS (
  SELECT {group_col}, (m.mn * {scale}) // n AS k FROM c, m
)
SELECT d.{id_col}, d.{group_col}
FROM {table} d JOIN t USING ({group_col})
WHERE t.k >= {scale}
   OR substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 4) < printf('%04x', t.k)
""".strip()


def select_token_budget(ds, budget: int, group_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text",
                        len_col: str = "n_chars",
                        max_boundary_rows: int = 1 << 22):
    """Quality-ordered data selection under a per-group TOKEN budget —
    "give me the best ``budget`` tokens from every source", the
    curation step that turns a scored corpus into a training mix.

    Rule (deterministic, windowable): within each group order docs by
    (score DESC, id ASC) — score = alpha-ratio in integer millionths,
    ``n_alpha * 1_000_000 // max(n_chars, 1)``, the exact-integer
    quality contract shared with the SQL mirror — and keep the maximal
    prefix whose inclusive token cumsum stays ≤ ``budget`` (tokens =
    runs of non-space, the engine's shared token rule).

    A naive per-group sort+cumsum puts a WHOLE SOURCE in one task —
    the thing that OOMs at 100 TB. This is statistic-then-map instead:

    1. one vectorized pass → (id, group, score, n_tok);
    2. per-(group, score-bin) token sums via the distributed combiner
       merge (``grouped_agg(final='ray')`` — the (group × millionths)
       key space is unbounded, the driver never holds it);
    3. per-group threshold scan over its ≤ 1e6+1 bins (one map_groups
       task per group): full bins fit while the bin cumsum ≤ budget;
       the FIRST bin crossing the budget is the group's single
       boundary bin, carrying the remaining budget. One tiny row per
       group reaches the driver (bounded by |groups|) and broadcasts;
    4. docs strictly above the threshold keep unconditionally (pure
       filter); only the boundary bin's docs take a second ordered
       pass (id-ASC cumsum against the remaining budget). A degenerate
       corpus where one (group, score) bin holds > ``max_boundary_rows``
       docs raises rather than silently serializing onto one task.

    Returns kept ``(id, group, score, n_tok)`` sorted by (group, id).
    Equality with the window mirror: a doc's inclusive global cumsum ≤
    budget ⟺ its bin fully fits, or it sits in the boundary bin with
    intra-bin cumsum ≤ remaining — later bins start past the budget
    (cumsums are monotone; zero-token docs follow the same algebra).
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.textstats import TOKEN_RE

    def score_pass(t: pa.Table) -> pa.Table:
        text = t[text_col]
        n_alpha = pc.cast(
            pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
        n_chars = pc.max_element_wise(
            pc.cast(t[len_col], pa.int64()), pa.scalar(1, pa.int64()))
        score = pc.divide(pc.multiply(n_alpha, pa.scalar(1_000_000,
                                                         pa.int64())),
                          n_chars)
        n_tok = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                        pa.int64())
        return pa.table({id_col: t[id_col], group_col: t[group_col],
                         "score": score, "n_tok": n_tok})

    scored = ds.map_batches(score_pass, batch_format="pyarrow",
                            zero_copy_batch=True)
    # multi-consumer below (filter + boundary pass) — materialize the
    # projection once so the upstream read/score doesn't re-execute
    scored = scored.materialize()

    bins = grouped_agg(scored, [group_col, "score"],
                       [("n_tok", "sum")], final="ray")

    def thresholds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("score", ascending=False)
        cum = g["n_tok_sum"].cumsum()
        pre = cum - g["n_tok_sum"]
        over = cum > budget
        if not over.any():  # whole group fits: thr=-1 keeps all
            # (scores are ≥ 0; a typed sentinel keeps the block schema
            # int64 everywhere — a None here would give this group a
            # null-typed column and flip schemas across blocks)
            return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                                 "thr": [-1], "rem": [0]})
        i = int(np.argmax(over.to_numpy()))
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            "thr": [int(g["score"].iloc[i])],
            "rem": [int(budget - pre.iloc[i])],
        })

    # one row per group: bounded by |groups| (the source mix), so the
    # driver collect is the statistic, not the data
    thr_tbl = (bins.groupby(group_col)
               .map_groups(thresholds, batch_format="pandas")
               .to_pandas())
    thr = {r[group_col]: (int(r["thr"]), int(r["rem"]))
           for _, r in thr_tbl.iterrows()}

    def _thr_of(t: pa.Table) -> np.ndarray:
        # factorize-then-scatter: the dict lookup runs per DISTINCT
        # group in the batch, never per row
        codes, uniques = pd.factorize(
            pd.Series(t[group_col].to_pandas()), sort=False)
        per_u = np.array([thr.get(u, (-1, 0))[0] for u in uniques],
                         dtype=np.int64)
        return per_u[codes]

    def keep_full(t: pa.Table) -> pa.Table:
        sc = t["score"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(sc > _thr_of(t)))

    def boundary_only(t: pa.Table) -> pa.Table:
        sc = t["score"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(sc == _thr_of(t)))

    full = scored.map_batches(keep_full, batch_format="pyarrow",
                              zero_copy_batch=True)

    def resolve_boundary(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_boundary_rows:
            raise ValueError(
                f"select_token_budget: boundary bin for group "
                f"{g[group_col].iloc[0]!r} holds {len(g)} rows > "
                f"max_boundary_rows={max_boundary_rows} — a degenerate "
                "single-score group; raise the cap or refine the score")
        g = g.sort_values(id_col)
        rem = thr[g[group_col].iloc[0]][1]
        return g[g["n_tok"].cumsum() <= rem]

    bdocs = scored.map_batches(boundary_only, batch_format="pyarrow",
                               zero_copy_batch=True)

    # an EMPTY map_groups output (e.g. budget=0) serializes as a
    # column-less pandas block and poisons the union's schema — coerce
    # every boundary block back to the scored schema explicitly
    sch = scored.schema().base_schema
    cols = [id_col, group_col, "score", "n_tok"]
    out_schema = pa.schema([(c, sch.field(c).type) for c in cols])
    empty_tbl = pa.table(
        {c: pa.array([], type=sch.field(c).type) for c in cols})

    def coerce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return empty_tbl
        return t.select(cols).cast(out_schema)

    bkept = (bdocs.groupby(group_col)
             .map_groups(resolve_boundary, batch_format="pandas")
             # union() requires both sides on the same block type —
             # re-encode the pandas map_groups blocks as Arrow
             .map_batches(coerce, batch_format="pyarrow"))
    return full.union(bkept).sort([group_col, id_col])


def select_token_budget_sql(budget: int, group_col: str = "source",
                            id_col: str = "doc_id",
                            len_col: str = "n_chars",
                            table: str = "documents") -> str:
    """Window mirror of the same prefix-under-budget rule."""
    return f"""
WITH scored AS (
  SELECT {id_col}, {group_col},
    len(regexp_extract_all(text, '[A-Za-z]')) * 1000000
      // greatest({len_col}, 1) AS score,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok
  FROM {table}
)
SELECT {id_col}, {group_col}, CAST(score AS BIGINT) AS score, n_tok
FROM (
  SELECT scored.*, sum(n_tok) OVER (
    PARTITION BY {group_col} ORDER BY score DESC, {id_col} ASC
    ROWS UNBOUNDED PRECEDING) AS cum
  FROM scored)
WHERE cum <= {budget}
ORDER BY {group_col}, {id_col}
""".strip()


def temperature_sample(ds, alpha: float = 0.5,
                       group_col: str = "source",
                       id_col: str = "doc_id", scale: int = 65_536):
    """Temperature-based source resampling (the multilingual-LM mixing
    rule of Conneau & Lample 2019 / mBERT): per-source keep-rate
    ``(min_n / n_s)^(1-alpha)`` — ``alpha=1`` keeps the natural mix,
    ``alpha=0`` flattens to the smallest source (exactly
    :func:`rebalance_by_key`), the default ``alpha=0.5`` (temperature
    T=2) is the published sweet spot that upsamples the tail without
    drowning the head. ``alpha`` is restricted to {0.0, 0.5, 1.0}: the
    keep-rate must be EXACT integer arithmetic on both engines, and
    those three exponents have exact forms (identity, isqrt, one).

    Two passes, statistic-then-map (same shape as
    :func:`rebalance_by_key`): a bounded grouped count, then per-source
    integer thresholds over the md5-4-hex-prefix coin —
    ``k_s = isqrt((scale² · min_n) // n_s)`` for alpha=0.5, computed in
    exact Python ints engine-side and mirrored in SQL by a
    float-sqrt-plus-correction (floor(sqrt(x)) can be off by one ulp at
    perfect squares; the ±1 fixup makes it exact isqrt). Output
    (id, group) for survivors."""
    from fluent_server_ray.stages.aggregate import grouped_counts

    if alpha not in (0.0, 0.5, 1.0):
        raise ValueError(
            f"alpha must be one of 0.0, 0.5, 1.0 (got {alpha}) — other "
            "exponents have no exact integer threshold form shared "
            "with the SQL mirror")

    counts = grouped_counts(
        ds.map_batches(lambda t: t.select([group_col]),
                       batch_format="pyarrow", zero_copy_batch=True),
        [group_col],
    )
    if len(counts) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            group_col: pa.array([], type=pa.string()),
        }))
    import math

    ns = {g: int(n) for g, n in zip(counts[group_col].to_pylist(),
                                    counts["n"].to_pylist())}
    min_n = min(ns.values())
    if alpha == 1.0:
        thr = {g: scale for g in ns}
    elif alpha == 0.0:
        thr = {g: (min_n * scale) // n for g, n in ns.items()}
    else:
        thr = {g: math.isqrt((scale * scale * min_n) // n)
               for g, n in ns.items()}

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hexes = _md5_hex(ids)
        gs = t[group_col].to_pylist()
        mask = pa.array([
            thr.get(g, 0) >= scale or h[:4] < format(thr.get(g, 0), "04x")
            for g, h in zip(gs, hexes)
        ])
        return t.select([id_col, group_col]).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def temperature_sample_sql(alpha: float = 0.5,
                           group_col: str = "source",
                           id_col: str = "doc_id", scale: int = 65_536,
                           table: str = "documents") -> str:
    """Standalone mirror: derives the same integer thresholds in SQL.
    For alpha=0.5 the isqrt is float sqrt + a ±1 correction (exact)."""
    if alpha == 1.0:
        k_expr = f"{scale}"
    elif alpha == 0.0:
        k_expr = f"(m.mn * {scale}) // n"
    elif alpha == 0.5:
        # x fits HUGEINT; x ≤ scale² so kr ≤ scale and kr² fits BIGINT
        return f"""
WITH c AS (
  SELECT {group_col}, count(*) AS n FROM {table} GROUP BY {group_col}
), m AS (
  SELECT min(n) AS mn FROM c
), x AS (
  SELECT {group_col},
    CAST((CAST({scale} AS HUGEINT) * {scale} * m.mn) // n AS BIGINT) AS xv
  FROM c, m
), kr AS (
  SELECT {group_col}, xv,
    CAST(floor(sqrt(CAST(xv AS DOUBLE))) AS BIGINT) AS kraw
  FROM x
), t AS (
  SELECT {group_col},
    kraw + CASE WHEN (kraw + 1) * (kraw + 1) <= xv THEN 1
                WHEN kraw * kraw > xv THEN -1 ELSE 0 END AS k
  FROM kr
)
SELECT d.{id_col}, d.{group_col}
FROM {table} d JOIN t USING ({group_col})
WHERE t.k >= {scale}
   OR substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 4) < printf('%04x', t.k)
""".strip()
    else:
        raise ValueError(f"alpha must be one of 0.0, 0.5, 1.0 (got {alpha})")
    return f"""
WITH c AS (
  SELECT {group_col}, count(*) AS n FROM {table} GROUP BY {group_col}
), m AS (
  SELECT min(n) AS mn FROM c
), t AS (
  SELECT {group_col}, {k_expr} AS k FROM c, m
)
SELECT d.{id_col}, d.{group_col}
FROM {table} d JOIN t USING ({group_col})
WHERE t.k >= {scale}
   OR substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 4) < printf('%04x', t.k)
""".strip()


def stratified_split(ds, strat_col: str = "source",
                     id_col: str = "doc_id",
                     val_ppm: int = 100_000, test_ppm: int = 100_000,
                     n_buckets: int = 64):
    """EXACT-quota stratified train/val/test split: within every
    stratum, rank rows by ``(md5(id), id)`` and assign the first
    ``⌊n·val_ppm/10^6⌋`` to val, the next ``⌊n·test_ppm/10^6⌋`` to
    test, the rest to train — so every stratum's split proportions are
    exact to the row (the evaluation-design requirement
    :func:`assembly.split_assign`'s md5 coin cannot give: a coin's
    per-stratum fractions wobble ~1/√n).

    ONE hash-bucket exchange on the stratum co-locates each stratum,
    so the stratum size and the within-stratum rank both come out of
    one segmented pandas pass over the bucket — no separate size pass.
    Contract (same as every key-colocating exchange here): a stratum
    lives in one bucket; at open scale with pathological strata use
    the coin-based ``split_assign``. NULL strata form their own
    stratum (SQL ``PARTITION BY`` semantics); NULL ids raise
    (see :func:`_md5_hex`).

    Output: (id, stratum, split) sorted by id.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.assembly import _with_bucket
    from fluent_server_ray.stages.groups import map_buckets

    for name, v in (("val_ppm", val_ppm), ("test_ppm", test_ppm)):
        if not 0 <= v <= 1_000_000:
            raise ValueError(f"{name} out of [0, 1000000]: {v}")
    if val_ppm + test_ppm > 1_000_000:
        raise ValueError("val_ppm + test_ppm exceed the corpus")

    schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field(strat_col, pa.string()),
        pa.field("split", pa.string()),
    ])

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.assign(_h=_md5_hex(g[id_col]))
        g = g.sort_values([strat_col, "_h", id_col])
        grp = g.groupby(strat_col, sort=False, dropna=False)
        n = grp[id_col].transform("size").to_numpy().astype(np.int64)
        r = grp.cumcount().to_numpy().astype(np.int64)
        n_val = (n * val_ppm) // 1_000_000
        n_test = (n * test_ppm) // 1_000_000
        split = np.where(r < n_val, "val",
                         np.where(r < n_val + n_test, "test", "train"))
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             strat_col: g[strat_col].to_numpy(),
                             "split": split})

    bucketed = _with_bucket(ds.select_columns([id_col, strat_col]),
                            strat_col, n_buckets)
    return map_buckets(bucketed, per_bucket, schema).sort(id_col)


def stratified_split_sql(strat_col: str = "source",
                         id_col: str = "doc_id",
                         val_ppm: int = 100_000, test_ppm: int = 100_000,
                         table: str = "documents") -> str:
    return f"""
WITH r AS (
  SELECT {id_col}, {strat_col},
    row_number() OVER (PARTITION BY {strat_col}
      ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn,
    count(*) OVER (PARTITION BY {strat_col}) AS n
  FROM {table}
)
SELECT {id_col}, {strat_col},
  CASE WHEN rn <= (n * {val_ppm}) // 1000000 THEN 'val'
       WHEN rn <= (n * {val_ppm}) // 1000000
                  + (n * {test_ppm}) // 1000000 THEN 'test'
       ELSE 'train' END AS split
FROM r ORDER BY {id_col}
""".strip()
