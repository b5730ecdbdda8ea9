"""Training-set assembly stages: ordered window functions, conversation
assembly, sequence packing, dataset splits.

The reference preserves intra-chunk order and nothing more
(``defaultreader/reader.go:85-103``); a training-data pipeline needs
real per-key ORDERED computation on top. The shared physical shape
here is ONE hash-bucket exchange on the key (``hash_bucket_array`` —
the same primitive every combiner/join stage uses) followed by
per-bucket VECTORIZED segmented kernels (pandas groupby cumsum/shift
run in C over the whole bucket, never per Python group) — so the cost
is one shuffle of exactly the needed columns regardless of key
cardinality, and a hot conversation never exceeds a bucket.

Every operator has an exact DuckDB window-function mirror.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _with_bucket(ds, key_col: str, n_buckets: int):
    from fluent_server_ray.stages.aggregate import hash_bucket_array, skip_empty

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(hash_bucket_array(t[key_col], n_buckets))
        )

    # skip_empty: the output feeds a groupby shuffle, where a zero-row
    # block would come back 0-column and trip the executor's
    # schema-mismatch warning (see aggregate.skip_empty)
    return ds.map_batches(skip_empty(fn), batch_format="pyarrow",
                          zero_copy_batch=True)


def running_turn_stats(ds, n_buckets: int = 64):
    """Per-conversation ordered window functions over transcript turns:
    ``turn_rank`` (1-based row_number), ``cum_chars`` (running character
    total, inclusive), ``prev_role`` (lag(role), NULL at the head) —
    the per-key ordered primitives (row_number / running sum / lag)
    under stable ``(conv_id, turn_idx)`` order.

    One bucket exchange; inside a bucket the groupby cumsum / cumcount
    / shift are pandas C kernels over all conversations at once."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        grp = g.groupby("conv_id", sort=False)
        n_chars = g["text"].str.len().astype("int64")
        prev_role = grp["role"].shift()
        # None, not NaN: DuckDB NULL VARCHAR → None in pandas; pandas'
        # nan-vs-None equality tolerance is deprecated — stay exact
        prev_role = prev_role.where(prev_role.notna(), None)
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "turn_rank": (grp.cumcount() + 1).astype("int64"),
                "cum_chars": n_chars.groupby(
                    g["conv_id"], sort=False
                ).cumsum(),
                "prev_role": prev_role,
            }
        )

    cols = ["conv_id", "turn_idx", "role", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    # deterministic output order (map_groups emits buckets in arbitrary
    # order; (conv_id, turn_idx) is a total order over turns)
    return out.sort(["conv_id", "turn_idx"])


def running_turn_stats_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + """
SELECT conv_id, turn_idx,
  CAST(row_number() OVER w AS BIGINT) AS turn_rank,
  CAST(sum(length(text)) OVER w AS BIGINT) AS cum_chars,
  lag(role) OVER w AS prev_role
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
ORDER BY conv_id, turn_idx"""
    )


def conv_to_documents(ds, n_buckets: int = 64):
    """Assemble one training DOCUMENT per conversation: turns sorted by
    ``turn_idx``, rendered ``role: text`` and newline-joined — the
    transcripts→documents step that turns a log pipeline's output into
    model training input. Output: (conv_id, doc_text, n_turns).

    Same single bucket exchange as :func:`running_turn_stats`; the
    join runs per conversation inside the bucket."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        line = g["role"].str.cat(g["text"], sep=": ")
        grp = line.groupby(g["conv_id"], sort=False)
        joined = grp.agg("\n".join)
        return pd.DataFrame(
            {
                "conv_id": joined.index.to_numpy(),
                "doc_text": joined.to_numpy(),
                "n_turns": grp.size().astype("int64").to_numpy(),
            }
        )

    cols = ["conv_id", "turn_idx", "role", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort("conv_id")


def conv_to_documents_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + """
SELECT conv_id,
  string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS doc_text,
  count(*) AS n_turns
FROM transcripts GROUP BY conv_id ORDER BY conv_id"""
    )


PACK_BUDGET = 1024
PACK_BUCKETS = 8


def pack_sequences(ds, budget: int = PACK_BUDGET,
                   n_buckets: int = PACK_BUCKETS,
                   n_col: str | None = None):
    """Deterministic concat-and-chunk sequence packing: documents are
    ordered by ``doc_id`` within ``bucket = doc_id % n_buckets``,
    logically concatenated, and cut into ``budget``-token sequences —
    each doc is assigned to the sequence where it STARTS (the standard
    LM-pretraining packing layout; a doc straddling a boundary belongs
    to its starting bin). Output per doc: (doc_id, bucket, seq_id,
    seq_off) with ``seq_off`` the token offset inside its sequence.

    Fully vectorized: the assignment is a window cumsum —
    ``off = running_sum(n_tokens) - n_tokens``; ``seq_id = off //
    budget``; no sequential bin-state loop. Buckets bound the ordered
    scan: packing parallelism = n_buckets, so size it to the cluster
    (each bucket's docs must co-locate — at corpus scale use thousands
    of buckets; sequences never cross buckets).

    ``n_col``: name of a precomputed token-count column (e.g. the
    ``n_tokens`` a tokenizer stage emitted) — packing then respects
    the REAL tokenizer's counts; default derives counts from ``text``
    with the whitespace TOKEN_RE."""
    from fluent_server_ray.stages.textstats import TOKEN_RE

    def prep(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        bucket = pc.subtract(
            did, pc.multiply(pc.divide(did, n_buckets), n_buckets)
        )
        n = (pc.cast(t[n_col], pa.int64()) if n_col is not None
             else pc.cast(
                 pc.count_substring_regex(t["text"], TOKEN_RE), pa.int64()))
        return pa.table(
            {
                "doc_id": did,
                "bucket": pc.cast(bucket, pa.int64()),
                "n": n,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        off = g["n"].cumsum() - g["n"]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "bucket": g["bucket"],
                "seq_id": (off // budget).astype("int64"),
                "seq_off": (off % budget).astype("int64"),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = prepped.groupby("bucket").map_groups(per_bucket,
                                               batch_format="pandas")
    return out.sort("doc_id")


def pack_sequences_sql(budget: int = PACK_BUDGET,
                       n_buckets: int = PACK_BUCKETS,
                       table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT doc_id, doc_id % {n_buckets} AS bucket,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n
  FROM {table}
), c AS (
  SELECT doc_id, bucket,
    sum(n) OVER (PARTITION BY bucket ORDER BY doc_id) - n AS off
  FROM t
)
SELECT doc_id, bucket,
  CAST(off // {budget} AS BIGINT) AS seq_id,
  CAST(off % {budget} AS BIGINT) AS seq_off
FROM c ORDER BY doc_id
""".strip()


# thresholds on the first md5 byte: < '08' test (~3.1% of keys),
# < '10' val (next ~3.1%), else train — same md5-rule family as
# stages/sampling (deterministic, engine-independent, key-whole).
SPLIT_TEST_HEX = "08"
SPLIT_VAL_HEX = "10"


def split_assign(ds, id_col: str = "doc_id"):
    """Deterministic train/val/test assignment by key hash — the split
    must be a pure function of the key (stable across runs, engines
    and re-shards; never RNG in the data plane). Output: (doc_id,
    split). Pure map stage, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], "split": split_of(t[id_col])})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split_of(ids) -> pa.Array:
    """train/val/test label array for a key column — the md5 split
    rule as a composable piece (:func:`split_assign` and composite
    pipelines attach it without re-deriving the rule)."""
    keys = pc.cast(ids, pa.string()).to_pylist()
    # NULL id → 'zz' (> any hex): both CASE tests fail, row lands
    # in 'train' — exactly the SQL mirror, where md5(NULL) is NULL
    # and `NULL < 'xx'` is not true, so CASE falls to ELSE
    h = ["zz" if k is None
         else hashlib.md5(k.encode()).hexdigest()[:2] for k in keys]
    split = np.where(
        np.array(h, dtype=object) < SPLIT_TEST_HEX, "test",
        np.where(np.array(h, dtype=object) < SPLIT_VAL_HEX, "val",
                 "train"),
    )
    return pa.array(split, type=pa.string())


def split_case_sql(id_col: str = "doc_id") -> str:
    """The split rule's CASE expression (composable mirror piece)."""
    h = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 2)"
    return (f"CASE WHEN {h} < '{SPLIT_TEST_HEX}' THEN 'test'"
            f" WHEN {h} < '{SPLIT_VAL_HEX}' THEN 'val' ELSE 'train' END")


def split_assign_sql(id_col: str = "doc_id",
                     table: str = "documents") -> str:
    return (f"SELECT {id_col}, {split_case_sql(id_col)}"
            f" AS split FROM {table}")


def chunk_windows(ds, window: int = 40, stride: int = 20,
                  src_col: str = "text", id_col: str = "doc_id"):
    """Sliding-window document chunking — the standard prep step that
    turns long documents into overlapping fixed-size training chunks
    (context-window packing's upstream sibling; reference keeps whole
    records only, ``defaultreader/reader.go:85-103``).

    Contract (mirrored exactly by the SQL): tokens = split on a single
    space; one chunk per start offset ``0, stride, 2*stride, …`` while
    ``start < n_tokens``; chunk = ``tokens[start : start+window]``
    (tail chunks run short rather than dropping trailing tokens).
    NULL text yields no chunks.

    Pure flat-map explode, no shuffle: per batch, ONE ``split_pattern``
    then one vectorized ``list_slice`` + ``binary_join`` per start
    offset across ALL rows still long enough (≤ ceil(max_tokens/stride)
    Arrow kernel passes per batch, each touching only surviving rows —
    total work is O(output size), never a Python per-row loop)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[src_col], " ")
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()), 0)
        ids = t[id_col]
        max_n = pc.max(n).as_py() if len(t) else None
        if len(t):  # NULL text (n=0) yields no chunks
            mask0 = pc.greater(n, 0)
            toks, ids, n = (toks.filter(mask0), ids.filter(mask0),
                            n.filter(mask0))
        out_ids, out_idx, out_txt = [], [], []
        start = 0
        # survivors are monotone (n > start ⟹ n > every earlier
        # start), so each iteration filters the ALREADY-SHRUNK arrays —
        # total filter work is O(output rows), and one pathological
        # long document costs O(its own chunks), not O(batch × chunks)
        while max_n is not None and start < max_n:
            if start:
                mask = pc.greater(n, start)
                toks = toks.filter(mask)
                ids = ids.filter(mask)
                n = n.filter(mask)
            out_ids.append(ids)
            out_txt.append(
                pc.binary_join(
                    pc.list_slice(toks, start, start + window), " "
                )
            )
            out_idx.append(
                pa.array([start // stride] * len(ids), type=pa.int64())
            )
            start += stride
        if not out_ids:
            return pa.table(
                {id_col: pa.array([], type=ids.type),
                 "chunk_idx": pa.array([], type=pa.int64()),
                 "chunk_text": pa.array([], type=pa.string())}
            )

        def _chunks(arrs):
            flat = []
            for a in arrs:
                flat.extend(a.chunks if isinstance(a, pa.ChunkedArray) else [a])
            return pa.chunked_array(flat)

        return pa.table(
            {id_col: _chunks(out_ids),
             "chunk_idx": _chunks(out_idx),
             "chunk_text": _chunks(out_txt)}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_windows_sql(window: int = 40, stride: int = 20,
                      src_col: str = "text", id_col: str = "doc_id",
                      table: str = "documents") -> str:
    """Exact mirror: 1-based list_slice; unnest(generate_series) over
    start offsets < n_tokens."""
    return f"""
WITH toks AS (
  SELECT {id_col}, string_split({src_col}, ' ') AS t,
         len(string_split({src_col}, ' ')) AS n
  FROM {table} WHERE {src_col} IS NOT NULL
), starts AS (
  SELECT {id_col}, t,
         unnest(generate_series(0, CAST(n AS BIGINT) - 1, {stride})) AS s
  FROM toks
)
SELECT {id_col}, CAST(s / {stride} AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(t, s + 1, s + {window}), ' ')
         AS chunk_text
FROM starts
""".strip()


def concat_multiline(ds, cont_pattern: str = r"^ERR-",
                     n_buckets: int = 64):
    """fluent-plugin-concat semantics: a turn whose text matches
    ``cont_pattern`` is a CONTINUATION and merges into the nearest
    earlier non-continuation turn of its conversation (stack-trace /
    multiline-log reassembly). A conversation that *starts* with
    continuations groups them under group 0 (no leader) — same rule
    both engines.

    Shape: the start/continuation flag is a vectorized per-batch regex;
    ONE bucket exchange on conv_id; inside a bucket the group id is a
    pandas segmented cumsum and the merge is a groupby-agg (the text
    join is per MERGED EVENT — the collect step itself). NULL texts
    count toward ``n_lines`` but are skipped by the join (SQL
    ``string_agg`` semantics; an all-NULL group has NULL text).

    Output: (conv_id, turn_start, n_lines, text).
    """

    def mark(t: pa.Table) -> pa.Table:
        m = pc.fill_null(
            pc.match_substring_regex(t["text"], cont_pattern), False
        )
        return pa.table({
            "conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
            "text": t["text"],
            "is_start": pc.cast(pc.invert(m), pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        g = g.assign(_grp=g.groupby("conv_id", sort=False)["is_start"]
                     .cumsum())

        def join(s):
            vals = s.dropna().tolist()
            return "\n".join(vals) if vals else None

        out = (g.groupby(["conv_id", "_grp"], sort=False)
               .agg(turn_start=("turn_idx", "min"),
                    n_lines=("turn_idx", "size"),
                    text=("text", join))
               .reset_index())
        out["n_lines"] = out["n_lines"].astype("int64")
        out["turn_start"] = out["turn_start"].astype("int64")
        return out[["conv_id", "turn_start", "n_lines", "text"]]

    marked = _with_bucket(
        ds.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True),
        "conv_id", n_buckets,
    )
    return marked.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def concat_multiline_sql(cont_pattern: str = r"^ERR-",
                         source_cte: str = "transcripts") -> str:
    """SELECT to append after the pipeline CTEs (reads the raw
    ``transcripts`` CTE)."""
    esc = cont_pattern.replace("'", "''")
    return f"""
SELECT conv_id, turn_start, n_lines, text FROM (
  SELECT conv_id, grp,
         min(turn_idx) AS turn_start,
         CAST(count(*) AS BIGINT) AS n_lines,
         string_agg(text, chr(10) ORDER BY turn_idx) AS text
  FROM (
    SELECT conv_id, turn_idx, text,
           sum(CASE WHEN regexp_matches(text, '{esc}') THEN 0 ELSE 1 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS UNBOUNDED PRECEDING) AS grp
    FROM {source_cte}
  ) GROUP BY conv_id, grp
)
""".strip()


def suppress(ds, lookback: int = 3, n_buckets: int = 64):
    """fluent-plugin-suppress semantics: within a conversation, a turn
    whose text EQUALS any of the previous ``lookback`` turns' texts is
    suppressed (repeated-message flood control — the reference's event
    stream has no such filter; fluentd deployments bolt it on before
    the forward output). NULL text never matches (SQL equality), so
    NULL turns always survive; empty-string heartbeats DO collapse.

    Shape: ONE conv bucket exchange; inside a bucket the ``lookback``
    comparisons are pandas groupby-shift C kernels over the whole
    bucket (``lookback`` vectorized passes, never per-row Python).
    Output: surviving (conv_id, turn_idx, text) rows.
    """

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        # dropna=False: SQL's PARTITION BY groups every NULL conv_id
        # into ONE partition (their repeats suppress like any other
        # conversation's); pandas would silently drop the NaN group
        # and never suppress among NULL-conv rows
        grp = g.groupby("conv_id", sort=False, dropna=False)["text"]
        dup = pd.Series(False, index=g.index)
        notna = g["text"].notna()
        for k in range(1, lookback + 1):
            prev = grp.shift(k)
            dup |= notna & prev.notna() & (g["text"] == prev)
        return g.loc[~dup, ["conv_id", "turn_idx", "text"]]

    cols = ["conv_id", "turn_idx", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    return bucketed.groupby("_bucket").map_groups(per_bucket,
                                                  batch_format="pandas")


def suppress_sql(lookback: int = 3,
                 source_cte: str = "transcripts") -> str:
    """SELECT to append after the pipeline CTEs. COALESCE keeps the
    NULL-text rows (text = lag(text) is NULL-not-true in SQL; the
    engine's notna mask is the same contract)."""
    lags = ", ".join(
        f"lag(text, {k}) OVER w AS p{k}" for k in range(1, lookback + 1)
    )
    keep = " AND ".join(
        f"COALESCE(text = p{k}, false) = false"
        for k in range(1, lookback + 1)
    )
    return f"""
SELECT conv_id, turn_idx, text FROM (
  SELECT conv_id, turn_idx, text, {lags}
  FROM {source_cte}
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
) WHERE {keep}
""".strip()


def conv_structure(ds, n_buckets: int = 64):
    """Per-conversation STRUCTURE validation — the chat-training-data
    quality gate that document-level filters can't see: is the
    conversation well-formed dialogue, or a broken/looping agent
    trace?

    Per conversation (turns in stable ``turn_idx`` order):

    - ``n_turns``
    - ``first_role`` / ``last_role`` — e.g. gate on "starts with
      user, ends with assistant"
    - ``n_role_repeats`` — adjacent turns with the SAME role (0 ⇔
      strictly alternating speakers)
    - ``max_repeat_run`` — longest run of consecutive IDENTICAL
      (role, text) turns: >1 flags an agent stuck in a loop
      re-issuing the same call (the classic trace pathology)

    One hash-bucket exchange on ``conv_id``; inside a bucket the
    run-length encoding is the gaps-and-islands cumsum over the whole
    bucket (pandas C kernels, never per-group Python). NULL text
    participates in identity via a sentinel-free pandas equality on
    (role, text) pairs — two NULLs are NOT a repeat (SQL ``=`` on NULL
    is never TRUE; mirrored with an explicit NOT-DISTINCT-free
    predicate)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        grp = g.groupby("conv_id", sort=False)
        same_conv = g["conv_id"].eq(g["conv_id"].shift())
        # SQL-equality semantics: NULL = NULL is not TRUE
        same_role = g["role"].eq(g["role"].shift()) & g["role"].notna()
        same_text = g["text"].eq(g["text"].shift()) & g["text"].notna()
        role_repeat = (same_conv & same_role).astype("int64")
        # islands: a new run starts where (role, text) differs from the
        # previous turn (or at a conversation head)
        brk = (~(same_conv & same_role & same_text)).astype("int64")
        run_id = brk.cumsum()
        run_len = run_id.groupby(run_id, sort=False).transform("size")
        first = grp["role"].transform("first")
        out = pd.DataFrame({
            "conv_id": g["conv_id"],
            "n_turns": grp["turn_idx"].transform("size").astype("int64"),
            "first_role": first,
            "last_role": grp["role"].transform("last"),
            "n_role_repeats": role_repeat.groupby(
                g["conv_id"], sort=False).transform("sum"),
            "max_repeat_run": run_len.groupby(
                g["conv_id"], sort=False).transform("max").astype("int64"),
        })
        return out.drop_duplicates("conv_id")

    cols = ["conv_id", "turn_idx", "role", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort("conv_id")


def conv_structure_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + """,
w AS (
  SELECT conv_id, turn_idx, role, text,
    CASE WHEN role = lag(role) OVER win THEN 1 ELSE 0 END AS role_rep,
    CASE WHEN role = lag(role) OVER win AND text = lag(text) OVER win
         THEN 0 ELSE 1 END AS brk
  FROM transcripts
  WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)
), runs AS (
  SELECT conv_id, turn_idx, role, role_rep,
    sum(brk) OVER (ORDER BY conv_id, turn_idx
                   ROWS UNBOUNDED PRECEDING) AS run_id
  FROM w
), runlen AS (
  SELECT conv_id, run_id, count(*) AS rl FROM runs GROUP BY conv_id, run_id
), per_conv AS (
  SELECT conv_id,
    CAST(count(*) AS BIGINT) AS n_turns,
    arg_min(role, turn_idx) AS first_role,
    arg_max(role, turn_idx) AS last_role,
    CAST(sum(role_rep) AS BIGINT) AS n_role_repeats
  FROM runs GROUP BY conv_id
)
SELECT p.conv_id, p.n_turns, p.first_role, p.last_role, p.n_role_repeats,
  (SELECT CAST(max(rl) AS BIGINT) FROM runlen r
   WHERE r.conv_id = p.conv_id) AS max_repeat_run
FROM per_conv p ORDER BY conv_id"""
    )


def conv_context_windows(ds, budget: int = 512, n_buckets: int = 64):
    """Chat-LM context-window assignment: each conversation's turns
    (stable ``turn_idx`` order) are packed into consecutive training
    windows of at most ``budget`` characters — a turn belongs to the
    window where it STARTS (the :func:`pack_sequences` convention at
    conversation granularity; a single turn longer than the budget
    still occupies one window slot). Turn boundaries are never split —
    the property chat fine-tuning needs and flat document chunking
    (:func:`chunk_windows`) destroys.

    Pure integer window arithmetic — ``window_id = exclusive running
    char sum // budget``, ``win_off`` the offset inside the window —
    so the mirror is bit-exact. One conv_id bucket exchange; in-bucket
    cumsum/shift are whole-bucket pandas C kernels. NULL text counts 0
    chars (SQL COALESCE). Output: (conv_id, turn_idx, window_id,
    win_off) sorted by (conv_id, turn_idx)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        chars = g["text"].str.len().fillna(0).astype("int64")
        cum = chars.groupby(g["conv_id"], sort=False).cumsum()
        prior = cum - chars
        win = prior // budget
        return pd.DataFrame({
            "conv_id": g["conv_id"],
            "turn_idx": g["turn_idx"],
            "window_id": win.astype("int64"),
            "win_off": (prior - win * budget).astype("int64"),
        })

    cols = ["conv_id", "turn_idx", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(["conv_id", "turn_idx"])


def conv_context_windows_sql(budget: int = 512) -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + f""",
w AS (
  SELECT conv_id, turn_idx,
    sum(COALESCE(length(text), 0)) OVER
      (PARTITION BY conv_id ORDER BY turn_idx
       ROWS UNBOUNDED PRECEDING) - COALESCE(length(text), 0) AS prior
  FROM transcripts
)
SELECT conv_id, turn_idx,
  CAST(prior // {budget} AS BIGINT) AS window_id,
  CAST(prior - (prior // {budget}) * {budget} AS BIGINT) AS win_off
FROM w ORDER BY conv_id, turn_idx"""
    )


def tool_transitions(ds, n_buckets: int = 64):
    """Agent tool-flow mining: the (previous tool → next tool)
    transition counts over each conversation's tool-CALL turns in
    stable ``turn_idx`` order — the first-order Markov summary of how
    agents chain tools ("search → browser → bash"), the log-pipeline
    analytic that plain per-tool counts can't express.

    ``ds``: PARSED transcripts (needs conv_id, turn_idx, parsed_tool,
    kind — i.e. :func:`parse.apply_parse` output). Non-call turns are
    dropped BEFORE the exchange (transitions skip over messages /
    errors between calls); one conv_id bucket exchange orders each
    conversation, the lag + pair-count run as whole-bucket pandas C
    kernels, and the per-bucket partials (≤ |tools|² rows each) merge
    in one bounded driver pass. Output: (prev_tool, tool, n) sorted.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "tool"))
        return t.select(["conv_id", "turn_idx", "parsed_tool"])

    calls = ds.map_batches(skip_empty(pre), batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        prev = g.groupby("conv_id", sort=False)["parsed_tool"].shift()
        mask = prev.notna()
        pairs = pd.DataFrame({
            "prev_tool": prev[mask].to_numpy(),
            "tool": g.loc[mask, "parsed_tool"].to_numpy(),
        })
        out = pairs.groupby(["prev_tool", "tool"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    bucketed = _with_bucket(calls, "conv_id", n_buckets)
    parts = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                   batch_format="pandas")
    merged = grouped_agg(parts, ["prev_tool", "tool"], [("n", "sum")],
                         final="driver")
    return merged.rename_columns(["prev_tool", "tool", "n"])


def tool_transitions_sql() -> str:
    from fluent_server_ray.oracle import with_pipeline_ctes

    return with_pipeline_ctes("""calls AS (
  SELECT conv_id, turn_idx, parsed_tool FROM parsed WHERE kind = 'tool'
), trans AS (
  SELECT parsed_tool AS tool,
    lag(parsed_tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
      AS prev_tool
  FROM calls
)""") + """
SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n
FROM trans WHERE prev_tool IS NOT NULL
GROUP BY prev_tool, tool ORDER BY prev_tool, tool"""


def conv_turn_gaps(ds, n_buckets: int = 64):
    """Per-conversation inter-turn latency stats — the agent-latency
    mining report (how long between consecutive turns): n_gaps,
    max_gap_sec, avg_gap_sec per conversation, single-turn
    conversations dropping out (no gap exists, matching the SQL
    lag+WHERE).

    One conv-bucket exchange; inside a bucket the lag/diff runs as one
    vectorized groupby-shift over every conversation at once. Gaps
    stay INTEGER microseconds through the aggregation (order-free
    sums); the two float derivations (max/1e6, (sum/1e6)/n) are single
    fixed expression trees mirrored in SQL."""
    import numpy as np

    from fluent_server_ray.stages.groups import map_buckets

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        us = (g["ts"].astype("datetime64[us]").astype("int64"))
        grp_prev = g.groupby("conv_id", sort=False)
        gap = us - pd.Series(us).groupby(
            g["conv_id"].to_numpy(), sort=False).shift()
        ok = gap.notna()
        sub = pd.DataFrame({
            "conv_id": g["conv_id"].to_numpy()[ok.to_numpy()],
            "gap_us": gap[ok].astype("int64").to_numpy(),
        })
        if not len(sub):
            return pd.DataFrame({
                "conv_id": pd.Series(dtype=object),
                "n_gaps": pd.Series(dtype="int64"),
                "max_us": pd.Series(dtype="int64"),
                "sum_us": pd.Series(dtype="int64"),
            })
        agg = sub.groupby("conv_id", sort=False)["gap_us"].agg(
            ["count", "max", "sum"]).reset_index()
        agg.columns = ["conv_id", "n_gaps", "max_us", "sum_us"]
        return agg

    from fluent_server_ray.stages.aggregate import hash_bucket_array, skip_empty

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket",
            pa.array(hash_bucket_array(t["conv_id"], n_buckets)))

    out_schema = pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("n_gaps", pa.int64()),
        pa.field("max_us", pa.int64()),
        pa.field("sum_us", pa.int64()),
    ])
    bucketed = ds.map_batches(skip_empty(add_bucket),
                              batch_format="pyarrow", zero_copy_batch=True)
    parts = map_buckets(bucketed, per_bucket, out_schema)

    def finish(t: pa.Table) -> pa.Table:
        mx = pc.divide(pc.cast(t["max_us"], pa.float64()), 1_000_000.0)
        avg = pc.divide(
            pc.divide(pc.cast(t["sum_us"], pa.float64()), 1_000_000.0),
            pc.cast(t["n_gaps"], pa.float64()))
        return pa.table({
            "conv_id": t["conv_id"],
            "n_gaps": t["n_gaps"],
            "max_gap_sec": mx,
            "avg_gap_sec": avg,
        })

    return parts.map_batches(skip_empty(finish), batch_format="pyarrow",
                             zero_copy_batch=True).sort("conv_id")


def conv_turn_gaps_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + """,
g AS (
  SELECT conv_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
  FROM transcripts
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_gaps,
  CAST(max(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_sec,
  (CAST(sum(gap_us) AS DOUBLE) / 1000000.0) / CAST(count(*) AS DOUBLE)
    AS avg_gap_sec
FROM g WHERE gap_us IS NOT NULL
GROUP BY conv_id ORDER BY conv_id"""
    )


def conv_merge_roles(ds, n_buckets: int = 64):
    """Merge CONSECUTIVE same-role turns of a conversation into one
    message — chat-format normalization (training APIs reject
    back-to-back same-role messages; fluentd's concat plugin is the
    log-side analogue: continuation lines fold into their head event).

    Islands: a turn starts a new message iff it is the conversation's
    first turn or its role differs from the previous turn's
    (``IS DISTINCT FROM`` — a run of NULL roles merges, NULL vs
    non-NULL splits, matching the SQL mirror). One conv bucket
    exchange; island ids are a vectorized cumsum over the whole
    bucket, texts join per island with ``\\n`` (NULL texts skipped;
    all-NULL islands yield NULL — SQL ``string_agg``). Output:
    (conv_id, msg_idx [1-based], role, text, n_merged) sorted.
    """

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        grp = g.groupby("conv_id", sort=False)
        prev = grp["role"].shift()
        role, prevv = g["role"], prev
        same = (role == prevv) | (role.isna() & prevv.isna())
        new_msg = (grp.cumcount() == 0) | ~same
        island = new_msg.astype("int64").groupby(
            g["conv_id"], sort=False).cumsum()
        keys = [g["conv_id"], island]
        joined = g["text"].dropna().groupby(
            [g["conv_id"][g["text"].notna()],
             island[g["text"].notna()]], sort=False).agg("\n".join)
        base = g.groupby(keys, sort=False).agg(
            role=("role", "first"), n_merged=("role", "size"))
        base["n_merged"] = base["n_merged"].astype("int64")
        out = base.join(joined.rename("text"), how="left")
        out = out.reset_index(names=["conv_id", "msg_idx"])
        # None (SQL NULL), not NaN, for all-NULL-text islands
        out["text"] = out["text"].where(out["text"].notna(), None)
        # SQL min(role) skips NULLs: pandas 'first' takes positional
        # first INCLUDING None -- but within an island roles are all
        # equal or all NULL (the island rule), so first == min(role)
        out["role"] = out["role"].where(out["role"].notna(), None)
        return out[["conv_id", "msg_idx", "role", "text", "n_merged"]]

    cols = ["conv_id", "turn_idx", "role", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(["conv_id", "msg_idx"])


def conv_merge_roles_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + """
, flagged AS (
  SELECT conv_id, turn_idx, role, text,
    CASE WHEN row_number() OVER w = 1
           OR role IS DISTINCT FROM lag(role) OVER w
         THEN 1 ELSE 0 END AS new_msg
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), islands AS (
  SELECT conv_id, turn_idx, role, text,
    sum(new_msg) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS msg_idx
  FROM flagged
)
SELECT conv_id, CAST(msg_idx AS BIGINT) AS msg_idx, min(role) AS role,
  string_agg(text, chr(10) ORDER BY turn_idx) AS text,
  CAST(count(*) AS BIGINT) AS n_merged
FROM islands
GROUP BY conv_id, msg_idx
ORDER BY conv_id, msg_idx"""
    )


def sft_loss_spans(ds, trainable_role: str = "assistant",
                   n_buckets: int = 64):
    """Loss-mask spans for SFT training: for every turn, the character
    offsets ``[start_off, end_off)`` of its rendered ``role: text``
    line inside the conversation document that
    :func:`conv_to_documents` assembles (newline-joined in stable
    ``turn_idx`` order — per-turn text equality under stable ordering
    is the engine's core invariant), plus whether the span is
    TRAINABLE (loss applied — the ``trainable_role``'s tokens) or
    masked context. A tokenizer-side masking step can consume these
    spans directly without re-rendering the document; the joining
    newline between turns belongs to no span.

    Output: (conv_id, turn_idx, start_off, end_off, trainable).
    Same single ``conv_id`` bucket exchange as
    :func:`conv_to_documents`; offsets are one vectorized
    cumsum/cumcount per bucket — no Python row loop."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        llen = (g["role"].str.len() + 2
                + g["text"].str.len()).astype("int64")
        keys = g["conv_id"].to_numpy()
        grp = llen.groupby(keys, sort=False)
        # start = (chars of prior lines) + (one newline per prior line)
        start = (grp.cumsum() - llen + grp.cumcount()).astype("int64")
        return pd.DataFrame({
            "conv_id": keys,
            "turn_idx": g["turn_idx"].to_numpy(),
            "start_off": start.to_numpy(),
            "end_off": (start + llen).to_numpy(),
            "trainable": (g["role"] == trainable_role).to_numpy(),
        })

    cols = ["conv_id", "turn_idx", "role", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    out = bucketed.groupby("_bucket").map_groups(per_bucket,
                                                 batch_format="pandas")
    return out.sort(["conv_id", "turn_idx"])


def sft_loss_spans_sql(trainable_role: str = "assistant") -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + f"""
, lines AS (
  SELECT conv_id, turn_idx,
    length(role || ': ' || text) AS llen,
    (role = '{trainable_role}') AS trainable
  FROM transcripts
)
SELECT conv_id, turn_idx,
  CAST(sum(llen) OVER w - llen + row_number() OVER w - 1
       AS BIGINT) AS start_off,
  CAST(sum(llen) OVER w + row_number() OVER w - 1
       AS BIGINT) AS end_off,
  trainable
FROM lines
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
             ROWS UNBOUNDED PRECEDING)
ORDER BY conv_id, turn_idx"""
    )


def conv_truncate_context(ds, max_tokens: int = 64, n_buckets: int = 64):
    """Context-window truncation — the SFT assembly step before
    packing: per conversation keep the SUFFIX of turns whose
    whitespace-token counts fit ``max_tokens`` (newest context wins;
    chat trainers drop the oldest turns, not the newest). The newest
    turn is ALWAYS kept even if alone over budget — downstream
    tokenizer truncation owns that case, a dropped-whole-conversation
    surprise helps nobody. A turn survives iff the total tokens of it
    and every later turn ≤ budget, or it is the conversation's final
    turn. Token rule: runs of non-space (``textstats.TOKEN_RE`` — the
    engine's shared token contract, counted with the Arrow kernel
    BEFORE the exchange so the bucket pass never touches text bytes
    for counting).

    Output: kept turns ``(conv_id, turn_idx, role, text, n_tok)``.
    One ``conv_id`` bucket exchange; the reverse cumulative sum is a
    single vectorized groupby-cumsum over each bucket."""
    from fluent_server_ray.stages.textstats import TOKEN_RE

    def count_tokens(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE),
                    pa.int64())
        return t.append_column("n_tok", n)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # newest-first within conv => plain cumsum IS the reverse cumsum
        g = g.sort_values(["conv_id", "turn_idx"],
                          ascending=[True, False])
        grp = g.groupby("conv_id", sort=False)
        rev_cum = grp["n_tok"].cumsum()
        newest = grp.cumcount() == 0
        kept = g[(rev_cum <= max_tokens) | newest]
        return kept.sort_values(["conv_id", "turn_idx"])

    cols = ["conv_id", "turn_idx", "role", "text"]
    counted = ds.select_columns(cols).map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True)
    bucketed = _with_bucket(counted, "conv_id", n_buckets)
    out = bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")
    return out.drop_columns(["_bucket"]).sort(["conv_id", "turn_idx"])


def conv_truncate_context_sql(max_tokens: int = 64) -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + f"""
, toks AS (
  SELECT conv_id, turn_idx, role, text,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tok
  FROM transcripts
)
SELECT conv_id, turn_idx, role, text, n_tok FROM (
  SELECT toks.*,
    sum(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                     ROWS UNBOUNDED PRECEDING) AS rev_cum,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC)
      AS rn
  FROM toks)
WHERE rev_cum <= {max_tokens} OR rn = 1
ORDER BY conv_id, turn_idx"""
    )


def shard_plan(ds, n_shards: int = 16, id_col: str = "doc_id",
               text_col: str = "text", n_buckets: int = 64):
    """Token-BALANCED output-shard planner — the resumable-writer's
    layout step at 100 TB: rank every doc by (n_tokens DESC, id ASC)
    and deal the sorted order round-robin over ``n_shards``. Sorted
    round-robin is the classic LPT-flavored greedy for multiway number
    partitioning: consecutive ranks land on different shards, so shard
    token totals differ by at most one doc per dealing round — without
    it a naive ``hash(id) % S`` leaves long-doc clumps that make one
    shard the straggler of every downstream stage.

    Exact global rank WITHOUT a global sort via the SHARED histogram
    rank plan (:func:`features._exact_rank` — additive distinct-value
    histogram, broadcast strictly-higher counts, one value-keyed
    cumcount exchange); shard = (rank-1) % n_shards on top. A corpus
    where ONE token count dominates co-locates that value's rows —
    same documented skew contract as every keyed exchange here.

    Returns a Dataset (doc_id, n_tokens, rank, shard) sorted by id.
    """
    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.features import _exact_rank
    from fluent_server_ray.stages.textstats import token_count_batch

    def counts(t: pa.Table) -> pa.Table:
        out = token_count_batch(
            t.rename_columns(["doc_id", "text"])
            if t.column_names != ["doc_id", "text"] else t)
        return pa.table({id_col: out["doc_id"], "n_tokens": out["n_tokens"]})

    tok = ds.select_columns([id_col, text_col]).map_batches(
        skip_empty(counts), batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    ranked = _exact_rank(tok, "n_tokens", id_col, "rank",
                         n_buckets=n_buckets, keep_value=True)

    def add_shard(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("shard",
                               pa.array((r - 1) % n_shards))

    return (ranked.map_batches(add_shard, batch_format="pyarrow",
                               zero_copy_batch=True)
            .sort([id_col]))


def shard_plan_sql(n_shards: int = 16, table: str = "documents") -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens
  FROM {table}
), r AS (
  SELECT doc_id, n_tokens,
    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rank
  FROM tok
)
SELECT doc_id, n_tokens, CAST(rank AS BIGINT) AS rank,
  CAST((rank - 1) % {n_shards} AS BIGINT) AS shard
FROM r ORDER BY doc_id
""".strip()


def packing_efficiency(ds, budget: int = PACK_BUDGET,
                       n_buckets: int = PACK_BUCKETS) -> pa.Table:
    """Packing-efficiency report for the concat-and-chunk layout of
    :func:`pack_sequences`: per bucket, docs / total tokens / sequence
    count / fill rate — the metric that tells an LM-training pipeline
    how much padding waste its packing layout costs (concat-and-chunk
    wastes only the bucket tail, so fill → 1 as buckets grow; a low
    fill flags too-many-buckets-for-the-corpus).

    All integer: ``n_seqs = ceil(total/budget)`` and
    ``fill_millionths = 1e6·total // (n_seqs·budget)``. One combiner
    pass (per-batch bucket sums), bounded driver merge; zero-token
    buckets are dropped (no sequences exist to fill).

    Returns a pyarrow Table (bucket, n_docs, total_tokens, n_seqs,
    fill_millionths) sorted by bucket.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.textstats import TOKEN_RE

    def prep(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        bucket = pc.subtract(
            did, pc.multiply(pc.divide(did, n_buckets), n_buckets))
        n = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE),
                    pa.int64())
        return pa.table({"bucket": pc.cast(bucket, pa.int64()), "n": n})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["bucket"], aggs=[("n", "sum"), ("n", "count")],
        final="driver")
    b = agg["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = agg["n_count"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = total > 0
    b, total, n_docs = b[keep], total[keep], n_docs[keep]
    n_seqs = (total + budget - 1) // budget
    fill = 1_000_000 * total // (n_seqs * budget)
    order = np.argsort(b)
    return pa.table({
        "bucket": pa.array(b[order]),
        "n_docs": pa.array(n_docs[order]),
        "total_tokens": pa.array(total[order]),
        "n_seqs": pa.array(n_seqs[order]),
        "fill_millionths": pa.array(fill[order]),
    })


def packing_efficiency_sql(budget: int = PACK_BUDGET,
                           n_buckets: int = PACK_BUCKETS,
                           table: str = "documents") -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, doc_id % {n_buckets} AS bucket,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n
  FROM {table}
)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS total_tokens,
  CAST((sum(n) + {budget - 1}) // {budget} AS BIGINT) AS n_seqs,
  CAST(1000000 * sum(n)
       // (((sum(n) + {budget - 1}) // {budget}) * {budget}) AS BIGINT)
    AS fill_millionths
FROM tok GROUP BY bucket HAVING sum(n) > 0 ORDER BY bucket
""".strip()


def prompt_completion_pairs(ds, prompt_role: str = "user",
                            completion_role: str = "assistant",
                            n_buckets: int = 64):
    """SFT pair mining: extract (prompt, completion) training pairs —
    every ``prompt_role`` turn immediately followed (next ``turn_idx``
    within the conversation) by a ``completion_role`` turn. The
    instruction-tuning counterpart of :func:`conv_to_documents`: where
    that operator renders whole conversations, this one mines the
    atomic request→response pairs chat SFT corpora are built from.

    Output: (conv_id, turn_idx, prompt, completion) — ``turn_idx`` is
    the PROMPT turn's index. One ``conv_id`` bucket exchange; the
    next-turn lookup is a vectorized groupby shift over the whole
    bucket (reference order contract: ``defaultreader/reader.go:85-103``
    preserves intra-chunk order; (conv_id, turn_idx) is the engine's
    stable total order)."""
    from fluent_server_ray.stages.groups import map_buckets

    schema = pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("prompt", pa.string()),
        pa.field("completion", pa.string()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        grp = g.groupby("conv_id", sort=False)
        nrole = grp["role"].shift(-1)
        ntext = grp["text"].shift(-1)
        m = ((g["role"] == prompt_role)
             & (nrole == completion_role)).to_numpy()
        return pd.DataFrame({
            "conv_id": g["conv_id"].to_numpy()[m],
            "turn_idx": g["turn_idx"].to_numpy()[m],
            "prompt": g["text"].to_numpy()[m],
            "completion": ntext.to_numpy()[m],
        })

    cols = ["conv_id", "turn_idx", "role", "text"]
    bucketed = _with_bucket(ds.select_columns(cols), "conv_id", n_buckets)
    return map_buckets(bucketed, per_bucket, schema).sort(
        ["conv_id", "turn_idx"])


def prompt_completion_pairs_sql(prompt_role: str = "user",
                                completion_role: str = "assistant") -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + f"""
, nxt AS (
  SELECT conv_id, turn_idx, role, text,
    lead(role) OVER w AS nrole, lead(text) OVER w AS ntext
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx, text AS prompt, ntext AS completion
FROM nxt
WHERE role = '{prompt_role}' AND nrole = '{completion_role}'
ORDER BY conv_id, turn_idx"""
    )


def fim_transform(ds, id_col: str = "doc_id", text_col: str = "text",
                  pre_tok: str = "<PRE>", suf_tok: str = "<SUF>",
                  mid_tok: str = "<MID>"):
    """Fill-in-the-middle transform (PSM order — the code-model data
    augmentation of Bavarian et al. 2022, "Efficient Training of
    Language Models to Fill in the Middle"): split each document at
    two DETERMINISTIC pseudo-random character offsets and emit
    ``<PRE> prefix <SUF> suffix <MID> middle`` so the model learns to
    infill. The cut points derive from ``md5(id ∥ '#1'/'#2') mod
    (len+1)`` (:func:`functions.hashing.md5_u64` ≡ DuckDB
    ``md5_number_upper`` — the engine's entropy-free determinism
    contract: no RNG in the data plane, reruns and retries produce
    byte-identical samples).

    Pure per-batch map, no shuffle. Offsets count CHARACTERS
    (Python codepoint slicing ≡ SQL ``substr`` semantics). NULL text
    → NULL output row (SQL ``md5(NULL)`` is NULL).
    Output: (id, cut_lo, cut_hi, fim_text)."""
    from fluent_server_ray.functions.hashing import md5_u64

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        lo_a, hi_a, out = [], [], []
        for i, txt in zip(ids, texts):
            if txt is None or i is None:
                lo_a.append(None); hi_a.append(None); out.append(None)
                continue
            n = len(txt) + 1
            c1 = md5_u64(f"{i}#1") % n
            c2 = md5_u64(f"{i}#2") % n
            lo, hi = (c1, c2) if c1 <= c2 else (c2, c1)
            lo_a.append(lo); hi_a.append(hi)
            out.append(pre_tok + txt[:lo] + suf_tok + txt[hi:]
                       + mid_tok + txt[lo:hi])
        return pa.table({
            id_col: t[id_col],
            "cut_lo": pa.array(lo_a, pa.int64()),
            "cut_hi": pa.array(hi_a, pa.int64()),
            "fim_text": pa.array(out, pa.string()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def fim_transform_sql(id_col: str = "doc_id", text_col: str = "text",
                      table: str = "documents",
                      pre_tok: str = "<PRE>", suf_tok: str = "<SUF>",
                      mid_tok: str = "<MID>") -> str:
    return f"""
WITH cuts AS (
  SELECT {id_col},
    {text_col} AS txt,
    CAST(md5_number_upper(CAST({id_col} AS VARCHAR) || '#1')
         % CAST(length({text_col}) + 1 AS UBIGINT) AS BIGINT) AS c1,
    CAST(md5_number_upper(CAST({id_col} AS VARCHAR) || '#2')
         % CAST(length({text_col}) + 1 AS UBIGINT) AS BIGINT) AS c2
  FROM {table}
)
SELECT {id_col},
  least(c1, c2) AS cut_lo,
  greatest(c1, c2) AS cut_hi,
  '{pre_tok}' || substr(txt, 1, least(c1, c2))
    || '{suf_tok}' || substr(txt, greatest(c1, c2) + 1)
    || '{mid_tok}'
    || substr(txt, least(c1, c2) + 1, greatest(c1, c2) - least(c1, c2))
    AS fim_text
FROM cuts ORDER BY {id_col}
""".strip()


def role_transition_latency(ds, n_buckets: int = 64) -> pa.Table:
    """Response latency by ROLE TRANSITION: for every adjacent turn
    pair of a conversation, the (prev_role → role) transition and its
    gap — aggregated corpus-wide to "how fast does the assistant
    answer a user vs a tool result" (:func:`conv_turn_gaps` is the
    per-conversation view; this is the per-edge-type panel an agent
    operator tunes against).

    Exact contract: gaps stay integer microseconds; per-transition
    (n, sum_us, max_us) merge as exact combiner partials bounded by
    |roles|²; the mean is ONE floor division to micros. Distributed
    shape: one conv-bucket exchange (the per-conversation lag needs
    co-location), per-bucket vectorized groupby-shift, then bounded
    per-transition partials to the driver. Output: (prev_role, role,
    n, max_us, mean_us) sorted by (prev_role, role).
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.groups import map_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket",
            pa.array(hash_bucket_array(t["conv_id"], n_buckets)))

    out_schema = pa.schema([
        pa.field("prev_role", pa.string()),
        pa.field("role", pa.string()),
        pa.field("n", pa.int64()),
        pa.field("max_us", pa.int64()),
        pa.field("sum_us", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        us = g["ts"].astype("datetime64[us]").astype("int64")
        conv = g["conv_id"].to_numpy()
        gap = us - pd.Series(us).groupby(conv, sort=False).shift()
        prev_role = g["role"].groupby(conv, sort=False).shift()
        ok = gap.notna()
        sub = pd.DataFrame({
            "prev_role": prev_role[ok].to_numpy(),
            "role": g["role"].to_numpy()[ok.to_numpy()],
            "gap": gap[ok].astype("int64").to_numpy(),
        })
        if not len(sub):
            return pd.DataFrame({
                "prev_role": pd.Series(dtype=object),
                "role": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "max_us": pd.Series(dtype="int64"),
                "sum_us": pd.Series(dtype="int64"),
            })
        agg = (sub.groupby(["prev_role", "role"], sort=False)["gap"]
               .agg(["count", "max", "sum"]).reset_index())
        agg.columns = ["prev_role", "role", "n", "max_us", "sum_us"]
        return agg

    parts = map_buckets(
        ds.map_batches(skip_empty(add_bucket), batch_format="pyarrow",
                       zero_copy_batch=True),
        per_bucket, out_schema).to_pandas()
    if parts.empty:  # all-empty partials drop columns
        return pa.table({"prev_role": pa.array([], pa.string()),
                         "role": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "max_us": pa.array([], pa.int64()),
                         "mean_us": pa.array([], pa.int64())})
    m = (parts.groupby(["prev_role", "role"], sort=True)
         .agg(n=("n", "sum"), max_us=("max_us", "max"),
              sum_us=("sum_us", "sum")).reset_index())
    mean_us = [int(s) // int(n) for s, n in zip(m["sum_us"], m["n"])]
    return pa.table({
        "prev_role": pa.array(m["prev_role"], pa.string()),
        "role": pa.array(m["role"], pa.string()),
        "n": pa.array(m["n"].astype("int64"), pa.int64()),
        "max_us": pa.array(m["max_us"].astype("int64"), pa.int64()),
        "mean_us": pa.array(mean_us, pa.int64()),
    })


def role_transition_latency_sql() -> str:
    from fluent_server_ray.sources.transcripts import TRANSCRIPTS_SQL_CTE

    return (
        "WITH " + TRANSCRIPTS_SQL_CTE + """,
g AS (
  SELECT
    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
      AS prev_role,
    role,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
  FROM transcripts
)
SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n,
  CAST(max(gap_us) AS BIGINT) AS max_us,
  CAST(sum(gap_us) // count(*) AS BIGINT) AS mean_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY prev_role, role ORDER BY prev_role, role"""
    )


def split_by_cluster(ds, id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 64):
    """Leakage-free split assignment at DUPLICATE-CLUSTER granularity:
    every doc inherits the split of its exact-dup cluster's
    representative (min id per content fingerprint), so identical
    texts can never straddle train/val/test — the FIX for what the
    :func:`hygiene.split_leakage` audit measures (per-doc
    :func:`split_assign` leaks whenever duplicates exist).

    Shape: one md5-fingerprint bucket exchange co-locates each content
    cluster; inside a bucket the representative is a vectorized
    transform-min and the split rule is the house md5 CASE
    (:func:`split_of` on the REPRESENTATIVE id — deterministic, engine
    and mirror agree byte-for-byte). NULL text fingerprints as the
    empty string (the house fingerprint contract), so NULL-text docs
    cluster together rather than dropping. Returns a Dataset
    (id, rep_id, split)."""
    from fluent_server_ray.stages.groups import map_buckets

    def add_fp(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        fps = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
               for x in texts]
        return pa.table({id_col: t[id_col],
                         "fp": pa.array(fps, pa.string())})

    out_schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field("rep_id", pa.int64()),
        pa.field("split", pa.string()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rep = g.groupby("fp", sort=False)[id_col].transform("min")
        out = pd.DataFrame({id_col: g[id_col].to_numpy(),
                            "rep_id": rep.to_numpy()})
        out["split"] = split_of(
            pa.array(out["rep_id"], pa.int64())).to_pylist()
        return out

    bucketed = _with_bucket(
        ds.select_columns([id_col, text_col]).map_batches(
            add_fp, batch_format="pyarrow", zero_copy_batch=True),
        "fp", n_buckets)
    return map_buckets(bucketed, per_bucket, out_schema)


def split_by_cluster_sql(id_col: str = "doc_id", text_col: str = "text",
                         table: str = "documents") -> str:
    return f"""
WITH reps AS (
  SELECT md5(COALESCE({text_col}, '')) AS fp,
    min({id_col}) AS rep FROM {table} GROUP BY 1
)
SELECT d.{id_col}, r.rep AS rep_id, {split_case_sql('r.rep')} AS split
FROM {table} d
JOIN reps r ON md5(COALESCE(d.{text_col}, '')) = r.fp
ORDER BY d.{id_col}
""".strip()


# -------------------------------------------- nested denormalization

def nest_order_lines(ds, n_buckets: int = 64):
    """Denormalize lineitem into one NESTED record per order: a
    canonical compact-JSON array of the order's lines sorted by line
    number — the document-store / training-record export shape (the
    inverse of a flatten/explode).

    Canonical-JSON contract: fixed key order (ln, pk, qty_cents,
    price_cents), integer-only values, compact separators — the string
    is byte-identical to the SQL mirror's ``string_agg`` rendering, so
    the nested payload itself is hash-comparable, not just its scalars.

    Scale shape: ONE orderkey-bucket exchange co-locates an order's
    lines; inside a bucket the per-row JSON fragments are vectorized
    pandas string concatenation and only the per-order join is a
    grouped agg. Output: (o_orderkey, lines_json, n_lines,
    total_price_cents)."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "ln": pc.cast(t["l_linenumber"], pa.int64()),
            "pk": pc.cast(t["l_partkey"], pa.int64()),
            "qty_cents": pc.cast(
                pc.round(pc.multiply(t["l_quantity"], 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
            "price_cents": pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
        })

    out_schema = pa.schema([
        pa.field("o_orderkey", pa.int64()),
        pa.field("lines_json", pa.string()),
        pa.field("n_lines", pa.int64()),
        pa.field("total_price_cents", pa.int64()),
    ])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # total intra-order sort: the testdata does NOT guarantee
        # unique (orderkey, linenumber), so the full value tuple is the
        # tiebreak — fully identical rows then render identically under
        # any order, keeping the string deterministic on both sides
        g = g.sort_values(["o_orderkey", "ln", "pk", "qty_cents",
                           "price_cents"])
        frag = ('{"ln":' + g["ln"].astype(str)
                + ',"pk":' + g["pk"].astype(str)
                + ',"qty_cents":' + g["qty_cents"].astype(str)
                + ',"price_cents":' + g["price_cents"].astype(str)
                + '}')
        grp = frag.groupby(g["o_orderkey"], sort=False)
        joined = grp.agg(",".join)
        sums = g.groupby("o_orderkey", sort=False)["price_cents"].sum()
        return pd.DataFrame({
            "o_orderkey": joined.index.to_numpy(),
            "lines_json": "[" + joined.to_numpy() + "]",
            "n_lines": grp.size().astype("int64").to_numpy(),
            "total_price_cents": sums.astype("int64").to_numpy(),
        })

    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
            "l_extendedprice"]
    bucketed = _with_bucket(
        ds.select_columns(cols).map_batches(prep, batch_format="pyarrow",
                                            zero_copy_batch=True),
        "o_orderkey", n_buckets)
    from fluent_server_ray.stages.groups import map_buckets

    return map_buckets(bucketed, per_bucket, out_schema)


def nest_order_lines_sql() -> str:
    return """
SELECT l_orderkey AS o_orderkey,
  '[' || string_agg(
    '{"ln":' || CAST(l_linenumber AS BIGINT)
    || ',"pk":' || l_partkey
    || ',"qty_cents":' || CAST(round(l_quantity * 100.0) AS BIGINT)
    || ',"price_cents":'
    || CAST(round(l_extendedprice * 100.0) AS BIGINT)
    || '}', ',' ORDER BY l_linenumber, l_partkey,
      CAST(round(l_quantity * 100.0) AS BIGINT),
      CAST(round(l_extendedprice * 100.0) AS BIGINT)) || ']'
    AS lines_json,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
    AS total_price_cents
FROM lineitem
GROUP BY 1
ORDER BY 1
""".strip()
