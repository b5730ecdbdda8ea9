"""Text-analysis stages for large-scale training-data pipelines.

Operations over a document table (``doc_id``, ``text``, …) expressed as
vectorized ``map_batches`` transforms:

- token counting (regex token scan, no Python row loop)
- quality scoring (length / alpha / digit / whitespace ratios; all
  per-row arithmetic, so an independent SQL engine reproduces the
  doubles bit-for-bit)
- language ID (marker-word n-gram heuristic, deterministic argmax)
- document fingerprinting (md5 content hash; winnowed Rabin-Karp
  rolling-hash fingerprints for shared-content detection)

Every function has a DuckDB SQL mirror built from the SAME
pattern/marker constants so the driver oracle cannot drift.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[^ ]+"

# language → marker regex (word-boundary alternation). Scores are
# occurrence counts; prediction is argmax with deterministic tie-break
# in LANG_ORDER; all-zero → 'unknown'.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|and|of|to|is)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
    "fr": r"\b(le|la|les|et|est|un)\b",
    "es": r"\b(el|los|las|es|y|un)\b",
    "zh": r"[\x{4e00}-\x{9fff}]",
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def token_count_batch(batch: pa.Table) -> pa.Table:
    n = pc.count_substring_regex(batch["text"], TOKEN_RE)
    return pa.table(
        {"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
    )


def token_count_sql() -> str:
    return (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT)"
        " AS n_tokens FROM documents"
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality ratios; denominators guarded with max(len,1)."""
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64())
    n_space = pc.cast(pc.count_substring_regex(text, " "), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
    denom = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars2": n_chars,
            "n_tokens": n_tokens,
            "n_alpha": n_alpha,
            "n_digit": n_digit,
            "alpha_ratio": pc.divide(pc.cast(n_alpha, pa.float64()), denom),
            "space_ratio": pc.divide(pc.cast(n_space, pa.float64()), denom),
        }
    )


def quality_sql() -> str:
    return """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars2,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
    / GREATEST(length(text), 1) AS alpha_ratio,
  CAST(len(regexp_extract_all(text, ' ')) AS DOUBLE)
    / GREATEST(length(text), 1) AS space_ratio
FROM documents
""".strip()


def langid_batch(batch: pa.Table) -> pa.Table:
    """Marker-count language ID (the classic stopword heuristic)."""
    text = batch["text"]
    scores = {
        lang: pc.cast(pc.count_substring_regex(text, rx), pa.int64())
        for lang, rx in LANG_MARKERS.items()
    }
    best = pa.nulls(len(batch), pa.string())
    best_score = pa.array([0] * len(batch), type=pa.int64())
    # iterate in LANG_ORDER: strictly-greater keeps the earlier lang on
    # ties — the same deterministic tie-break as the SQL mirror
    for lang in LANG_ORDER:
        s = scores[lang]
        hit = pc.greater(s, best_score)
        best = pc.if_else(hit, pa.scalar(lang), best)
        best_score = pc.max_element_wise(best_score, s)
    best = pc.fill_null(best, "unknown")
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": best})


def _langid_expr() -> str:
    """The SQL argmax expression over LANG_MARKERS — same sequential
    strictly-greater scan (and therefore the same tie-break) as
    :func:`langid_batch`'s Arrow loop. DuckDB RE2 uses \\x{4e00}
    syntax too; markers are shared verbatim."""
    score = {
        lang: f"len(regexp_extract_all(text, '{rx}'))"
        for lang, rx in LANG_MARKERS.items()
    }
    # build nested CASE mirroring the sequential strictly-greater scan
    sql = "0"
    lang_expr = "'unknown'"
    for lang in LANG_ORDER:
        s = score[lang]
        lang_expr = f"CASE WHEN {s} > ({sql}) THEN '{lang}' ELSE {lang_expr} END"
        sql = f"GREATEST({sql}, {s})"
    return lang_expr


def langid_sql() -> str:
    """Same argmax, same tie-break, generated from LANG_MARKERS."""
    return f"SELECT doc_id, {_langid_expr()} AS lang_pred FROM documents"


def langid_confusion(ds, label_col: str = "lang") -> pa.Table:
    """Language-ID confusion matrix: counts per (labeled lang,
    predicted lang) — the accuracy report a curation team reads before
    trusting the classifier's gates. One combiner pass: the langid
    argmax and the (label, pred) count fuse into the read stage; the
    shuffle carries ≤ |langs|² partial rows per block. Output sorted
    by (label, pred)."""
    from fluent_server_ray.stages.aggregate import grouped_counts

    def pred(t: pa.Table) -> pa.Table:
        p = langid_batch(t)
        return pa.table({
            label_col: pc.fill_null(
                pc.cast(t[label_col], pa.string()), "unknown"),
            "lang_pred": p["lang_pred"],
        })

    out = grouped_counts(
        ds.map_batches(pred, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[label_col, "lang_pred"])
    return out.sort_by([(label_col, "ascending"),
                        ("lang_pred", "ascending")])


def langid_confusion_sql(label_col: str = "lang",
                         table: str = "documents") -> str:
    return f"""
SELECT COALESCE(CAST({label_col} AS VARCHAR), 'unknown') AS {label_col},
  {_langid_expr()} AS lang_pred, count(*) AS n
FROM {table} GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """md5 content fingerprint.

    Note: the md5 itself is per-row Python (Arrow ships no md5 kernel);
    the C hash dominates, and at scale this runs inside parallel
    map_batches tasks, so the driver never loops.
    """
    texts = batch["text"].to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.string())}
    )


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp FROM documents"


def apply_doc_stage(ds, batch_fn, batch_size: int | None = None):
    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(batch_fn, **kwargs)


def winnow_fingerprints_batch(batch: pa.Table, k: int = 8, window: int = 4) -> pa.Table:
    """Winnowed rolling-hash document fingerprints (the MOSS scheme):
    Rabin-Karp rolling hash over k-char grams, then the minimum hash of
    each sliding window of `window` gram-hashes — a compact, position-
    robust signature set; two documents sharing enough fingerprints
    share k-char content. Vectorized per row with numpy (polynomial
    rolling hash computed over the whole byte array at once).

    Output: one row per (doc_id, fingerprint) — explode-style, ready
    for a groupby("fp") to find cross-document shared content.
    """
    import numpy as np

    B = np.uint64(1_000_003)  # polynomial base
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_fp = [], []
    for doc_id, text in zip(ids, texts):
        data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
        n = len(data)
        if n < k:
            continue
        # polynomial hash of every k-gram in one vectorized matmul
        grams = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        gram_pows = B ** np.arange(k, dtype=np.uint64)[::-1]
        h = (grams * gram_pows).sum(axis=1)  # mod 2^64 wraparound
        if len(h) >= window:
            mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
        else:
            mins = np.array([h.min()], dtype=np.uint64)
        # Mask to 63 bits BEFORE deduplicating: the SQL mirror's
        # DISTINCT runs post-mask, so two window mins differing only
        # in the top bit must collapse to ONE (doc_id, fp) row here
        # too.
        fps = np.unique(mins & np.uint64(0x7FFFFFFFFFFFFFFF))
        out_id.extend([doc_id] * len(fps))
        out_fp.extend(fps.tolist())
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "fp": pa.array(out_fp, type=pa.int64()),
        }
    )


def winnow_fingerprints_sql(k: int = 8, window: int = 4,
                            table: str = "documents") -> str:
    """DuckDB mirror of :func:`winnow_fingerprints_batch` — the rolling
    polynomial hash is plain modular arithmetic, so HUGEINT math
    reproduces it bit-for-bit: per position, ``Σ byte_j · B^(k-1-j)
    mod 2^64`` with the powers precomputed in Python and inlined as
    literals (DuckDB's ``**`` returns DOUBLE — never use it for exact
    integer powers), then the window min via ``min() OVER (... ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)`` kept only where the
    window is full (short docs: the last running min IS the global
    min), DISTINCT, masked to 63 bits via ``% 2^63``.

    ASCII assumption: the engine hashes UTF-8 BYTES; the mirror reads
    ``unicode(substr(text, i, 1))`` which equals the byte only for
    ASCII text (true of the test corpora — asserted nowhere here, so
    do not point this ORACLE at non-ASCII data; the engine itself is
    byte-correct for any input)."""
    B = 1_000_003
    C = [pow(B, k - 1 - j, 2 ** 64) for j in range(k)]
    m64 = "CAST('18446744073709551616' AS HUGEINT)"
    m63 = "CAST('9223372036854775808' AS HUGEINT)"
    terms = " + ".join(
        f"CAST(unicode(substr(text, gs+{j}, 1)) AS HUGEINT) * "
        f"CAST('{C[j]}' AS HUGEINT)" for j in range(k)
    )
    return f"""
WITH docs AS (
  SELECT doc_id, text, length(text) AS n FROM {table}
  WHERE text IS NOT NULL AND length(text) >= {k}
), grams AS (
  SELECT doc_id, gs AS i, ({terms}) % {m64} AS h
  FROM docs CROSS JOIN unnest(generate_series(1, n - {k - 1})) AS u(gs)
), counted AS (
  SELECT doc_id, count(*) AS ng FROM grams GROUP BY doc_id
), mins AS (
  SELECT g.doc_id,
    min(h) OVER (PARTITION BY g.doc_id ORDER BY i
                 ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS m,
    i, c.ng
  FROM grams g JOIN counted c USING (doc_id)
)
SELECT DISTINCT doc_id, CAST(m % {m63} AS BIGINT) AS fp
FROM mins
WHERE (ng < {window} AND i = ng) OR (ng >= {window} AND i >= {window})
ORDER BY doc_id, fp
""".strip()


# GPT2-style pre-tokenizer pattern (BPE-ish token segmentation) —
# identical RE2 semantics in Arrow and DuckDB (\p{L}/\p{N} classes).
BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace tokens + BPE-ish pre-tokenizer counts side by side
    (the two token-counting bases a training pipeline budgets with)."""
    ws = pc.cast(pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64())
    bpe = pc.cast(pc.count_substring_regex(batch["text"], BPE_RE), pa.int64())
    return pa.table(
        {"doc_id": batch["doc_id"], "n_ws_tokens": ws, "n_bpe_tokens": bpe}
    )


def bpe_token_count_sql() -> str:
    rx = BPE_RE.replace("'", "''")
    return (
        "SELECT doc_id, "
        "CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_ws_tokens, "
        f"CAST(len(regexp_extract_all(text, '{rx}')) AS BIGINT) AS n_bpe_tokens "
        "FROM documents"
    )


# --------------------------------------------------------- TF-IDF

def doc_tfidf(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document TF-IDF mass — the corpus-level distinctiveness
    score a curation pipeline uses to separate boilerplate from
    content: ``score(d) = Σ_t tf(t,d) · idf(t)`` with
    ``idf(t) = ln(N / df(t))``.

    Integer-exact contract: idf is scaled to MILLIONTHS and floored to
    int64 (``floor(ln(N/df)·1e6)``), so the per-doc score is a sum of
    int64 products — order-free and bit-exact across engines (a raw
    double Σ would hash-diverge on summation order). The ln itself is
    IEEE double in both numpy and DuckDB on identical inputs; floor at
    the sixth decimal absorbs any last-ulp wobble except on exact
    boundaries (measure-zero).

    Two passes, both combiner-first:

    1. **df pass**: per batch, distinct (term) per doc → Arrow
       ``group_by(term).count`` partials → driver merge (vocab-sized;
       at web scale swap the driver merge for ``final='ray'`` + a
       persisted vocab sink and broadcast the top-V slice — the df
       table is the pipeline's "small side").
    2. **score pass**: the (vocab → idf_millionths) map broadcasts
       once via ``ray.put``; each batch tokenizes (Python
       ``str.split`` — parity with the SQL mirror's Unicode-whitespace
       class, cf. ``dedup._PY_WHITESPACE_RE2``), counts (doc, term)
       pairs with one Arrow ``group_by``, attaches idf with
       ``index_in``/``take``, and segment-sums per doc.

    Docs with zero tokens produce no row (the SQL inner join drops
    them identically). Returns a Dataset (doc_id, tfidf_millionths).
    """
    import numpy as np
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    # consumed three times (N, df pass, score pass) — pin the blocks in
    # the object store once instead of re-running the upstream graph
    ds = ds.materialize()
    n_docs = ds.count()

    def flat_tokens(t: pa.Table):
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        total = int(lens.sum())
        flat = np.empty(total, dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        return np.repeat(ids, lens), flat

    def df_partial(t: pa.Table) -> pa.Table:
        doc_of, flat = flat_tokens(t)
        pairs = pa.table(
            {"term": pa.array(flat, type=pa.string()),
             "d": pa.array(doc_of)}
        )
        uniq = pairs.group_by(["term", "d"]).aggregate([])
        out = uniq.group_by("term").aggregate([([], "count_all")])
        return out.rename_columns(["term", "df"])

    parts = ds.map_batches(skip_empty(df_partial), batch_format="pyarrow",
                           zero_copy_batch=True)
    tables = list(parts.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({id_col: pa.array([], type=pa.int64()),
                      "tfidf_millionths": pa.array([], type=pa.int64())})
        )
    df_tbl = (
        pa.concat_tables(tables).group_by("term").aggregate([("df", "sum")])
    )
    terms = df_tbl["term"].combine_chunks()
    df_np = df_tbl["df_sum"].to_numpy(zero_copy_only=False).astype("float64")
    idf_m = np.floor(np.log(float(n_docs) / df_np) * 1_000_000).astype("int64")
    idf_ref = ray.put((terms, pa.array(idf_m)))

    def score(t: pa.Table) -> pa.Table:
        vocab, idf = ray.get(idf_ref)
        doc_of, flat = flat_tokens(t)
        pairs = pa.table(
            {"d": pa.array(doc_of), "term": pa.array(flat, type=pa.string())}
        )
        tf = pairs.group_by(["d", "term"]).aggregate([([], "count_all")])
        tf = tf.rename_columns(["d", "term", "tf"])
        idx = pc.index_in(tf["term"], value_set=vocab)
        w = pc.multiply(
            pc.cast(tf["tf"], pa.int64()), pc.take(idf, idx)
        )
        scored = pa.table({"d": tf["d"], "w": w})
        out = scored.group_by("d").aggregate([("w", "sum")])
        return pa.table(
            {id_col: out["d"], "tfidf_millionths": out["w_sum"]}
        )

    return ds.map_batches(skip_empty(score), batch_format="pyarrow",
                          zero_copy_batch=True)


def doc_tfidf_sql(table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
), n AS (
  SELECT count(*) AS n FROM {table}
)
SELECT tf.doc_id,
  CAST(sum(tf.tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / df.df) * 1000000)
                        AS BIGINT)) AS BIGINT) AS tfidf_millionths
FROM tf JOIN df USING (term) CROSS JOIN n
GROUP BY tf.doc_id
""".strip()


# ------------------------------------------------ corpus vocabulary

def vocab_top_words(ds, k: int = 100, n_buckets: int = 64) -> pa.Table:
    """Corpus vocabulary: the top-``k`` words by total occurrence count
    (ties broken by word, ascending) — the vocabulary-build step of LM
    tokenizer prep, over an UNBOUNDED word space.

    Shape: per-batch explode + LOCAL count (Arrow ``split_pattern`` →
    ``group_by`` — the combiner: a batch contributes one row per
    distinct word, not per token), ONE hash-bucket exchange on the
    word, per-bucket sum + per-bucket top-k (buckets partition words
    disjointly, so the global top-k is the top-k of the ≤ buckets×k
    bucket winners — an O(buckets·k) driver merge, never a global
    sort). Split is single-space, mirroring the SQL ``string_split``
    exactly (cf. ``TOKEN_RE``)."""
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        toks = toks.filter(pc.not_equal(toks, ""))
        c = (pa.table({"word": toks}).group_by("word")
             .aggregate([([], "count_all")])
             .rename_columns(["word", "n"]))
        return c.append_column(
            "_bucket", pa.array(hash_bucket_array(c["word"], n_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "word"], ascending=[False, True]).head(k)
        return s[["word", "n"]]

    tops = (
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    merged = tops.to_pandas()  # bounded: ≤ n_buckets × k rows
    if merged.empty:
        # empty / all-empty-text corpus: skip_empty emitted no blocks
        # and Ray's to_pandas() drops columns on zero-row datasets —
        # return the TYPED empty vocabulary (mirrors the SQL's 0 rows)
        return pa.table({"word": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    merged = merged.sort_values(["n", "word"],
                                ascending=[False, True]).head(k)
    return pa.table(
        {"word": pa.array(merged["word"].to_numpy(), type=pa.string()),
         "n": pa.array(merged["n"].to_numpy(), type=pa.int64())}
    )


def vocab_top_words_sql(k: int = 100, table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM {table}
)
SELECT word, count(*) AS n FROM toks
GROUP BY word ORDER BY n DESC, word LIMIT {k}
""".strip()


def vocab_novelty(ds, ts_col: str = "ts", text_col: str = "text"):
    """New-vocabulary cadence: how many NEVER-BEFORE-SEEN tokens enter
    the corpus each day — the vocabulary-growth monitor a continuous
    ingestion pipeline watches for drift (a spike = a new language /
    format / spam family arriving; a Heaps'-law decay = healthy).

    Two-level reduce, both combiner-first: per batch, each token
    collapses to its batch-min day (one Arrow ``group_by`` min —
    days ride as int64 epoch days, so min is order-free), the
    UNBOUNDED token keyspace merges via the distributed min-groupby
    (``grouped_agg(final='ray')`` — the vocabulary never lands on the
    driver), and the surviving (token → first_day) rows collapse to
    per-day counts (bounded: one row per calendar day) with a driver
    merge. Tokenizer = Python ``str.split`` ≡ the SQL mirror's Unicode
    whitespace class.

    Returns a pyarrow Table (day, n_new) sorted by day, ``day`` =
    int64 epoch days (``epoch_us // 86_400_000_000``).
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        # normalize the unit first: a pandas-sourced ns column would
        # otherwise silently divide 1000x wrong
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        days = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        day_np = days.to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        total = int(lens.sum())
        flat = np.empty(total, dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        pairs = pa.table({"term": pa.array(flat, type=pa.string()),
                          "day": pa.array(np.repeat(day_np, lens))})
        out = pairs.group_by("term").aggregate([("day", "min")])
        return out.rename_columns(["term", "day"])

    tok_min = ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                             zero_copy_batch=True)
    first_seen = grouped_agg(tok_min, keys=["term"],
                             aggs=[("day", "min")], final="ray")

    def day_counts(t: pa.Table) -> pa.Table:
        out = t.group_by("day_min").aggregate([([], "count_all")])
        return out.rename_columns(["day", "n_new"])

    parts = list(
        first_seen.map_batches(skip_empty(day_counts),
                               batch_format="pyarrow",
                               zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return pa.table({"day": pa.array([], type=pa.int64()),
                         "n_new": pa.array([], type=pa.int64())})
    out = (pa.concat_tables(parts).group_by("day")
           .aggregate([("n_new", "sum")]))
    return (out.rename_columns(["day", "n_new"])
            .sort_by([("day", "ascending")]))


def vocab_novelty_sql(table: str = "transcripts") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
toks AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
    unnest(list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM {table}
), first_seen AS (
  SELECT term, min(day) AS day FROM toks GROUP BY term
)
SELECT day, CAST(count(*) AS BIGINT) AS n_new
FROM first_seen GROUP BY day ORDER BY day
""".strip()


def token_filter_above_quantile(ds, q: float = 0.5, lo: float = 0.0,
                                hi: float = 500.0, bins: int = 500):
    """Percentile-threshold curation: keep documents whose token count
    reaches the corpus q-quantile — the "top-half by length" gate that
    needs a GLOBAL statistic before a per-row filter.

    Scale shape: pass 1 computes the quantile with the additive
    histogram sketch (per-block bincount partials, one tiny vector per
    block to the driver — :func:`sketches.binned_quantiles`'s
    integer-exact rule, so SQL reproduces the threshold bit-for-bit);
    the threshold scalar then broadcasts into a pure filter pass. The
    token-count table (id + int per doc) is materialized ONCE and
    feeds both passes — at corpus scale that is O(rows·16B) in the
    object store, never the text itself, and never the driver.

    Output: (doc_id, n_tokens) for surviving docs.
    """
    from fluent_server_ray.stages.sketches import binned_quantiles

    tc = ds.map_batches(token_count_batch, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    qt = binned_quantiles(tc, "n_tokens", lo=lo, hi=hi, bins=bins, qs=(q,))
    if len(qt) == 0:
        # empty corpus: the sketch has no quantile row — the gate keeps
        # nothing, same 0 rows the SQL mirror returns
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "n_tokens": pa.array([], type=pa.int64())}
        ))
    threshold = qt["bucket_lo"][0].as_py()

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(pc.cast(t["n_tokens"], pa.float64()), threshold)
        )

    return tc.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def token_filter_above_quantile_sql(q: float = 0.5, lo: float = 0.0,
                                    hi: float = 500.0, bins: int = 500,
                                    table: str = "documents") -> str:
    from fluent_server_ray.stages.sketches import binned_quantiles_sql

    qsql = binned_quantiles_sql("n_tokens", lo=lo, hi=hi, bins=bins,
                                qs=(q,), table="tc")
    return f"""
WITH tc AS (
  SELECT doc_id, CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT)
           AS n_tokens
  FROM {table}
), qt AS ({qsql})
SELECT tc.doc_id, tc.n_tokens
FROM tc, qt
WHERE CAST(tc.n_tokens AS DOUBLE) >= qt.bucket_lo
""".strip()


def bigram_top(ds, k: int = 100, n_buckets: int = 64) -> pa.Table:
    """Top-``k`` adjacent word pairs (collocations) by corpus count —
    the co-occurrence-statistics step of phrase/tokenizer-merge prep
    (BPE's merge candidates ARE the most frequent adjacent pairs),
    over an UNBOUNDED pair space.

    Same physical shape as :func:`vocab_top_words` (per-batch explode
    + local count combiner → one pair-hash bucket exchange →
    per-bucket top-k → O(buckets·k) driver merge), but the explode is
    pair-forming: flatten all tokens, drop empties (compacting doc
    ownership alongside), then ONE vectorized join of the flat array
    against itself shifted by one, masked where the two tokens belong
    to different documents — no per-document loop, O(tokens) work.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        if len(flat) < 2:
            return pa.table({"pair": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "_bucket": pa.array([], type=pa.int64())})
        pair = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        )
        same_doc = doc_of[:-1] == doc_of[1:]
        pair = pair.filter(pa.array(same_doc))
        c = (pa.table({"pair": pair}).group_by("pair")
             .aggregate([([], "count_all")])
             .rename_columns(["pair", "n"]))
        return c.append_column(
            "_bucket", pa.array(hash_bucket_array(c["pair"], n_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "pair"], ascending=[False, True]).head(k)
        return s[["pair", "n"]]

    tops = (
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    merged = tops.to_pandas()  # bounded: ≤ n_buckets × k rows
    if merged.empty:
        return pa.table({"pair": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    merged = merged.sort_values(["n", "pair"],
                                ascending=[False, True]).head(k)
    return pa.table(
        {"pair": pa.array(merged["pair"].to_numpy(), type=pa.string()),
         "n": pa.array(merged["n"].to_numpy(), type=pa.int64())}
    )


def bigram_top_sql(k: int = 100, table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), pairs AS (
  SELECT t[gs] || ' ' || t[gs + 1] AS pair
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
)
SELECT pair, count(*) AS n FROM pairs
GROUP BY pair ORDER BY n DESC, pair LIMIT {k}
""".strip()


def word_postings(ds, max_docs: int | None = None,
                  n_buckets: int = 64):
    """Inverted index build: per word, the document frequency and the
    sorted posting list (comma-joined doc ids) — the IR-side sibling
    of :func:`vocab_top_words`, demonstrating distributed
    collect-sorted-list aggregation.

    Shape: per batch, explode to DISTINCT (word, doc_id) pairs (an
    Arrow group_by — the combiner: a doc contributes each word once
    regardless of term frequency), ONE word-bucket exchange, per-bucket
    collect (sort by (word, doc_id), segmented join). Returns a
    Dataset — the index is corpus-sized and never on the driver.

    ``max_docs``: the honest scale cap — a stop-word's posting list is
    itself corpus-sized, so words with ``n_docs > max_docs`` keep their
    exact count but emit a NULL ``doc_list`` (the SQL mirror uses the
    identical CASE). ``None`` collects everything (test scale).
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(ids, lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        pairs = (
            pa.table({"word": flat.filter(pa.array(keep)),
                      "doc_id": pa.array(doc_of[keep], type=pa.int64())})
            .group_by(["word", "doc_id"]).aggregate([])  # batch-local distinct
        )
        return pairs.append_column(
            "_bucket", pa.array(hash_bucket_array(pairs["word"], n_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # global distinct within the bucket (a (word, doc) pair can
        # arrive from several blocks), then segmented collect
        g = (g[["word", "doc_id"]].drop_duplicates()
             .sort_values(["word", "doc_id"]))
        grp = g.groupby("word", sort=False)
        out = grp.agg(
            n_docs=("doc_id", "size"),
            doc_list=("doc_id", lambda s: ",".join(map(str, s))),
        ).reset_index()
        out["n_docs"] = out["n_docs"].astype("int64")
        if max_docs is not None:
            out.loc[out["n_docs"] > max_docs, "doc_list"] = None
        # emit a TYPED Arrow block: a bucket where EVERY list was
        # capped would otherwise convert its all-None object column to
        # Arrow null type → schema mismatch against sibling blocks
        # (and pandas StringDtype would surface pd.NA where the oracle
        # yields None)
        return pa.table({
            "word": pa.array(out["word"], type=pa.string()),
            "n_docs": pa.array(out["n_docs"], type=pa.int64()),
            "doc_list": pa.array(
                [None if pd.isna(x) else x for x in out["doc_list"]],
                type=pa.string(),
            ),
        })

    return (
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def word_postings_sql(max_docs: int | None = None,
                      table: str = "documents") -> str:
    cap = (f"CASE WHEN count(*) > {max_docs} THEN NULL ELSE "
           if max_docs is not None else "(")
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             AS word
    FROM {table}
  )
)
SELECT word, CAST(count(*) AS BIGINT) AS n_docs,
       {cap}string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
       {'END' if max_docs is not None else ')'} AS doc_list
FROM pairs GROUP BY word
""".strip()


def encode_with_vocab(ds, vocab_words) -> "ray.data.Dataset":
    """Tokenizer APPLY: map every document to its id sequence under a
    fixed vocabulary (id = position in ``vocab_words``; out-of-vocab →
    -1) — the encode step that follows a :func:`vocab_top_words`
    build. The vocabulary is bounded (top-k) so it ships once in the
    stage closure; the encode itself is a pure map: ONE ``index_in``
    over the batch's flat token array, then a segmented re-join into
    per-doc comma-separated ids (offsets arithmetic, no Python
    per-doc loop). Documents with no (non-empty) tokens emit no row
    (the SQL mirror's GROUP BY drops them identically).

    Output: (doc_id, ids) — ids as a CSV string, the cross-engine
    value-comparable form of ``list<int>``.
    """
    import numpy as np

    vocab_arr = pa.array(list(vocab_words), type=pa.string())

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        # per-doc non-empty token counts: segmented sum of the keep mask
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        new_lens = np.bincount(doc_of[keep], minlength=len(lens)) \
            .astype(np.int64)
        ids = pc.fill_null(
            pc.cast(pc.index_in(flat, vocab_arr), pa.int64()), -1
        )
        id_str = pc.cast(ids, pa.string())
        nonzero = new_lens > 0
        offsets = np.concatenate(
            [[0], np.cumsum(new_lens)]
        ).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            id_str.combine_chunks() if isinstance(id_str, pa.ChunkedArray)
            else id_str,
        )
        joined = pc.binary_join(lists, ",")
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(nonzero)),
            "ids": joined.filter(pa.array(nonzero)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def encode_with_vocab_sql(vocab_sql: str, table: str = "documents") -> str:
    """Mirror: the vocabulary subquery's (ORDER BY n DESC, word) rank
    is the id; tokens keep document order via generate_series
    position."""
    return f"""
WITH vocab AS (
  SELECT word, CAST(row_number() OVER (ORDER BY n DESC, word) - 1
                    AS BIGINT) AS id
  FROM ({vocab_sql})
), toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), positioned AS (
  SELECT doc_id, gs AS pos, t[gs] AS word
  FROM toks CROSS JOIN unnest(generate_series(1, len(t))) AS u(gs)
)
SELECT p.doc_id,
       string_agg(CAST(COALESCE(v.id, -1) AS VARCHAR), ','
                  ORDER BY p.pos) AS ids
FROM positioned p LEFT JOIN vocab v ON p.word = v.word
GROUP BY p.doc_id
""".strip()


# ------------------------------------- corpus unigram-LM quality score

def doc_unigram_logprob(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document average unigram log-probability under the corpus's
    OWN unigram language model — the perplexity-style quality gate of
    training-data curation (cf. CCNet/Gopher LM filtering) with the
    corpus itself as the model: gibberish and rare-token soup scores
    low, repetitive boilerplate scores high.

    ``logp(t) = ln(count(t) / total_tokens)`` (token counts WITH
    multiplicity — this is the LM distribution, unlike
    :func:`doc_tfidf`'s document frequency), per-doc score
    ``Σ_tokens logp`` and its per-token mean.

    Integer-exact contract (same device as :func:`doc_tfidf`): logp is
    floored to int64 MILLIONTHS, the doc score is a sum of int64
    products — order-free, so partitioning can never flip the hash.
    The exposed mean divides the int sum by the int token count in one
    float64 division (one IEEE op = bit-exact across engines).

    Two combiner-first passes over one materialized input: (1) term
    counts per batch → driver merge (vocab-sized; the 100 TB variant
    swaps the driver merge for ``final='ray'`` + a persisted vocab
    sink, as with doc_tfidf); (2) the (term → logp_millionths) map
    broadcasts once, each batch segment-sums its tokens' logp. Docs
    with zero tokens emit no row (SQL inner join drops them too).

    Returns a Dataset (doc_id, n_tokens, logprob_millionths,
    avg_logprob).
    """
    import numpy as np
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    ds = ds.materialize()

    def flat_tokens(t: pa.Table):
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        return np.repeat(ids, lens), flat

    def tf_partial(t: pa.Table) -> pa.Table:
        _, flat = flat_tokens(t)
        terms = pa.table({"term": pa.array(flat, type=pa.string())})
        out = terms.group_by("term").aggregate([([], "count_all")])
        return out.rename_columns(["term", "n"])

    parts = ds.map_batches(skip_empty(tf_partial), batch_format="pyarrow",
                           zero_copy_batch=True)
    tables = list(parts.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "logprob_millionths": pa.array([], type=pa.int64()),
            "avg_logprob": pa.array([], type=pa.float64()),
        }))
    tf_tbl = pa.concat_tables(tables).group_by("term").aggregate(
        [("n", "sum")])
    terms = tf_tbl["term"].combine_chunks()
    counts = tf_tbl["n_sum"].to_numpy(zero_copy_only=False).astype("float64")
    total = float(counts.sum())
    logp_m = np.floor(np.log(counts / total) * 1_000_000).astype("int64")
    lp_ref = ray.put((terms, pa.array(logp_m)))

    def score(t: pa.Table) -> pa.Table:
        vocab, lp = ray.get(lp_ref)
        doc_of, flat = flat_tokens(t)
        pairs = pa.table({
            "d": pa.array(doc_of),
            "term": pa.array(flat, type=pa.string()),
        })
        tf = pairs.group_by(["d", "term"]).aggregate([([], "count_all")])
        tf = tf.rename_columns(["d", "term", "tf"])
        idx = pc.index_in(tf["term"], value_set=vocab)
        w = pc.multiply(pc.cast(tf["tf"], pa.int64()), pc.take(lp, idx))
        scored = pa.table({"d": tf["d"], "w": w,
                           "tf": pc.cast(tf["tf"], pa.int64())})
        out = scored.group_by("d").aggregate([("w", "sum"), ("tf", "sum")])
        avg = pc.divide(pc.cast(out["w_sum"], pa.float64()),
                        pc.cast(out["tf_sum"], pa.float64()))
        return pa.table({
            id_col: out["d"],
            "n_tokens": out["tf_sum"],
            "logprob_millionths": out["w_sum"],
            "avg_logprob": avg,
        })

    return ds.map_batches(skip_empty(score), batch_format="pyarrow",
                          zero_copy_batch=True)


def doc_unigram_logprob_sql(table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), lm AS (
  SELECT term, count(*) AS n FROM toks GROUP BY term
), tot AS (
  SELECT count(*) AS total FROM toks
), lp AS (
  SELECT term,
    CAST(floor(ln(CAST(n AS DOUBLE) / total) * 1000000) AS BIGINT) AS lp_m
  FROM lm CROSS JOIN tot
), doc AS (
  SELECT tf.doc_id,
    CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
    CAST(sum(tf.tf * lp.lp_m) AS BIGINT) AS logprob_millionths
  FROM tf JOIN lp USING (term)
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens, logprob_millionths,
  CAST(logprob_millionths AS DOUBLE) / CAST(n_tokens AS DOUBLE)
    AS avg_logprob
FROM doc
""".strip()


# ------------------------------------ corpus bigram-LM quality score

_BIGRAM_SEP = "\x1f"  # U+001F is Python/RE2 whitespace on BOTH engines
#                       (str.split and _PY_WHITESPACE_RE2 both split on
#                       it), so no token can ever contain it — the
#                       joined bigram key is collision-free by
#                       construction, not by assumption.


def doc_bigram_logprob(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document average BIGRAM log-probability under the corpus's
    own bigram LM — the next step up from
    :func:`doc_unigram_logprob`'s bag-of-words score: word-salad that
    uses common words in uncommon ORDER now scores low, fluent
    boilerplate scores high. ``logp(w1,w2) = ln(c(w1,w2) /
    c_prefix(w1))`` where ``c_prefix`` counts occurrences of ``w1`` as
    a bigram START (doc-final tokens excluded) — a proper conditional:
    probabilities over each prefix sum to 1. Under the self-trained
    model every observed bigram has count ≥ 1, so no backoff branch
    exists to diverge on.

    Same integer-exact contract and scale shape as
    :func:`doc_unigram_logprob`: one count pass whose per-batch
    combiner emits (bigram, n) partials (the shuffle carries distinct
    bigrams per block), driver merge (bigram-vocab-sized; the 100 TB
    variant swaps it for ``grouped_agg(final='ray')`` + a bucketed
    scoring join, as documented on doc_tfidf), prefix counts derived
    from the merged table (no second corpus pass), the (bigram →
    logp_millionths) map broadcast once, then one vectorized scoring
    pass. Docs with < 2 tokens emit no row (SQL inner join drops them
    too).

    Returns a Dataset (doc_id, n_bigrams, logprob_millionths,
    avg_logprob).
    """
    import numpy as np
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    ds = ds.materialize()

    def flat_bigrams(t: pa.Table):
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        doc_of = np.repeat(ids, lens)
        if len(flat) < 2:
            e = pa.array([], type=pa.string())
            return np.empty(0, dtype=np.int64), e
        same = doc_of[1:] == doc_of[:-1]
        # doc ids can repeat across batches but never interleave within
        # one (each doc is one row) — adjacency within doc_of is exact
        w1 = pa.array(flat[:-1][same], type=pa.string())
        w2 = pa.array(flat[1:][same], type=pa.string())
        b = pc.binary_join_element_wise(w1, w2, _BIGRAM_SEP)
        return doc_of[1:][same], b

    def bg_partial(t: pa.Table):
        _, b = flat_bigrams(t)
        if not len(b):
            return
        out = pa.table({"b": b}).group_by("b").aggregate([([], "count_all")])
        yield out.rename_columns(["b", "n"])

    parts = ds.map_batches(bg_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    tables = list(parts.iter_batches(batch_size=None, batch_format="pyarrow"))
    empty = pa.table({
        id_col: pa.array([], type=pa.int64()),
        "n_bigrams": pa.array([], type=pa.int64()),
        "logprob_millionths": pa.array([], type=pa.int64()),
        "avg_logprob": pa.array([], type=pa.float64()),
    })
    if not tables:
        import ray.data as rd

        return rd.from_arrow(empty)
    cb = pa.concat_tables(tables).group_by("b").aggregate([("n", "sum")])
    b_terms = cb["b"].combine_chunks()
    n_b = cb["n_sum"].to_numpy(zero_copy_only=False).astype("float64")
    # prefix counts fold out of the bigram table — no second corpus pass
    w1 = pc.list_element(pc.split_pattern(b_terms, _BIGRAM_SEP), 0)
    pref = pa.table({"w1": w1, "n": cb["n_sum"]}).group_by("w1").aggregate(
        [("n", "sum")])
    idx = pc.index_in(w1, value_set=pref["w1"].combine_chunks())
    n_p = pc.take(pref["n_sum"], idx).to_numpy(
        zero_copy_only=False).astype("float64")
    lp_m = np.floor(np.log(n_b / n_p) * 1_000_000).astype("int64")
    lp_ref = ray.put((b_terms, pa.array(lp_m)))

    def score(t: pa.Table):
        doc_of, b = flat_bigrams(t)
        if not len(b):
            return
        vocab, lp = ray.get(lp_ref)
        tf = pa.table({"d": pa.array(doc_of), "b": b}).group_by(
            ["d", "b"]).aggregate([([], "count_all")])
        tf = tf.rename_columns(["d", "b", "tf"])
        w = pc.multiply(pc.cast(tf["tf"], pa.int64()),
                        pc.take(lp, pc.index_in(tf["b"], value_set=vocab)))
        scored = pa.table({"d": tf["d"], "w": w,
                           "tf": pc.cast(tf["tf"], pa.int64())})
        out = scored.group_by("d").aggregate([("w", "sum"), ("tf", "sum")])
        avg = pc.divide(pc.cast(out["w_sum"], pa.float64()),
                        pc.cast(out["tf_sum"], pa.float64()))
        yield pa.table({
            id_col: out["d"],
            "n_bigrams": out["tf_sum"],
            "logprob_millionths": out["w_sum"],
            "avg_logprob": avg,
        })

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    return scored


def doc_bigram_logprob_sql(table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), pos AS (
  SELECT doc_id, t[gs] AS w1, t[gs] || chr(31) || t[gs + 1] AS b
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), tf AS (
  SELECT doc_id, b, count(*) AS tf FROM pos GROUP BY doc_id, b
), cb AS (
  SELECT b, count(*) AS n FROM pos GROUP BY b
), cp AS (
  SELECT w1, count(*) AS np FROM pos GROUP BY w1
), lp AS (
  SELECT b,
    CAST(floor(ln(CAST(cb.n AS DOUBLE) / cp.np) * 1000000) AS BIGINT)
      AS lp_m
  FROM cb JOIN cp ON split_part(cb.b, chr(31), 1) = cp.w1
), doc AS (
  SELECT tf.doc_id,
    CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
    CAST(sum(tf.tf * lp.lp_m) AS BIGINT) AS logprob_millionths
  FROM tf JOIN lp USING (b)
  GROUP BY tf.doc_id
)
SELECT doc_id, n_bigrams, logprob_millionths,
  CAST(logprob_millionths AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
    AS avg_logprob
FROM doc
""".strip()


def doc_token_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon token entropy (nats) — the WITHIN-document
    distribution signal that complements the corpus-LM scores:
    keyword-stuffing and single-phrase spam score near 0, varied text
    scores near ``ln(n_tokens)``. ``H = ln(n) - (Σ_t tf·ln(tf)) / n``
    over the doc's term frequencies.

    Integer-exact contract: BOTH logs floor to int64 millionths
    (``ln(tf)`` per term, ``ln(n)`` per doc), so the numerator
    ``ln_n_m·n − Σ tf·lp_m`` is an order-free int64 and the final
    float is ONE exact division mirrored verbatim in SQL — a free-form
    ``ln(n) − (sum/1e6)/n`` float tree differed from DuckDB by 1 ulp
    on ~20% of rows (libm vs DuckDB ln). Pure per-batch map (term frequencies are per-doc
    — no corpus pass, no shuffle, unlike doc_unigram_logprob). Docs
    with zero tokens emit no row. Returns (doc_id, n_tokens,
    entropy)."""
    import numpy as np

    def fn(t: pa.Table):
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        if not len(flat):
            return
        doc_of = np.repeat(ids, lens)
        tf = pa.table({
            "d": pa.array(doc_of),
            "term": pa.array(flat, type=pa.string()),
        }).group_by(["d", "term"]).aggregate([([], "count_all")])
        tf = tf.rename_columns(["d", "term", "tf"])
        cnt = tf["tf"].to_numpy(zero_copy_only=False).astype("float64")
        lp_m = np.floor(np.log(cnt) * 1_000_000).astype("int64")
        w = pc.multiply(pc.cast(tf["tf"], pa.int64()), pa.array(lp_m))
        agg = pa.table({
            "d": tf["d"], "w": w,
            "tf": pc.cast(tf["tf"], pa.int64()),
        }).group_by("d").aggregate([("w", "sum"), ("tf", "sum")])
        n = agg["tf_sum"].to_numpy(zero_copy_only=False).astype("int64")
        s = agg["w_sum"].to_numpy(zero_copy_only=False).astype("int64")
        ln_n_m = np.floor(
            np.log(n.astype("float64")) * 1_000_000
        ).astype("int64")
        num = ln_n_m * n - s  # exact int64 (n, s ≪ 2^53)
        ent = num.astype("float64") / (1_000_000.0 * n.astype("float64"))
        yield pa.table({
            id_col: agg["d"],
            "n_tokens": agg["tf_sum"],
            "entropy": pa.array(ent, type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def doc_token_entropy_sql(table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), doc AS (
  SELECT doc_id,
    CAST(sum(tf) AS BIGINT) AS n_tokens,
    CAST(sum(tf * CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000000) AS BIGINT))
         AS BIGINT) AS s_m
  FROM tf GROUP BY doc_id
)
SELECT doc_id, n_tokens,
  CAST(CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
         * n_tokens - s_m AS DOUBLE)
    / (1000000.0 * CAST(n_tokens AS DOUBLE))
    AS entropy
FROM doc
""".strip()


# --------------------------------------------------- BM25 retrieval

def bm25_topk(ds, query_terms, k: int = 10, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> pa.Table:
    """Okapi BM25 top-``k`` retrieval for a fixed query term set — the
    scoring sibling of the inverted index (:func:`word_postings`); on
    a training-data pipeline this is the targeted-subset selector
    ("find the docs about X") that runs BEFORE an expensive stage.

    Scale shape, one tokenize pass over the corpus:

    - per-batch combiner emits (doc_id, term, tf, dl) for docs
      containing a query term (``is_in`` against the tiny broadcast
      query set — never the vocabulary) plus ONE sentinel stats row
      per batch (term='', tf=#docs, dl=#tokens) so corpus N / avgdl
      need no second pass;
    - the matched-row table is materialized in the OBJECT STORE (it is
      O(docs containing a query term) — corpus-scale for stopword-like
      terms, so it never concats to the driver);
    - df per term and the N/avgdl scalars reduce through tiny
      per-batch partials (≤ |query|+1 rows each) merged on the driver;
    - scoring is a pure vectorized map over the matched rows with the
      broadcast idf table, summed per doc via
      ``grouped_agg(final='ray')`` (unbounded matched-doc cardinality),
      then per-block top-k partials merge on the driver (≤ blocks × k
      rows — the same O(blocks·k) merge as :func:`vocab_top_words`).

    Scores are integer ``bm25_millionths`` = Σ_t floor(idf_t · tf-norm
    · 1e6): per-term floor in BOTH engines (cf. ``doc_tfidf``) makes
    the sum integer-exact across engines, so the DuckDB oracle matches
    bit-for-bit. Ties break by doc_id ascending. Tokenization is the
    single-space split of :func:`vocab_top_words` (SQL
    ``string_split``)."""
    import numpy as np
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    terms_sorted = sorted(set(query_terms))
    if not terms_sorted or any(t == "" for t in terms_sorted):
        raise ValueError("query_terms must be non-empty, no empty string")
    q_ref = ray.put(pa.array(terms_sorted, type=pa.string()))

    def partial(t: pa.Table):
        q = ray.get(q_ref)
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        d_of = doc_idx[keep]
        dl = np.bincount(d_of, minlength=len(lens)).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        flat_k = flat.filter(pa.array(keep))
        m = pc.is_in(flat_k, value_set=q).to_numpy(zero_copy_only=False)
        rows = pa.table({
            "doc_id": pa.array(ids[d_of[m]]),
            "term": flat_k.filter(pa.array(m)),
            "dl": pa.array(dl[d_of[m]]),
        }).group_by(["doc_id", "term", "dl"]).aggregate([([], "count_all")])
        rows = rows.rename_columns(["doc_id", "term", "dl", "tf"])
        stats = pa.table({
            "doc_id": pa.array([-1], type=pa.int64()),
            "term": pa.array([""], type=pa.string()),
            "dl": pa.array([int(dl.sum())], type=pa.int64()),
            "tf": pa.array([len(t)], type=pa.int64()),
        })
        return pa.concat_tables(
            [rows.select(["doc_id", "term", "dl", "tf"]), stats]
        )

    rows_ds = ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "bm25_millionths": pa.array([], type=pa.int64())})

    def small_partial(t: pa.Table) -> pa.Table:
        # one tiny row set per block: the batch's stats sentinel(s)
        # + per-term df partials (each (doc,term) row is one doc)
        is_stats = pc.equal(t["term"], "")
        st = t.filter(is_stats)
        n = pc.sum(st["tf"]).as_py() or 0
        tok = pc.sum(st["dl"]).as_py() or 0
        tf_rows = t.filter(pc.invert(is_stats))
        d = (tf_rows.select(["term"]).group_by("term")
             .aggregate([([], "count_all")])
             .rename_columns(["term", "df"]))
        head = pa.table({"term": pa.array([""], type=pa.string()),
                         "df": pa.array([0], type=pa.int64()),
                         "n": pa.array([n], type=pa.int64()),
                         "tok": pa.array([tok], type=pa.int64())})
        d = d.append_column("n", pa.array(np.zeros(len(d), dtype=np.int64)))
        d = d.append_column("tok", pa.array(np.zeros(len(d), dtype=np.int64)))
        return pa.concat_tables([head, d])

    small_tables = list(
        rows_ds.map_batches(skip_empty(small_partial),
                            batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not small_tables:  # zero input blocks
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "bm25_millionths": pa.array([], type=pa.int64())})
    small = pa.concat_tables(small_tables)
    n_docs = int(pc.sum(small["n"]).as_py() or 0)
    n_tokens = int(pc.sum(small["tok"]).as_py() or 0)
    if n_docs == 0:
        return empty
    avgdl = float(n_tokens) / float(n_docs)
    dfs = (small.filter(pc.not_equal(small["term"], ""))
           .group_by("term").aggregate([("df", "sum")]))
    if len(dfs) == 0:
        return empty
    df_terms = dfs["term"].combine_chunks()
    df_np = dfs["df_sum"].to_numpy(zero_copy_only=False).astype("float64")
    # identical eval order to the SQL mirror: ln(((N-df)+0.5)/(df+0.5)+1)
    idf = np.log(((float(n_docs) - df_np) + 0.5) / (df_np + 0.5) + 1.0)
    idf_ref = ray.put((df_terms, pa.array(idf, type=pa.float64())))

    def contrib(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["term"], ""))
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        vocab, idf_arr = ray.get(idf_ref)
        idx = pc.index_in(t["term"], value_set=vocab)
        idf_row = pc.take(idf_arr, idx).to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype("float64")
        dl_row = t["dl"].to_numpy(zero_copy_only=False).astype("float64")
        den = tf + k1 * ((1.0 - b) + (b * dl_row) / avgdl)
        c = np.floor((idf_row * (tf * (1.0 + k1))) / den * 1_000_000.0)
        return pa.table({"doc_id": t["doc_id"],
                         "c": pa.array(c.astype(np.int64))})

    scored = grouped_agg(
        rows_ds.map_batches(skip_empty(contrib), batch_format="pyarrow",
                            zero_copy_batch=True),
        ["doc_id"], [("c", "sum")], final="ray",
    )

    def local_topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("c_sum", "descending"), ("doc_id", "ascending")]
        )
        return t.take(order.slice(0, k))

    part_tables = list(
        scored.map_batches(skip_empty(local_topk), batch_format="pyarrow",
                           zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not part_tables:
        return empty
    parts = pa.concat_tables(part_tables)
    if len(parts) == 0:
        return empty
    order = pc.sort_indices(
        parts, sort_keys=[("c_sum", "descending"), ("doc_id", "ascending")]
    )
    out = parts.take(order.slice(0, k))
    return pa.table({id_col: out["doc_id"],
                     "bm25_millionths": out["c_sum"]})


def bm25_topk_sql(query_terms, k: int = 10, k1: float = 1.2,
                  b: float = 0.75, table: str = "documents") -> str:
    terms = sorted(set(query_terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM {table} WHERE text IS NOT NULL
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM {table}) AS n,
         (SELECT count(*) FROM toks) AS tok
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id,
    CAST(floor(
      (ln(((CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
          / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
       * (CAST(tf.tf AS DOUBLE) * (1.0 + {k1})))
      / (CAST(tf.tf AS DOUBLE)
         + {k1} * ((1.0 - {b}) + ({b} * CAST(dl.dl AS DOUBLE))
                   / (CAST(stats.tok AS DOUBLE) / CAST(stats.n AS DOUBLE))))
      * 1000000.0) AS BIGINT) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS bm25_millionths
FROM contrib GROUP BY doc_id
ORDER BY bm25_millionths DESC, doc_id LIMIT {int(k)}
""".strip()


# ---------------------------------------------- PMI collocation mining

def pmi_top_pairs(ds, k: int = 50, min_count: int = 5,
                  n_buckets: int = 64, text_col: str = "text",
                  driver_max_partial_bytes: int = 256 << 20) -> pa.Table:
    """Top-``k`` adjacent word pairs by pointwise mutual information —
    the collocation detector behind phrase-vocabulary induction
    (word2vec phrase pass, tokenizer merge seeding): PMI(a,b) =
    ln( p(ab) / (p(a)·p(b)) ) with p from corpus counts, restricted to
    pairs seen ≥ ``min_count`` times (raw PMI is noise-dominated at
    low counts).

    Scale shape — the corpus is read exactly ONCE: a combined per-batch
    combiner emits local unigram AND pair counts in one table (pair
    rows flagged; unigram rows carry a sentinel w2). The count tables
    are UNBOUNDED (vocab / pair space), so the continuation is
    SIZE-ADAPTIVE (the ``bpe_train_adaptive`` pattern):

    - partials fit ``driver_max_partial_bytes`` → one driver pandas
      merge pass: zero shuffles, zero joins; byte-identical output
      (same float tree, same tie-breaks), pinned vs the distributed
      path in pytest;
    - larger → unigram and pair counts merge via
      ``grouped_agg(final='ray')`` (totals fall out of the merged
      tables for free — no extra corpus scan), the ``min_count`` gate
      runs BEFORE the joins, and two ``bucketed_hash_join``s attach
      c1(w1) and c1(w2) — the unigram table shuffles once per join
      side, the corpus never;
    - PMI is one vectorized float64 expression; integer
      ``pmi_millionths`` (floor, cf. ``doc_tfidf``) keeps the DuckDB
      oracle bit-exact; per-block top-k partials merge on the driver
      (O(blocks·k)).

    Output: (w1, w2, n, pmi_millionths), ordered by PMI desc then
    (w1, w2). Tokenization = single-space split (SQL string_split)."""
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def explode(t: pa.Table):
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        return flat, doc_of[keep]

    def combined_partial(t: pa.Table) -> pa.Table:
        # ONE corpus pass emits BOTH count partials: unigram rows carry
        # the sentinel w2 = '' (tokens are never '' — the explode
        # filters them — so the sentinel cannot collide) and
        # is_pair = False; pair rows carry the real (w1, w2).
        flat, doc_of = explode(t)
        uni = (pa.table({"w1": flat}).group_by("w1")
               .aggregate([([], "count_all")])
               .rename_columns(["w1", "c"]))
        n_u = len(uni)
        tabs = [pa.table({
            "w1": uni["w1"],
            "w2": pa.array([""] * n_u, type=pa.string()),
            "c": pc.cast(uni["c"], pa.int64()),
            "is_pair": pa.array(np.zeros(n_u, dtype=bool)),
        })]
        if len(flat) >= 2:
            same = pa.array(doc_of[:-1] == doc_of[1:])
            pairs = (pa.table({
                "w1": flat.slice(0, len(flat) - 1).filter(same),
                "w2": flat.slice(1).filter(same),
            }).group_by(["w1", "w2"]).aggregate([([], "count_all")])
              .rename_columns(["w1", "w2", "c"]))
            tabs.append(pa.table({
                "w1": pairs["w1"], "w2": pairs["w2"],
                "c": pc.cast(pairs["c"], pa.int64()),
                "is_pair": pa.array(np.ones(len(pairs), dtype=bool)),
            }))
        return pa.concat_tables(tabs)

    empty = pa.table({"w1": pa.array([], type=pa.string()),
                      "w2": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64()),
                      "pmi_millionths": pa.array([], type=pa.int64())})

    def _col_sum(mds, col: str) -> int:
        def part(t: pa.Table) -> pa.Table:
            return pa.table({"s": pa.array(
                [int(pc.sum(t[col]).as_py() or 0)], type=pa.int64())})

        total = 0
        for t in mds.map_batches(
                skip_empty(part), batch_format="pyarrow",
                zero_copy_batch=True,
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            total += int(pc.sum(t["s"]).as_py() or 0)
        return total

    T: float
    B: float

    def score_table(w1, w2, c2, c1a, c1b) -> pa.Table:
        # identical eval order on BOTH paths (and in the SQL mirror):
        # (c2*T*T)/(B*c1a*c1b)
        pmi = np.floor(np.log((c2 * T * T) / (B * c1a * c1b)) * 1_000_000.0)
        out = pa.table({
            "w1": pa.array(w1, type=pa.string()),
            "w2": pa.array(w2, type=pa.string()),
            "n": pa.array(c2.astype(np.int64)),
            "pmi_millionths": pa.array(pmi.astype(np.int64)),
        })
        order = pc.sort_indices(out, sort_keys=[
            ("pmi_millionths", "descending"),
            ("w1", "ascending"), ("w2", "ascending"),
        ])
        return out.take(order.slice(0, k))

    # ONE corpus pass; partials are count-table-sized (vocab + distinct
    # pairs per block), never corpus-sized
    parts = ds.map_batches(skip_empty(combined_partial),
                           batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    if (parts.size_bytes() or 0) <= driver_max_partial_bytes:
        # size-adaptive driver merge (the bpe_train_adaptive pattern):
        # counts fit one machine → zero shuffles, zero joins, one
        # pandas merge pass; byte-identical output (same float tree,
        # same tie-breaks), pinned against the distributed path
        import pandas as pd

        pdf = parts.to_pandas()
        if pdf.empty:
            return empty
        uni_d = (pdf[~pdf["is_pair"]].groupby("w1", sort=False)["c"]
                 .sum())
        big_d = (pdf[pdf["is_pair"]].groupby(["w1", "w2"], sort=False)
                 ["c"].sum().reset_index())
        n_tok = int(uni_d.sum())
        n_pairs = int(big_d["c"].sum()) if len(big_d) else 0
        if n_pairs == 0:
            return empty
        gated = big_d[big_d["c"] >= int(min_count)]
        if gated.empty:
            return empty
        T, B = float(n_tok), float(n_pairs)
        return score_table(
            gated["w1"].to_numpy(), gated["w2"].to_numpy(),
            gated["c"].to_numpy().astype("float64"),
            gated["w1"].map(uni_d).to_numpy().astype("float64"),
            gated["w2"].map(uni_d).to_numpy().astype("float64"),
        )

    # distributed fallback: split the combined partials (no re-read),
    # merge each side via grouped_agg(final='ray'), bucketed joins.
    # materialize: BOTH join sides consume the unigram graph (without
    # the pin the distributed aggregation would execute twice), and
    # the totals reduction + the gate both consume the pair graph.
    def split(flag: bool):
        def fn(t: pa.Table) -> pa.Table:
            sub = t.filter(pc.equal(t["is_pair"], flag))
            if flag:
                return pa.table({"w1": sub["w1"], "w2": sub["w2"],
                                 "c2": sub["c"]})
            return pa.table({"word": sub["w1"], "c1": sub["c"]})

        return fn

    uni = grouped_agg(
        parts.map_batches(skip_empty(split(False)), batch_format="pyarrow",
                          zero_copy_batch=True),
        ["word"], [("c1", "sum")], final="ray",
    ).materialize()
    big = grouped_agg(
        parts.map_batches(skip_empty(split(True)), batch_format="pyarrow",
                          zero_copy_batch=True),
        ["w1", "w2"], [("c2", "sum")], final="ray",
    ).materialize()

    # totals for free off the merged tables: Σ c1 = token count,
    # Σ c2 = adjacent-pair count — no third corpus scan
    n_tok = _col_sum(uni, "c1_sum")
    n_pairs = _col_sum(big, "c2_sum")
    if n_pairs == 0:
        return empty

    def gate(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["c2_sum"], pa.scalar(int(min_count)))
        )

    big = big.map_batches(skip_empty(gate), batch_format="pyarrow",
                          zero_copy_batch=True)

    def rename_uni(new: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(["word", new])

        return fn

    u1 = uni.map_batches(skip_empty(rename_uni("c1a")),
                         batch_format="pyarrow", zero_copy_batch=True)
    u2 = uni.map_batches(skip_empty(rename_uni("c1b")),
                         batch_format="pyarrow", zero_copy_batch=True)
    j1 = bucketed_hash_join(big, u1, key="w1", right_key="word",
                            n_buckets=n_buckets).drop_columns(["word"])
    j2 = bucketed_hash_join(j1, u2, key="w2", right_key="word",
                            n_buckets=n_buckets).drop_columns(["word"])

    T = float(n_tok)
    B = float(n_pairs)

    def score_topk(t: pa.Table) -> pa.Table:
        return score_table(
            t["w1"].to_numpy(zero_copy_only=False),
            t["w2"].to_numpy(zero_copy_only=False),
            t["c2_sum"].to_numpy(zero_copy_only=False).astype("float64"),
            t["c1a"].to_numpy(zero_copy_only=False).astype("float64"),
            t["c1b"].to_numpy(zero_copy_only=False).astype("float64"),
        )

    part_tables = list(
        j2.map_batches(skip_empty(score_topk), batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not part_tables:
        return empty
    parts = pa.concat_tables(part_tables)
    if len(parts) == 0:
        return empty
    order = pc.sort_indices(parts, sort_keys=[
        ("pmi_millionths", "descending"),
        ("w1", "ascending"), ("w2", "ascending"),
    ])
    return parts.take(order.slice(0, k))


def pmi_top_pairs_sql(k: int = 50, min_count: int = 5,
                      table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), flat AS (
  SELECT unnest(t) AS w FROM toks
), uni AS (
  SELECT w, count(*) AS c1 FROM flat GROUP BY w
), pairs AS (
  SELECT t[gs] AS w1, t[gs + 1] AS w2
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
), stats AS (
  SELECT (SELECT count(*) FROM flat) AS tok,
         (SELECT count(*) FROM pairs) AS np
), big AS (
  SELECT w1, w2, count(*) AS c2 FROM pairs
  GROUP BY w1, w2 HAVING count(*) >= {int(min_count)}
)
SELECT b.w1, b.w2, b.c2 AS n,
  CAST(floor(ln(
    (CAST(b.c2 AS DOUBLE) * CAST(stats.tok AS DOUBLE)
       * CAST(stats.tok AS DOUBLE))
    / (CAST(stats.np AS DOUBLE) * CAST(u1.c1 AS DOUBLE)
       * CAST(u2.c1 AS DOUBLE))) * 1000000.0) AS BIGINT)
    AS pmi_millionths
FROM big b
JOIN uni u1 ON b.w1 = u1.w
JOIN uni u2 ON b.w2 = u2.w
CROSS JOIN stats
ORDER BY pmi_millionths DESC, w1, w2 LIMIT {int(k)}
""".strip()


# ------------------------------------- compression-ratio quality signal

def doc_compression_ratio(ds, id_col: str = "doc_id",
                          text_col: str = "text", level: int = 6):
    """Per-document zlib compression ratio — the redundancy quality
    gate of the Dolma/Gopher filter suites: highly compressible text
    (ratio « 1) is repetitive boilerplate; near-incompressible text
    (ratio ≈ 1+) is often binary junk or high-entropy noise. Both
    tails get cut by a downstream threshold filter.

    The zlib call is per-row C (same precedent as the md5
    ``fingerprint_batch``) inside parallel ``map_batches`` tasks — the
    driver never loops. Output: (id, n_bytes, n_compressed, ratio)
    with ratio = one float64 division (empty docs: ratio over
    max(n_bytes,1) so the row is kept, mirroring the quality_batch
    guard). No SQL engine ships zlib, so this is pytest-pinned
    (byte-exact vs direct zlib) rather than DuckDB-checked."""
    import zlib

    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        nb = np.empty(len(texts), dtype=np.int64)
        nc = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            raw = (s or "").encode("utf-8")
            nb[i] = len(raw)
            nc[i] = len(zlib.compress(raw, level))
        ratio = nc.astype(np.float64) / np.maximum(nb, 1).astype(np.float64)
        return pa.table({
            id_col: t[id_col],
            "n_bytes": pa.array(nb),
            "n_compressed": pa.array(nc),
            "ratio": pa.array(ratio),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def doc_tfidf_joined(ds, id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 64):
    """:func:`doc_tfidf`'s WEB-SCALE path: identical output (same SQL
    oracle), but the vocabulary never touches the driver and is never
    broadcast — at crawl scale the (term → idf) table is itself a
    large dataset (10^8 terms × avg-30-byte strings), so:

    - df merges via ``grouped_agg(final='ray')`` (unbounded term
      cardinality), idf_millionths derives in a pure map over it;
    - ONE ``bucketed_hash_join`` on the term attaches idf to the
      (doc, term, tf) rows — the tf rows and the vocab each shuffle
      once, the corpus text never;
    - per-doc sums merge via ``grouped_agg(final='ray')`` (unbounded
      doc cardinality).

    Use :func:`doc_tfidf` (broadcast idf) when the vocab fits workers
    comfortably — one shuffle fewer; this variant when it doesn't.
    Tests pin row-set equality of both paths."""
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    ds = ds.materialize()  # consumed twice (count + tf pass)
    n_docs = ds.count()
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "tfidf_millionths": pa.array([], type=pa.int64())})
    if n_docs == 0:
        import ray.data as rd

        return rd.from_arrow(empty)

    def tf_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        if not len(flat):
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64())})
        out = pa.table({
            "d": pa.array(np.repeat(ids, lens)),
            "term": pa.array(flat, type=pa.string()),
        }).group_by(["d", "term"]).aggregate([([], "count_all")])
        return out.rename_columns(["d", "term", "tf"])

    # tf rows are distinct (doc, term) per batch AND docs never
    # straddle blocks → per-batch term count IS an exact df partial
    tf_rows = ds.map_batches(skip_empty(tf_partial), batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        out = t.group_by("term").aggregate([([], "count_all")])
        return out.rename_columns(["term", "df"])

    df_ds = grouped_agg(
        tf_rows.map_batches(skip_empty(df_partial), batch_format="pyarrow",
                            zero_copy_batch=True),
        ["term"], [("df", "sum")], final="ray",
    )

    def to_idf(t: pa.Table) -> pa.Table:
        dfv = t["df_sum"].to_numpy(zero_copy_only=False).astype("float64")
        idf_m = np.floor(
            np.log(float(n_docs) / dfv) * 1_000_000
        ).astype("int64")
        return pa.table({"term": t["term"], "idf_m": pa.array(idf_m)})

    idf = df_ds.map_batches(skip_empty(to_idf), batch_format="pyarrow",
                            zero_copy_batch=True)
    joined = bucketed_hash_join(tf_rows, idf, key="term",
                                n_buckets=n_buckets)

    def weigh(t: pa.Table) -> pa.Table:
        return pa.table({
            "d": t["d"],
            "w": pc.multiply(pc.cast(t["tf"], pa.int64()), t["idf_m"]),
        })

    summed = grouped_agg(
        joined.map_batches(skip_empty(weigh), batch_format="pyarrow",
                           zero_copy_batch=True),
        ["d"], [("w", "sum")], final="ray",
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["d"],
                         "tfidf_millionths": pc.cast(t["w_sum"], pa.int64())})

    return summed.map_batches(skip_empty(rename), batch_format="pyarrow",
                              zero_copy_batch=True)


# ----------------------------------------- n-gram diversity by source

def gram_diversity_by_source(ds, group_col: str = "source",
                             text_col: str = "text",
                             n_buckets: int = 64) -> pa.Table:
    """Distinct-bigram ratio per source — the diversity/QA metric for
    mixed or synthetic corpora (mode-collapsed generated text shows a
    LOW distinct-gram ratio long before eyeballing does; the distinct-n
    family of generation metrics).

    Per-batch combiners explode adjacent word pairs with source
    ownership (the :func:`bigram_top` shift-join, doc boundaries
    masked); totals reduce as bounded grouped counts and the distinct
    count runs through :func:`aggregate.grouped_distinct_count`'s
    two-level exact distinct (gram-hash exchange — the gram space is
    unbounded, the per-source result is not). Output: (source,
    n_grams, n_distinct, diversity = one float division)."""
    import numpy as np

    from fluent_server_ray.stages.aggregate import (grouped_counts,
                                                    grouped_distinct_count,
                                                    skip_empty)

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row_of = row_of[keep]
        empty = pa.table({group_col: pa.array([], type=pa.string()),
                          "gram": pa.array([], type=pa.string())})
        if len(flat) < 2:
            return empty
        same = row_of[:-1] == row_of[1:]
        gram = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        src = t[group_col].to_numpy(zero_copy_only=False)
        return pa.table({
            group_col: pa.array(src[row_of[:-1][same]], type=pa.string()),
            "gram": gram.filter(pa.array(same)),
        })

    exploded = ds.map_batches(skip_empty(pairs), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    totals = grouped_counts(exploded, [group_col])
    distinct = grouped_distinct_count(exploded, group_col, "gram",
                                      n_buckets=n_buckets)
    tot = {g: int(n) for g, n in zip(totals[group_col].to_pylist(),
                                     totals["n"].to_pylist())}
    dis = {g: int(n) for g, n in zip(distinct[group_col].to_pylist(),
                                     distinct["n_distinct"].to_pylist())}
    groups = sorted(tot)
    return pa.table({
        group_col: pa.array(groups, type=pa.string()),
        "n_grams": pa.array([tot[g] for g in groups], type=pa.int64()),
        "n_distinct": pa.array([dis.get(g, 0) for g in groups],
                               type=pa.int64()),
        "diversity": pa.array(
            [float(dis.get(g, 0)) / float(tot[g]) for g in groups],
            type=pa.float64()),
    })


def gram_diversity_by_source_sql(group_col: str = "source",
                                 text_col: str = "text",
                                 table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS g,
         list_filter(string_split({text_col}, ' '), x -> x <> '') AS t
  FROM {table} WHERE {text_col} IS NOT NULL
), grams AS (
  SELECT g, t[gs] || ' ' || t[gs + 1] AS gram
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
)
SELECT g AS {group_col},
  CAST(count(*) AS BIGINT) AS n_grams,
  CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
  CAST(count(DISTINCT gram) AS DOUBLE) / CAST(count(*) AS DOUBLE)
    AS diversity
FROM grams GROUP BY g ORDER BY g
""".strip()


def compression_ratio_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`doc_compression_ratio` via PINNED zlib
    constants (VERDICT r3's "pin constants" scheme): no SQL engine
    ships zlib, but zlib level 6 is fully deterministic, so the
    compressed SIZE of every distinct test-corpus text is checked in
    as a golden map keyed by ``md5(utf-8 text)`` (generated by direct
    per-row zlib over the parquet — independent of the engine's Ray
    plumbing; see ``_zlib_golden``). The mirror joins documents to the
    map ON CONTENT, computes ``n_bytes = strlen`` (utf-8 bytes) and
    the one-division float64 ratio in SQL. What this checks: the
    distributed pipeline keeps (id ↔ text) pairing intact, loses and
    duplicates nothing, and matches C zlib byte-for-byte. A corpus
    with texts outside the golden map drops rows → an honest row-count
    failure, never a silent pass. An INNER join (not LEFT) makes that
    failure mode explicit."""
    from fluent_server_ray.stages._zlib_golden import ZLIB_L6_BY_MD5

    rows = ", ".join(f"('{k}', {v})" for k, v in
                     sorted(ZLIB_L6_BY_MD5.items()))
    return f"""
WITH golden(h, n_compressed) AS (VALUES {rows})
SELECT d.doc_id, CAST(strlen(COALESCE(d.text, '')) AS BIGINT) AS n_bytes,
  CAST(g.n_compressed AS BIGINT) AS n_compressed,
  CAST(g.n_compressed AS DOUBLE)
    / GREATEST(strlen(COALESCE(d.text, '')), 1) AS ratio
FROM {table} d JOIN golden g ON g.h = md5(COALESCE(d.text, ''))
ORDER BY d.doc_id
""".strip()


# ------------------------------------------- vocabulary-coverage gate

def oov_rate(ds, vocab_k: int = 1000, id_col: str = "doc_id",
             text_col: str = "text"):
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_k`` vocabulary — the tokenizer-coverage gate of
    training-data curation (docs full of tokens the tokenizer will
    shatter into bytes are expensive and usually junk; cf. Gopher's
    "fraction of tokens in the most common set" rules).

    Two passes over one materialized input: (1) the distributed
    :func:`vocab_top_words` build (combiner → one word-bucket exchange
    → O(buckets·k) driver merge); (2) the ≤ ``vocab_k``-row vocabulary
    broadcasts once (``ray.put``) and each batch counts its tokens'
    membership with one vectorized ``index_in`` + per-doc segment sums
    — the corpus-sized side never shuffles. Token rule = the engine's
    shared single-space split (SQL ``string_split(text, ' ')``).

    Integer-exact: ``oov_rate_millionths = 1e6 · n_oov // n_tokens``.
    Zero-token docs emit no row (mirrors the SQL unnest). Returns a
    Dataset (doc_id, n_tokens, n_oov, oov_rate_millionths).
    """
    import numpy as np
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    ds = ds.materialize()
    vocab = vocab_top_words(ds, k=vocab_k)
    vocab_ref = ray.put(vocab["word"].combine_chunks())

    def score(t: pa.Table) -> pa.Table:
        words = ray.get(vocab_ref)
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False).astype("int64"),
            lens.astype("int64"))
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        ids = ids[keep.to_numpy(zero_copy_only=False)]
        is_oov = pc.cast(
            pc.is_null(pc.index_in(flat, value_set=words)), pa.int64())
        pairs = pa.table({"d": pa.array(ids), "o": is_oov})
        out = pairs.group_by("d").aggregate([("o", "sum"), ("o", "count")])
        n_tok = pc.cast(out["o_count"], pa.int64())
        n_oov = pc.cast(out["o_sum"], pa.int64())
        rate = pc.divide(pc.multiply(n_oov, pa.scalar(1_000_000,
                                                      pa.int64())),
                         n_tok)
        return pa.table({
            id_col: out["d"], "n_tokens": n_tok, "n_oov": n_oov,
            "oov_rate_millionths": rate,
        })

    return ds.map_batches(skip_empty(score), batch_format="pyarrow",
                          zero_copy_batch=True)


def oov_rate_sql(vocab_k: int = 1000, table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM {table}
), v AS (
  SELECT word FROM (
    SELECT word, count(*) AS n FROM toks
    GROUP BY word ORDER BY n DESC, word LIMIT {vocab_k})
), d AS (
  SELECT t.doc_id,
    CAST(count(*) AS BIGINT) AS n_tokens,
    CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_oov
  FROM toks t LEFT JOIN v ON t.word = v.word
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov,
  n_oov * 1000000 // n_tokens AS oov_rate_millionths
FROM d
""".strip()


# --------------------------------- per-source token-distribution drift

def source_token_kl(ds, group_col: str = "lang", id_col: str = "doc_id",
                    text_col: str = "text", n_buckets: int = 64):
    """Per-group KL divergence of the group's token distribution from
    the whole corpus's — the data-mixing diagnostic ("how far does
    this source/language drift from the blend?") behind temperature
    and mixture tuning.

    ``KL(g ‖ corpus) = Σ_w (c_gw/n_g) · ln((c_gw · N)/(n_g · c_w))``
    over an UNBOUNDED word space. Integer-exact contract (the
    :func:`doc_token_entropy` device): both logs floor to int64
    millionths — ``term = c_gw · (L(c_gw·N) − L(n_g·c_w))``,
    ``L(x) = floor(1e6·ln(x))`` — so the per-group sum is order-free
    int64 and the exposed ``kl_nats`` is one float64 division.

    Shape: per-batch (group, word) count combiner; ONE hash-bucket
    exchange on the word co-locates each word's per-group counts
    (``c_w`` folds out of the bucket — never a corpus-wide join);
    per-group totals ``n_g`` and ``N`` are a bounded grouped sum of
    the same partials, broadcast as literals. Each bucket emits one
    row per (group) partial; the driver merge is O(buckets·groups).
    Returns a pyarrow Table (group, n_tokens, kl_millionths, kl_nats)
    sorted by group.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        grp = t[group_col].to_pandas().to_numpy()
        gs = np.repeat(grp, lens.astype("int64"))
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        gs = gs[keep.to_numpy(zero_copy_only=False)]
        c = (pa.table({group_col: pa.array(gs, type=pa.string()),
                       "word": flat})
             .group_by([group_col, "word"])
             .aggregate([([], "count_all")])
             .rename_columns([group_col, "word", "n"]))
        return c.append_column(
            "_bucket", pa.array(hash_bucket_array(c["word"], n_buckets)))

    parts = ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # bounded statistic: per-group token totals — each block collapses
    # to |groups| rows BEFORE the driver sees it (never the word table)
    def group_totals(t: pa.Table) -> pa.Table:
        return (t.select([group_col, "n"]).group_by(group_col)
                .aggregate([("n", "sum")])
                .rename_columns([group_col, "n"]))

    tot_tables = list(
        parts.map_batches(skip_empty(group_totals),
                          batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tot_tables:
        return pa.table({
            group_col: pa.array([], type=pa.string()),
            "n_tokens": pa.array([], type=pa.int64()),
            "kl_millionths": pa.array([], type=pa.int64()),
            "kl_nats": pa.array([], type=pa.float64()),
        })
    g_tbl = (pa.concat_tables(tot_tables).group_by(group_col)
             .aggregate([("n", "sum")]))
    n_g = {g: int(n) for g, n in zip(g_tbl[group_col].to_pylist(),
                                     g_tbl["n_sum"].to_pylist())}
    big_n = float(sum(n_g.values()))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        c = (b.groupby([group_col, "word"], sort=False)["n"].sum()
             .reset_index())
        cw = c.groupby("word", sort=False)["n"].transform("sum")
        cg = c["n"].to_numpy(dtype="float64")
        ng = c[group_col].map(n_g).to_numpy(dtype="float64")
        l1 = np.floor(np.log(cg * big_n) * 1_000_000).astype("int64")
        l2 = np.floor(np.log(ng * cw.to_numpy(dtype="float64"))
                      * 1_000_000).astype("int64")
        term = c["n"].to_numpy(dtype="int64") * (l1 - l2)
        out = pd.DataFrame({group_col: c[group_col], "t": term})
        return out.groupby(group_col, sort=False)["t"].sum().reset_index()

    merged = (parts.groupby("_bucket")
              .map_groups(per_bucket, batch_format="pandas")
              .to_pandas())  # bounded: ≤ n_buckets × |groups| rows
    kl = merged.groupby(group_col, sort=True)["t"].sum().reset_index()
    groups = kl[group_col].tolist()
    ksum = kl["t"].to_numpy(dtype="int64")
    ntok = np.array([n_g[g] for g in groups], dtype="int64")
    nats = ksum.astype("float64") / (ntok.astype("float64") * 1_000_000.0)
    return pa.table({
        group_col: pa.array(groups, type=pa.string()),
        "n_tokens": pa.array(ntok),
        "kl_millionths": pa.array(ksum),
        "kl_nats": pa.array(nats),
    })


def source_token_kl_sql(group_col: str = "lang",
                        table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp,
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM {table}
), cs AS (
  SELECT grp, word, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY grp, word
), g AS (
  SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM cs GROUP BY grp
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS bn FROM cs
), w AS (
  SELECT word, CAST(sum(c) AS BIGINT) AS cw FROM cs GROUP BY word
), term AS (
  SELECT cs.grp, cs.c *
    (CAST(floor(ln(CAST(cs.c AS DOUBLE) * bn) * 1000000) AS BIGINT)
     - CAST(floor(ln(CAST(g.n AS DOUBLE) * w.cw) * 1000000) AS BIGINT))
    AS t
  FROM cs JOIN g USING (grp) JOIN w USING (word) CROSS JOIN tot
)
SELECT term.grp AS {group_col},
  any_value(g.n) AS n_tokens,
  CAST(sum(t) AS BIGINT) AS kl_millionths,
  CAST(CAST(sum(t) AS BIGINT) AS DOUBLE)
    / (CAST(any_value(g.n) AS DOUBLE) * 1000000.0) AS kl_nats
FROM term JOIN g USING (grp)
GROUP BY term.grp
ORDER BY term.grp
""".strip()


def doc_keywords(ds, k: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Per-document top-``k`` TF-IDF keywords — the distinctive-term
    extraction step behind tagging/faceting a curated corpus. Same
    integer-exact contract as :func:`doc_tfidf` (``w = tf ·
    floor(ln(N/df)·1e6)``), with a fully deterministic rank:
    row_number over (w DESC, term ASC) per doc.

    Shape: the df pass and broadcast idf are :func:`doc_tfidf`'s; the
    top-k itself is a pure per-batch combiner (a doc's rows live in
    the batch that carries the doc — no exchange at all). Returns a
    Dataset (doc_id, term, rank, w_millionths) sorted by
    (doc_id, rank); zero-token docs yield no rows (SQL inner join).
    """
    import numpy as np
    import pandas as pd
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    ds = ds.materialize()
    n_docs = ds.count()

    def flat_tokens(t: pa.Table):
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        return np.repeat(ids, lens), flat

    def df_partial(t: pa.Table) -> pa.Table:
        doc_of, flat = flat_tokens(t)
        pairs = pa.table({"term": pa.array(flat, type=pa.string()),
                          "d": pa.array(doc_of)})
        uniq = pairs.group_by(["term", "d"]).aggregate([])
        out = uniq.group_by("term").aggregate([([], "count_all")])
        return out.rename_columns(["term", "df"])

    tabs = list(
        ds.map_batches(skip_empty(df_partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    import ray.data as rd
    if not tabs:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int64()),
            "w_millionths": pa.array([], type=pa.int64()),
        }))
    df_tbl = (pa.concat_tables(tabs).group_by("term")
              .aggregate([("df", "sum")]))
    terms = df_tbl["term"].combine_chunks()
    dfv = df_tbl["df_sum"].to_numpy(zero_copy_only=False).astype("float64")
    idf_m = np.floor(np.log(float(n_docs) / dfv) * 1_000_000
                     ).astype("int64")
    idf_ref = ray.put((terms, pa.array(idf_m)))

    def topk(t: pa.Table) -> pa.Table:
        vocab, idf = ray.get(idf_ref)
        doc_of, flat = flat_tokens(t)
        pairs = pa.table({"d": pa.array(doc_of),
                          "term": pa.array(flat, type=pa.string())})
        tf = (pairs.group_by(["d", "term"]).aggregate([([], "count_all")])
              .rename_columns(["d", "term", "tf"]))
        idx = pc.index_in(tf["term"], value_set=vocab)
        w = pc.multiply(pc.cast(tf["tf"], pa.int64()), pc.take(idf, idx))
        df_ = pd.DataFrame({"d": tf["d"].to_numpy(zero_copy_only=False),
                            "term": tf["term"].to_pandas(),
                            "w": w.to_numpy(zero_copy_only=False)})
        df_ = df_.sort_values(["d", "w", "term"],
                              ascending=[True, False, True],
                              kind="mergesort").reset_index(drop=True)
        rank = df_.groupby("d", sort=False).cumcount() + 1
        df_ = df_.assign(rank=rank.astype("int64"))
        df_ = df_[df_["rank"] <= k]
        return pa.table({
            id_col: pa.array(df_["d"].to_numpy(dtype="int64")),
            "term": pa.array(df_["term"], type=pa.string()),
            "rank": pa.array(df_["rank"].to_numpy(dtype="int64")),
            "w_millionths": pa.array(df_["w"].to_numpy(dtype="int64")),
        })

    return (ds.map_batches(skip_empty(topk), batch_format="pyarrow",
                           zero_copy_batch=True)
            .sort([id_col, "rank"]))


def doc_keywords_sql(k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text",
                     table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT {id_col},
    unnest(list_filter(regexp_split_to_array({text_col},
                                             '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM {table}
), tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY {id_col}, term
), dfc AS (
  SELECT term, count(DISTINCT {id_col}) AS df FROM toks GROUP BY term
), nn AS (
  SELECT count(*) AS n FROM {table}
), w AS (
  SELECT tf.{id_col}, tf.term,
    CAST(tf.tf * CAST(floor(ln(CAST(nn.n AS DOUBLE) / dfc.df) * 1000000)
                      AS BIGINT) AS BIGINT) AS w
  FROM tf JOIN dfc USING (term) CROSS JOIN nn
)
SELECT {id_col}, term, rank, w AS w_millionths FROM (
  SELECT {id_col}, term, w,
    row_number() OVER (PARTITION BY {id_col}
                       ORDER BY w DESC, term ASC) AS rank
  FROM w
) WHERE rank <= {k}
ORDER BY {id_col}, rank
""".strip()


def source_vocab_overlap(ds, k: int = 100, group_col: str = "source",
                         text_col: str = "text",
                         n_buckets: int = 64) -> pa.Table:
    """Cross-source vocabulary overlap: for every pair of sources, how
    many of each other's top-``k`` words they share — the
    mixture-design diagnostic ("are these two feeds the same register,
    or genuinely complementary?").

    Per-source top-k is exact over the UNBOUNDED word space via the
    :func:`vocab_top_words` argument: per-batch (source, word) count
    combiner → ONE hash-bucket exchange on the word → per-bucket
    per-source sum + per-source top-k (buckets partition words
    disjointly, so the global per-source top-k is the top-k of the
    ≤ buckets×sources×k bucket winners — an O(buckets·sources·k)
    driver merge). The pairwise intersection then runs on the driver
    over |sources|·k rows. Single-space split + drop-empties, the
    shared SQL tokenizer. Output: pa.Table (source_a, source_b,
    n_shared) with source_a < source_b, sorted.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        src = pc.fill_null(pc.cast(t[group_col], pa.string()), "")
        toks = pc.split_pattern(t[text_col], " ")
        lens = pc.fill_null(pc.cast(pc.list_value_length(toks),
                                    pa.int64()), 0)
        flat = pc.list_flatten(toks)
        src_of = pc.take(
            src, pa.array(np.repeat(np.arange(len(t)),
                                    lens.to_numpy(zero_copy_only=False))))
        tbl = pa.table({"src": src_of, "word": flat})
        tbl = tbl.filter(pc.not_equal(tbl["word"], ""))
        out = (tbl.group_by(["src", "word"]).aggregate([([], "count_all")])
               .rename_columns(["src", "word", "n"]))
        return out.append_column(
            "_b", pa.array(hash_bucket_array(out["word"], n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["src", "word"], sort=False)["n"].sum()
               .reset_index())
        agg = agg.sort_values(["src", "n", "word"],
                              ascending=[True, False, True],
                              kind="mergesort")
        top = agg.groupby("src", sort=False).head(k)
        return top[["src", "word", "n"]]

    parts = (
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )
    tables = list(parts.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
    empty = pa.table({
        "source_a": pa.array([], type=pa.string()),
        "source_b": pa.array([], type=pa.string()),
        "n_shared": pa.array([], type=pa.int64()),
    })
    if not tables:
        return empty
    cand = pa.concat_tables(tables).to_pandas()
    if cand.empty:
        return empty
    # global per-source top-k over the bucket winners; deterministic
    # (n desc, word asc) — the SQL row_number tie-break
    cand = cand.sort_values(["src", "n", "word"],
                            ascending=[True, False, True],
                            kind="mergesort")
    top = cand.groupby("src", sort=False).head(k)
    sets = {s: set(w) for s, w in top.groupby("src")["word"]}
    rows = []
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(sets[a] & sets[b])
            if shared:
                rows.append((a, b, shared))
    if not rows:
        return empty
    return pa.table({
        "source_a": pa.array([r[0] for r in rows], type=pa.string()),
        "source_b": pa.array([r[1] for r in rows], type=pa.string()),
        "n_shared": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def source_vocab_overlap_sql(k: int = 100, group_col: str = "source",
                             text_col: str = "text",
                             table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT COALESCE(CAST({group_col} AS VARCHAR), '') AS src,
    unnest(list_filter(string_split({text_col}, ' '), x -> x <> ''))
      AS word
  FROM {table}
), cnt AS (
  SELECT src, word, count(*) AS n FROM toks GROUP BY src, word
), rk AS (
  SELECT src, word,
    row_number() OVER (PARTITION BY src ORDER BY n DESC, word) AS r
  FROM cnt
), top AS (
  SELECT src, word FROM rk WHERE r <= {k}
)
SELECT a.src AS source_a, b.src AS source_b, count(*) AS n_shared
FROM top a JOIN top b ON a.word = b.word AND a.src < b.src
GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def source_length_gini(ds, group_col: str = "source",
                       text_col: str = "text", id_col: str = "doc_id",
                       n_buckets: int = 64) -> pa.Table:
    """Per-source GINI COEFFICIENT of document token counts — the
    corpus-balance diagnostic ("is this source a few giant docs or
    many uniform ones?") that mean/median length miss. Gini via the
    rank formula ``G = (2·Σ i·x_(i) ) / (n·Σx) − (n+1)/n`` with x
    ascending and ties broken by id.

    Both Σx and the rank-weighted Σ i·x_(i) are int64-exact: one
    bucket exchange keyed on the group co-locates each source, the
    within-source ranks come from one vectorized cumcount, and the two
    integer partials feed ONE float tree per source — so the doubles
    mirror SQL bit-for-bit. (A source with a single doc has G = 0 by
    the formula.) Returns (source, n_docs, total_tokens,
    gini) sorted by source.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import skip_empty
    from fluent_server_ray.stages.assembly import _with_bucket

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            group_col: pc.cast(t[group_col], pa.string()),
            id_col: pc.cast(t[id_col], pa.int64()),
            "n": pc.cast(pc.count_substring_regex(t[text_col], TOKEN_RE),
                         pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "n", id_col],
                          kind="mergesort").reset_index(drop=True)
        rank = g.groupby(group_col, sort=False).cumcount().to_numpy() + 1
        n = g["n"].to_numpy(dtype="int64")
        agg = (g.assign(_rw=rank * n)
               .groupby(group_col, as_index=False)
               .agg(n_docs=(id_col, "size"), total_tokens=("n", "sum"),
                    rw=("_rw", "sum")))
        return agg

    pre = ds.map_batches(skip_empty(prep), batch_format="pyarrow",
                         zero_copy_batch=True)
    bucketed = _with_bucket(pre, group_col, n_buckets)
    parts = (bucketed.groupby("_bucket")
             .map_groups(per_bucket, batch_format="pandas").to_pandas())
    # INVARIANT: a source hashes to exactly one bucket and Ray's
    # groupby delivers a bucket to one map_groups call, so parts has
    # one complete row per source (ranks are source-global); this
    # groupby only collapses the frame, it must never sum real splits
    agg = parts.groupby(group_col, as_index=False).sum()
    nd = agg["n_docs"].to_numpy(dtype="int64")
    tot = agg["total_tokens"].to_numpy(dtype="int64")
    rw = agg["rw"].to_numpy(dtype="int64")
    gini = ((2.0 * rw.astype(np.float64))
            / (nd.astype(np.float64) * tot.astype(np.float64))
            - (nd + 1).astype(np.float64) / nd.astype(np.float64))
    order = np.argsort(agg[group_col].to_numpy())
    return pa.table({
        group_col: pa.array(agg[group_col].to_numpy(dtype=object)[order],
                            pa.string()),
        "n_docs": pa.array(nd[order]),
        "total_tokens": pa.array(tot[order]),
        "gini": pa.array(gini[order], pa.float64()),
    })


def source_length_gini_sql(group_col: str = "source",
                           table: str = "documents") -> str:
    return f"""
WITH tok AS (
  SELECT {group_col}, doc_id,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n
  FROM {table}
), r AS (
  SELECT {group_col}, n,
    row_number() OVER (PARTITION BY {group_col} ORDER BY n, doc_id)
      AS rank
  FROM tok
), agg AS (
  SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n) AS BIGINT) AS total_tokens,
    CAST(sum(rank * n) AS BIGINT) AS rw
  FROM r GROUP BY {group_col}
)
SELECT {group_col}, n_docs, total_tokens,
  (2.0 * CAST(rw AS DOUBLE))
    / (CAST(n_docs AS DOUBLE) * CAST(total_tokens AS DOUBLE))
  - CAST(n_docs + 1 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS gini
FROM agg ORDER BY {group_col}
""".strip()


def source_distinctive_bigrams(ds, k: int = 10, min_count: int = 3,
                               group_col: str = "source",
                               n_buckets: int = 64) -> pa.Table:
    """Per-source DISTINCTIVE bigrams: top-``k`` adjacent word pairs
    by LIFT ``(n_sb/n_s)/(n_b/N)`` — "what does this feed say that the
    rest of the corpus doesn't" (plain per-source top-k just returns
    the corpus-wide head; the denominator contrast is the point).

    Exactness: lift rides as ``1e6·n_sb·N // (n_s·n_b)`` computed in
    PYTHON ints (arbitrary precision — the HUGEINT mirror; an int64
    product n_sb·N wraps at web scale, so no numpy fast path is
    offered). All counts are exact combiner partials. One pair-hash
    bucket exchange co-locates every source's counts for a pair WITH
    its corpus total; per-source totals are the bounded small side
    (one extra combiner pass, broadcast by closure capture).

    Returns (source, pair, n_sb, lift_millionths): top-k per source by
    (lift DESC, pair ASC), rows with ``n_sb < min_count`` gated out,
    sorted by (source, lift DESC, pair).
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(
            np.int64)
        src = t[group_col].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "pair": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "_bucket": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        pair = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        same = doc_of[:-1] == doc_of[1:]
        pair = pair.filter(pa.array(same))
        psrc = src[doc_of[:-1][same]]
        c = (pa.table({group_col: pa.array(psrc, pa.string()),
                       "pair": pair})
             .group_by([group_col, "pair"])
             .aggregate([([], "count_all")])
             .rename_columns([group_col, "pair", "n"]))
        return c.append_column(
            "_bucket", pa.array(hash_bucket_array(c["pair"], n_buckets)))

    counts = ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    # bounded small side: per-source bigram totals + corpus total
    tot = (pa.concat_tables(
        counts.select_columns([group_col, "n"])
        .iter_batches(batch_size=None, batch_format="pyarrow"))
        .group_by(group_col).aggregate([("n", "sum")]))
    n_s = {s: int(v) for s, v in zip(tot[group_col].to_pylist(),
                                     tot["n_sum"].to_pylist())}
    n_total = sum(n_s.values())

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby([group_col, "pair"], sort=False)["n"].sum()
        agg = agg.reset_index()
        nb = agg.groupby("pair", sort=False)["n"].transform("sum")
        agg = agg[agg["n"] >= min_count].assign(
            _nb=nb[agg.index])
        if agg.empty:
            return pd.DataFrame({group_col: pd.Series(dtype=object),
                                 "pair": pd.Series(dtype=object),
                                 "n_sb": pd.Series(dtype="int64"),
                                 "lift_millionths": pd.Series(
                                     dtype="int64")})
        lift = [1_000_000 * int(nsb) * n_total
                // (n_s[s] * int(nbv))
                for s, nsb, nbv in zip(agg[group_col], agg["n"],
                                       agg["_nb"])]
        out = pd.DataFrame({group_col: agg[group_col].to_numpy(),
                            "pair": agg["pair"].to_numpy(),
                            "n_sb": agg["n"].to_numpy(dtype="int64"),
                            "lift_millionths": np.asarray(lift,
                                                          dtype="int64")})
        out = out.sort_values(["lift_millionths", "pair"],
                              ascending=[False, True])
        return out.groupby(group_col, sort=False).head(k)

    parts = (counts.groupby("_bucket")
             .map_groups(per_bucket, batch_format="pandas")
             .to_pandas())  # bounded: ≤ buckets × sources × k
    if parts.empty:
        return pa.table({group_col: pa.array([], pa.string()),
                         "pair": pa.array([], pa.string()),
                         "n_sb": pa.array([], pa.int64()),
                         "lift_millionths": pa.array([], pa.int64())})
    parts = parts.sort_values(["lift_millionths", "pair"],
                              ascending=[False, True])
    parts = parts.groupby(group_col, sort=False).head(k)
    parts = parts.sort_values(
        [group_col, "lift_millionths", "pair"],
        ascending=[True, False, True]).reset_index(drop=True)
    return pa.table({
        group_col: pa.array(parts[group_col].to_numpy(dtype=object),
                            pa.string()),
        "pair": pa.array(parts["pair"].to_numpy(dtype=object),
                         pa.string()),
        "n_sb": pa.array(parts["n_sb"].to_numpy()),
        "lift_millionths": pa.array(parts["lift_millionths"].to_numpy()),
    })


def source_distinctive_bigrams_sql(k: int = 10, min_count: int = 3,
                                   group_col: str = "source",
                                   table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {group_col},
    list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM {table}
), pairs AS (
  SELECT {group_col},
    unnest(list_transform(range(1, len(w)),
           i -> w[i] || ' ' || w[i + 1])) AS pair
  FROM toks WHERE len(w) >= 2
), sb AS (
  SELECT {group_col}, pair, count(*) AS n_sb
  FROM pairs GROUP BY 1, 2
), b AS (
  SELECT pair, sum(n_sb) AS n_b FROM sb GROUP BY pair
), s AS (
  SELECT {group_col}, sum(n_sb) AS n_s FROM sb GROUP BY {group_col}
), n AS (SELECT sum(n_sb) AS n_total FROM sb),
lift AS (
  SELECT sb.{group_col}, sb.pair, sb.n_sb,
    CAST(CAST(1000000 AS HUGEINT) * sb.n_sb * n.n_total
         // (s.n_s * b.n_b) AS BIGINT) AS lift_millionths
  FROM sb JOIN b USING (pair) JOIN s USING ({group_col}) CROSS JOIN n
  WHERE sb.n_sb >= {min_count}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {group_col}
    ORDER BY lift_millionths DESC, pair) AS rn
  FROM lift
)
SELECT {group_col}, pair, CAST(n_sb AS BIGINT) AS n_sb,
  lift_millionths
FROM ranked WHERE rn <= {k}
ORDER BY {group_col}, lift_millionths DESC, pair
""".strip()


def type_token_ratio(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc TYPE-TOKEN RATIO signals: distinct-token count vs total
    tokens — the lexical-diversity gate (synthetic/SEO spam repeats a
    tiny vocabulary; healthy prose doesn't). Integers only
    (downstream thresholds divide); tokens = whitespace split ≡ the
    shared mirror class. Pure per-batch map: one flat tokenize + one
    Arrow group_by over (doc, term) per batch, no shuffle.

    Returns a Dataset (doc_id, n_tokens, n_types).
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import skip_empty

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        pairs = pa.table({"d": pa.array(np.repeat(ids, lens)),
                          "term": pa.array(flat, type=pa.string())})
        uniq = pairs.group_by(["d", "term"]).aggregate([])
        cnt = (pa.table({"d": uniq["d"]}).group_by("d")
               .aggregate([([], "count_all")])
               .rename_columns(["d", "c"]))
        types = np.zeros(len(ids), dtype=np.int64)
        cd = cnt["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = cnt["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        pos = order[np.searchsorted(ids[order], cd)]
        types[pos] = cc
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(lens),
            "n_types": pa.array(types),
        })

    return ds.map_batches(skip_empty(fn), batch_format="pyarrow",
                          zero_copy_batch=True)


def type_token_ratio_sql(table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                x -> x <> '') AS w
  FROM {table}
)
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(w)) AS BIGINT) AS n_types
FROM toks ORDER BY doc_id
""".strip()


def vocab_coverage(ds, k: int = 100, id_col: str = "doc_id",
                   text_col: str = "text", n_buckets: int = 64):
    """Per-document coverage of the global top-``k`` vocabulary — the
    tokenizer-fit / domain-shift diagnostic: a doc whose tokens mostly
    fall OUTSIDE the corpus's core vocabulary is foreign-domain, noisy
    or a different language, and will tokenize badly. Composes
    :func:`vocab_top_words` (combiner + word-bucket exchange,
    O(buckets·k) driver merge) with ONE per-batch pass over the docs:
    the k-word vocabulary rides into each task as a tiny value set and
    the per-doc in-vocab counts are segmented cumsum diffs over the
    flat token array — no Python row loop, no second shuffle.

    coverage_ppm = (10^6 · n_in_vocab) // n_tokens (the house
    integer-millionths contract; order-free, strict-mirrorable).
    Empty/NULL docs → n_tokens 0, coverage NULL.
    Output: (id, n_tokens, n_in_vocab, coverage_ppm) in input order.
    """
    import numpy as np

    ds = ds.select_columns([id_col, text_col]).materialize()
    vocab = vocab_top_words(ds, k=k, n_buckets=n_buckets)
    vocab_words = vocab["word"].combine_chunks()

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        lists = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        inv = pc.is_in(flat, value_set=vocab_words).to_numpy(
            zero_copy_only=False)
        cs_ne = np.concatenate(([0], np.cumsum(ne)))
        cs_in = np.concatenate(([0], np.cumsum(inv & ne)))
        n_tok = (cs_ne[ends] - cs_ne[starts]).astype(np.int64)
        n_in = (cs_in[ends] - cs_in[starts]).astype(np.int64)
        ppm = (1_000_000 * n_in) // np.maximum(n_tok, 1)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok),
            "n_in_vocab": pa.array(n_in),
            "coverage_ppm": pa.array(ppm, pa.int64(),
                                     mask=(n_tok == 0)),
        })

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def vocab_coverage_sql(k: int = 100, id_col: str = "doc_id",
                       table: str = "documents") -> str:
    return f"""
WITH v AS MATERIALIZED (
  {vocab_top_words_sql(k=k, table=table)}
), toks AS (
  SELECT {id_col},
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM {table}
), agg AS (
  SELECT {id_col}, count(*) AS n_tokens,
    count(*) FILTER (WHERE word IN (SELECT word FROM v)) AS n_in
  FROM toks GROUP BY {id_col}
)
SELECT d.{id_col},
  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(a.n_in, 0) AS BIGINT) AS n_in_vocab,
  CAST(CASE WHEN COALESCE(a.n_tokens, 0) > 0
       THEN (1000000 * a.n_in) // a.n_tokens END AS BIGINT)
    AS coverage_ppm
FROM {table} d LEFT JOIN agg a USING ({id_col})
ORDER BY d.{id_col}
""".strip()


def readability_batch(batch: pa.Table) -> pa.Table:
    """Coleman-Liau readability per document — the grade-level proxy
    quality gate that needs no syllable dictionary (Coleman & Liau
    1975: ``CLI = 0.0588*L - 0.296*S - 15.8`` with L = letters per
    100 words, S = sentence terminators per 100 words) — the
    readability member of the quality-score family
    (:func:`quality_batch` measures composition ratios; this scores
    reading grade).

    Exactness contract: letters / words / terminators are integer
    regex counts (letters ``[A-Za-z]``, terminators ``[.!?]``, words =
    the house non-space tokenizer), and ``cli`` is ONE declared
    float64 expression over those ints — identical operation order in
    the mirror, so the double matches bit-for-bit (the zscore
    contract). ``words = 0`` (or NULL text) gives NULL cli.
    """
    import numpy as np

    text = batch["text"]
    letters = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"),
                      pa.int64())
    sents = pc.cast(pc.count_substring_regex(text, "[.!?]"),
                    pa.int64())
    words = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                    pa.int64())
    ln = letters.to_numpy(zero_copy_only=False).astype(np.float64)
    sn = sents.to_numpy(zero_copy_only=False).astype(np.float64)
    wn = words.to_numpy(zero_copy_only=False).astype(np.float64)
    null_mask = pc.is_null(words).to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        cli = (0.0588 * (ln * 100.0 / wn)
               - 0.296 * (sn * 100.0 / wn) - 15.8)
    wz = np.where(null_mask, 1.0, wn) == 0.0
    cli_arr = pa.array(np.where(np.isfinite(cli), cli, 0.0),
                       pa.float64())
    cli_arr = pc.if_else(pa.array(null_mask | wz), None, cli_arr)
    return pa.table({
        "doc_id": batch["doc_id"],
        "letters": letters,
        "words": words,
        "sentences": sents,
        "cli": cli_arr,
    })


def readability_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
    AS letters,
  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
  CAST(length(regexp_replace(text, '[^.!?]', '', 'g')) AS BIGINT)
    AS sentences,
  CASE WHEN len(regexp_extract_all(text, '[^ ]+')) = 0 THEN NULL
    ELSE 0.0588 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '',
                                              'g')) AS DOUBLE)
                   * 100.0
                   / len(regexp_extract_all(text, '[^ ]+')))
         - 0.296 * (CAST(length(regexp_replace(text, '[^.!?]', '',
                                               'g')) AS DOUBLE)
                    * 100.0
                    / len(regexp_extract_all(text, '[^ ]+')))
         - 15.8
  END AS cli
FROM {table} ORDER BY doc_id
""".strip()


def vocab_growth(ds, boundaries, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """Type-token (Heaps-law) vocabulary growth curve: at each
    ``doc_id`` boundary, the cumulative token count and the cumulative
    DISTINCT vocabulary over all docs with id <= boundary — the
    corpus-scaling diagnostic that sizes tokenizers and predicts how
    much new text buys new vocabulary (Heaps 1978: V ~ k*n^beta).

    One tokenize pass: per batch, per-word MIN doc_id partials (a
    word's first occurrence decides which boundary first counts it)
    with per-boundary token/doc counts riding the SAME pass as
    sentinel rows — the sentinel key carries a LEADING SPACE, which no
    word can contain (the tokenizer splits on spaces), so sentinels
    and words can never collide. The unbounded word space merges
    distributedly (``grouped_agg(final='ray')``: min for first
    occurrence, sum for the sentinel counters), then collapses to a
    |boundaries|-bounded first-occurrence histogram before reaching
    the driver — the vocabulary itself never materializes anywhere.

    Docs with id beyond the last boundary contribute nothing (the
    curve is only defined at its checkpoints). Output:
    (boundary, n_docs, n_tokens_cum, vocab_cum) sorted by boundary.
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    bnd = sorted(int(b) for b in boundaries)
    if not bnd:
        raise ValueError("vocab_growth: need at least one boundary")
    barr = np.asarray(bnd, dtype=np.int64)
    last = bnd[-1]

    def partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[text_col]),
                             pc.less_equal(t[id_col], last)))
        toks = pc.split_pattern(pc.cast(t[text_col], pa.string()), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(ids, lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        wt = (pa.table({"word": flat.filter(pa.array(keep)),
                        "first_id": pa.array(doc_of[keep])})
              .group_by("word").aggregate([("first_id", "min")])
              .rename_columns(["word", "first_id"]))
        zeros = pa.array(np.zeros(wt.num_rows, np.int64))
        wt = wt.append_column("toks", zeros).append_column("docs", zeros)
        bidx = np.searchsorted(barr, ids, side="left")
        tok_sums = np.zeros(len(barr), dtype=np.int64)
        np.add.at(tok_sums, np.repeat(bidx, lens)[keep],
                  np.ones(int(keep.sum()), np.int64))
        doc_counts = np.bincount(bidx, minlength=len(barr)
                                 ).astype(np.int64)
        sent = pa.table({
            "word": pa.array([f" {b}" for b in bnd], pa.string()),
            "first_id": pa.array(barr),
            "toks": pa.array(tok_sums),
            "docs": pa.array(doc_counts),
        })
        return pa.concat_tables([wt, sent])

    merged = grouped_agg(
        ds.select_columns([id_col, text_col]).map_batches(
            skip_empty(partials), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=["word"], aggs=[("first_id", "min"), ("toks", "sum"),
                             ("docs", "sum")], final="ray")

    def collapse(t: pa.Table) -> pa.Table:
        is_sent = pc.starts_with(t["word"], " ").to_numpy(
            zero_copy_only=False)
        first = t["first_id_min"].to_numpy(zero_copy_only=False)
        toks = t["toks_sum"].to_numpy(zero_copy_only=False)
        docs = t["docs_sum"].to_numpy(zero_copy_only=False)
        vocab = np.zeros(len(barr), dtype=np.int64)
        widx = np.searchsorted(barr, first[~is_sent], side="left")
        np.add.at(vocab, widx, np.ones(len(widx), np.int64))
        tsum = np.zeros(len(barr), dtype=np.int64)
        dsum = np.zeros(len(barr), dtype=np.int64)
        sidx = np.searchsorted(barr, first[is_sent], side="left")
        np.add.at(tsum, sidx, toks[is_sent])
        np.add.at(dsum, sidx, docs[is_sent])
        return pa.table({
            "bucket": pa.array(np.arange(len(barr), dtype=np.int64)),
            "vocab": pa.array(vocab),
            "toks": pa.array(tsum),
            "docs": pa.array(dsum),
        })

    # bounded: |boundaries| rows per block after collapse
    tiny_tables = list(
        merged.map_batches(skip_empty(collapse), batch_format="pyarrow",
                           zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tiny_tables:
        # empty corpus: the curve is all zeros (mirror agrees)
        zeros = pa.array(np.zeros(len(barr), np.int64))
        return pa.table({"boundary": pa.array(barr), "n_docs": zeros,
                         "n_tokens_cum": zeros, "vocab_cum": zeros})
    tiny = pa.concat_tables(tiny_tables)
    agg = (tiny.group_by("bucket").aggregate(
        [("vocab", "sum"), ("toks", "sum"), ("docs", "sum")])
        .rename_columns(["bucket", "vocab", "toks", "docs"])
        .sort_by("bucket").to_pandas())
    full = agg.set_index("bucket").reindex(
        range(len(barr)), fill_value=0)
    return pa.table({
        "boundary": pa.array(barr),
        "n_docs": pa.array(np.cumsum(full["docs"].to_numpy())
                           .astype(np.int64)),
        "n_tokens_cum": pa.array(np.cumsum(full["toks"].to_numpy())
                                 .astype(np.int64)),
        "vocab_cum": pa.array(np.cumsum(full["vocab"].to_numpy())
                              .astype(np.int64)),
    })


def vocab_growth_sql(boundaries, id_col: str = "doc_id",
                     text_col: str = "text",
                     table: str = "documents") -> str:
    bvals = ", ".join(f"({int(b)})" for b in sorted(boundaries))
    return f"""
WITH b(boundary) AS (VALUES {bvals}),
toks AS (
  SELECT {id_col} AS id, u.w AS word
  FROM {table}
  CROSS JOIN unnest(list_filter(string_split({text_col}, ' '),
                                x -> x <> '')) AS u(w)
  WHERE {text_col} IS NOT NULL
    AND {id_col} <= (SELECT max(boundary) FROM b)
), firsts AS (
  SELECT word, min(id) AS first_id FROM toks GROUP BY word
)
SELECT CAST(b.boundary AS BIGINT) AS boundary,
  CAST((SELECT count(*) FROM {table} d
        WHERE d.{text_col} IS NOT NULL AND d.{id_col} <= b.boundary)
       AS BIGINT) AS n_docs,
  CAST((SELECT count(*) FROM toks WHERE toks.id <= b.boundary)
       AS BIGINT) AS n_tokens_cum,
  CAST((SELECT count(*) FROM firsts
        WHERE firsts.first_id <= b.boundary) AS BIGINT) AS vocab_cum
FROM b ORDER BY boundary
""".strip()


# --------------------------------------- phrase / proximity search

def phrase_match(ds, w1: str, w2: str, window: int = 1,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Phrase / proximity search over whitespace tokens: per document,
    the number of (w1, w2) occurrence pairs with w2 at token distance
    1..``window`` AFTER w1 (``window=1`` = the exact phrase "w1 w2";
    larger = NEAR/k proximity). Docs with zero occurrences are
    omitted. Tokens are the non-empty single-space splits — the same
    contract as :func:`word_postings` and the ``list_filter`` SQL
    mirror, so positions count non-empty tokens only.

    Map-only (each doc's text lives in its row, so adjacency never
    crosses blocks): per batch, one flatten to (doc, pos) arrays, the
    two term masks, and a searchsorted range-count per w1 occurrence —
    no exchange at any corpus size. The postings-intersection shape of
    classic IR engines exists to serve ad-hoc queries from a
    PRE-BUILT index (cf. :func:`word_postings`); for a scan-time
    query over row-complete documents the map-only form is strictly
    cheaper. Returns a Dataset (doc_id, n_occurrences).
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import skip_empty

    def per_batch(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.asarray(lens, dtype=np.int64)
        doc_row = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_row = doc_row[keep]
        # positions among NON-EMPTY tokens, 1-based per doc
        ne_lens = np.bincount(doc_row, minlength=len(t)).astype(np.int64)
        starts = np.cumsum(ne_lens) - ne_lens
        pos = (np.arange(len(doc_row), dtype=np.int64)
               - np.repeat(starts, ne_lens) + 1)
        words = flat.filter(pa.array(keep))
        m1 = pc.equal(words, w1).to_numpy(zero_copy_only=False)
        m2 = pc.equal(words, w2).to_numpy(zero_copy_only=False)
        if not (m1.any() and m2.any()):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_occurrences": pa.array([], pa.int64())})
        # range-count: per w1 occurrence, w2 positions in (p, p+window]
        big = np.int64(1) << np.int64(32)
        k1 = doc_row[m1] * big + pos[m1]
        k2 = np.sort(doc_row[m2] * big + pos[m2])
        cnt = (np.searchsorted(k2, k1 + window, side="right")
               - np.searchsorted(k2, k1, side="right"))
        per_doc = np.zeros(len(t), dtype=np.int64)
        np.add.at(per_doc, doc_row[m1], cnt)
        hit = per_doc > 0
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[hit], pa.int64()),
            "n_occurrences": pa.array(per_doc[hit], pa.int64()),
        })

    return ds.map_batches(skip_empty(per_batch), batch_format="pyarrow",
                          zero_copy_batch=True)


def phrase_match_sql(w1: str, w2: str, window: int = 1,
                     id_col: str = "doc_id", text_col: str = "text",
                     table: str = "documents") -> str:
    """Mirror: unnest non-empty tokens with ordinality, self-join on
    position distance 1..window."""
    return f"""
WITH tok AS (
  SELECT {id_col},
    unnest(list_filter(str_split({text_col}, ' '), x -> x <> ''))
      AS w,
    generate_subscripts(
      list_filter(str_split({text_col}, ' '), x -> x <> ''), 1) AS p
  FROM {table}
)
SELECT t1.{id_col}, count(*) AS n_occurrences
FROM tok t1 JOIN tok t2 ON t2.{id_col} = t1.{id_col}
  AND t2.p - t1.p BETWEEN 1 AND {window}
WHERE t1.w = '{w1}' AND t2.w = '{w2}'
GROUP BY t1.{id_col}
""".strip()


def boolean_search(ds, must: list[str], must_not: list[str] = (),
                   id_col: str = "doc_id", text_col: str = "text"):
    """Boolean term search (AND / AND-NOT) over whitespace tokens:
    documents containing EVERY ``must`` term and NONE of the
    ``must_not`` terms, with the total occurrence count of the must
    terms — the classic inverted-index conjunction, served scan-time
    (cf. :func:`phrase_match`'s note: for row-complete documents the
    map-only form beats postings intersection; :func:`word_postings`
    is the pre-built-index path). Same token contract as the rest of
    the family: non-empty single-space splits.

    Map-only, no exchange at any scale: per batch one token flatten,
    then a per-query-term (bounded, not per-row) vectorized count per
    doc. Returns a Dataset (doc_id, n_hits) of matching docs.
    """
    import numpy as np

    must = list(must)
    must_not = list(must_not)
    if not must:
        raise ValueError("boolean_search: need at least one must term")

    def per_batch(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_row = np.repeat(np.arange(len(t), dtype=np.int64),
                            np.asarray(lens, dtype=np.int64))
        counts = []
        for w in must + must_not:
            m = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            c = np.zeros(len(t), dtype=np.int64)
            np.add.at(c, doc_row[m], 1)
            counts.append(c)
        hit = counts[0] > 0
        for c in counts[1:len(must)]:
            hit &= c > 0
        for c in counts[len(must):]:
            hit &= c == 0
        n_hits = np.zeros(len(t), dtype=np.int64)
        for c in counts[:len(must)]:
            n_hits += c
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[hit], pa.int64()),
            "n_hits": pa.array(n_hits[hit], pa.int64()),
        })

    from fluent_server_ray.stages.aggregate import skip_empty

    return ds.select_columns([id_col, text_col]).map_batches(
        skip_empty(per_batch), batch_format="pyarrow",
        zero_copy_batch=True)


def boolean_search_sql(must: list[str], must_not: list[str] = (),
                       id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents") -> str:
    toks = (f"list_filter(str_split({text_col}, ' '), x -> x <> '')")
    n_hits = " + ".join(
        f"len(list_filter(tk, x -> x = '{w}'))" for w in must)
    conds = [f"len(list_filter(tk, x -> x = '{w}')) > 0" for w in must]
    conds += [f"len(list_filter(tk, x -> x = '{w}')) = 0"
              for w in must_not]
    return f"""
WITH tok AS (SELECT {id_col}, {toks} AS tk FROM {table})
SELECT {id_col}, CAST({n_hits} AS BIGINT) AS n_hits
FROM tok
WHERE {' AND '.join(conds)}
""".strip()


def autocomplete_topk(ds, k: int = 3, prefix_len: int = 2,
                      n_buckets: int = 64,
                      text_col: str = "text") -> pa.Table:
    """Autocomplete index: for every ``prefix_len``-character word
    prefix in the corpus, the top-``k`` completions by total
    occurrence count (ties broken by word ascending) — the
    type-ahead table a search box serves, built the
    :func:`vocab_top_words` way but grouped under each prefix.

    Shape: per-batch explode + local word count (combiner), ONE
    hash-bucket exchange on the PREFIX (buckets partition prefixes
    disjointly, so each bucket's per-prefix top-k is final), and an
    O(prefixes × k) driver concatenation — never a global sort.
    Words shorter than ``prefix_len`` are excluded by contract.
    Output: (prefix, rank, word, n) sorted by (prefix, rank).
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        toks = toks.filter(
            pc.greater_equal(pc.utf8_length(toks), prefix_len))
        c = (pa.table({"word": toks}).group_by("word")
             .aggregate([([], "count_all")])
             .rename_columns(["word", "n"]))
        pref = pc.utf8_slice_codeunits(c["word"], 0, prefix_len)
        c = c.append_column("prefix", pref)
        return c.append_column(
            "_bucket", pa.array(hash_bucket_array(c["prefix"],
                                                  n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["prefix", "word"], sort=False)["n"].sum()
             .reset_index())
        s = s.sort_values(["prefix", "n", "word"],
                          ascending=[True, False, True])
        s["rank"] = s.groupby("prefix", sort=False).cumcount() + 1
        return s.loc[s["rank"] <= k,
                     ["prefix", "rank", "word", "n"]]

    tops = (ds.select_columns([text_col])
            .map_batches(skip_empty(partial), batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))
    merged = tops.to_pandas()  # bounded: ≤ |prefixes| × k rows
    if merged.empty:
        return pa.table({"prefix": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64()),
                         "word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    merged = merged.sort_values(["prefix", "rank"])
    return pa.table({
        "prefix": pa.array(merged["prefix"].to_numpy(), pa.string()),
        "rank": pa.array(merged["rank"].to_numpy(dtype="int64"),
                         pa.int64()),
        "word": pa.array(merged["word"].to_numpy(), pa.string()),
        "n": pa.array(merged["n"].to_numpy(dtype="int64"), pa.int64()),
    })


def autocomplete_topk_sql(k: int = 3, prefix_len: int = 2,
                          text_col: str = "text",
                          table: str = "documents") -> str:
    return f"""
WITH w AS (
  SELECT unnest(list_filter(string_split({text_col}, ' '),
                            x -> x <> '')) AS word
  FROM {table}
), cnt AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n FROM w
  WHERE length(word) >= {prefix_len} GROUP BY word
), r AS (
  SELECT substr(word, 1, {prefix_len}) AS prefix, word, n,
    row_number() OVER (PARTITION BY substr(word, 1, {prefix_len})
                       ORDER BY n DESC, word) AS rank
  FROM cnt
)
SELECT prefix, CAST(rank AS BIGINT) AS rank, word, n
FROM r WHERE rank <= {k}
ORDER BY prefix, rank
""".strip()


def concordance(ds, term: str, width: int = 2, id_col: str = "doc_id",
                text_col: str = "text"):
    """KWIC (keyword-in-context) concordance: for every occurrence of
    ``term``, the occurrence's 1-based token position and up to
    ``width`` tokens of left / right context joined by single spaces
    — the corpus-linguistics view behind "show me how this word is
    used". Token contract: non-empty single-space splits, positions
    count non-empty tokens (the :func:`phrase_match` convention).

    Map-only, no exchange: the vectorized flatten finds occurrences;
    context assembly loops over MATCHES (output-sized, not
    corpus-sized). Returns a Dataset (doc_id, pos, left_ctx,
    right_ctx) in scan × position order.
    """
    import numpy as np

    from fluent_server_ray.stages.aggregate import skip_empty

    def per_batch(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_row = np.repeat(np.arange(len(t), dtype=np.int64),
                            np.asarray(lens, dtype=np.int64))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_row = doc_row[keep]
        words = flat.filter(pa.array(keep))
        m = pc.equal(words, term).to_numpy(zero_copy_only=False)
        if not m.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "left_ctx": pa.array([], pa.string()),
                             "right_ctx": pa.array([], pa.string())})
        ne_lens = np.bincount(doc_row, minlength=len(t)).astype(np.int64)
        starts = np.cumsum(ne_lens) - ne_lens
        pos = (np.arange(len(doc_row), dtype=np.int64)
               - np.repeat(starts, ne_lens) + 1)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        wl = words.to_pylist()
        out_id, out_pos, out_l, out_r = [], [], [], []
        for gidx in np.flatnonzero(m):
            d = doc_row[gidx]
            p = int(pos[gidx])          # 1-based within doc
            s = int(starts[d])
            n = int(ne_lens[d])
            lo = max(p - 1 - width, 0)
            out_id.append(int(ids[d]))
            out_pos.append(p)
            out_l.append(" ".join(wl[s + lo:s + p - 1]))
            out_r.append(" ".join(wl[s + p:s + min(p + width, n)]))
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "pos": pa.array(out_pos, pa.int64()),
                         "left_ctx": pa.array(out_l, pa.string()),
                         "right_ctx": pa.array(out_r, pa.string())})

    return ds.select_columns([id_col, text_col]).map_batches(
        skip_empty(per_batch), batch_format="pyarrow",
        zero_copy_batch=True)


def concordance_sql(term: str, width: int = 2, id_col: str = "doc_id",
                    text_col: str = "text",
                    table: str = "documents") -> str:
    return f"""
WITH tok AS (
  SELECT {id_col},
    list_filter(string_split({text_col}, ' '), x -> x <> '') AS t
  FROM {table}
), occ AS (
  SELECT {id_col}, t, unnest(t) AS w,
    generate_subscripts(t, 1) AS p
  FROM tok
)
SELECT {id_col}, CAST(p AS BIGINT) AS pos,
  COALESCE(array_to_string(t[greatest(p - {width}, 1):p - 1], ' '),
           '') AS left_ctx,
  COALESCE(array_to_string(t[p + 1:least(p + {width}, len(t))], ' '),
           '') AS right_ctx
FROM occ WHERE w = '{term}'
""".strip()


def simpson_diversity_by_source(ds, group_col: str = "source",
                                text_col: str = "text") -> pa.Table:
    """Simpson concentration index per source over word frequencies:
    λ = Σ n_i(n_i−1) / (N(N−1)) — the probability two random tokens
    are the SAME word (low = diverse vocabulary; the frequency-
    weighted sibling of :func:`gram_diversity_by_source`'s distinct
    ratio, which ignores how skewed the counts are).

    Exact-integer contract: per-word counts are exact; Σ n(n−1)
    accumulates as python ints (HUGEINT mirror — word counts at open
    scale overflow int64 squared); λ is ONE floor division to
    millionths. Sources with < 2 tokens emit NULL.

    Distributed shape: the unbounded (source, word) count space
    merges via the distributed groupby; per-source moment partials
    then collapse per block (python-int strings) to a driver merge
    bounded by |sources|. Output: (source, n_tokens, sum_nn1,
    simpson_millionths) sorted by source.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.filter(pc.is_valid(t[group_col]))
        toks = pc.split_pattern(pc.fill_null(t[text_col], ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(np.repeat(
            t[group_col].to_numpy(zero_copy_only=False),
            np.asarray(lens, dtype=np.int64)))
        keep = pc.not_equal(flat, "")
        sub = pa.table({"g": src, "word": flat}).filter(keep)
        return (sub.group_by(["g", "word"])
                .aggregate([([], "count_all")])
                .rename_columns(["g", "word", "n"]))

    cnt = grouped_agg(
        ds.select_columns([group_col, text_col]).map_batches(
            skip_empty(explode), batch_format="pyarrow",
            zero_copy_batch=True),
        ["g", "word"], [("n", "sum")], final="ray")

    def moment_partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pa.table({"g": t["g"], "n": t["n_sum"]}).to_pandas()
        n = df["n"].astype(object)  # python ints: n*(n-1) at any scale
        df["nn1"] = n * (n - 1)
        agg = df.groupby("g", sort=False).agg(
            N=("n", "sum"), S=("nn1", "sum")).reset_index()
        return pa.table({
            "g": pa.array(agg["g"], pa.string()),
            "N": pa.array([str(int(v)) for v in agg["N"]]),
            "S": pa.array([str(int(v)) for v in agg["S"]]),
        })

    acc: dict[str, list[int]] = {}
    for r in (cnt.map_batches(skip_empty(moment_partial),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        for g, N, S in zip(r["g"].to_pylist(), r["N"].to_pylist(),
                           r["S"].to_pylist()):
            a = acc.setdefault(g, [0, 0])
            a[0] += int(N)
            a[1] += int(S)

    groups = sorted(acc)
    lam = []
    for g in groups:
        N, S = acc[g]
        if S >= (1 << 63):
            raise ValueError("simpson_diversity_by_source: sum_nn1 "
                             "exceeds BIGINT — the output cast (and "
                             "the mirror's) would overflow")
        lam.append(S * 1_000_000 // (N * (N - 1)) if N > 1 else None)
    return pa.table({
        group_col: pa.array(groups, pa.string()),
        "n_tokens": pa.array([acc[g][0] for g in groups], pa.int64()),
        "sum_nn1": pa.array([acc[g][1] for g in groups], pa.int64()),
        "simpson_millionths": pa.array(lam, pa.int64()),
    })


def simpson_diversity_sql(group_col: str = "source",
                          text_col: str = "text",
                          table: str = "documents") -> str:
    return f"""
WITH w AS (
  SELECT {group_col} AS g,
    unnest(list_filter(string_split({text_col}, ' '),
                       x -> x <> '')) AS word
  FROM {table} WHERE {group_col} IS NOT NULL
), cnt AS (
  SELECT g, word, CAST(count(*) AS HUGEINT) AS n FROM w GROUP BY 1, 2
), agg AS (
  SELECT g, sum(n) AS nn, sum(n * (n - 1)) AS s FROM cnt GROUP BY g
)
SELECT g AS {group_col}, CAST(nn AS BIGINT) AS n_tokens,
  CAST(s AS BIGINT) AS sum_nn1,
  CAST(s * 1000000 // NULLIF(nn * (nn - 1), 0) AS BIGINT)
    AS simpson_millionths
FROM agg ORDER BY {group_col}
""".strip()


# ---------------------------------------- trigram wildcard search

def wildcard_search(ds, pattern: str, id_col: str = "doc_id",
                    text_col: str = "text"):
    """SQL-``LIKE`` wildcard search with a trigram prefilter — the
    pg_trgm plan expressed Ray-Data-first: ``%lit1%lit2%…%`` matching
    runs as (1) a cheap vectorized AND-mask of plain-substring
    trigram probes (``pc.match_substring`` per query trigram,
    short-circuit: each probe only scans survivors of the previous
    one), then (2) the exact ordered-literal regex verify
    (``lit1.*lit2.*``, DOTALL — ``%`` crosses newlines like LIKE)
    on the tiny candidate set. The trigram mask is sound: any LIKE
    match must contain every trigram of every literal, so step (1)
    never drops a true match — step (2) only removes false
    positives (trigrams present but out of order / overlapping).

    At corpus scale the same trigram set probes a PERSISTED postings
    layout instead of rescanning (the :func:`word_postings` shape,
    keyed on trigram); the scan form here is the index-free plan —
    still one streaming pass, never a row loop.

    Contract: the pattern must start and end with ``%``, contain no
    ``_`` wildcards, and every literal must be ≥ 3 chars (shorter
    literals have no trigram — raise rather than silently full-scan).
    Returns a Dataset of matching (id) rows, ascending.
    """
    import re

    if not (pattern.startswith("%") and pattern.endswith("%")):
        raise ValueError("wildcard_search: pattern must be %-anchored "
                         "on both ends (LIKE '%…%' form)")
    if "_" in pattern:
        raise ValueError("wildcard_search: '_' wildcard not supported")
    lits = [p for p in pattern.split("%") if p]
    if not lits or any(len(p) < 3 for p in lits):
        raise ValueError("wildcard_search: every literal needs ≥ 3 "
                         "chars for the trigram prefilter")
    trigrams = sorted({lit[i:i + 3] for lit in lits
                       for i in range(len(lit) - 2)})
    # (?s): '%' crosses newlines like LIKE (RE2/Arrow have no dotall
    # kwarg — the inline flag is the portable spelling)
    rx = "(?s)" + ".*".join(re.escape(lit) for lit in lits)

    def probe(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        # short-circuit AND: each trigram probe scans only survivors
        for tg in trigrams:
            if t.num_rows == 0:
                break
            t = t.filter(pc.match_substring(t[text_col], tg))
        if t.num_rows:
            t = t.filter(pc.match_substring_regex(t[text_col], rx))
        return t.select([id_col])

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    ).sort(id_col)


def wildcard_search_sql(pattern: str, id_col: str = "doc_id",
                        text_col: str = "text",
                        table: str = "documents") -> str:
    esc = pattern.replace("'", "''")
    return (f"SELECT {id_col} FROM {table} "
            f"WHERE {text_col} LIKE '{esc}' ORDER BY {id_col}").strip()


# ------------------------------- deletion-neighborhood spell match

def _lev1(a: str, b: str) -> int:
    """Exact Levenshtein distance CAPPED at 2 (returns 0, 1 or 2) —
    the verify kernel for distance-1 candidates; O(len) band walk."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return 2
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb - la ∈ {0, 1}: one aligned pass, allow a single edit
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if i == la:          # a is a prefix of b (lb = la + 1)
        return 1
    if la == lb:         # substitution at i?
        return 1 if a[i + 1:] == b[i + 1:] else 2
    return 1 if a[i:] == b[i + 1:] else 2  # insertion into a at i?


def spell_candidates(ds, n_queries: int = 200, min_len: int = 4,
                     min_count: int = 3, text_col: str = "text"):
    """Spell-correction candidate generation via the SymSpell
    deletion-neighborhood index (Garbe's device: two words are within
    Levenshtein 1 only if they share a key in ``{w} ∪ deletions₁(w)``)
    — candidate pairs come from a KEY join, never a vocab×query cross
    join; the exact distance check runs only on key-collision pairs
    (the collision set includes lev-2 false positives like ab/ba —
    the verify removes them).

    Deterministic query derivation (self-contained, mirrorable):
    vocabulary = corpus words (space-split) with ``len ≥ min_len``
    and ``count ≥ min_count``; queries = the DISTINCT 2nd-char
    deletions of the ``n_queries`` most frequent vocab words
    (freq desc, word asc tiebreak) — synthetic typos guaranteed to
    sit at distance ≤ 1 from their source word.

    Distributed shape: one per-batch word-count combiner with a
    distributed merge (vocab is unbounded); the top-``n_queries``
    cut is a bounded sort+limit; query keys broadcast as a plain
    dict into one vectorized key-expansion map over the vocab — the
    vocab never lands on the driver until the (tiny) matched set.
    Output: pyarrow Table (query, word, n, dist) sorted by
    (query, word).
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    n_buckets = 64

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.filter(
            pc.greater_equal(pc.utf8_length(flat), min_len))
        c = (pa.table({"word": flat}).group_by("word")
             .aggregate([([], "count_all")])
             .rename_columns(["word", "n"]))
        return c.append_column(
            "_bucket", pa.array(hash_bucket_array(c["word"], n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("word", sort=False)["n"].sum().reset_index()
        s = s[s["n"] >= min_count]
        # typed Arrow out: a gate-emptied bucket keeps its schema (an
        # empty pandas frame would come back 0-column and flip the
        # executor's bundle schema)
        return pa.table({"word": pa.array(s["word"], pa.string()),
                         "n": pa.array(s["n"], pa.int64())})

    # unbounded word space: combiner + ONE bucket exchange (the
    # vocab_top_words shape); the gated vocab stays distributed
    vocab = (ds.select_columns([text_col])
             .map_batches(skip_empty(partial), batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("_bucket")
             .map_groups(per_bucket, batch_format="pandas"))
    vocab = vocab.materialize()  # two consumers: query cut + key join

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("word", "ascending")])
        return t.take(idx[:n_queries])

    # top-k without a distributed sort: bounded per-block partials,
    # one driver merge over ≤ blocks × n_queries rows
    parts = list(vocab.map_batches(
        local_topk, batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"word": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())})
    idx = pc.sort_indices(merged, sort_keys=[("n", "descending"),
                                             ("word", "ascending")])
    top = merged.take(idx[:n_queries]).to_pandas()
    queries = sorted({w[0] + w[2:] for w in top["word"].tolist()
                      if len(w) >= min_len})

    # query key → queries sharing it (keys = word + its 1-deletions)
    qkeys: dict[str, list[str]] = {}
    for q in queries:
        for k in {q} | {q[:i] + q[i + 1:] for i in range(len(q))}:
            qkeys.setdefault(k, []).append(q)

    def match(t: pa.Table) -> pa.Table:
        out_q, out_w, out_n = [], [], []
        for w, n in zip(t["word"].to_pylist(), t["n"].to_pylist()):
            seen = set()
            for k in {w} | {w[:i] + w[i + 1:] for i in range(len(w))}:
                for q in qkeys.get(k, ()):
                    if q not in seen:
                        seen.add(q)
                        out_q.append(q)
                        out_w.append(w)
                        out_n.append(n)
        return pa.table({"query": pa.array(out_q, pa.string()),
                         "word": pa.array(out_w, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    cands_tables = list(vocab.map_batches(
        match, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"))
    cands = (pa.concat_tables(cands_tables).to_pandas()
             if cands_tables else
             __import__("pandas").DataFrame(columns=["query", "word",
                                                     "n"]))
    if cands.empty:
        return pa.table({"query": pa.array([], pa.string()),
                         "word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    dist = [_lev1(q, w) for q, w in zip(cands["query"], cands["word"])]
    cands["dist"] = dist
    cands = (cands[cands["dist"] <= 1]
             .sort_values(["query", "word"]).reset_index(drop=True))
    return pa.Table.from_pandas(cands, preserve_index=False)


def spell_candidates_sql(n_queries: int = 200, min_len: int = 4,
                         min_count: int = 3,
                         table: str = "documents") -> str:
    return f"""
WITH vocab AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split(text, ' '),
                              x -> length(x) >= {min_len})) AS w
    FROM {table}
  ) GROUP BY w HAVING count(*) >= {min_count}
), top AS (
  SELECT word FROM vocab
  ORDER BY n DESC, word LIMIT {n_queries}
), queries AS (
  SELECT DISTINCT substr(word, 1, 1) || substr(word, 3) AS q
  FROM top WHERE length(word) >= {min_len}
)
SELECT q.q AS query, v.word, v.n,
  CAST(levenshtein(q.q, v.word) AS BIGINT) AS dist
FROM queries q CROSS JOIN vocab v
WHERE levenshtein(q.q, v.word) <= 1
ORDER BY query, word
""".strip()


# ------------------------------------------------ term burstiness

def term_burstiness(ds, k: int = 100, text_col: str = "text",
                    n_buckets: int = 64) -> pa.Table:
    """Term burstiness / clumpiness audit — for each of the top-``k``
    terms by collection frequency: does the term spread evenly across
    documents or clump into a few (Church & Gale 1995: burstiness =
    cf/df, the mean occurrences per document CONTAINING the term, and
    the corpus-wide per-doc count variance)? High-burst terms are
    boilerplate/template markers; flat terms are function words —
    the curation signal n-gram repetition can't see across docs.

    Exact-integer contract (python-int driver merge, HUGEINT mirror):
    ``burst_e6 = (1_000_000 * cf) // df`` and, over ALL D docs
    (zero-count docs included), ``var_e6 = (1_000_000 * (D * s2 -
    cf²)) // D²`` with ``s2 = Σ c_d²`` — both floor once at the end.
    D counts rows with non-NULL text (a tokenless doc still
    dilutes the variance).

    Shape: per-batch (doc, word) count → per-word batch partials
    (cf, df, s2) + a sentinel total-docs row (leading-space word —
    the tokenizer can't produce one) riding the same stream; ONE
    hash-bucket exchange merges the unbounded word space; per-bucket
    top-k by cf leaves an O(buckets·k) driver merge. Returns a
    pyarrow Table (word, cf, df, burst_millionths, var_millionths)
    sorted by (cf desc, word asc), top ``k``.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    SENT = " docs"  # leading space: no real token contains one

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        valid = pc.is_valid(txt)
        n_docs = int(pc.sum(pc.cast(valid, pa.int64())).as_py() or 0)
        toks = pc.split_pattern(pc.fill_null(txt, ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64),
                           lens.astype(np.int64))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        dw = (pa.table({"word": flat, "d": pa.array(doc_of)})
              .group_by(["word", "d"]).aggregate([([], "count_all")])
              .rename_columns(["word", "d", "c"]))
        c = dw["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        per_word = (pa.table({
            "word": dw["word"], "cf": dw["c"],
            "df": pa.array(np.ones(len(c), dtype=np.int64)),
            "s2": pa.array(c * c)})
            .group_by("word")
            .aggregate([("cf", "sum"), ("df", "sum"), ("s2", "sum")])
            .rename_columns(["word", "cf", "df", "s2"]))
        sent = pa.table({"word": pa.array([SENT], pa.string()),
                         "cf": pa.array([n_docs], pa.int64()),
                         "df": pa.array([0], pa.int64()),
                         "s2": pa.array([0], pa.int64())})
        out = pa.concat_tables([per_word.cast(sent.schema), sent])
        return out.append_column(
            "_bucket", pa.array(hash_bucket_array(out["word"],
                                                  n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        s = (g.groupby("word", sort=False)[["cf", "df", "s2"]].sum()
             .reset_index())
        sent = s[s["word"] == SENT]
        s = s[s["word"] != SENT]
        s = s.sort_values(["cf", "word"],
                          ascending=[False, True]).head(k)
        if not sent.empty:
            s = pd.concat([s, sent], ignore_index=True)
        return pa.table({"word": pa.array(s["word"], pa.string()),
                         "cf": pa.array(s["cf"], pa.int64()),
                         "df": pa.array(s["df"], pa.int64()),
                         "s2": pa.array(s["s2"], pa.int64())})

    parts = (ds.select_columns([text_col])
             .map_batches(skip_empty(partial), batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("_bucket").map_groups(per_bucket,
                                            batch_format="pandas"))
    merged = pa.concat_tables(parts.iter_batches(
        batch_size=None, batch_format="pyarrow"))  # ≤ buckets×(k+1)
    df = merged.to_pandas() if merged.num_rows else None
    out_fields = [("word", pa.string()), ("cf", pa.int64()),
                  ("df", pa.int64()), ("burst_millionths", pa.int64()),
                  ("var_millionths", pa.int64())]
    if df is None:
        return pa.schema(out_fields).empty_table()
    agg = df.groupby("word", sort=False)[["cf", "df", "s2"]].sum()
    big_d = int(agg.loc[SENT, "cf"]) if SENT in agg.index else 0
    agg = agg.drop(index=SENT, errors="ignore")
    agg = agg.sort_values(["cf"], ascending=False)
    agg = agg.reset_index().sort_values(
        ["cf", "word"], ascending=[False, True]).head(k)
    if big_d == 0 or agg.empty:
        return pa.schema(out_fields).empty_table()
    words = agg["word"].tolist()
    cf = [int(x) for x in agg["cf"]]
    dfreq = [int(x) for x in agg["df"]]
    s2 = [int(x) for x in agg["s2"]]
    burst = [(1_000_000 * c) // d for c, d in zip(cf, dfreq)]
    var = [(1_000_000 * (big_d * q - c * c)) // (big_d * big_d)
           for c, q in zip(cf, s2)]
    return pa.table({"word": pa.array(words, pa.string()),
                     "cf": pa.array(cf, pa.int64()),
                     "df": pa.array(dfreq, pa.int64()),
                     "burst_millionths": pa.array(burst, pa.int64()),
                     "var_millionths": pa.array(var, pa.int64())})


def term_burstiness_sql(k: int = 100, table: str = "documents") -> str:
    return f"""
WITH dw AS (
  SELECT did, word, CAST(count(*) AS HUGEINT) AS c FROM (
    SELECT row_number() OVER () AS did,
      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
    FROM {table} WHERE text IS NOT NULL
  ) GROUP BY did, word
), dtot AS (
  SELECT CAST(count(*) AS HUGEINT) AS d FROM {table}
  WHERE text IS NOT NULL
), w AS (
  SELECT word, sum(c) AS cf, CAST(count(*) AS HUGEINT) AS df,
    sum(c * c) AS s2
  FROM dw GROUP BY word
)
SELECT word, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
  CAST((1000000 * cf) // df AS BIGINT) AS burst_millionths,
  CAST((1000000 * ((SELECT d FROM dtot) * s2 - cf * cf))
       // ((SELECT d FROM dtot) * (SELECT d FROM dtot)) AS BIGINT)
    AS var_millionths
FROM w
ORDER BY cf DESC, word
LIMIT {k}
""".strip()


# --------------------------------- Jensen-Shannon source divergence

def source_js_divergence(ds, group_col: str = "source",
                         text_col: str = "text",
                         n_buckets: int = 64) -> pa.Table:
    """Pairwise Jensen-Shannon divergence between per-group token
    distributions — the SYMMETRIC, always-finite companion of
    :func:`source_token_kl` for mixture design ("which two sources
    are interchangeable, which two clash?"): ``JSD(P,Q) = ½KL(P‖M)
    + ½KL(Q‖M)``, ``M = (P+Q)/2`` — bounded by ln 2, defined even
    when a word appears in only one source (KL(g‖corpus) hides
    pairwise structure; JSD is the standard pairwise matrix).

    Integer-exact contract (the :func:`source_token_kl` log device):
    with per-pair counts a_w, b_w and totals n_a, n_b,
    ``KL(P‖M) = Σ_{a_w>0} (a_w/n_a)·ln(2·a_w·n_b / (a_w·n_b +
    b_w·n_a))``; each log floors to int64 millionths
    (``L(x) = floor(1e6·ln(x))``), so the per-pair term sums
    ``term_a = Σ a_w·(L(2·a_w·n_b) − L(a_w·n_b + b_w·n_a))`` are
    order-free int64 and ``jsd_nats = (term_a/n_a + term_b/n_b) /
    2e6`` is two float64 divisions at the very end.

    Shape: per-batch (group, word) count combiner; ONE hash-bucket
    exchange on the word co-locates each word's per-group counts;
    per-bucket ALL |G|²/2 pair partials emit (pairs are bounded —
    sources, langs); per-group totals fall out of the same partials
    (the :func:`source_token_kl` device). Driver merge is
    O(buckets·pairs). Returns (source_a, source_b, n_a, n_b, term_a,
    term_b, jsd_nats) sorted by (source_a, source_b).
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        grp = t[group_col].to_pandas().to_numpy()
        gs = np.repeat(grp, lens.astype("int64"))
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        gs = gs[keep.to_numpy(zero_copy_only=False)]
        c = (pa.table({"g": pa.array(gs, type=pa.string()),
                       "word": flat})
             .group_by(["g", "word"]).aggregate([([], "count_all")])
             .rename_columns(["g", "word", "n"]))
        return c.append_column(
            "_bucket", pa.array(hash_bucket_array(c["word"], n_buckets)))

    parts = ds.select_columns([group_col, text_col]).map_batches(
        skip_empty(partial), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    # bounded statistic: per-group token totals (combiner partials,
    # ≤ |groups| rows per block before the driver sees them)
    def group_totals(t: pa.Table) -> pa.Table:
        return (t.select(["g", "n"]).group_by("g")
                .aggregate([("n", "sum")]).rename_columns(["g", "n"]))

    tot_tables = list(parts.map_batches(
        skip_empty(group_totals), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    out_fields = [("source_a", pa.string()), ("source_b", pa.string()),
                  ("n_a", pa.int64()), ("n_b", pa.int64()),
                  ("term_a", pa.int64()), ("term_b", pa.int64()),
                  ("jsd_nats", pa.float64())]
    if not tot_tables:
        return pa.schema(out_fields).empty_table()
    g_tbl = (pa.concat_tables(tot_tables).group_by("g")
             .aggregate([("n", "sum")]))
    n_g = {g: int(n) for g, n in zip(g_tbl["g"].to_pylist(),
                                     g_tbl["n_sum"].to_pylist())}
    groups = sorted(n_g)
    if max(n_g.values()) ** 2 >= 2 ** 52:
        raise ValueError("source_js_divergence: n_a·n_b would lose "
                         "float64 exactness in the log argument")

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        c = (b.groupby(["g", "word"], sort=False)["n"].sum()
             .reset_index())
        wide = c.pivot_table(index="word", columns="g", values="n",
                             aggfunc="sum", fill_value=0)
        out_a, out_b, ta, tb = [], [], [], []
        for i, ga in enumerate(groups):
            av_all = (wide[ga].to_numpy(dtype="int64")
                      if ga in wide.columns
                      else np.zeros(len(wide), dtype=np.int64))
            for gb in groups[i + 1:]:
                bv_all = (wide[gb].to_numpy(dtype="int64")
                          if gb in wide.columns
                          else np.zeros(len(wide), dtype=np.int64))
                na, nb = n_g[ga], n_g[gb]
                mix = av_all * nb + bv_all * na
                t_a = t_b = 0
                m = av_all > 0
                if m.any():
                    av = av_all[m].astype("float64")
                    t_a = int((av_all[m] * (
                        np.floor(np.log(2.0 * av * nb) * 1e6)
                        - np.floor(np.log(mix[m].astype("float64"))
                                   * 1e6)).astype("int64")).sum())
                m = bv_all > 0
                if m.any():
                    bv = bv_all[m].astype("float64")
                    t_b = int((bv_all[m] * (
                        np.floor(np.log(2.0 * bv * na) * 1e6)
                        - np.floor(np.log(mix[m].astype("float64"))
                                   * 1e6)).astype("int64")).sum())
                out_a.append(ga)
                out_b.append(gb)
                ta.append(t_a)
                tb.append(t_b)
        return pa.table({"source_a": pa.array(out_a, pa.string()),
                         "source_b": pa.array(out_b, pa.string()),
                         "ta": pa.array(ta, pa.int64()),
                         "tb": pa.array(tb, pa.int64())})

    merged = (parts.groupby("_bucket")
              .map_groups(per_bucket, batch_format="pandas")
              .to_pandas())  # bounded: ≤ n_buckets × pairs rows
    if merged.empty:
        return pa.schema(out_fields).empty_table()
    agg = (merged.groupby(["source_a", "source_b"], sort=True)
           [["ta", "tb"]].sum().reset_index())
    na = np.array([n_g[g] for g in agg["source_a"]], dtype=np.int64)
    nb = np.array([n_g[g] for g in agg["source_b"]], dtype=np.int64)
    ta = agg["ta"].to_numpy(dtype=np.int64)
    tb = agg["tb"].to_numpy(dtype=np.int64)
    jsd = (ta / na + tb / nb) / 2e6
    return pa.table({
        "source_a": pa.array(agg["source_a"], pa.string()),
        "source_b": pa.array(agg["source_b"], pa.string()),
        "n_a": pa.array(na), "n_b": pa.array(nb),
        "term_a": pa.array(ta), "term_b": pa.array(tb),
        "jsd_nats": pa.array(jsd, pa.float64())})


def source_js_divergence_sql(group_col: str = "source",
                             table: str = "documents") -> str:
    return f"""
WITH cs AS MATERIALIZED (
  SELECT {group_col} AS g, word, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT {group_col},
      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
    FROM {table}
  ) GROUP BY g, word
), tot AS MATERIALIZED (
  SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cs GROUP BY g
), pairs AS (
  SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb
  FROM tot a JOIN tot b ON a.g < b.g
), terma AS (
  SELECT p.ga, p.gb, CAST(sum(ca.c * (
    CAST(floor(ln(2.0 * ca.c * p.nb) * 1000000) AS BIGINT)
    - CAST(floor(ln(CAST(ca.c * p.nb + COALESCE(cb.c, 0) * p.na
                         AS DOUBLE)) * 1000000) AS BIGINT)
  )) AS BIGINT) AS term_a
  FROM pairs p
  JOIN cs ca ON ca.g = p.ga
  LEFT JOIN cs cb ON cb.g = p.gb AND cb.word = ca.word
  GROUP BY p.ga, p.gb
), termb AS (
  SELECT p.ga, p.gb, CAST(sum(cb.c * (
    CAST(floor(ln(2.0 * cb.c * p.na) * 1000000) AS BIGINT)
    - CAST(floor(ln(CAST(cb.c * p.na + COALESCE(ca.c, 0) * p.nb
                         AS DOUBLE)) * 1000000) AS BIGINT)
  )) AS BIGINT) AS term_b
  FROM pairs p
  JOIN cs cb ON cb.g = p.gb
  LEFT JOIN cs ca ON ca.g = p.ga AND ca.word = cb.word
  GROUP BY p.ga, p.gb
)
SELECT p.ga AS source_a, p.gb AS source_b,
  p.na AS n_a, p.nb AS n_b, ta.term_a, tb.term_b,
  (CAST(ta.term_a AS DOUBLE) / p.na
   + CAST(tb.term_b AS DOUBLE) / p.nb) / 2000000.0 AS jsd_nats
FROM pairs p
JOIN terma ta ON ta.ga = p.ga AND ta.gb = p.gb
JOIN termb tb ON tb.ga = p.ga AND tb.gb = p.gb
ORDER BY source_a, source_b
""".strip()


# --------------------------------------------- RAKE keyphrases

RAKE_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is")


def rake_keyphrases(ds, k: int = 50, text_col: str = "text",
                    stopwords: tuple = RAKE_STOPWORDS,
                    n_buckets: int = 64) -> pa.Table:
    """RAKE keyphrase extraction (Rose et al. 2010, "Automatic
    Keyword Extraction from Individual Documents") over the whole
    corpus — the phrase-level complement of :func:`doc_keywords`'
    TF-IDF unigrams: candidate phrases are maximal stopword-free
    token runs; each word scores ``degree/frequency`` (degree = Σ of
    the lengths of the phrase occurrences containing it — long-phrase
    words beat isolated frequent words); a phrase scores the sum of
    its words' scores.

    Exact-integer contract: ``word_score_e6 = (1_000_000 * deg) //
    freq`` floors once per word; ``phrase_score_e6`` sums those with
    multiplicity — both engines spell the same floors, so ranking is
    deterministic: (score desc, phrase asc), top ``k`` distinct
    phrases, each with its occurrence count.

    Distributed shape (nothing unbounded on the driver): per-batch
    phrase extraction (vectorized boundary cumsum over the flat token
    stream) feeds (1) per-word (freq, deg) partials → ONE word-bucket
    exchange, and (2) distinct (phrase, n) counts → distributed
    merge; scoring re-explodes the DISTINCT phrases to (phrase, word,
    mult) rows and bucket-JOINS word scores back (no corpus-wide
    broadcast), re-aggregates per phrase, and per-bucket top-k leaves
    an O(buckets·k) driver merge.
    """
    import numpy as np
    import pandas as pd

    from fluent_server_ray.stages.aggregate import (grouped_agg,
                                                    hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.joins import bucketed_hash_join

    stop = frozenset(stopwords)

    def extract_phrases(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(pc.fill_null(t[text_col], ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64),
                           lens.astype(np.int64))
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""
        words, doc_of = words[keep], doc_of[keep]
        if len(words) == 0:
            return pd.DataFrame({"phrase": [], "plen": []})
        is_stop = np.isin(words, list(stop))
        new_doc = np.concatenate(([True], doc_of[1:] != doc_of[:-1]))
        # a phrase breaks at every stopword or doc boundary
        brk = is_stop | new_doc
        pid = np.cumsum(brk)
        m = ~is_stop
        sub = pd.DataFrame({"pid": pid[m], "w": words[m]})
        g = sub.groupby("pid", sort=True)["w"]
        phrases = g.agg(" ".join)
        plens = g.size()
        return pd.DataFrame({"phrase": phrases.to_numpy(),
                             "plen": plens.to_numpy(dtype=np.int64)})

    phrase_schema = pa.schema([("phrase", pa.string()),
                               ("plen", pa.int64())])

    def phrases_arrow(t: pa.Table) -> pa.Table:
        df = extract_phrases(t)
        return pa.table({
            "phrase": pa.array(df["phrase"], pa.string()),
            "plen": pa.array(df["plen"], pa.int64())})

    out_schema = pa.schema([("phrase", pa.string()), ("n", pa.int64()),
                            ("score_millionths", pa.int64())])

    occ = ds.select_columns([text_col]).map_batches(
        skip_empty(phrases_arrow), batch_format="pyarrow",
        zero_copy_batch=True).materialize()  # two consumers below
    if occ.count() == 0:  # all-stopword / empty corpus
        return out_schema.empty_table()

    # (1) per-word (freq, deg) partials → ONE word-bucket exchange
    def word_partial(t: pa.Table) -> pa.Table:
        ph = t["phrase"].to_numpy(zero_copy_only=False)
        pl = t["plen"].to_numpy(zero_copy_only=False)
        words = np.concatenate([p.split(" ") for p in ph]) \
            if len(ph) else np.array([], dtype=object)
        degs = np.repeat(pl, pl)
        sub = pd.DataFrame({"w": words, "deg": degs})
        g = sub.groupby("w", sort=False)["deg"]
        out = pd.DataFrame({"freq": g.size(), "deg": g.sum()}) \
            .reset_index()
        tbl = pa.table({"w": pa.array(out["w"], pa.string()),
                        "freq": pa.array(out["freq"], pa.int64()),
                        "deg": pa.array(out["deg"], pa.int64())})
        return tbl.append_column(
            "_bucket", pa.array(hash_bucket_array(tbl["w"], n_buckets)))

    score_schema = pa.schema([("w", pa.string()),
                              ("score_e6", pa.int64())])

    def bucket_scores(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("w", sort=False)[["freq", "deg"]].sum()
        score = (1_000_000 * s["deg"]) // s["freq"]
        return pa.table({
            "w": pa.array(s.index.to_numpy(), pa.string()),
            "score_e6": pa.array(score.to_numpy(), pa.int64())})

    from fluent_server_ray.stages.groups import map_buckets

    wscores = map_buckets(
        occ.map_batches(skip_empty(word_partial),
                        batch_format="pyarrow", zero_copy_batch=True),
        bucket_scores, score_schema)

    # (2) distinct (phrase, n) via distributed merge
    def phrase_partial(t: pa.Table) -> pa.Table:
        return (t.select(["phrase"]).group_by("phrase")
                .aggregate([([], "count_all")])
                .rename_columns(["phrase", "n"]))

    phrases = grouped_agg(
        occ.map_batches(skip_empty(phrase_partial),
                        batch_format="pyarrow", zero_copy_batch=True),
        keys=["phrase"], aggs=[("n", "sum")], final="ray")

    # re-explode DISTINCT phrases and bucket-join word scores back
    def explode(t: pa.Table) -> pa.Table:
        ph = t["phrase"].to_numpy(zero_copy_only=False)
        ns = t["n_sum"].to_numpy(zero_copy_only=False)
        lists = [p.split(" ") for p in ph]
        lens = np.array([len(x) for x in lists], dtype=np.int64)
        words = (np.concatenate(lists) if len(lists)
                 else np.array([], dtype=object))
        return pa.table({
            "phrase": pa.array(np.repeat(ph, lens), pa.string()),
            "n": pa.array(np.repeat(ns, lens), pa.int64()),
            "w": pa.array(words, pa.string())})

    joined = bucketed_hash_join(
        phrases.map_batches(skip_empty(explode),
                            batch_format="pyarrow",
                            zero_copy_batch=True),
        wscores, key="w", n_buckets=n_buckets)

    def per_phrase_partial(t: pa.Table) -> pa.Table:
        return (t.select(["phrase", "n", "score_e6"])
                .group_by(["phrase", "n"])
                .aggregate([("score_e6", "sum")])
                .rename_columns(["phrase", "n", "score_e6"]))

    scored = grouped_agg(
        joined.map_batches(skip_empty(per_phrase_partial),
                           batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["phrase", "n"], aggs=[("score_e6", "sum")], final="ray")

    def local_topk(t: pa.Table) -> pa.Table:
        out = pa.table({"phrase": t["phrase"],
                        "n": pc.cast(t["n"], pa.int64()),
                        "score_millionths": pc.cast(t["score_e6_sum"],
                                                    pa.int64())})
        idx = pc.sort_indices(out, sort_keys=[
            ("score_millionths", "descending"), ("phrase", "ascending")])
        return out.take(idx[:k])

    tops = list(scored.map_batches(
        skip_empty(local_topk), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    if not tops:
        return out_schema.empty_table()
    merged = pa.concat_tables(tops)  # ≤ blocks × k rows
    idx = pc.sort_indices(merged, sort_keys=[
        ("score_millionths", "descending"), ("phrase", "ascending")])
    return merged.take(idx[:k])


def rake_keyphrases_sql(k: int = 50,
                        stopwords: tuple = RAKE_STOPWORDS,
                        table: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
WITH toks AS (
  SELECT did, gs, w, w IN ({stop_list}) AS is_stop FROM (
    SELECT row_number() OVER () AS did,
      list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM {table} WHERE text IS NOT NULL
  ) CROSS JOIN unnest(generate_series(1, len(t))) AS u(gs)
  CROSS JOIN LATERAL (SELECT t[gs] AS w) z
), pids AS (
  SELECT did, gs, w, is_stop,
    sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
      OVER (PARTITION BY did ORDER BY gs) AS pid
  FROM toks
), occ AS MATERIALIZED (
  SELECT did, pid, string_agg(w, ' ' ORDER BY gs) AS phrase,
    CAST(count(*) AS BIGINT) AS plen
  FROM pids WHERE NOT is_stop GROUP BY did, pid
), wstats AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq,
    CAST(sum(plen) AS BIGINT) AS deg FROM (
    SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM occ
  ) GROUP BY w
), phrases AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n FROM occ GROUP BY phrase
), scored AS (
  SELECT p.phrase, p.n,
    CAST(sum((1000000 * s.deg) // s.freq) AS BIGINT) AS score
  FROM (SELECT phrase, n, unnest(string_split(phrase, ' ')) AS w
        FROM phrases) p
  JOIN wstats s ON s.w = p.w
  GROUP BY p.phrase, p.n
)
SELECT phrase, n, score AS score_millionths
FROM scored
ORDER BY score DESC, phrase
LIMIT {k}
""".strip()


# ------------------------------------- inter-labeler agreement (kappa)

def langid_kappa(ds, label_col: str = "lang") -> pa.Table:
    """Cohen's kappa between the stored language label and the langid
    heuristic's prediction — the chance-corrected agreement score a
    curation team reads alongside the raw confusion matrix (Cohen
    1960): kappa = (Po − Pe) / (1 − Pe), Pe = Σ_k row_k·col_k / N².

    Exact-integer contract: the confusion matrix is integer counts, so
    with A = agreement count and PE = Σ row_k·col_k, kappa =
    (N·A − PE) / (N² − PE) is a ratio of exact integers. The engine
    computes it in unbounded Python ints (N² exceeds int64 past ~3e9
    rows) and emits TRUNCATED millionths (toward zero — DuckDB ``//``
    semantics, kappa can be negative); the mirror does the same
    arithmetic in HUGEINT. Perfect chance agreement (N² == PE, e.g. a
    single class on both sides) yields NULL kappa on both sides.

    Shape: one combiner pass builds the ≤ |langs|² confusion table
    (:func:`langid_confusion`); the scalar reduction is driver-side
    over that bounded table. Returns ONE row: (n_items, agree_n,
    po_millionths, pe_millionths, kappa_millionths)."""
    conf = langid_confusion(ds, label_col)
    labs = conf[label_col].to_pylist()
    preds = conf["lang_pred"].to_pylist()
    ns = conf["n"].to_pylist()

    n_total = sum(ns)
    out_schema = pa.schema([
        pa.field("n_items", pa.int64()), pa.field("agree_n", pa.int64()),
        pa.field("po_millionths", pa.int64()),
        pa.field("pe_millionths", pa.int64()),
        pa.field("kappa_millionths", pa.int64()),
    ])
    if n_total == 0:
        return out_schema.empty_table()

    agree = sum(n for l, p, n in zip(labs, preds, ns) if l == p)
    row_tot: dict = {}
    col_tot: dict = {}
    for l, p, n in zip(labs, preds, ns):
        row_tot[l] = row_tot.get(l, 0) + n
        col_tot[p] = col_tot.get(p, 0) + n
    pe = sum(r * col_tot.get(k, 0) for k, r in row_tot.items())

    def tdiv(a: int, d: int) -> int:
        # truncate toward zero (DuckDB // semantics); d > 0 always here
        return a // d if a >= 0 else -((-a) // d)

    den = n_total * n_total - pe
    kappa = tdiv(10**6 * (n_total * agree - pe), den) if den else None
    return pa.table({
        "n_items": pa.array([n_total], pa.int64()),
        "agree_n": pa.array([agree], pa.int64()),
        "po_millionths": pa.array([(10**6 * agree) // n_total],
                                  pa.int64()),
        "pe_millionths": pa.array([(10**6 * pe)
                                   // (n_total * n_total)], pa.int64()),
        "kappa_millionths": pa.array([kappa], pa.int64()),
    })


def langid_kappa_sql(label_col: str = "lang",
                     table: str = "documents") -> str:
    return f"""
WITH conf AS MATERIALIZED (
  SELECT COALESCE(CAST({label_col} AS VARCHAR), 'unknown') AS lab,
    {_langid_expr()} AS pred, count(*) AS n
  FROM {table} GROUP BY 1, 2
), tot AS (
  SELECT CAST(COALESCE(sum(n), 0) AS HUGEINT) AS nt,
    CAST(COALESCE(sum(n) FILTER (WHERE lab = pred), 0) AS HUGEINT) AS a
  FROM conf
), pe AS (
  SELECT CAST(COALESCE(sum(r.r * c.c), 0) AS HUGEINT) AS pe
  FROM (SELECT lab AS k, CAST(sum(n) AS HUGEINT) AS r
        FROM conf GROUP BY 1) r
  JOIN (SELECT pred AS k, CAST(sum(n) AS HUGEINT) AS c
        FROM conf GROUP BY 1) c ON r.k = c.k
)
SELECT CAST(nt AS BIGINT) AS n_items, CAST(a AS BIGINT) AS agree_n,
  CAST((1000000 * a) // nt AS BIGINT) AS po_millionths,
  CAST((1000000 * pe) // (nt * nt) AS BIGINT) AS pe_millionths,
  CAST((1000000 * (nt * a - pe)) // NULLIF(nt * nt - pe, 0) AS BIGINT)
    AS kappa_millionths
FROM tot, pe
WHERE nt > 0
""".strip()


# --------------------------------------- feature hashing (the trick)

_FEATHASH_CACHE: dict = {}


def feature_hash_vectors(ds, dim: int = 64, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Hashing-trick bag-of-words vectors (Weinberger 2009): every
    token maps to ``md5(tok) % dim`` with a ±1 sign from an
    independent salted hash, so the feature space is FIXED-width with
    no vocabulary build, no broadcast table, no exchange — the
    standard way to featurize an unbounded token space at 100 TB.

    Hash family is the oracle-checkable house device: ``md5_u64`` ≡
    DuckDB ``md5_number_upper`` bit-for-bit (first 8 digest bytes,
    little-endian; cf. stages/dedup.py simhash). Sign salt is
    ``'s#' ∥ tok`` — independent of the bucket hash.

    Purely per-doc: one streaming map, per-worker token→(bucket,sign)
    cache (the corpus vocabulary amortizes the md5). Returns a Dataset
    of long-form (id, dim, weight) rows, zero-weight cells dropped —
    exactly the SQL mirror's HAVING."""
    from fluent_server_ray.functions.hashing import md5_u64

    def fn(t: pa.Table) -> pa.Table:
        ids_out, dims_out, w_out = [], [], []
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        cache = _FEATHASH_CACHE
        for i, text in zip(ids, texts):
            acc: dict = {}
            for tok in (text or "").split(" "):
                if not tok:
                    continue
                bs = cache.get(tok)
                if bs is None:
                    bs = (md5_u64(tok) % dim,
                          1 if md5_u64("s#" + tok) % 2 == 0 else -1)
                    if len(cache) < (1 << 20):
                        cache[tok] = bs
                acc[bs[0]] = acc.get(bs[0], 0) + bs[1]
            for d in sorted(acc):
                if acc[d] != 0:
                    ids_out.append(i)
                    dims_out.append(d)
                    w_out.append(acc[d])
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "dim": pa.array(dims_out, pa.int64()),
            "weight": pa.array(w_out, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def feature_hash_vectors_sql(dim: int = 64, id_col: str = "doc_id",
                             table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM {table}
)
SELECT {id_col}, CAST(md5_number_upper(tok) % {dim} AS BIGINT) AS dim,
  CAST(sum(CASE WHEN md5_number_upper('s#' || tok) % 2 = 0
           THEN 1 ELSE -1 END) AS BIGINT) AS weight
FROM toks GROUP BY 1, 2
HAVING sum(CASE WHEN md5_number_upper('s#' || tok) % 2 = 0
           THEN 1 ELSE -1 END) <> 0
ORDER BY {id_col}, dim
""".strip()


# ------------------------------------------ tokenizer fertility audit

def token_fertility_by_lang(ds, group_col: str = "lang",
                            text_col: str = "text") -> pa.Table:
    """Tokenizer fertility per language: BPE-ish tokens emitted per
    whitespace word — the multilingual-tokenizer audit (a language
    with fertility ≫ the corpus mean pays more context budget per
    word; the standard go/no-go table before freezing a tokenizer).

    fertility = 1e6·Σ bpe_tokens // Σ ws_tokens per language (exact
    integer sums, one floor division; NULL when a language has no
    whitespace tokens). NULL lang folds to 'unknown' (the langid
    contract). ONE combiner pass — per batch the two regex counts
    collapse to per-lang partial sums; driver merge is |langs|-bounded.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": pc.fill_null(pc.cast(t[group_col], pa.string()),
                                 "unknown"),
            "ws": pc.cast(pc.count_substring_regex(
                t[text_col], TOKEN_RE), pa.int64()),
            "bpe": pc.cast(pc.count_substring_regex(
                t[text_col], BPE_RE), pa.int64()),
        })

    agg = grouped_agg(
        ds.select_columns([group_col, text_col]).map_batches(
            proj, batch_format="pyarrow", zero_copy_batch=True),
        ["lang"], [("ws", "sum"), ("bpe", "sum")])
    ws = agg["ws_sum"].to_pylist()
    bpe = agg["bpe_sum"].to_pylist()
    return pa.table({
        "lang": agg["lang"],
        "n_ws_tokens": pa.array([w or 0 for w in ws], pa.int64()),
        "n_bpe_tokens": pa.array([b or 0 for b in bpe], pa.int64()),
        "fertility_millionths": pa.array(
            [10**6 * (b or 0) // w if w else None
             for w, b in zip(ws, bpe)], pa.int64()),
    })


def token_fertility_sql(group_col: str = "lang",
                        table: str = "documents") -> str:
    rx = BPE_RE.replace("'", "''")
    return f"""
SELECT COALESCE(CAST({group_col} AS VARCHAR), 'unknown') AS lang,
  CAST(COALESCE(sum(len(regexp_extract_all(text, '[^ ]+'))), 0)
       AS BIGINT) AS n_ws_tokens,
  CAST(COALESCE(sum(len(regexp_extract_all(text, '{rx}'))), 0)
       AS BIGINT) AS n_bpe_tokens,
  CAST((CAST(1000000 AS HUGEINT)
        * COALESCE(sum(len(regexp_extract_all(text, '{rx}'))), 0))
       // NULLIF(sum(len(regexp_extract_all(text, '[^ ]+'))), 0)
       AS BIGINT) AS fertility_millionths
FROM {table} GROUP BY 1 ORDER BY 1
""".strip()


# ------------------------------------------------ Naive Bayes classifier

def naive_bayes_classify(ds, id_col: str = "doc_id",
                         text_col: str = "text",
                         label_col: str = "lang",
                         holdout_mod: int = 5):
    """Multinomial Naive Bayes text classifier trained on the corpus's
    own labels — the classic bag-of-words baseline (cf. McCallum &
    Nigam 1998) as a distributed train→score pipeline: docs with
    ``id % holdout_mod != 0`` train the model, the holdout slice is
    scored and argmax-classified. Laplace add-one smoothing over the
    TRAIN vocabulary; tokens outside that vocabulary are ignored at
    scoring time (the standard multinomial-NB restriction). Rows with a
    NULL label never train (SQL ``GROUP BY`` would keep a NULL class
    whose name can't tie-break deterministically).

    Integer-exact contract (house log-millionths rule, same device as
    :func:`doc_unigram_logprob`): ``lp(w,c) = floor(1e6·ln((n_cw+1) /
    (n_c+V)))`` and ``prior(c) = floor(1e6·ln(docs_c/docs))`` are
    int64; a doc's class score is ``prior + Σ_tokens lp`` — an
    order-free int64 sum, so partitioning can never flip the argmax;
    ties break by class name ascending.

    Scale shape: ONE training pass (per-batch (class,term) count
    combiner with a ``term=''`` sentinel row carrying per-class doc
    counts — tokens are split-nonempty so the sentinel can't collide)
    → model-sized driver merge (vocab×classes — a trained classifier
    is a bounded artifact by definition; a 100 TB vocab would swap the
    driver merge for ``final='ray'`` + a persisted model sink exactly
    as doc_tfidf documents) → the dense lp matrix broadcasts ONCE via
    ``ray.put`` → the scoring pass is one vectorized vocab lookup +
    segment-sum per batch. Returns a Dataset
    (``id_col``, pred_<label_col>, score_millionths).
    """
    import math

    import numpy as np
    import ray
    import ray.data as rd

    from fluent_server_ray.stages.aggregate import skip_empty

    pred_col = f"pred_{label_col}"
    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        pred_col: pa.array([], pa.string()),
        "score_millionths": pa.array([], pa.int64()),
    })

    ds = ds.materialize()  # two consumers: train pass + score pass

    def _flat(t: pa.Table):
        """(doc-local row index per token, per-row token counts, flat
        token array) — flat order groups by row in row order."""
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        return np.repeat(np.arange(len(toks)), lens), lens, flat

    def _is_train(col):
        m = pc.equal(
            pc.subtract(col, pc.multiply(pc.divide(col, holdout_mod),
                                         holdout_mod)),
            0)
        return pc.invert(m)

    def train_partial(t: pa.Table):
        t = t.filter(pc.and_(_is_train(t[id_col]),
                             pc.is_valid(t[label_col])))
        if not len(t):
            return
        labels = t[label_col].to_pylist()
        _, lens, flat = _flat(t)
        lab_of = np.repeat(np.asarray(labels, dtype=object), lens)
        tok = pa.table({
            "c": pa.array(lab_of, pa.string()),
            "term": pa.array(flat, pa.string()),
        })
        out = tok.group_by(["c", "term"]).aggregate([([], "count_all")])
        out = out.rename_columns(["c", "term", "n"])
        # sentinel: per-class doc counts ride the same partial (split()
        # never yields '' so the key space can't collide)
        dcnt = pa.table({"c": pa.array(labels, pa.string())}).group_by(
            ["c"]).aggregate([([], "count_all")])
        sent = pa.table({
            "c": dcnt["c"],
            "term": pa.array([""] * len(dcnt), pa.string()),
            "n": dcnt["count_all"],
        })
        yield pa.concat_tables([out, sent])

    parts = list(ds.map_batches(
        train_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return rd.from_arrow(empty)
    merged = pa.concat_tables(parts).group_by(["c", "term"]).aggregate(
        [("n", "sum")])
    is_sent = pc.equal(merged["term"], "")
    doc_tbl = merged.filter(is_sent)
    cw_tbl = merged.filter(pc.invert(is_sent))

    classes = sorted(doc_tbl["c"].to_pylist())
    docs_per = dict(zip(doc_tbl["c"].to_pylist(),
                        doc_tbl["n_sum"].to_pylist()))
    n_docs = sum(docs_per.values())
    prior_m = np.array(
        [math.floor(math.log(docs_per[c] / n_docs) * 1_000_000)
         for c in classes], dtype=np.int64)

    vocab = pa.array(sorted(set(cw_tbl["term"].to_pylist())), pa.string())
    V = len(vocab)
    C = len(classes)
    cidx = {c: i for i, c in enumerate(classes)}
    cnt = np.zeros((V, C), dtype=np.int64)
    if V:
        t_idx = pc.index_in(cw_tbl["term"],
                            value_set=vocab).to_numpy(
                                zero_copy_only=False).astype("int64")
        c_idx = np.fromiter((cidx[c] for c in cw_tbl["c"].to_pylist()),
                            dtype=np.int64, count=len(cw_tbl))
        cnt[t_idx, c_idx] = cw_tbl["n_sum"].to_numpy(
            zero_copy_only=False).astype("int64")
    n_c = cnt.sum(axis=0)  # per-class token totals fold out of cw
    lp_m = np.floor(np.log((cnt + 1.0) / (n_c + float(V))[None, :])
                    * 1_000_000).astype(np.int64)
    model_ref = ray.put((vocab, lp_m, np.array(classes, dtype=object),
                         prior_m))

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(_is_train(t[id_col])))
        if not len(t):
            return empty
        voc, lp, cls, prior = ray.get(model_ref)
        doc_loc, _, flat = _flat(t)
        scores = np.tile(prior, (len(t), 1))
        if len(flat) and len(voc):
            pos = pc.index_in(pa.array(flat, pa.string()), value_set=voc)
            # index_in yields nulls for OOV tokens — they are ignored
            mask = np.asarray(pos.is_valid())
            if mask.any():
                ti = np.asarray(
                    pos.fill_null(0).to_numpy(zero_copy_only=False)
                ).astype("int64")[mask]
                di = doc_loc[mask]
                np.add.at(scores, di, lp[ti])
        best = np.argmax(scores, axis=1)  # first max = smallest name
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            pred_col: pa.array(cls[best], pa.string()),
            "score_millionths": pa.array(
                scores[np.arange(len(best)), best], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def naive_bayes_classify_sql(table: str = "documents",
                             id_col: str = "doc_id",
                             label_col: str = "lang",
                             holdout_mod: int = 5) -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH train AS MATERIALIZED (
  SELECT {id_col}, {label_col} AS c, text FROM {table}
  WHERE {id_col} % {holdout_mod} <> 0 AND {label_col} IS NOT NULL
), hold AS (
  SELECT {id_col}, text FROM {table} WHERE {id_col} % {holdout_mod} = 0
), ttoks AS MATERIALIZED (
  SELECT c,
    unnest(list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM train
), cw AS (
  SELECT c, term, count(*) AS n FROM ttoks GROUP BY 1, 2
), vocab AS (
  SELECT DISTINCT term FROM ttoks
), nv AS (
  SELECT count(*) AS v FROM vocab
), ctot AS (
  SELECT c, count(*) AS n_c FROM ttoks GROUP BY 1
), cls AS (
  SELECT c, count(*) AS docs FROM train GROUP BY 1
), prior AS (
  SELECT c, CAST(floor(ln(CAST(docs AS DOUBLE)
      / (SELECT CAST(sum(docs) AS DOUBLE) FROM cls)) * 1000000)
    AS BIGINT) AS prior_m
  FROM cls
), lp AS MATERIALIZED (
  SELECT ctot.c, vocab.term,
    CAST(floor(ln(CAST(coalesce(cw.n, 0) + 1 AS DOUBLE)
        / CAST(ctot.n_c + nv.v AS DOUBLE)) * 1000000) AS BIGINT) AS lp_m
  FROM ctot CROSS JOIN vocab CROSS JOIN nv
  LEFT JOIN cw ON cw.c = ctot.c AND cw.term = vocab.term
), htoks AS (
  SELECT {id_col},
    unnest(list_filter(regexp_split_to_array(text, '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS term
  FROM hold
), hsum AS (
  SELECT h.{id_col}, lp.c, CAST(sum(lp.lp_m) AS BIGINT) AS s
  FROM htoks h JOIN lp ON lp.term = h.term
  GROUP BY 1, 2
), scored AS (
  SELECT hold.{id_col}, prior.c,
    prior.prior_m + coalesce(hsum.s, 0) AS score,
    row_number() OVER (PARTITION BY hold.{id_col}
      ORDER BY prior.prior_m + coalesce(hsum.s, 0) DESC, prior.c) AS rn
  FROM hold CROSS JOIN prior
  LEFT JOIN hsum ON hsum.{id_col} = hold.{id_col} AND hsum.c = prior.c
)
SELECT {id_col}, c AS pred_{label_col},
  CAST(score AS BIGINT) AS score_millionths
FROM scored WHERE rn = 1 ORDER BY {id_col}
""".strip()


# ------------------------------------------ soundex phonetic blocking

_SOUNDEX_FROM = "AEIOUYBFPVCGJKQSXZDTLMNR"
_SOUNDEX_TO = "000000111122222222334556"
_SOUNDEX_MAP = str.maketrans(_SOUNDEX_FROM, _SOUNDEX_TO)


def soundex(word: str) -> str:
    """American Soundex (NARA variant) of an ASCII-alpha word —
    deterministic chain shared verbatim with the SQL mirror:
    uppercase → drop H/W (they never separate equal codes) → map
    letters to digits (vowels→0) → collapse same-digit runs → drop the
    leading digit when it equals the first letter's code (merged with
    it) → drop 0s → first letter + first 3 digits zero-padded.
    Pinned on the classic quartet (Robert→R163, Ashcraft→A261,
    Tymczak→T522, Pfister→P236)."""
    import re as _re

    u = word.upper()
    first = u[0]
    codes = _re.sub(r"[HW]", "", u).translate(_SOUNDEX_MAP)
    collapsed = _re.sub(r"(.)\1+", r"\1", codes)
    fcode = first.translate(_SOUNDEX_MAP)
    if fcode and fcode in "0123456" and collapsed[:1] == fcode:
        collapsed = collapsed[1:]
    digits = collapsed.replace("0", "")
    return first + (digits + "000")[:3]


def phonetic_word_pairs(ds, text_col: str = "text",
                        min_count: int = 1,
                        max_bucket: int = 10_000) -> pa.Table:
    """Phonetic blocking pairs: all (word_a < word_b) pairs of DISTINCT
    ASCII-alpha corpus words sharing a Soundex code — the
    record-linkage blocking classic (names that "sound alike"), the
    phonetic sibling of the edit-distance and SymSpell candidates.

    Scale shape: tokens explode per batch into LOCAL distinct
    (word, count) partials, merge through the distributed groupby, and
    only the VOCABULARY (bounded, like doc_tfidf's idf map) reaches the
    driver, where the per-distinct-word Soundex loop and the in-code
    pairing run (factorize-then-scatter discipline: the digest loop is
    per distinct value, never per row). ``min_count`` gates rare words
    before pairing; a code bucket above ``max_bucket`` raises (an
    O(m²) blowup is a contract violation, not a slow answer). Words
    with any non-ASCII-alpha char are excluded (Soundex is defined on
    letters). Output: (code, word_a, word_b, n_a, n_b) sorted."""
    import re as _re

    from fluent_server_ray.stages.aggregate import grouped_agg

    from fluent_server_ray.stages.hygiene import _flat_tokens

    def words_partial(t: pa.Table):
        _, flat = _flat_tokens(t[text_col].to_pylist())
        if not len(flat):
            return
        tt = pa.table({"w": pa.array(flat, pa.string())})
        out = tt.group_by("w").aggregate([([], "count_all")])
        yield out.rename_columns(["w", "n"])

    from fluent_server_ray.stages.aggregate import skip_empty

    parts = ds.map_batches(words_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    tables = [b for b in parts.iter_batches(batch_size=None,
                                            batch_format="pyarrow")
              if b.num_rows]
    out_fields = [("code", pa.string()), ("word_a", pa.string()),
                  ("word_b", pa.string()), ("n_a", pa.int64()),
                  ("n_b", pa.int64())]
    if not tables:
        return pa.schema(out_fields).empty_table()
    vocab = pa.concat_tables(tables).group_by("w").aggregate(
        [("n", "sum")])
    alpha = _re.compile(r"^[A-Za-z]+$")
    rows = [(w, int(n)) for w, n in zip(vocab["w"].to_pylist(),
                                        vocab["n_sum"].to_pylist())
            if n >= min_count and alpha.match(w)]
    by_code: dict[str, list] = {}
    for w, n in rows:
        by_code.setdefault(soundex(w), []).append((w, n))
    out = {"code": [], "word_a": [], "word_b": [], "n_a": [], "n_b": []}
    for code in sorted(by_code):
        members = sorted(by_code[code])
        if len(members) > max_bucket:
            raise ValueError(
                f"phonetic_word_pairs: code {code!r} has "
                f"{len(members)} words (> max_bucket={max_bucket}) — "
                "gate with min_count or raise max_bucket explicitly")
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out["code"].append(code)
                out["word_a"].append(members[i][0])
                out["word_b"].append(members[j][0])
                out["n_a"].append(members[i][1])
                out["n_b"].append(members[j][1])
    return pa.table({
        "code": pa.array(out["code"], pa.string()),
        "word_a": pa.array(out["word_a"], pa.string()),
        "word_b": pa.array(out["word_b"], pa.string()),
        "n_a": pa.array(out["n_a"], pa.int64()),
        "n_b": pa.array(out["n_b"], pa.int64()),
    })


def _soundex_sql(col: str) -> str:
    """The engine's soundex chain as a SQL expression over ``col``
    (uppercased ASCII-alpha input). RE2 has no backreferences, so the
    same-digit run collapse is seven per-digit replaces (equivalent:
    runs are single-char)."""
    codes = (f"translate(regexp_replace(upper({col}), '[HW]', '', 'g'),"
             f" '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')")
    collapsed = codes
    for d in "0123456":
        collapsed = (f"regexp_replace({collapsed}, '{d}{{2,}}',"
                     f" '{d}', 'g')")
    first = f"substr(upper({col}), 1, 1)"
    fcode = f"translate({first}, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    body = (f"CASE WHEN {fcode} BETWEEN '0' AND '6'"
            f" AND substr({collapsed}, 1, 1) = {fcode}"
            f" THEN substr({collapsed}, 2) ELSE {collapsed} END")
    digits = f"replace({body}, '0', '')"
    return f"{first} || substr({digits} || '000', 1, 3)"


def phonetic_word_pairs_sql(table: str = "documents",
                            text_col: str = "text",
                            min_count: int = 1) -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH toks AS (
  SELECT
    unnest(list_filter(regexp_split_to_array({text_col},
                                             '{_PY_WHITESPACE_RE2}'),
                       x -> x <> '')) AS w
  FROM {table}
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks
  WHERE regexp_matches(w, '^[A-Za-z]+$')
  GROUP BY w HAVING count(*) >= {min_count}
), coded AS MATERIALIZED (
  SELECT w, n, {_soundex_sql('w')} AS code FROM vocab
)
SELECT a.code, a.w AS word_a, b.w AS word_b, a.n AS n_a, b.n AS n_b
FROM coded a JOIN coded b ON a.code = b.code AND a.w < b.w
ORDER BY 1, 2, 3
""".strip()


# ------------------------------------------- next-word suggestions

def next_word_topk(ds, top_m: int = 20, k: int = 3,
                   text_col: str = "text") -> pa.Table:
    """Bigram-LM next-word suggestions: for the ``top_m`` most
    frequent prefix words (ranked by their count in non-final
    positions — exactly the LM denominator), the top-``k`` following
    words by continuation count. The word-level sibling of the
    char-prefix ``autocomplete_topk`` and the lookup table a
    suggest-as-you-type service ships. Tokenization = single-space
    split (the ``string_split`` contract of :func:`bigram_top`).

    Shape: one pair-forming pass (flat token array joined against
    itself shifted by one, doc-boundary masked — O(tokens), no
    per-doc loop) → distributed (w1, w2) merge → prefix totals fold
    out of the merged pair table (no second corpus pass) → per-block
    partial top-m + driver merge picks the prefixes → the ≤
    ``top_m``·fanout suggestion rows collect driver-side (bounded by
    the prefix gate). Ranks tie-break (n DESC, w2 ASC); prefix rank
    ties (total DESC, w1 ASC). Output (w1, w2, n, rank)."""
    import numpy as np

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64),
                             nan=0.0).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        same_doc = pa.array(doc_of[:-1] == doc_of[1:])
        prep = pa.table({
            "w1": flat.slice(0, len(flat) - 1),
            "w2": flat.slice(1),
        }).filter(same_doc)
        if not len(prep):
            return empty
        out = prep.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return out.rename_columns(["w1", "w2", "n"])

    pairs = grouped_agg(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["w1", "w2"], [("n", "sum")], final="ray").materialize()

    out_fields = [("w1", pa.string()), ("w2", pa.string()),
                  ("n", pa.int64()), ("rank", pa.int64())]

    # prefix totals fold out of the pair table (combiner per block)
    totals = grouped_agg(pairs, ["w1"], [("n_sum", "sum")], final="ray")

    def topm_partial(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("n_sum_sum", "descending"), ("w1", "ascending")])
        return t.take(idx[:top_m])

    blocks = [b for b in totals.map_batches(
        skip_empty(topm_partial), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow")
        if b.num_rows]
    if not blocks:
        return pa.schema(out_fields).empty_table()
    merged = pa.concat_tables(blocks)
    idx = pc.sort_indices(merged, sort_keys=[
        ("n_sum_sum", "descending"), ("w1", "ascending")])
    prefixes = merged.take(idx[:top_m])["w1"].combine_chunks()

    import ray

    pref_ref = ray.put(prefixes)

    def gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["w1"], value_set=ray.get(pref_ref)))

    rows = [b for b in pairs.map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows]
    if not rows:
        return pa.schema(out_fields).empty_table()
    import pandas as pd

    df = pa.concat_tables(rows).to_pandas()
    df = df.rename(columns={"n_sum": "n"}).sort_values(
        ["w1", "n", "w2"], ascending=[True, False, True])
    df["rank"] = df.groupby("w1").cumcount() + 1
    df = df[df["rank"] <= k].reset_index(drop=True)
    return pa.table({
        "w1": pa.array(df["w1"], pa.string()),
        "w2": pa.array(df["w2"], pa.string()),
        "n": pa.array(df["n"].astype("int64"), pa.int64()),
        "rank": pa.array(df["rank"].astype("int64"), pa.int64()),
    })


def next_word_topk_sql(top_m: int = 20, k: int = 3,
                       table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {table} WHERE text IS NOT NULL
), bigrams AS MATERIALIZED (
  SELECT t[gs] AS w1, t[gs + 1] AS w2, CAST(count(*) AS BIGINT) AS n
  FROM toks CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS u(gs)
  GROUP BY 1, 2
), prefixes AS (
  SELECT w1 FROM bigrams GROUP BY w1
  ORDER BY sum(n) DESC, w1 LIMIT {top_m}
), ranked AS (
  SELECT b.w1, b.w2, b.n,
    row_number() OVER (PARTITION BY b.w1 ORDER BY b.n DESC, b.w2)
      AS rank
  FROM bigrams b JOIN prefixes p ON p.w1 = b.w1
)
SELECT w1, w2, n, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k} ORDER BY w1, rank
""".strip()


# ------------------------------------------------ gazetteer tagging

# Deterministic default dictionary over the corpus vocabulary. Terms
# are single whitespace tokens and must be DISJOINT across categories
# (a shared term would double-count; `gazetteer_tags` asserts this).
GAZETTEER: dict[str, tuple[str, ...]] = {
    "ops": ("join", "merge", "sort", "filter", "agg", "scan", "hash"),
    "objects": ("row", "column", "table", "batch", "stream", "vector",
                "window"),
    "qualifiers": ("big", "small", "fast", "slow"),
}


def gazetteer_tags(ds, gazetteer: dict[str, tuple[str, ...]] | None = None,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Dictionary-based tagging: per document, how many tokens hit each
    category of a broadcast term dictionary (gazetteer) — the classic
    multi-pattern annotation stage (PII term lists, topic lexicons,
    blocklists) a curation pipeline runs before gating.

    Output rows: (id, category, n_hits) for categories with ≥1 hit.

    Scale shape: the gazetteer is driver-small and ships inside the
    task closure as two Arrow arrays; tokenization, the term lookup
    (one ``index_in`` per batch) and the per-doc count are all batch-
    local — a document never spans batches, so the per-batch
    ``group_by`` is EXACT and the stage needs no shuffle at all."""
    gaz = GAZETTEER if gazetteer is None else gazetteer
    terms: list[str] = []
    cats: list[str] = []
    for cat in sorted(gaz):
        for w in gaz[cat]:
            terms.append(w)
            cats.append(cat)
    assert len(set(terms)) == len(terms), \
        "gazetteer terms must be disjoint across categories"
    term_arr = pa.array(terms, pa.string())
    cat_arr = pa.array(cats, pa.string())

    def tag(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        ids = pc.take(pc.cast(t[id_col], pa.int64()), parents)
        pos = pc.index_in(flat, value_set=term_arr)
        keep = pc.is_valid(pos)
        prep = pa.table({
            id_col: ids.filter(keep),
            "category": pc.take(cat_arr, pos.filter(keep)),
        })
        out = prep.group_by([id_col, "category"]).aggregate(
            [([], "count_all")])
        return pa.table({
            id_col: out[id_col],
            "category": out["category"],
            "n_hits": pc.cast(out["count_all"], pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True)


def gazetteer_tags_sql(gazetteer: dict[str, tuple[str, ...]] | None = None,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    gaz = GAZETTEER if gazetteer is None else gazetteer
    vals = ", ".join(f"('{w}', '{c}')" for c in sorted(gaz)
                     for w in gaz[c])
    return f"""
WITH terms(word, category) AS (VALUES {vals}),
tok AS (
  SELECT {id_col},
    unnest(list_filter(string_split({text_col}, ' '), x -> x <> ''))
      AS word
  FROM {table} WHERE {text_col} IS NOT NULL
)
SELECT {id_col}, category, CAST(count(*) AS BIGINT) AS n_hits
FROM tok JOIN terms USING (word)
GROUP BY 1, 2
ORDER BY {id_col}, category
""".strip()


_SENT_SPLIT_RE = r"[.!?]+[ \t\r\n]+"


def sentence_stats(ds, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Per-document sentence segmentation stats — the text-
    segmentation primitive under the shared split contract
    ``[.!?]+[ \\t\\r\\n]+`` (terminator run + whitespace; the final
    sentence keeps its punctuation; empty segments drop). Lengths are
    CHARACTERS (``len`` ≡ DuckDB ``length``).

    Embarrassingly parallel: one compiled-regex pass per batch, no
    exchange. NULL text rows are excluded by contract. Output per doc:
    (id, n_sentences, total_sentence_chars, max_sentence_chars,
    min_sentence_chars); a doc whose text is all terminators/space
    yields n_sentences = 0 with NULL max/min.
    """
    import re

    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty

    rx = re.compile(_SENT_SPLIT_RE)

    def stats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        ids = t[id_col]
        n, tot, mx, mn = [], [], [], []
        for v in t[text_col]:
            parts = [s for s in rx.split(v.as_py()) if s != ""]
            lens = [len(s) for s in parts]
            n.append(len(parts))
            tot.append(sum(lens))
            mx.append(max(lens) if lens else None)
            mn.append(min(lens) if lens else None)
        return pa.table({
            id_col: ids,
            "n_sentences": pa.array(n, pa.int64()),
            "total_sentence_chars": pa.array(tot, pa.int64()),
            "max_sentence_chars": pa.array(mx, pa.int64()),
            "min_sentence_chars": pa.array(mn, pa.int64()),
        })

    return ds.map_batches(skip_empty(stats), batch_format="pyarrow",
                          zero_copy_batch=True)


def sentence_stats_sql(id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents") -> str:
    return f"""
WITH segs AS (
  SELECT {id_col},
    list_filter(regexp_split_to_array({text_col},
                '{_SENT_SPLIT_RE}'), s -> s <> '') AS parts
  FROM {table} WHERE {text_col} IS NOT NULL
), lens AS (
  SELECT {id_col},
    list_transform(parts, s -> length(s)) AS ll
  FROM segs
)
SELECT {id_col},
  CAST(len(ll) AS BIGINT) AS n_sentences,
  CAST(COALESCE(list_sum(ll), 0) AS BIGINT)
    AS total_sentence_chars,
  CAST(list_max(ll) AS BIGINT) AS max_sentence_chars,
  CAST(list_min(ll) AS BIGINT) AS min_sentence_chars
FROM lens
""".strip()


def extractive_summary(ds, id_col: str = "doc_id",
                       text_col: str = "text"):
    """TF-IDF extractive summarization — per document, the single
    sentence with the highest corpus-distinctiveness mass (Luhn 1958
    ancestry): sentence score = Σ over its token OCCURRENCES of the
    corpus ``idf_millionths`` (same floored-millionth idf contract as
    :func:`doc_tfidf`); ties pick the EARLIEST sentence.

    Sentences come from the shared :data:`_SENT_SPLIT_RE` contract;
    tokens from python ``str.split()`` ≡ the mirror's Unicode-
    whitespace class. Sentences with zero tokens score 0 (kept);
    documents with zero sentences produce no row; NULL-text docs
    count toward N for idf but emit nothing.

    Shape: corpus materialized once; df pass identical to doc_tfidf
    (vocab-sized driver merge, broadcast via ``ray.put``); the score
    pass segments per (doc, sentence) with Arrow group_by + one pandas
    head(1) pick per batch — no cross-batch exchange (a doc's
    sentences live in its batch). Output: (id, n_sentences, best_idx
    1-based, best_score_millionths, best_sentence) as a Dataset.
    """
    import re

    import numpy as np
    import pandas as pd
    import ray

    from fluent_server_ray.stages.aggregate import skip_empty

    rx = re.compile(_SENT_SPLIT_RE)

    ds = ds.materialize()
    n_docs = ds.count()

    def df_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype("int64")
        toks = [(s or "").split() for s in t[text_col].to_pylist()]
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                           count=len(toks))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for w in toks:
            if w:
                flat[pos:pos + len(w)] = w
                pos += len(w)
        pairs = pa.table({"term": pa.array(flat, type=pa.string()),
                          "d": pa.array(np.repeat(ids, lens))})
        uniq = pairs.group_by(["term", "d"]).aggregate([])
        out = uniq.group_by("term").aggregate([([], "count_all")])
        return out.rename_columns(["term", "df"])

    tables = list(ds.map_batches(
        skip_empty(df_partial), batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    if not tables:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_sentences": pa.array([], pa.int64()),
            "best_idx": pa.array([], pa.int64()),
            "best_score_millionths": pa.array([], pa.int64()),
            "best_sentence": pa.array([], pa.string()),
        }))
    df_tbl = (pa.concat_tables(tables).group_by("term")
              .aggregate([("df", "sum")]))
    terms = df_tbl["term"].combine_chunks()
    df_np = (df_tbl["df_sum"].to_numpy(zero_copy_only=False)
             .astype("float64"))
    idf_m = np.floor(np.log(float(n_docs) / df_np)
                     * 1_000_000).astype("int64")
    idf_ref = ray.put((terms, pa.array(idf_m)))

    def pick(t: pa.Table) -> pa.Table:
        vocab, idf = ray.get(idf_ref)
        t = t.filter(pc.is_valid(t[text_col]))
        recs = []          # (doc, si, sentence)
        for d, txt in zip(
                t[id_col].to_numpy(zero_copy_only=False),
                t[text_col].to_pylist()):
            si = 0
            for s in rx.split(txt):
                if s != "":
                    si += 1
                    recs.append((int(d), si, s))
        if not recs:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_sentences": pa.array([], pa.int64()),
                "best_idx": pa.array([], pa.int64()),
                "best_score_millionths": pa.array([], pa.int64()),
                "best_sentence": pa.array([], pa.string()),
            })
        sf = pd.DataFrame(recs, columns=["d", "si", "s"])
        tok_rows = []      # (row_idx, term)
        for ridx, s in enumerate(sf["s"]):
            for w in s.split():
                tok_rows.append((ridx, w))
        if tok_rows:
            tt = pa.table({
                "r": pa.array([r for r, _ in tok_rows], pa.int64()),
                "term": pa.array([w for _, w in tok_rows],
                                 pa.string()),
            })
            idx = pc.index_in(tt["term"], value_set=vocab)
            w = pc.take(idf, idx)
            sc = (pa.table({"r": tt["r"], "w": w}).group_by("r")
                  .aggregate([("w", "sum")]).to_pandas()
                  .set_index("r")["w_sum"])
            # reindex fills MISSING rows; a sentence whose every
            # token misses the vocab (terminator-stripped forms)
            # arrives as NaN from the all-null Arrow sum — both mean
            # "no scored token", which the mirror COALESCEs to 0
            sf["score"] = (sc.reindex(range(len(sf)), fill_value=0)
                           .fillna(0).to_numpy())
        else:
            sf["score"] = 0
        sf["score"] = sf["score"].astype("int64")
        nsent = sf.groupby("d")["si"].max()
        best = (sf.sort_values(["d", "score", "si"],
                               ascending=[True, False, True],
                               kind="mergesort")
                .groupby("d", sort=True).head(1))
        return pa.table({
            id_col: pa.array(best["d"].to_numpy(), pa.int64()),
            "n_sentences": pa.array(
                nsent.loc[best["d"]].to_numpy(), pa.int64()),
            "best_idx": pa.array(best["si"].to_numpy(), pa.int64()),
            "best_score_millionths": pa.array(
                best["score"].to_numpy(), pa.int64()),
            "best_sentence": pa.array(best["s"], pa.string()),
        })

    return ds.map_batches(skip_empty(pick), batch_format="pyarrow",
                          zero_copy_batch=True)


def extractive_summary_sql(id_col: str = "doc_id",
                           text_col: str = "text",
                           table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
WITH docs AS (
  SELECT {id_col},
    list_filter(regexp_split_to_array({text_col},
                '{_SENT_SPLIT_RE}'), x -> x <> '') AS parts
  FROM {table} WHERE {text_col} IS NOT NULL
), sents AS (
  SELECT {id_col}, g.i AS si, parts[g.i] AS s
  FROM docs CROSS JOIN unnest(generate_series(1, len(parts)))
    AS g(i)
), toks AS (
  SELECT {id_col},
    unnest(list_filter(regexp_split_to_array({text_col},
                       '{_PY_WHITESPACE_RE2}'), x -> x <> '')) AS term
  FROM {table} WHERE {text_col} IS NOT NULL
), df AS (
  SELECT term, count(DISTINCT {id_col}) AS df FROM toks GROUP BY term
), n AS (SELECT count(*) AS n FROM {table}),
stoks AS (
  SELECT {id_col}, si,
    unnest(list_filter(regexp_split_to_array(s,
                       '{_PY_WHITESPACE_RE2}'), x -> x <> '')) AS term
  FROM sents
), sscore AS (
  SELECT st.{id_col}, st.si,
    CAST(sum(CAST(floor(ln(CAST(n.n AS DOUBLE) / df.df) * 1000000)
             AS BIGINT)) AS BIGINT) AS score
  FROM stoks st JOIN df USING (term) CROSS JOIN n
  GROUP BY 1, 2
), sagg AS (
  SELECT s.{id_col}, s.si, s.s,
    COALESCE(sc.score, 0) AS score
  FROM sents s LEFT JOIN sscore sc
    ON sc.{id_col} = s.{id_col} AND sc.si = s.si
), picked AS (
  SELECT *, row_number() OVER (PARTITION BY {id_col}
    ORDER BY score DESC, si) AS rn,
    count(*) OVER (PARTITION BY {id_col}) AS n_sentences
  FROM sagg
)
SELECT {id_col}, CAST(n_sentences AS BIGINT) AS n_sentences,
  CAST(si AS BIGINT) AS best_idx,
  CAST(score AS BIGINT) AS best_score_millionths,
  s AS best_sentence
FROM picked WHERE rn = 1
""".strip()


# explicit codepoint classes — PINNED (no \s/\w: python and RE2
# disagree on Unicode classes; these literal ASCII classes cannot)
_CLS_ALPHA = "[A-Za-z]"
_CLS_DIGIT = "[0-9]"
_CLS_SPACE = "[ \\t\\r\\n]"
_CLS_PUNCT = "[!-/:-@\\[-`{-~]"


def charset_profile(ds, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Per-document codepoint-class census — the charset/noise audit
    of a text-curation gate (mojibake, binary spill, non-Latin mixes):
    counts of ASCII letters, digits, whitespace, ASCII punctuation and
    OTHER codepoints, from the pinned literal classes above (never
    ``\\s``/``\\w`` — python and RE2 disagree on their Unicode
    extents; these ASCII classes are engine-proof).

    Lengths are CHARACTERS. Embarrassingly parallel, no exchange;
    NULL-text rows excluded. Output per doc: (id, n_chars, n_alpha,
    n_digit, n_space, n_punct, n_other).
    """
    import re

    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import skip_empty

    rxs = [re.compile(p) for p in (_CLS_ALPHA, _CLS_DIGIT,
                                   _CLS_SPACE, _CLS_PUNCT)]

    def stats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        cols = {"n_chars": [], "n_alpha": [], "n_digit": [],
                "n_space": [], "n_punct": []}
        for v in t[text_col].to_pylist():
            cols["n_chars"].append(len(v))
            for name, rx in zip(("n_alpha", "n_digit", "n_space",
                                 "n_punct"), rxs):
                cols[name].append(len(v) - len(rx.sub("", v)))
        out = {id_col: t[id_col]}
        out.update({k: pa.array(vv, pa.int64())
                    for k, vv in cols.items()})
        out["n_other"] = pa.array(
            [c - a - d - s - p for c, a, d, s, p in zip(
                cols["n_chars"], cols["n_alpha"], cols["n_digit"],
                cols["n_space"], cols["n_punct"])], pa.int64())
        return pa.table(out)

    return ds.map_batches(skip_empty(stats), batch_format="pyarrow",
                          zero_copy_batch=True)


def charset_profile_sql(id_col: str = "doc_id",
                        text_col: str = "text",
                        table: str = "documents") -> str:
    def cnt(cls):
        return (f"length({text_col}) - length(regexp_replace("
                f"{text_col}, '{cls}', '', 'g'))")

    return f"""
SELECT {id_col},
  CAST(length({text_col}) AS BIGINT) AS n_chars,
  CAST({cnt(_CLS_ALPHA)} AS BIGINT) AS n_alpha,
  CAST({cnt(_CLS_DIGIT)} AS BIGINT) AS n_digit,
  CAST({cnt(_CLS_SPACE)} AS BIGINT) AS n_space,
  CAST({cnt(_CLS_PUNCT)} AS BIGINT) AS n_punct,
  CAST(length({text_col}) - ({cnt(_CLS_ALPHA)}) - ({cnt(_CLS_DIGIT)})
    - ({cnt(_CLS_SPACE)}) - ({cnt(_CLS_PUNCT)}) AS BIGINT) AS n_other
FROM {table} WHERE {text_col} IS NOT NULL
""".strip()


def yules_k(ds, group_col: str = "source", text_col: str = "text"):
    """Yule's characteristic K per group (Yule 1944) — the lexical-
    richness constant built from the frequency-of-frequencies
    spectrum: ``K = 10⁴ · (Σ_m m²·V_m − N) / N²`` where ``V_m`` is the
    number of types occurring exactly m times and N the token count.
    Unlike type-token ratio it is length-invariant, which makes it the
    repetitiveness gate for mixed-length corpora.

    Exact contract: tokens are the single-space split (≡ mirror
    ``string_split``); the (group, term) counts merge DISTRIBUTED
    (vocab is unbounded — ``final='ray'``); the counts-of-counts
    collapse is a second bounded exchange; ``Σ m²·V_m`` and N are
    exact python ints and K is ONE float tree
    ``10000.0 · float(S − N) / (float(N) · float(N))``. NULL
    group/text rows excluded. Output: (group, n_tokens, n_types,
    s_m2vm, yules_k) sorted by group.
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[group_col]),
                       pc.is_valid(t[text_col]))
        t = t.filter(keep)
        toks = pc.split_pattern(t[text_col], " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype("int64")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        import numpy as np

        grp = t[group_col].take(
            pa.array(np.repeat(np.arange(len(t)), lens)))
        tbl = pa.table({"g": grp, "term": flat}).filter(
            pc.not_equal(flat, ""))
        out = tbl.group_by(["g", "term"]).aggregate([([],
                                                      "count_all")])
        return out.rename_columns(["g", "term", "c"])

    per_term = grouped_agg(
        ds.map_batches(skip_empty(pairs), batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["g", "term"], aggs=[("c", "sum")], final="ray")

    def cof(t: pa.Table) -> pa.Table:
        out = (t.select(["g", "c_sum"]).group_by(["g", "c_sum"])
               .aggregate([([], "count_all")]))
        return out.rename_columns(["g", "m", "vm"])

    hist = grouped_agg(
        per_term.map_batches(skip_empty(cof), batch_format="pyarrow",
                             zero_copy_batch=True),
        ["g", "m"], [("vm", "sum")], final="driver").to_pandas()

    rows = {"g": [], "n": [], "ty": [], "s": [], "k": []}
    for g, sub in hist.groupby("g", sort=True):
        m = sub["m"].astype("int64")
        vm = sub["vm_sum"].astype("int64")
        n = int((m * vm).sum())
        s = sum(int(mi) * int(mi) * int(vi)
                for mi, vi in zip(m, vm))
        rows["g"].append(g)
        rows["n"].append(n)
        rows["ty"].append(int(vm.sum()))
        rows["s"].append(s)
        rows["k"].append(10000.0 * float(s - n)
                         / (float(n) * float(n)) if n else None)
    return pa.table({
        group_col: pa.array(rows["g"], pa.string()),
        "n_tokens": pa.array(rows["n"], pa.int64()),
        "n_types": pa.array(rows["ty"], pa.int64()),
        "s_m2vm": pa.array(rows["s"], pa.int64()),
        "yules_k": pa.array(rows["k"], pa.float64()),
    })


def yules_k_sql(group_col: str = "source", text_col: str = "text",
                table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS g,
    unnest(list_filter(string_split({text_col}, ' '),
                       x -> x <> '')) AS term
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {text_col} IS NOT NULL
), tc AS (
  SELECT g, term, count(*) AS c FROM toks GROUP BY g, term
), hist AS (
  SELECT g, c AS m, count(*) AS vm FROM tc GROUP BY g, c
), agg AS (
  SELECT g, CAST(sum(m * vm) AS BIGINT) AS n,
    CAST(sum(vm) AS BIGINT) AS n_types,
    CAST(sum(CAST(m AS HUGEINT) * m * vm) AS BIGINT) AS s
  FROM hist GROUP BY g
)
SELECT g AS {group_col}, n AS n_tokens, n_types, s AS s_m2vm,
  CASE WHEN n > 0 THEN
    10000.0 * CAST(s - n AS DOUBLE)
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) END AS yules_k
FROM agg ORDER BY g
""".strip()


def kish_ess(ds, group_col: str = "source", text_col: str = "text"):
    """Kish effective sample size per group under length weighting
    (Kish 1965) — the survey-statistics diagnostic a data-mixing
    pipeline reads before trusting a token-weighted blend:
    ``ESS = (Σw)² / Σw²`` with w = the doc's whitespace token count.
    ESS ≪ n means a few long docs dominate the mixture.

    Exact contract: token counts are exact ints (single-space split ≡
    ``string_split``); Σw and the hi/lo-split Σw² merge exactly;
    ``ess = (float(S) / float(SS)) · float(S)`` — every int→double
    conversion stays under 2^63 (the S² form would hit DuckDB's
    HUGEINT→double double-rounding; see NOTES). Zero-token docs carry
    w = 0 (they dilute n but not the mass). NULL group/text rows
    excluded. Output: (group, n_docs, sum_w, sum_w2, ess) sorted by
    group.
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.features import _SS_SPLIT

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[group_col]),
                       pc.is_valid(t[text_col]))
        t = t.filter(keep)
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        # token count = list length minus empty segments per doc
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(t)), lens)
        n_empty = np.bincount(doc_of[empty], minlength=len(t)) \
            if len(doc_of) else np.zeros(len(t), np.int64)
        w = lens - n_empty.astype(np.int64)
        sq = w * w
        prep = pa.table({
            "g": t[group_col],
            "w": pa.array(w),
            "ss_hi": pa.array(sq // _SS_SPLIT),
            "ss_lo": pa.array(sq % _SS_SPLIT),
            "one": pa.array(np.ones(len(t), np.int64)),
        })
        out = prep.group_by(["g"]).aggregate(
            [("w", "sum"), ("ss_hi", "sum"), ("ss_lo", "sum"),
             ("one", "sum")])
        return out.rename_columns(["g", "w", "ss_hi", "ss_lo", "one"])

    agg = grouped_agg(
        ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g"], [("w", "sum"), ("ss_hi", "sum"), ("ss_lo", "sum"),
                ("one", "sum")], final="driver").to_pandas()

    out = {"g": [], "n": [], "s": [], "ss": [], "ess": []}
    for _, r in agg.sort_values("g").iterrows():
        s = int(r["w_sum"])
        ss = int(r["ss_hi_sum"]) * _SS_SPLIT + int(r["ss_lo_sum"])
        if ss >= 2 ** 63:
            raise ValueError("kish_ess: Σw² exceeds the exactly-"
                             "convertible range — rescale weights")
        out["g"].append(r["g"])
        out["n"].append(int(r["one_sum"]))
        out["s"].append(s)
        out["ss"].append(ss)
        out["ess"].append((float(s) / float(ss)) * float(s)
                          if ss else None)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "n_docs": pa.array(out["n"], pa.int64()),
        "sum_w": pa.array(out["s"], pa.int64()),
        "sum_w2": pa.array(out["ss"], pa.int64()),
        "ess": pa.array(out["ess"], pa.float64()),
    })


def kish_ess_sql(group_col: str = "source", text_col: str = "text",
                 table: str = "documents") -> str:
    return f"""
WITH w AS (
  SELECT {group_col} AS g,
    CAST(len(list_filter(string_split({text_col}, ' '),
                         x -> x <> '')) AS BIGINT) AS w
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {text_col} IS NOT NULL
), agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(w) AS BIGINT) AS sum_w,
    CAST(sum(CAST(w AS HUGEINT) * w) AS BIGINT) AS sum_w2
  FROM w GROUP BY g
)
SELECT g AS {group_col}, n_docs, sum_w, sum_w2,
  CASE WHEN sum_w2 != 0 THEN
    (CAST(sum_w AS DOUBLE) / CAST(sum_w2 AS DOUBLE))
    * CAST(sum_w AS DOUBLE) END AS ess
FROM agg ORDER BY g
""".strip()
