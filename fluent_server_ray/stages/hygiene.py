"""Corpus-hygiene stages: scrubbing, repetition filters, decontamination.

The hygiene passes every large-scale training-data pipeline runs before
training, expressed as vectorized Ray Data transforms with exact DuckDB
mirrors (shared pattern constants — the oracle cannot drift):

- **scrub** — sequential regex redaction (PII masking: emails / IPs /
  phone numbers; log pseudonymization: user ids, error codes). Pure
  per-row Arrow kernels (``replace_substring_regex``), zero shuffle.
  The reference never mutates record payloads (its handler stores them
  verbatim, ``mirror/mirror.go:26-39``); this is the record_transformer
  -style rewrite capability a fluentd-class pipeline adds on top.
- **ngram_repetition** — Gopher-style repetition quality signals over
  word n-grams (top-2-gram fraction, duplicate-3-gram fraction);
  boilerplate and spam score high and get gated out.
- **decontaminate** — benchmark n-gram overlap: any training document
  sharing a word k-gram with the held-out benchmark set is flagged.
  The benchmark shingle set is the pipeline's SMALL side: it broadcasts
  once via ``ray.put`` (a benchmark suite is KBs–MBs against a 100 TB
  corpus) and membership runs as one Arrow ``is_in`` per batch.

Tokenization parity: engine uses Python ``str.split()`` (Unicode
whitespace); the SQL mirrors reuse :data:`dedup._PY_WHITESPACE_RE2`,
the byte-exact RE2 enumeration of ``str.isspace()`` code points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, literal replacement) — applied IN ORDER; counts
# are taken on the text state before that pattern's own replacement.
# Patterns are RE2-valid in both Arrow and DuckDB (shared verbatim).
SCRUB_PII = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
)

# log pseudonymization: the structured fields the flagship transcripts
# actually carry (``user=<uid>`` from the msg template, ``ERR-<nnn>``
# codes) — masking user ids is the log-pipeline flavor of PII scrub.
SCRUB_LOG = (
    ("uid", r"user=[0-9]+", "user=<UID>"),
    ("err", r"ERR-[0-9]{3}", "ERR-<NNN>"),
)


def make_scrub_fn(patterns, id_cols: tuple[str, ...], text_col: str):
    def fn(t: pa.Table) -> pa.Table:
        text = t[text_col]
        cols = {c: t[c] for c in id_cols}
        for name, rx, rep in patterns:
            cols["n_" + name] = pc.cast(
                pc.count_substring_regex(text, rx), pa.int64()
            )
            text = pc.replace_substring_regex(text, rx, rep)
        cols[text_col + "_clean"] = text
        return pa.table(cols)

    return fn


def scrub(ds, patterns=SCRUB_PII, id_cols: tuple[str, ...] = ("doc_id",),
          text_col: str = "text"):
    """Sequential regex redaction. Output: id cols + ``n_<name>`` match
    counts (counted before that pattern's replacement — later patterns
    see earlier replacements, exactly like the nested SQL mirror) +
    ``<text_col>_clean``. Embarrassingly parallel, no shuffle."""
    return ds.map_batches(make_scrub_fn(patterns, id_cols, text_col),
                          batch_format="pyarrow", zero_copy_batch=True)


def scrub_expr_sql(patterns=SCRUB_PII, text_col: str = "text") -> str:
    """The nested ``regexp_replace`` SQL expression applying
    ``patterns`` in order — the composable mirror piece (used by
    :func:`scrub_sql` and by composite-pipeline oracles that scrub as
    their first stage)."""
    cur = text_col
    for _, rx, rep in patterns:
        rx_sql = rx.replace("'", "''")
        cur = f"regexp_replace({cur}, '{rx_sql}', '{rep}', 'g')"
    return cur


def scrub_sql(patterns=SCRUB_PII, id_cols: tuple[str, ...] = ("doc_id",),
              text_col: str = "text", table: str = "documents") -> str:
    exprs = []
    cur = text_col
    for name, rx, rep in patterns:
        rx_sql = rx.replace("'", "''")
        exprs.append(
            f"CAST(len(regexp_extract_all({cur}, '{rx_sql}')) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{rx_sql}', '{rep}', 'g')"
    cols = ", ".join(id_cols)
    return (
        f"SELECT {cols}, {', '.join(exprs)}, {cur} AS {text_col}_clean"
        f" FROM {table}"
    )


# ------------------------------------------------ token-flattening

def _flat_tokens(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """(local_doc_index_per_token, flat object array of tokens) for a
    batch — the shared shape of every token-level kernel here (cf. the
    identical helper inside ``textstats.doc_tfidf``)."""
    toks = [(s or "").split() for s in texts]
    lens = np.fromiter((len(w) for w in toks), dtype=np.int64,
                       count=len(toks))
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in toks:
        if w:
            flat[pos:pos + len(w)] = w
            pos += len(w)
    return np.repeat(np.arange(len(toks), dtype=np.int64), lens), flat


def _gram_strings(doc_of: np.ndarray, flat: np.ndarray, k: int):
    """All within-document word k-gram strings of a flattened batch:
    object-array elementwise concat (C loop over str +), with positions
    whose window crosses a document boundary masked out. Returns
    (doc_index_per_gram, gram string array); docs with < k tokens
    contribute nothing (no fallback — a hygiene gram is k words)."""
    total = len(flat)
    if total < k:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    g = flat[: total - k + 1]
    for j in range(1, k):
        g = g + " "
        g = g + flat[j: total - k + 1 + j]
    valid = doc_of[: total - k + 1] == doc_of[k - 1:]
    return doc_of[: total - k + 1][valid], g[valid]


# ------------------------------------------------ n-gram repetition

def ngram_repetition_batch(t: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document:

    - ``top2_frac``  = occurrences of the most frequent word 2-gram
      over total 2-gram occurrences (boilerplate headers/footers and
      keyword spam push this up);
    - ``dup3_frac``  = fraction of 3-gram occurrences that are repeats
      (1 − distinct/total).

    One Arrow ``group_by`` over (doc, gram) per order — vectorized for
    the whole batch; per-doc aggregates are a second tiny ``group_by``.
    Docs with < k tokens report zero counts (ratio denominators are
    ``max(n, 1)``)."""
    ids = t["doc_id"]
    doc_of, flat = _flat_tokens(t["text"].to_pylist())
    n = len(t)
    n2 = np.zeros(n, dtype=np.int64)
    top2 = np.zeros(n, dtype=np.int64)
    n3 = np.zeros(n, dtype=np.int64)
    d3 = np.zeros(n, dtype=np.int64)
    for k, (tot, best, dist) in ((2, (n2, top2, None)),
                                 (3, (n3, None, d3))):
        d_of, grams = _gram_strings(doc_of, flat, k)
        if not len(grams):
            continue
        gc = pa.table(
            {"d": pa.array(d_of), "g": pa.array(grams, type=pa.string())}
        ).group_by(["d", "g"]).aggregate([([], "count_all")])
        per_doc = gc.group_by("d").aggregate(
            [("count_all", "sum"), ("count_all", "max"), ([], "count_all")]
        )
        di = per_doc["d"].to_numpy()
        tot[di] = per_doc["count_all_sum"].to_numpy()
        if best is not None:
            best[di] = per_doc["count_all_max"].to_numpy()
        if dist is not None:
            dist[di] = per_doc["count_all"].to_numpy()  # the count_all of
            # the SECOND group_by = number of distinct grams per doc
    return pa.table(
        {
            "doc_id": ids,
            "n_2grams": pa.array(n2),
            "top2_count": pa.array(top2),
            "top2_frac": pa.array(top2 / np.maximum(n2, 1)),
            "n_3grams": pa.array(n3),
            "dup3_frac": pa.array((n3 - d3) / np.maximum(n3, 1)),
        }
    )


def _toks_cte(table: str) -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return (
        f"SELECT doc_id, list_filter(regexp_split_to_array(text,"
        f" '{_PY_WHITESPACE_RE2}'), x -> x <> '') AS w FROM {table}"
    )


def _gram_list_sql(k: int) -> str:
    """DuckDB list expression for word k-grams of token list ``w``
    (1-based slicing; empty for < k tokens — mirrors _gram_strings)."""
    join = " || ' ' || ".join(
        f"w[i + {j}]" if j else "w[i]" for j in range(k)
    )
    return (
        f"CASE WHEN len(w) < {k} THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(1, len(w) - {k - 2}), i -> {join}) END"
    )


def ngram_repetition_sql(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  {_toks_cte(table)}
), g2 AS (
  SELECT doc_id, unnest({_gram_list_sql(2)}) AS g FROM toks
), c2 AS (
  SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
), a2 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
         CAST(max(c) AS BIGINT) AS top2 FROM c2 GROUP BY doc_id
), g3 AS (
  SELECT doc_id, unnest({_gram_list_sql(3)}) AS g FROM toks
), c3 AS (
  SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g
), a3 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3,
         CAST(count(*) AS BIGINT) AS d3 FROM c3 GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(a2.n2, 0) AS n_2grams,
  COALESCE(a2.top2, 0) AS top2_count,
  CAST(COALESCE(a2.top2, 0) AS DOUBLE)
    / GREATEST(COALESCE(a2.n2, 0), 1) AS top2_frac,
  COALESCE(a3.n3, 0) AS n_3grams,
  CAST(COALESCE(a3.n3, 0) - COALESCE(a3.d3, 0) AS DOUBLE)
    / GREATEST(COALESCE(a3.n3, 0), 1) AS dup3_frac
FROM {table} d LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
""".strip()


# ------------------------------------------------ decontamination

BENCH_MOD = 29  # doc_id % BENCH_MOD == 0 marks the held-out benchmark


def decontaminate(ds, k: int = 3, bench_mod: int = BENCH_MOD):
    """Benchmark n-gram decontamination: flag every training document
    (``doc_id % bench_mod != 0``) sharing any word ``k``-gram with the
    benchmark slice (``== 0``). Output: (doc_id, contaminated) for the
    training docs, in input order.

    Scale shape: the benchmark gram set is collected once (distinct
    per batch → driver union — a benchmark suite is the small side by
    definition; for a corpus-sized "bench" use the bucketed-join path
    of :func:`dedup.ngram_jaccard_dupes` instead), broadcast via
    ``ray.put``, and each batch runs ONE vectorized ``is_in`` over its
    flattened gram array. The corpus streams; nothing corpus-sized
    ever reaches the driver."""
    import ray

    ds = ds.materialize()  # consumed twice (bench pass + flag pass)

    def _is_bench(ids):
        m = pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, bench_mod),
                                         bench_mod)),
            0,
        )
        return m

    def bench_grams(t: pa.Table):
        t = t.filter(_is_bench(t["doc_id"]))
        if not len(t):
            return
        _, grams = _gram_strings(*_flat_tokens(t["text"].to_pylist()), k)
        if len(grams):
            yield pa.table(
                {"g": pa.array(np.unique(grams), type=pa.string())}
            )

    parts = ds.map_batches(bench_grams, batch_format="pyarrow",
                           zero_copy_batch=True)
    bench: set = set()
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        bench.update(b["g"].to_pylist())
    bench_ref = ray.put(pa.array(sorted(bench), type=pa.string()))

    def flag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(_is_bench(t["doc_id"])))
        out_flag = np.zeros(len(t), dtype=bool)
        if len(t):
            d_of, grams = _gram_strings(
                *_flat_tokens(t["text"].to_pylist()), k
            )
            if len(grams):
                vs = ray.get(bench_ref)
                hit = pc.is_in(pa.array(grams, type=pa.string()),
                               value_set=vs).to_numpy(zero_copy_only=False)
                np.logical_or.at(out_flag, d_of, hit)
        return pa.table(
            {"doc_id": t["doc_id"], "contaminated": pa.array(out_flag)}
        )

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate_sql(k: int = 3, bench_mod: int = BENCH_MOD,
                      table: str = "documents") -> str:
    return f"""
WITH toks AS (
  {_toks_cte(table)}
), sh AS (
  SELECT doc_id, {_gram_list_sql(k)} AS s FROM toks
), bench AS (
  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {bench_mod} = 0
), benchlist AS (
  SELECT COALESCE(list(g), CAST([] AS VARCHAR[])) AS bl FROM bench
)
SELECT doc_id, len(list_intersect(s, bl)) > 0 AS contaminated
FROM sh CROSS JOIN benchlist WHERE doc_id % {bench_mod} <> 0
""".strip()


# ------------------------------------------------ text normalization

def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Canonical text normalization — the pre-dedup cleanup pass that
    makes trivially-different copies (case, spacing, stray control
    bytes) collide in downstream exact/near dedup:

        1. strip NON-whitespace control chars (C0 minus \\t \\n \\v
           \\f \\r, plus DEL) — whitespace controls survive into step
           2 and become spaces, never glue words together
        2. collapse every Unicode-whitespace run to one space
           (``dedup._PY_WHITESPACE_RE2`` — the byte-exact RE2 class for
           Python ``str.isspace()``)
        3. trim leading/trailing spaces
        4. lowercase (Unicode simple case-folding — Arrow
           ``utf8_lower`` and DuckDB ``lower()`` agree, pinned in
           tests incl. non-ASCII)

    Pure per-row Arrow kernels, zero shuffle; NULL text stays NULL.
    Output: (id, text_norm)."""
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    def fn(t: pa.Table) -> pa.Table:
        text = t[text_col]
        text = pc.replace_substring_regex(
            text, r"[\x00-\x08\x0E-\x1B\x7F]", "")
        text = pc.replace_substring_regex(text, _PY_WHITESPACE_RE2, " ")
        text = pc.utf8_trim(text, " ")
        text = pc.utf8_lower(text)
        return pa.table({id_col: t[id_col], "text_norm": text})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text_sql(id_col: str = "doc_id", text_col: str = "text",
                       table: str = "documents") -> str:
    from fluent_server_ray.stages.dedup import _PY_WHITESPACE_RE2

    return f"""
SELECT {id_col},
  lower(trim(regexp_replace(regexp_replace({text_col},
    '[\\x00-\\x08\\x0E-\\x1B\\x7F]', '', 'g'),
    '{_PY_WHITESPACE_RE2}', ' ', 'g'), ' ')) AS text_norm
FROM {table}
""".strip()


# ------------------------------------------- corpus-level line dedup

def line_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
               min_count: int = 2):
    """Bulk LINE-level deduplication (the RefinedWeb/C4 pre-training
    staple, distinct from document dedup): every line whose exact text
    occurs at least ``min_count`` times across the WHOLE corpus
    (counted with multiplicity) is removed from every document —
    navigation bars, cookie banners, and (in transcript corpora)
    repeated assistant boilerplate vanish while unique content stays.

    Scale shape: (1) per-batch line-count combiner (ONE Arrow
    ``split_pattern`` + ``group_by`` per batch, so the shuffle carries
    ~|distinct lines per block| rows, not lines); (2)
    :func:`aggregate.grouped_agg(final='ray')` merges partials in a
    distributed groupby — the full line-frequency table never exists
    in one place; (3) only lines AT/ABOVE the threshold (the
    boilerplate set — corpus-sublinear by construction; an adversarial
    all-duplicate corpus would need the bucketed anti-join of
    :func:`dedup.build_text_index` instead) come back to the driver
    and broadcast once via ``ray.put``; (4) each batch masks + rejoins
    with one vectorized pass (``is_in`` → filter → ``binary_join``).

    NULL text is treated as '' (one empty line, like the SQL mirror's
    COALESCE). Docs whose every line was boilerplate keep their row
    with ``text = ''``. Output: (id, text, n_lines, n_removed), input
    row order preserved.
    """
    import ray

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    ds = ds.materialize()  # consumed twice: count pass + clean pass

    def count_partial(t: pa.Table) -> pa.Table:
        lines = pc.split_pattern(pc.fill_null(t[text_col], ""), "\n")
        flat = pc.list_flatten(lines)
        out = pa.table({"line": flat}).group_by("line").aggregate(
            [([], "count_all")])
        return out.rename_columns(["line", "n"])

    parts = ds.map_batches(skip_empty(count_partial), batch_format="pyarrow",
                           zero_copy_batch=True)
    freq = grouped_agg(parts, ["line"], [("n", "sum")], final="ray")

    def over_threshold(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["n_sum"], pa.scalar(int(min_count)))
        ).select(["line"])

    dup_tbls = list(
        freq.map_batches(skip_empty(over_threshold), batch_format="pyarrow",
                         zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    dup_lines = (
        pa.concat_tables(dup_tbls)["line"].combine_chunks()
        if dup_tbls else pa.array([], type=pa.string())
    )
    dup_ref = ray.put(dup_lines)

    def clean(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.fill_null(t[text_col], ""), "\n")
        lists = lists.combine_chunks() if isinstance(
            lists, pa.ChunkedArray) else lists
        flat = pc.list_flatten(lists)
        keep = pc.invert(pc.is_in(flat, value_set=ray.get(dup_ref)))
        keep_np = keep.to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype("int64")
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        new_lens = np.bincount(
            doc_of[keep_np], minlength=len(lens)).astype("int64")
        offsets = np.concatenate([[0], np.cumsum(new_lens)]).astype("int32")
        kept = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), flat.filter(keep))
        return pa.table({
            id_col: t[id_col],
            text_col: pc.binary_join(kept, "\n"),
            "n_lines": pa.array(lens),
            "n_removed": pa.array(lens - new_lens),
        })

    return ds.map_batches(clean, batch_format="pyarrow",
                          zero_copy_batch=True)


def line_dedup_sql(docs_cte: str, id_col: str, text_col: str,
                   min_count: int = 2) -> str:
    """Mirror over a caller-supplied ``docs`` CTE body (must yield
    ``(id_col, text_col)``): split → corpus line frequency → anti-join
    kept lines → positional re-join, all-removed docs COALESCE to ''."""
    return f"""
WITH docs AS ({docs_cte}),
split AS (
  SELECT {id_col}, string_split(COALESCE({text_col}, ''), chr(10)) AS ls
  FROM docs
), lines AS (
  SELECT {id_col}, gs AS pos, ls[gs] AS line
  FROM split CROSS JOIN unnest(generate_series(1, len(ls))) AS u(gs)
), freq AS (
  SELECT line FROM lines GROUP BY line HAVING count(*) >= {int(min_count)}
), kept AS (
  SELECT l.{id_col}, l.pos, l.line
  FROM lines l ANTI JOIN freq f ON l.line = f.line
), agg AS (
  SELECT {id_col}, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY {id_col}
), tot AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_lines
  FROM lines GROUP BY {id_col}
)
SELECT t.{id_col}, COALESCE(a.text, '') AS {text_col}, t.n_lines,
       CAST(t.n_lines - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
FROM tot t LEFT JOIN agg a USING ({id_col})
ORDER BY t.{id_col}
""".strip()


# -------------------------------- cross-corpus duplicated-gram signal

def dup_ngram_fraction(ds, k: int = 3, min_df: int = 2,
                       n_buckets: int = 64):
    """Per-document DUPLICATED-n-gram fraction — the cross-corpus
    boilerplate signal of the RefinedWeb/Dolma quality suite: what
    fraction of a document's word ``k``-gram occurrences belong to
    grams appearing in at least ``min_df`` distinct documents
    corpus-wide. High fraction ⇒ the doc is mostly shared boilerplate
    even when no single document duplicates it (the signal
    :func:`ngram_repetition` — within-doc — cannot see).

    Scale shape, no broadcast anywhere (the duplicated-gram set is
    corpus-scale, unlike :func:`decontaminate`'s benchmark set):
    per-batch (doc, gram) COUNT combiner (docs never straddle blocks,
    so per-doc totals and document frequency partials are both exact
    map-side); gram df merges through ``grouped_agg(final='ray')``;
    occurrences join the ``df >= min_df`` grams with ONE bucketed hash
    join on the gram; per-doc dup counts merge distributed; one final
    doc_id-bucketed LEFT join attaches totals. Output: (doc_id,
    n_grams, n_dup, dup_frac) for docs with >= k tokens, sorted by
    doc_id; ``dup_frac`` is one float64 division.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.joins import bucketed_hash_join

    def occ_partial(t: pa.Table):
        d_of, grams = _gram_strings(*_flat_tokens(t["text"].to_pylist()), k)
        if not len(grams):
            return
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        out = pa.table({
            "doc_id": pa.array(ids[d_of]),
            "gram": pa.array(grams, type=pa.string()),
        }).group_by(["doc_id", "gram"]).aggregate([([], "count_all")])
        yield out.rename_columns(["doc_id", "gram", "cnt"])

    occ = ds.map_batches(occ_partial, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    def tot_partial(t: pa.Table) -> pa.Table:
        out = t.group_by("doc_id").aggregate([("cnt", "sum")])
        return out.rename_columns(["doc_id", "n_grams"])

    totals = occ.map_batches(skip_empty(tot_partial), batch_format="pyarrow",
                             zero_copy_batch=True)

    # occ rows ARE distinct (doc, gram) pairs → df partial = per-batch
    # gram count; distributed merge handles unbounded gram cardinality
    def df_partial(t: pa.Table) -> pa.Table:
        out = t.group_by("gram").aggregate([([], "count_all")])
        return out.rename_columns(["gram", "df"])

    df_parts = occ.map_batches(skip_empty(df_partial),
                               batch_format="pyarrow", zero_copy_batch=True)
    df = grouped_agg(df_parts, ["gram"], [("df", "sum")], final="ray")

    def dup_only(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["df_sum"], pa.scalar(int(min_df)))
        ).select(["gram"])

    from fluent_server_ray.stages.aggregate import skip_empty as _se

    dup_grams = df.map_batches(_se(dup_only), batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    if dup_grams.count() == 0:
        def all_zero(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t["doc_id"],
                "n_grams": t["n_grams"],
                "n_dup": pa.array(np.zeros(len(t), dtype=np.int64)),
                "dup_frac": pa.array(np.zeros(len(t), dtype=np.float64)),
            })

        return totals.map_batches(all_zero, batch_format="pyarrow",
                                  zero_copy_batch=True).sort("doc_id")

    dup_occ = bucketed_hash_join(occ, dup_grams, key="gram",
                                 n_buckets=n_buckets, how="inner")
    n_dup = grouped_agg(dup_occ.select_columns(["doc_id", "cnt"]),
                        ["doc_id"], [("cnt", "sum")], final="ray")

    def rename_dup(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "n_dup"])

    n_dup = n_dup.map_batches(_se(rename_dup), batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = bucketed_hash_join(totals, n_dup, key="doc_id",
                                n_buckets=n_buckets, how="left")

    def finish(t: pa.Table) -> pa.Table:
        nd = pc.cast(pc.fill_null(t["n_dup"], 0), pa.int64())
        frac = pc.divide(pc.cast(nd, pa.float64()),
                         pc.cast(t["n_grams"], pa.float64()))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": t["n_grams"],
            "n_dup": nd,
            "dup_frac": frac,
        })

    return joined.map_batches(_se(finish), batch_format="pyarrow",
                              zero_copy_batch=True).sort("doc_id")


def dup_ngram_fraction_sql(k: int = 3, min_df: int = 2,
                           table: str = "documents") -> str:
    return f"""
WITH toks AS (
  {_toks_cte(table)}
), grams AS (
  SELECT doc_id, unnest({_gram_list_sql(k)}) AS gram FROM toks
), occ AS (
  SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram
), df AS (
  SELECT gram, count(*) AS df FROM occ GROUP BY gram
), tot AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams
  FROM occ GROUP BY doc_id
), dup AS (
  SELECT o.doc_id, CAST(sum(o.cnt) AS BIGINT) AS n_dup
  FROM occ o JOIN df USING (gram)
  WHERE df.df >= {int(min_df)}
  GROUP BY o.doc_id
)
SELECT t.doc_id, t.n_grams,
  COALESCE(d.n_dup, 0) AS n_dup,
  CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
    AS dup_frac
FROM tot t LEFT JOIN dup d USING (doc_id)
ORDER BY t.doc_id
""".strip()


# ------------------------------- per-language stratified quality gate

LANG_MIN_TOKENS = {"en": 30, "de": 25, "fr": 25, "es": 25, "zh": 10}
LANG_MIN_DEFAULT = 15


def gate_per_language(ds, thresholds: dict | None = None,
                      default: int = LANG_MIN_DEFAULT,
                      id_col: str = "doc_id", text_col: str = "text",
                      lang_col: str = "lang"):
    """Per-language minimum-length gate — multilingual curation never
    uses ONE threshold (a 10-token Chinese doc carries the content of
    a 30-token English one): each language gets its own min-token bar,
    unknown languages the default.

    Pure map stage: the threshold table broadcasts in the task closure
    (a dozen entries — closure shipping is fine at this size; compare
    ``enrich.range_lookup`` for the million-entry pattern), token
    counts are the Arrow regex kernel of ``textstats.token_count_batch``,
    and the keep decision is one vectorized take+compare. Output:
    (id, lang, n_tokens) of survivors. NULL lang → default; NULL text
    → 0 tokens (gated out unless the bar is 0)."""
    thresholds = dict(LANG_MIN_TOKENS if thresholds is None else thresholds)
    langs = sorted(thresholds)
    lang_arr = pa.array(langs, type=pa.string())
    thr_arr = pa.array([thresholds[l] for l in langs], type=pa.int64())

    def fn(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(pc.fill_null(t[text_col], ""),
                                     "[^ ]+"),
            pa.int64())
        idx = pc.index_in(t[lang_col], lang_arr)
        thr = pc.fill_null(pc.take(thr_arr, idx), default)
        out = pa.table({id_col: t[id_col], lang_col: t[lang_col],
                        "n_tokens": n})
        return out.filter(pc.greater_equal(n, thr))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def gate_per_language_sql(thresholds: dict | None = None,
                          default: int = LANG_MIN_DEFAULT,
                          id_col: str = "doc_id", text_col: str = "text",
                          lang_col: str = "lang",
                          table: str = "documents") -> str:
    thresholds = dict(LANG_MIN_TOKENS if thresholds is None else thresholds)
    cases = " ".join(f"WHEN '{l}' THEN {t}"
                     for l, t in sorted(thresholds.items()))
    return f"""
SELECT {id_col}, {lang_col},
  CAST(len(regexp_extract_all(COALESCE({text_col}, ''), '[^ ]+'))
       AS BIGINT) AS n_tokens
FROM {table}
WHERE CAST(len(regexp_extract_all(COALESCE({text_col}, ''), '[^ ]+'))
           AS BIGINT)
      >= (CASE {lang_col} {cases} ELSE {default} END)
""".strip()


def pseudonymize(ds, cols: tuple[str, ...] = ("conv_id",),
                 salt: str = "fsr", keep: int = 16):
    """Salted-hash pseudonymization of identifier columns (the
    fluent-plugin-anonymizer shape; GDPR-style pseudonymization for
    training corpora): each value is replaced by the first ``keep``
    hex chars of ``sha256(salt ∥ ':' ∥ value)``. Same value → same
    pseudonym, so joins/groupbys/dedup keyed on the column still work;
    the original is unrecoverable without the salt. NULL stays NULL.

    Vectorized via factorize-then-scatter: each DISTINCT value is
    hashed ONCE per batch (identifier columns are low-distinct per
    block — the digest loop is vocabulary-sized, not row-sized), then
    broadcast back through the inverse codes. Non-string columns hash
    their string form (mirror: ``CAST(col AS VARCHAR)``).
    Embarrassingly parallel, no shuffle.
    """
    import hashlib

    import pandas as pd_

    cols = tuple(cols)

    def fn(t: pa.Table) -> pa.Table:
        for col in cols:
            s = pc.cast(t[col], pa.string())
            codes, uniques = pd_.factorize(
                np.asarray(s.to_pylist(), dtype=object))
            hashed = np.array(
                [hashlib.sha256(f"{salt}:{u}".encode("utf-8"))
                 .hexdigest()[:keep] for u in uniques],
                dtype=object,
            )
            # np.where evaluates both branches eagerly — with an
            # all-NULL column uniques is empty and hashed[...] would
            # IndexError, so scatter through a mask instead.
            out = np.full(len(codes), None, dtype=object)
            mask = codes >= 0
            out[mask] = hashed[codes[mask]]
            t = t.set_column(t.column_names.index(col), col,
                             pa.array(out, type=pa.string()))
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pseudonymize_expr_sql(col: str, salt: str = "fsr",
                          keep: int = 16) -> str:
    """The per-column expression mirroring :func:`pseudonymize`
    (DuckDB sha256 == hashlib sha256 hex; NULL propagates through
    the concatenation)."""
    return (f"substr(sha256('{salt}' || ':' || CAST({col} AS VARCHAR)),"
            f" 1, {int(keep)})")


def split_leakage(ds, id_col: str = "doc_id",
                  text_col: str = "text", n_buckets: int = 64) -> pa.Table:
    """Train/val/test leakage audit under the corpus's own md5 split
    rule (:func:`~fluent_server_ray.stages.assembly.split_of`): for
    every split, how many DISTINCT texts it holds and how many of
    those also appear in ANOTHER split — the eval-integrity check a
    training pipeline must pass before results mean anything (a
    duplicated doc whose copies hash into different splits leaks eval
    content into train).

    Shape: per batch md5 + split label, batch-local distinct
    (fp, split) combiner → ONE digest-bucket exchange (all copies of a
    text co-locate, so cross-split membership is decided entirely
    inside a bucket) → per-bucket per-split (n_texts, n_leaked)
    partials → bounded driver merge (≤ 3 × buckets rows). Output:
    pa.Table (split, n_texts, n_leaked), sorted by split.
    """
    import hashlib

    import pandas as pd

    from fluent_server_ray.stages.aggregate import (hash_bucket_array,
                                                    skip_empty)
    from fluent_server_ray.stages.assembly import split_of

    def fp(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        fps = pa.array([hashlib.md5((s or "").encode("utf-8")).hexdigest()
                        for s in texts], type=pa.string())
        base = pa.table({"_fp": fps, "split": split_of(t[id_col])})
        uniq = base.group_by(["_fp", "split"]).aggregate([])
        return uniq.append_column(
            "_b", pa.array(hash_bucket_array(uniq["_fp"], n_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["_fp", "split"])
        k = d.groupby("_fp")["split"].transform("size")
        out = (d.assign(_leak=(k > 1).astype("int64"))
               .groupby("split", sort=False)
               .agg(n=("_fp", "size"), leaked=("_leak", "sum"))
               .reset_index())
        return out[["split", "n", "leaked"]]

    parts = (
        ds.map_batches(skip_empty(fp), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )
    tables = list(parts.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
    empty = pa.table({
        "split": pa.array([], type=pa.string()),
        "n_texts": pa.array([], type=pa.int64()),
        "n_leaked": pa.array([], type=pa.int64()),
    })
    if not tables:
        return empty
    merged = pa.concat_tables(tables)
    if merged.num_rows == 0:
        return empty
    out = (merged.group_by("split")
           .aggregate([("n", "sum"), ("leaked", "sum")])
           .rename_columns(["split", "n_texts", "n_leaked"]))
    return out.sort_by("split")


def split_leakage_sql(id_col: str = "doc_id", text_col: str = "text",
                      table: str = "documents") -> str:
    from fluent_server_ray.stages.assembly import split_case_sql

    return f"""
WITH h AS (
  SELECT md5(COALESCE(CAST({text_col} AS VARCHAR), '')) AS fp,
    {split_case_sql(id_col)} AS split
  FROM {table}
), d AS (
  SELECT DISTINCT fp, split FROM h
), c AS (
  SELECT fp, count(*) AS k FROM d GROUP BY fp
)
SELECT d.split, count(*) AS n_texts,
  CAST(sum(CASE WHEN c.k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
FROM d JOIN c USING (fp)
GROUP BY d.split ORDER BY d.split
""".strip()


def collapse_repeat_tokens(ds, id_col: str = "doc_id",
                           text_col: str = "text"):
    """Consecutive-duplicate-token collapse ("the the cat" → "the
    cat") — the stutter-cleanup pass OCR/ASR/scrape corpora need
    before token statistics (repetition inflates counts and poisons
    n-gram models; the dup_ngram_fraction op MEASURES it, this one
    REMOVES it).

    Pure per-batch Arrow kernels, no shuffle, no Python row loop:
    split → flat token array with doc ownership → one vectorized
    equal-to-previous mask (guarded at doc boundaries) → rebuild the
    list layout from kept-count offsets → ``binary_join``. Whitespace
    canonicalizes to single spaces (tokens = non-empty split, the
    shared tokenizer contract). Returns (doc_id, text, n_before,
    n_after).
    """
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        text = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        doc_of = doc_of[nonempty]
        m = len(flat)
        if m:
            same_prev = pc.equal(flat.slice(1), flat.slice(0, m - 1)
                                 ).to_numpy(zero_copy_only=False)
            same_prev = np.nan_to_num(same_prev.astype(np.float64),
                                      nan=0.0).astype(bool)
            same_doc = doc_of[1:] == doc_of[:-1]
            drop = np.concatenate(([False], same_prev & same_doc))
        else:
            drop = np.zeros(0, dtype=bool)
        kept = flat.filter(pa.array(~drop))
        kept_doc = doc_of[~drop]
        n_before = np.bincount(doc_of, minlength=n).astype(np.int64)
        n_after = np.bincount(kept_doc, minlength=n).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(n_after)))
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
        return pa.table({
            id_col: t[id_col],
            text_col: pc.binary_join(la, " "),
            "n_before": pa.array(n_before),
            "n_after": pa.array(n_after),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def collapse_repeat_tokens_sql(table: str = "documents") -> str:
    return f"""
WITH l AS (
  SELECT doc_id,
    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '')
      AS ls
  FROM {table}
)
SELECT doc_id,
  array_to_string(list_filter(ls, (x, i) -> i = 1 OR x <> ls[i - 1]),
                  ' ') AS text,
  CAST(len(ls) AS BIGINT) AS n_before,
  CAST(len(list_filter(ls, (x, i) -> i = 1 OR x <> ls[i - 1]))
       AS BIGINT) AS n_after
FROM l ORDER BY doc_id
""".strip()


def k_anonymity(ds, cols: list[str], k: int = 5):
    """k-anonymity audit over quasi-identifier columns — the privacy
    gate run before a dataset leaves the pipeline: every distinct
    quasi-identifier combination with its population and an
    ``at_risk`` flag (``n < k`` means fewer than k individuals share
    the combination — re-identifiable; the release rule is suppress or
    generalize those groups). Complements the content-side scrubbers
    (:func:`scrub`, :func:`pseudonymize`) which cannot see
    COMBINATION risk.

    Quasi-id cardinality is O(rows) in the worst case, so the grouped
    count merges distributed (``grouped_agg(final='ray')``) and the
    flag is a pure map — the audit table never lands on the driver.
    NULL quasi-id values form their own class (SQL GROUP BY): since
    the distributed merge (and Ray's sort boundary sampling) cannot
    carry NULL keys, each column travels sentinel-filled alongside an
    ``__isnull`` flag — the (filled, flag) pair IS the class key and
    orders exactly like SQL's default NULLS-LAST — and the NULLs are
    restored after the sort.
    Output: Dataset (cols..., n, at_risk) sorted by cols."""
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    flags = [f"{c}__isnull" for c in cols]

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        arrays, names = [], []
        for c in cols:
            col = t[c].combine_chunks()
            isnull = pc.is_null(col)
            sentinel = ("" if pa.types.is_string(col.type)
                        or pa.types.is_large_string(col.type) else 0)
            arrays += [pc.fill_null(col, sentinel), isnull]
            names += [c, f"{c}__isnull"]
        filled = pa.table(dict(zip(names, arrays)))
        out = (filled.group_by(names).aggregate([([], "count_all")]))
        return out.rename_columns(names + ["n"])

    counts = grouped_agg(
        ds.select_columns(cols).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=cols + flags, aggs=[("n", "sum")], final="ray")

    # NULLS-LAST per column: (isnull, filled) ascending
    sort_keys = [k_ for c, f in zip(cols, flags) for k_ in (f, c)]

    def restore(t: pa.Table) -> pa.Table:
        n = t["n_sum"].combine_chunks().cast(pa.int64())
        out_cols = {}
        for c, f in zip(cols, flags):
            col = t[c].combine_chunks()
            out_cols[c] = pc.if_else(t[f].combine_chunks(),
                                     pa.scalar(None, col.type), col)
        out_cols["n"] = n
        out_cols["at_risk"] = pc.less(n, k)
        return pa.table(out_cols)

    return counts.sort(sort_keys).map_batches(
        restore, batch_format="pyarrow", zero_copy_batch=True)


def k_anonymity_sql(col_exprs: list[str], names: list[str], k: int,
                    table: str) -> str:
    """Mirror: ``col_exprs`` (SQL expressions) aliased to ``names``."""
    sel = ", ".join(f"{e} AS {n}" for e, n in zip(col_exprs, names))
    keys = ", ".join(names)
    return f"""
WITH q AS (SELECT {sel} FROM {table})
SELECT {keys}, CAST(count(*) AS BIGINT) AS n,
  count(*) < {k} AS at_risk
FROM q GROUP BY {keys} ORDER BY {keys}
""".strip()


def l_diversity(ds, cols: list[str], sensitive: str, l_min: int = 3):
    """l-diversity audit — :func:`k_anonymity`'s companion release
    gate: a quasi-identifier class can be large (k-anonymous) yet
    still leak if everyone in it shares the SAME sensitive value;
    this reports, per quasi-id class, the row count and the number of
    DISTINCT sensitive values, flagging classes below ``l_min``.

    Contract: rows with a NULL quasi-id or sensitive value are
    excluded (the NULL-class semantics live in :func:`k_anonymity`;
    here a NULL sensitive value is a non-observation). Distributed
    shape: per-batch local dedup of (quasi..., sensitive) with row
    counts (combiner), distributed merge over the unbounded key
    space, then a second distributed rollup to per-class (Σn,
    distinct-count) — the audit table never lands on the driver.
    Output: Dataset (cols..., n, l_distinct, at_risk) sorted by cols.
    """
    import pyarrow.compute as pc

    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    if l_min <= 0:
        raise ValueError(f"l_min must be positive, got {l_min}")
    allc = cols + [sensitive]

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(allc)
        mask = None
        for c in allc:
            v = pc.is_valid(t[c])
            mask = v if mask is None else pc.and_(mask, v)
        t = t.filter(mask)
        out = t.group_by(allc).aggregate([([], "count_all")])
        return out.rename_columns(allc + ["n"])

    qs = grouped_agg(
        ds.select_columns(allc).map_batches(
            skip_empty(partial), batch_format="pyarrow",
            zero_copy_batch=True),
        keys=allc, aggs=[("n", "sum")], final="ray")

    def one_per_value(t: pa.Table) -> pa.Table:
        ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return pa.table({**{c: t[c] for c in cols},
                         "n": pc.cast(t["n_sum"], pa.int64()),
                         "one": ones})

    cls = grouped_agg(
        qs.map_batches(one_per_value, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=cols, aggs=[("n", "sum"), ("one", "sum")], final="ray")

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_sum"], pa.int64())
        l = pc.cast(t["one_sum"], pa.int64())
        return pa.table({**{c: t[c] for c in cols}, "n": n,
                         "l_distinct": l,
                         "at_risk": pc.less(l, l_min)})

    return cls.sort(cols).map_batches(finish, batch_format="pyarrow",
                                      zero_copy_batch=True)


def l_diversity_sql(col_exprs: list[str], names: list[str],
                    sensitive_expr: str, l_min: int,
                    table: str) -> str:
    sel = ", ".join(f"{e} AS {n}" for e, n in zip(col_exprs, names))
    keys = ", ".join(names)
    nn = " AND ".join(f"{n} IS NOT NULL" for n in names)
    return f"""
WITH q AS (
  SELECT {sel}, {sensitive_expr} AS s FROM {table}
), f AS (
  SELECT * FROM q WHERE {nn} AND s IS NOT NULL
)
SELECT {keys}, CAST(count(*) AS BIGINT) AS n,
  CAST(count(DISTINCT s) AS BIGINT) AS l_distinct,
  count(DISTINCT s) < {l_min} AS at_risk
FROM f GROUP BY {keys} ORDER BY {keys}
""".strip()


def t_closeness(ds, cols: list[str], sensitive_cents, t_max_e6: int,
                unit: int = 100, max_cells: int = 50_000_000):
    """t-closeness audit — the third release gate after
    :func:`k_anonymity` and :func:`l_diversity`: a class can be large
    AND diverse yet still leak if its sensitive-value DISTRIBUTION
    differs from the corpus-wide one (e.g. one (event_type, day)
    class holding only the top-value users). Reports, per quasi-id
    class, the Earth Mover's Distance between the class's and the
    global sensitive distribution over the ORDERED value domain
    (Li, Li & Venkatasubramanian, ICDE 2007 — ordered-attribute EMD
    = mean absolute difference of the two CDFs).

    Exact-integer contract: the sensitive column is the house cents
    rule floored to ``unit`` buckets (``dollar = cents // unit`` —
    the audit's ordered domain; unit=1 for raw cents); with global
    counts g_j (Σ=N) and class counts c_j (Σ=n) over the m-value
    global grid::

        cum_i = Σ_{j≤i} (c_j·N − g_j·n)       (exact int64, python-int
        emd_e6 = (1_000_000 · Σ_{i<m} |cum_i|)      totals)
                 // ((m−1) · n · N)

    which is floor(1e6·EMD). Needs ``N < 2³¹`` (cum ≤ N²); raises
    beyond. Rows with NULL quasi-id or sensitive values are excluded
    (the NULL-class semantics live in :func:`k_anonymity`).

    Distributed shape: ONE per-batch (class, bucket) count combiner
    collapses the corpus to the distinct-cell histogram (guarded by
    ``max_cells`` against open-scale domains — coarsen ``unit``
    first); the dense class×grid walk runs vectorized on the bounded
    driver table. Output: pyarrow Table (cols..., n,
    emd_millionths, at_risk) sorted by cols.
    """
    import pandas as pd

    from fluent_server_ray.stages.aggregate import grouped_counts

    def partial(t: pa.Table) -> pa.Table:
        mask = None
        for c in cols + ["__sens"]:
            col = sensitive_cents(t) if c == "__sens" else t[c]
            v = pc.is_valid(col)
            mask = v if mask is None else pc.and_(mask, v)
        sens = sensitive_cents(t)
        buck = pc.cast(
            pc.floor(pc.divide(pc.cast(sens, pa.float64()), float(unit))),
            pa.int64())
        keep = pa.table({**{c: t[c] for c in cols}, "bucket": buck})
        return keep.filter(mask)

    cells = grouped_counts(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        cols + ["bucket"], final="driver")
    out_fields = ([(c, cells.schema.field(c).type) for c in cols]
                  + [("n", pa.int64()), ("emd_millionths", pa.int64()),
                     ("at_risk", pa.bool_())])
    df = cells.to_pandas()
    if df.empty:
        return pa.schema(out_fields).empty_table()

    grid = np.sort(df["bucket"].unique())
    m = len(grid)
    classes = df.groupby(cols, sort=True)
    if m * classes.ngroups > max_cells:
        raise ValueError(
            "t_closeness: class×grid cells exceed max_cells — coarsen "
            "unit or generalize the quasi-identifier first")
    g_counts = (df.groupby("bucket")["n"].sum()
                .reindex(grid, fill_value=0).to_numpy(dtype=np.int64))
    big_n = int(g_counts.sum())
    if big_n >= 2 ** 31:
        raise ValueError("t_closeness: N ≥ 2^31 — cum would overflow "
                         "int64; audit per partition")
    if m < 2:
        raise ValueError("t_closeness: sensitive domain has < 2 values")

    keys, ns, emds = [], [], []
    for key, sub in classes:
        c = (sub.set_index("bucket")["n"].reindex(grid, fill_value=0)
             .to_numpy(dtype=np.int64))
        n = int(c.sum())
        cum = np.cumsum(c * big_n - g_counts * n)
        tot = int(np.abs(cum[:-1]).sum())  # ≤ m·N² < 2^63 given N<2^31
        emds.append((1_000_000 * tot) // ((m - 1) * n * big_n))
        keys.append(key if isinstance(key, tuple) else (key,))
        ns.append(n)

    out = {c: pa.array([k[i] for k in keys],
                       cells.schema.field(c).type)
           for i, c in enumerate(cols)}
    out["n"] = pa.array(ns, pa.int64())
    out["emd_millionths"] = pa.array(emds, pa.int64())
    out["at_risk"] = pc.greater(pa.array(emds, pa.int64()), t_max_e6)
    return pa.table(out)


def t_closeness_sql(col_exprs: list[str], names: list[str],
                    sensitive_expr: str, t_max_e6: int,
                    unit: int, table: str) -> str:
    """Mirror: dense class×grid cross join, window cumsum, HUGEINT."""
    sel = ", ".join(f"{e} AS {n}" for e, n in zip(col_exprs, names))
    keys = ", ".join(names)
    qkeys = ", ".join(f"q.{n}" for n in names)
    return f"""
WITH base AS (
  SELECT {sel},
    CAST(floor(CAST({sensitive_expr} AS DOUBLE) / {unit}) AS BIGINT)
      AS bucket
  FROM {table}
  WHERE {sensitive_expr} IS NOT NULL
    AND {" AND ".join(f"({e}) IS NOT NULL" for e in col_exprs)}
), cells AS (
  SELECT {keys}, bucket, CAST(count(*) AS HUGEINT) AS c
  FROM base GROUP BY {keys}, bucket
), grid AS (
  SELECT bucket, CAST(sum(c) AS HUGEINT) AS g FROM cells GROUP BY bucket
), tot AS (
  SELECT CAST(sum(g) AS HUGEINT) AS big_n,
    CAST(count(*) AS HUGEINT) AS m FROM grid
), cls AS (
  SELECT {keys}, CAST(sum(c) AS HUGEINT) AS n FROM cells
  GROUP BY {keys}
), dense AS (
  SELECT {qkeys}, g.bucket, g.g, q.n, COALESCE(c.c, 0) AS c
  FROM cls q CROSS JOIN grid g
  LEFT JOIN cells c ON c.bucket = g.bucket
    AND {" AND ".join(f"c.{n} = q.{n}" for n in names)}
), cums AS (
  SELECT {keys}, n, bucket,
    sum(c * (SELECT big_n FROM tot) - g * n)
      OVER (PARTITION BY {keys} ORDER BY bucket) AS cum,
    row_number() OVER (PARTITION BY {keys} ORDER BY bucket) AS i
  FROM dense
), emd AS (
  SELECT {keys}, any_value(n) AS n,
    (1000000 * sum(abs(cum)) FILTER (WHERE i < (SELECT m FROM tot)))
      // (((SELECT m FROM tot) - 1) * any_value(n)
          * (SELECT big_n FROM tot)) AS emd
  FROM cums GROUP BY {keys}
)
SELECT {keys}, CAST(n AS BIGINT) AS n,
  CAST(emd AS BIGINT) AS emd_millionths,
  emd > {t_max_e6} AS at_risk
FROM emd ORDER BY {keys}
""".strip()


def contamination_score(ds, k: int = 3, bench_mod: int = BENCH_MOD):
    """Graded benchmark contamination: for every training document,
    the FRACTION of its distinct word k-grams that appear anywhere in
    the benchmark slice — :func:`decontaminate`'s boolean flag, made
    rankable (curation wants "drop the worst 1%", not just "any
    overlap"). Score = 1e6·n_hit // n_grams; documents with < k
    tokens have no grams → NULL score (0/0 is not 'clean').

    Same scale shape as :func:`decontaminate`: bench gram set
    collected once and broadcast via ``ray.put``; the corpus streams
    through one vectorized ``is_in`` + per-batch distinct/groupby.
    Output: (doc_id, n_grams, n_hit, contamination_millionths) for
    training docs in input order."""
    import ray

    ds = ds.materialize()  # consumed twice (bench pass + score pass)

    def _is_bench(ids):
        return pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, bench_mod),
                                         bench_mod)), 0)

    def bench_grams(t: pa.Table):
        t = t.filter(_is_bench(t["doc_id"]))
        if not len(t):
            return
        _, grams = _gram_strings(*_flat_tokens(t["text"].to_pylist()), k)
        if len(grams):
            yield pa.table(
                {"g": pa.array(np.unique(grams), type=pa.string())})

    parts = ds.map_batches(bench_grams, batch_format="pyarrow",
                           zero_copy_batch=True)
    bench: set = set()
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        bench.update(b["g"].to_pylist())
    import ray as _ray
    bench_ref = _ray.put(pa.array(sorted(bench), type=pa.string()))

    def score(t: pa.Table) -> pa.Table:
        import pandas as pd

        t = t.filter(pc.invert(_is_bench(t["doc_id"])))
        ng = np.zeros(len(t), dtype=np.int64)
        nh = np.zeros(len(t), dtype=np.int64)
        if len(t):
            d_of, grams = _gram_strings(
                *_flat_tokens(t["text"].to_pylist()), k)
            if len(grams):
                dd = pd.DataFrame({"d": d_of, "g": grams}).drop_duplicates()
                hit = pc.is_in(
                    pa.array(dd["g"].to_numpy(), type=pa.string()),
                    value_set=ray.get(bench_ref),
                ).to_numpy(zero_copy_only=False)
                agg = (pd.DataFrame({"d": dd["d"].to_numpy(),
                                     "h": hit.astype(np.int64)})
                       .groupby("d").agg(ng=("h", "size"),
                                         nh=("h", "sum")))
                ng[agg.index.to_numpy()] = agg["ng"].to_numpy()
                nh[agg.index.to_numpy()] = agg["nh"].to_numpy()
        sc = pa.array(
            [10**6 * int(h) // int(g) if g else None
             for g, h in zip(ng, nh)], pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pa.array(ng), "n_hit": pa.array(nh),
            "contamination_millionths": sc,
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def contamination_score_sql(k: int = 3, bench_mod: int = BENCH_MOD,
                            table: str = "documents") -> str:
    return f"""
WITH toks AS (
  {_toks_cte(table)}
), sh AS MATERIALIZED (
  SELECT doc_id, {_gram_list_sql(k)} AS s FROM toks
), bench AS MATERIALIZED (
  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {bench_mod} = 0
), d AS (
  SELECT DISTINCT doc_id, unnest(s) AS g FROM sh
  WHERE doc_id % {bench_mod} <> 0
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS ng,
    CAST(sum(CASE WHEN g IN (SELECT g FROM bench)
             THEN 1 ELSE 0 END) AS BIGINT) AS nh
  FROM d GROUP BY 1
)
SELECT t.doc_id, COALESCE(agg.ng, 0) AS n_grams,
  COALESCE(agg.nh, 0) AS n_hit,
  CAST((1000000 * agg.nh) // NULLIF(agg.ng, 0) AS BIGINT)
    AS contamination_millionths
FROM (SELECT doc_id FROM {table} WHERE doc_id % {bench_mod} <> 0) t
LEFT JOIN agg USING (doc_id)
ORDER BY t.doc_id
""".strip()


# ------------------------------------- randomized-response private counts

def rr_private_daily_counts(ds, sensitive_type: str = "purchase",
                            ts_col: str = "ts", id_col: str = "event_id",
                            type_col: str = "event_type") -> pa.Table:
    """Local-differential-privacy count release via RANDOMIZED RESPONSE
    (Warner 1965): each event's sensitive bit (``event_type ==
    sensitive_type``) is reported truthfully with probability 3/4 and
    FLIPPED with probability 1/4, then the per-day count is debiased —
    ``estimate = (4·n_reported − n) / 2`` (the unbiased inverse of the
    flip channel at f = 1/4, ε = ln 3 per event). The privacy sibling
    of the k-anonymity / l-diversity rollups above: those suppress,
    this randomizes.

    Determinism contract: the flip coin is ``md5_u64('rr:' ∥ id) % 4
    == 0`` (≡ DuckDB ``md5_number_upper``), so both engines flip the
    SAME events and the audit row is strictly checkable — the
    deterministic coin IS the operator's auditability contract (a
    production release would draw real entropy; the channel math is
    identical). The true count rides along so the driver row exhibits
    estimate-vs-truth directly.

    Shape: one per-batch combiner (day, n, n_true, n_reported) — the
    md5 coin is the only per-row Python cost, amortized per batch —
    merged on the bounded calendar-day table. NULL ts/id rows are
    excluded by contract. Output: (day, n, n_true, n_reported,
    dp_estimate) sorted by day.
    """
    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import grouped_agg
    from fluent_server_ray.stages.features import _epoch_day

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[ts_col]),
                             pc.is_valid(t[id_col])))
        day = _epoch_day(t[ts_col]).to_numpy(zero_copy_only=False)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        x = pc.fill_null(
            pc.cast(pc.equal(t[type_col], sensitive_type), pa.int64()),
            0).to_numpy(zero_copy_only=False).astype(np.int64)
        flip = np.fromiter(
            (md5_u64(f"rr:{i}") % 4 == 0 for i in ids),
            dtype=bool, count=len(ids))
        reported = np.where(flip, 1 - x, x)
        prep = pa.table({
            "day": pa.array(day, pa.int64()),
            "n": pa.array(np.ones(len(ids), dtype=np.int64)),
            "n_true": pa.array(x),
            "n_reported": pa.array(reported.astype(np.int64)),
        })
        out = prep.group_by(["day"]).aggregate(
            [("n", "sum"), ("n_true", "sum"), ("n_reported", "sum")])
        return out.rename_columns(["day", "n", "n_true", "n_reported"])

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["day"], [("n", "sum"), ("n_true", "sum"),
                  ("n_reported", "sum")], final="driver")
    n = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    rep = agg["n_reported_sum"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    est = (4 * rep - n).astype(np.float64) / 2.0
    return pa.table({
        "day": pc.cast(agg["day"], pa.int64()),
        "n": pa.array(n),
        "n_true": pc.cast(agg["n_true_sum"], pa.int64()),
        "n_reported": pa.array(rep),
        "dp_estimate": pa.array(est, pa.float64()),
    }).sort_by([("day", "ascending")])


def rr_private_daily_counts_sql(sensitive_type: str = "purchase",
                                ts_col: str = "ts",
                                id_col: str = "event_id",
                                type_col: str = "event_type",
                                table: str = "events") -> str:
    return f"""
WITH r AS (
  SELECT
    CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
    CASE WHEN {type_col} = '{sensitive_type}' THEN 1 ELSE 0 END AS x,
    CASE WHEN md5_number_upper('rr:' || CAST({id_col} AS VARCHAR))
              % 4 = 0 THEN 1 ELSE 0 END AS flip
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {id_col} IS NOT NULL
)
SELECT day, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(x) AS BIGINT) AS n_true,
  CAST(sum(CASE WHEN flip = 1 THEN 1 - x ELSE x END) AS BIGINT)
    AS n_reported,
  CAST(4 * sum(CASE WHEN flip = 1 THEN 1 - x ELSE x END) - count(*)
       AS DOUBLE) / 2.0 AS dp_estimate
FROM r GROUP BY day ORDER BY day
""".strip()


def word_dropout(ds, id_col: str = "doc_id", text_col: str = "text",
                 p_millis: int = 100):
    """Deterministic word-dropout augmentation (Iyyer 2015's word
    dropout, the LM-training regularizer): token at 1-based position
    ``p`` of doc ``d`` drops iff ``md5_u64('wd:' || d || ':' || p) %
    1000 < p_millis`` — the md5 stream plays the Bernoulli draw, so
    both engines drop the SAME tokens (a production run would draw
    real entropy; the mechanics are identical).

    Tokens are the single-space split (≡ mirror ``string_split``,
    empties removed); the augmented text re-joins survivors with
    single spaces. Docs with ≥1 token appear (even if everything
    dropped — text_aug ''); token-less docs are absent. NULL id/text
    rows excluded. Embarrassingly parallel. Output: (id, n_tokens,
    n_dropped, text_aug).
    """
    import numpy as np
    import pyarrow.compute as pc

    from fluent_server_ray.functions.hashing import md5_u64
    from fluent_server_ray.stages.aggregate import skip_empty

    def aug(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[id_col]), pc.is_valid(t[text_col]))
        t = t.filter(keep)
        ids, nt, nd, texts = [], [], [], []
        for d, txt in zip(t[id_col].to_numpy(zero_copy_only=False),
                          t[text_col].to_pylist()):
            toks = [w for w in txt.split(" ") if w != ""]
            if not toks:
                continue
            kept = [w for p, w in enumerate(toks, start=1)
                    if md5_u64(f"wd:{int(d)}:{p}") % 1000 >= p_millis]
            ids.append(int(d))
            nt.append(len(toks))
            nd.append(len(toks) - len(kept))
            texts.append(" ".join(kept))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_dropped": pa.array(nd, pa.int64()),
            "text_aug": pa.array(texts, pa.string()),
        })

    return ds.map_batches(skip_empty(aug), batch_format="pyarrow",
                          zero_copy_batch=True)


def word_dropout_sql(id_col: str = "doc_id", text_col: str = "text",
                     p_millis: int = 100,
                     table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
    list_filter(string_split({text_col}, ' '), x -> x <> '') AS tt
  FROM {table}
  WHERE {id_col} IS NOT NULL AND {text_col} IS NOT NULL
), pos AS (
  SELECT {id_col}, g.p AS p, tt[g.p] AS term, len(tt) AS n_tokens
  FROM toks CROSS JOIN unnest(generate_series(1, len(tt))) AS g(p)
), flagged AS (
  SELECT *,
    md5_number_upper('wd:' || CAST(CAST({id_col} AS BIGINT) AS VARCHAR)
                     || ':'
                     || CAST(p AS VARCHAR)) % 1000 < {p_millis}
      AS dropped
  FROM pos
)
SELECT {id_col}, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dropped,
  COALESCE(string_agg(CASE WHEN NOT dropped THEN term END, ' '
                      ORDER BY p), '') AS text_aug
FROM flagged GROUP BY {id_col}
""".strip()
