"""Distributed byte-pair-encoding (BPE) merge-table training.

The tokenizer-training step of LM data prep (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — a
public textbook algorithm): repeatedly merge the most frequent
adjacent symbol pair. The classic trainer operates on the WORD
FREQUENCY table, not the raw corpus — one distributed word count
collapses a 100 TB corpus to a vocabulary-sized working set, and every
merge iteration is then a cheap parallel pass over that vocab Dataset:

- pair counts: per-batch vectorized explode (Arrow split + the
  shift-join trick of ``textstats.bigram_top``) weighted by word
  count, merged distributed (``grouped_agg(final='ray')`` — the pair
  space is unbounded), global argmax via per-block top-1 partials
  (O(blocks) driver merge, never a full pair table on the driver);
- merge application: ONE compiled-regex pass per batch over a
  newline-joined symbol column (Python ``re`` lookarounds reproduce
  the reference implementation's non-consuming, left-to-right
  non-overlapping replace exactly — RE2/Arrow lacks lookbehind, and a
  separator-consuming literal replace groups runs differently);
- the vocab re-materializes between iterations (object store, never
  the driver), so the loop is n_merges × (map + tiny reduce).

Iterative and therefore not SQL-expressible — correctness is pinned in
pytest against a from-scratch pure-Python reference trainer.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

END_OF_WORD = "</w>"


def _word_counts(ds, text_col: str):
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    def partial(t: pa.Table) -> pa.Table:
        # all whitespace separates words: a literal tab/newline inside
        # a "word" would otherwise corrupt the newline/tab-joined
        # regex buffers of _apply_merge / bpe_encode
        txt = pc.replace_substring_regex(t[text_col], r"[\t\n\r]", " ")
        toks = pc.list_flatten(pc.split_pattern(txt, " "))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        toks = toks.filter(pc.not_equal(toks, ""))
        out = (pa.table({"word": toks}).group_by("word")
               .aggregate([([], "count_all")]))
        return out.rename_columns(["word", "n"])

    parts = ds.map_batches(skip_empty(partial), batch_format="pyarrow",
                           zero_copy_batch=True)
    return grouped_agg(parts, ["word"], [("n", "sum")], final="ray")


def _to_symbols(vocab):
    """(word, n_sum) -> (syms, n): space-joined characters + the
    end-of-word marker, the classic BPE working representation."""
    def fn(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        syms = [" ".join(list(w) + [END_OF_WORD]) for w in words]
        return pa.table({
            "syms": pa.array(syms, type=pa.string()),
            "n": pc.cast(t["n_sum"], pa.int64()),
        })

    from fluent_server_ray.stages.aggregate import skip_empty

    return vocab.map_batches(skip_empty(fn), batch_format="pyarrow",
                             zero_copy_batch=True)


def _pair_counts_partial(t: pa.Table) -> pa.Table:
    """Weighted adjacent-pair counts for one vocab block — vectorized:
    explode symbols with row ownership, shift-join, weight by the
    row's word count."""
    toks = pc.split_pattern(t["syms"], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    empty = pa.table({"left": pa.array([], type=pa.string()),
                      "right": pa.array([], type=pa.string()),
                      "w": pa.array([], type=pa.int64())})
    if len(flat) < 2:
        return empty
    same = row_of[:-1] == row_of[1:]
    wts = t["n"].to_numpy(zero_copy_only=False).astype("int64")
    out = pa.table({
        "left": flat.slice(0, len(flat) - 1).filter(pa.array(same)),
        "right": flat.slice(1).filter(pa.array(same)),
        "w": pa.array(wts[row_of[:-1][same]]),
    })
    agg = out.group_by(["left", "right"]).aggregate([("w", "sum")])
    return agg.rename_columns(["left", "right", "w"])


def _best_pair(vocab_syms):
    """Global argmax pair: distributed pair-count merge, then
    per-block top-1 partials to the driver. Tie-break (w desc, left
    asc, right asc) — deterministic."""
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty

    merged = grouped_agg(
        vocab_syms.map_batches(skip_empty(_pair_counts_partial),
                               batch_format="pyarrow",
                               zero_copy_batch=True),
        ["left", "right"], [("w", "sum")], final="ray",
    )

    def top1(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            ("w_sum", "descending"),
            ("left", "ascending"), ("right", "ascending"),
        ])
        return t.take(order.slice(0, 1))

    parts = list(
        merged.map_batches(skip_empty(top1), batch_format="pyarrow",
                           zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not parts:
        return None
    best = pa.concat_tables(parts)
    if len(best) == 0:
        return None
    order = pc.sort_indices(best, sort_keys=[
        ("w_sum", "descending"),
        ("left", "ascending"), ("right", "ascending"),
    ])
    row = best.take(order.slice(0, 1))
    return (row["left"][0].as_py(), row["right"][0].as_py(),
            int(row["w_sum"][0].as_py()))


def _apply_merge(vocab_syms, left: str, right: str):
    """One merge over the whole vocab: join the block's rows with
    newlines (whitespace — invisible to the \\S lookarounds), ONE
    compiled-regex pass, split back. Exactly the reference trainer's
    replace semantics (non-consuming boundaries, left-to-right
    non-overlapping)."""
    pattern = (r"(?<!\S)" + re.escape(left) + r" " + re.escape(right)
               + r"(?!\S)")
    merged_sym = left + right

    from fluent_server_ray.stages.aggregate import skip_empty

    def fn(t: pa.Table) -> pa.Table:
        rx = re.compile(pattern)
        mega = "\n".join(t["syms"].to_pylist())
        out = rx.sub(merged_sym, mega).split("\n")
        return pa.table({"syms": pa.array(out, type=pa.string()),
                         "n": t["n"]})

    return vocab_syms.map_batches(skip_empty(fn), batch_format="pyarrow",
                                  zero_copy_batch=True)


def bpe_train(ds, n_merges: int = 32, min_count: int = 2,
              text_col: str = "text") -> pa.Table:
    """Train a BPE merge table over a document corpus.

    Returns (rank, left, right, merged, w) — one row per learned
    merge, rank 0 first; stops early when no pair reaches
    ``min_count``. Tokenization: single-space word split (cf.
    ``textstats.vocab_top_words``), char-level initial symbols with an
    ``</w>`` end-of-word marker (Sennrich's setup)."""
    vocab = _to_symbols(_word_counts(ds, text_col)).materialize()
    out = {"rank": [], "left": [], "right": [], "merged": [], "w": []}
    for rank in range(n_merges):
        best = _best_pair(vocab)
        if best is None or best[2] < min_count:
            break
        left, right, w = best
        out["rank"].append(rank)
        out["left"].append(left)
        out["right"].append(right)
        out["merged"].append(left + right)
        out["w"].append(w)
        vocab = _apply_merge(vocab, left, right).materialize()
    return pa.table({
        "rank": pa.array(out["rank"], type=pa.int64()),
        "left": pa.array(out["left"], type=pa.string()),
        "right": pa.array(out["right"], type=pa.string()),
        "merged": pa.array(out["merged"], type=pa.string()),
        "w": pa.array(out["w"], type=pa.int64()),
    })


def bpe_train_reference(texts, n_merges: int = 32,
                        min_count: int = 2) -> list[tuple[str, str, int]]:
    """From-scratch pure-Python reference trainer (the textbook
    algorithm, driver-side) — the test oracle for :func:`bpe_train`."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                words[w] += 1
    vocab = {" ".join(list(w) + [END_OF_WORD]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            parts = syms.split(" ")
            for a, b in zip(parts[:-1], parts[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), w = best
        if w < min_count:
            break
        merges.append((a, b, w))
        rx = re.compile(r"(?<!\S)" + re.escape(a) + r" " + re.escape(b)
                        + r"(?!\S)")
        vocab = {rx.sub(a + b, syms): c for syms, c in vocab.items()}
    return merges


def bpe_train_adaptive(ds, n_merges: int = 32, min_count: int = 2,
                       text_col: str = "text",
                       driver_max_vocab_bytes: int = 256 << 20) -> pa.Table:
    """Size-adaptive BPE training (the minhash-verify pattern): the
    distributed merge loop of :func:`bpe_train` costs two cluster
    passes PER MERGE — irreducible when the word-frequency table is
    itself too big for one machine, but a real 32k-merge tokenizer run
    over a vocab that FITS should not pay 64k fixed executor costs.
    So: build the word counts distributed (always), measure the vocab,
    and if it fits ``driver_max_vocab_bytes`` run the merge loop
    locally on the collapsed (syms, n) table — byte-identical output
    (same tie-breaks), pinned by tests against the distributed path.
    Falls back to :func:`bpe_train`'s loop otherwise."""
    from collections import Counter

    vocab = _to_symbols(_word_counts(ds, text_col)).materialize()
    nbytes = vocab.size_bytes() or 0
    if nbytes > driver_max_vocab_bytes:
        out = {"rank": [], "left": [], "right": [], "merged": [], "w": []}
        vsyms = vocab
        for rank in range(n_merges):
            best = _best_pair(vsyms)
            if best is None or best[2] < min_count:
                break
            left, right, w = best
            out["rank"].append(rank)
            out["left"].append(left)
            out["right"].append(right)
            out["merged"].append(left + right)
            out["w"].append(w)
            vsyms = _apply_merge(vsyms, left, right).materialize()
        return pa.table({
            "rank": pa.array(out["rank"], type=pa.int64()),
            "left": pa.array(out["left"], type=pa.string()),
            "right": pa.array(out["right"], type=pa.string()),
            "merged": pa.array(out["merged"], type=pa.string()),
            "w": pa.array(out["w"], type=pa.int64()),
        })

    # driver-exact path: same algorithm, zero per-merge cluster passes
    local = {}
    for b in vocab.iter_batches(batch_size=None, batch_format="pyarrow"):
        for syms, n in zip(b["syms"].to_pylist(), b["n"].to_pylist()):
            local[syms] = local.get(syms, 0) + int(n)
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in local.items():
            parts = syms.split(" ")
            for a, bb in zip(parts[:-1], parts[1:]):
                pairs[(a, bb)] += c
        if not pairs:
            break
        (a, bb), w = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if w < min_count:
            break
        merges.append((rank, a, bb, a + bb, w))
        rx = re.compile(r"(?<!\S)" + re.escape(a) + r" " + re.escape(bb)
                        + r"(?!\S)")
        local = {rx.sub(a + bb, syms): c for syms, c in local.items()}
    cols = list(zip(*merges)) if merges else [[], [], [], [], []]
    return pa.table({
        "rank": pa.array(list(cols[0]), type=pa.int64()),
        "left": pa.array(list(cols[1]), type=pa.string()),
        "right": pa.array(list(cols[2]), type=pa.string()),
        "merged": pa.array(list(cols[3]), type=pa.string()),
        "w": pa.array(list(cols[4]), type=pa.int64()),
    })


def bpe_encode(ds, merges: pa.Table, id_col: str = "doc_id",
               text_col: str = "text"):
    """Apply a learned merge table to a corpus — the TOKENIZE step
    that follows training: each batch splits words to characters +
    ``</w>`` and replays the merges in rank order with the same
    compiled lookaround regexes over one newline/tab-joined buffer
    (words separated by tabs within a doc, docs by newlines — both
    whitespace, invisible to the merges). The merge table broadcasts
    once via ``ray.put``. Output: (id, n_tokens, tokens — the
    space-joined symbol string per doc). Deterministic; pinned against
    a per-word reference encoder."""
    import ray

    pairs = list(zip(merges["left"].to_pylist(),
                     merges["right"].to_pylist()))
    merges_ref = ray.put(pairs)

    def fn(t: pa.Table) -> pa.Table:
        ms = ray.get(merges_ref)
        rxs = [(re.compile(r"(?<!\S)" + re.escape(a) + r" " + re.escape(b)
                           + r"(?!\S)"), a + b) for a, b in ms]
        docs = []
        for s in t[text_col].to_pylist():
            s = (s or "").replace("\t", " ").replace("\n", " ")
            s = s.replace("\r", " ")
            words = [w for w in s.split(" ") if w]
            docs.append("\t".join(
                " ".join(list(w) + [END_OF_WORD]) for w in words))
        mega = "\n".join(docs)
        for rx, repl in rxs:
            mega = rx.sub(repl, mega)
        out_docs = mega.split("\n")
        toks = [d.replace("\t", " ").split(" ") if d else []
                for d in out_docs]
        toks = [[x for x in ws if x] for ws in toks]
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array([len(ws) for ws in toks],
                                 type=pa.int64()),
            "tokens": pa.array([" ".join(ws) for ws in toks],
                               type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------- computed DuckDB mirrors (strict oracles)

def _bpe_rounds_sql(n_merges: int, min_count: int, table: str) -> str:
    """The shared CTE chain both mirrors build on: word counts →
    char+``</w>`` symbol lists → ``n_merges`` UNROLLED merge rounds
    (pair counts → argmax with the (w desc, left, right) tie-break →
    greedy merge application). The apply step reproduces the engine's
    left-to-right non-overlapping lookaround-regex semantics exactly
    via run parity: within each maximal run of consecutive match
    positions, the 1st/3rd/5th… merge ('aaaa' → aa+aa, 'aaa' → aa+a —
    the regex's zero-width boundaries never consume the separating
    space, so greediness is a pure parity rule on ORIGINAL positions).
    ``AS MATERIALIZED`` pins each round to one evaluation (v/b CTEs
    are referenced twice; inlining would recompute the whole chain
    2^rounds times). An empty best (everything below ``min_count``)
    LEFT-JOINs as NULL and leaves the vocab unchanged — exactly the
    engine's early stop."""
    parts = [f"""
words AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(
      string_split(regexp_replace(text, '[\\t\\n\\r]', ' ', 'g'), ' '),
      x -> x <> '')) AS w
    FROM {table} WHERE text IS NOT NULL
  ) GROUP BY w
), v0 AS MATERIALIZED (
  SELECT w, n, list_append(regexp_extract_all(w, '.'), '{END_OF_WORD}') AS s
  FROM words
)""".strip()]
    for k in range(n_merges):
        parts.append(f"""
p{k} AS (
  SELECT s[i] AS l, s[i+1] AS r, CAST(sum(n) AS BIGINT) AS wt
  FROM v{k}, unnest(generate_series(1, len(s)-1)) AS u(i)
  GROUP BY 1, 2
), b{k} AS MATERIALIZED (
  SELECT l, r, wt FROM p{k} WHERE wt >= {min_count}
  ORDER BY wt DESC, l, r LIMIT 1
), m{k} AS (
  SELECT v.w, v.n, v.s, b.l AS bl, b.r AS br,
    list_filter(generate_series(1, len(v.s)-1),
                i -> v.s[i] = b.l AND v.s[i+1] = b.r) AS m
  FROM v{k} v LEFT JOIN b{k} b ON TRUE
), v{k+1} AS MATERIALIZED (
  SELECT w, n, CASE WHEN bl IS NULL THEN s ELSE
    flatten(list_transform(generate_series(1, len(s)), i ->
      CASE WHEN list_contains(kept, i) THEN [bl || br]
           WHEN list_contains(kept, i - 1) THEN []
           ELSE [s[i]] END))
    END AS s
  FROM (
    SELECT w, n, s, bl, br,
      list_filter(m, i -> (i - list_max(list_filter(
        generate_series(0, i-1), j -> NOT list_contains(m, j)))) % 2 = 1
      ) AS kept
    FROM m{k}
  )
)""".strip())
    return ",\n".join(parts)


def bpe_train_sql(n_merges: int = 8, min_count: int = 2,
                  table: str = "documents") -> str:
    """DuckDB mirror of :func:`bpe_train` / :func:`bpe_train_adaptive`
    — BPE training is iterative but each round is a deterministic SQL
    transform, so a FIXED merge budget unrolls to one (large) computed
    query: a REAL oracle over any corpus, not a golden table. Output
    (rank, left, right, merged, w), rank 0 first; rounds whose best
    pair falls below ``min_count`` emit nothing (engine early stop)."""
    union = "\nUNION ALL\n".join(
        f'SELECT {k} AS rk, l, r, l || r AS merged, wt FROM b{k}'
        for k in range(n_merges))
    return f"""
WITH {_bpe_rounds_sql(n_merges, min_count, table)}
SELECT CAST(rk AS BIGINT) AS "rank", l AS "left", r AS "right", merged,
       wt AS w
FROM ({union}) ORDER BY "rank"
""".strip()


def bpe_encode_sql(n_merges: int = 8, min_count: int = 2,
                   table: str = "documents") -> str:
    """DuckDB mirror of train-then-:func:`bpe_encode` over the SAME
    corpus: the final round's vocab (``v{{n}}``) already maps every
    distinct word to its merged symbol list, so encoding is one join
    from the doc's ordered word list — no re-derivation. Docs with
    NULL/empty text keep a row (n_tokens 0, tokens '') like the
    engine."""
    return f"""
WITH {_bpe_rounds_sql(n_merges, min_count, table)},
dwords AS (
  SELECT doc_id, i AS wi, ws[i] AS w
  FROM (
    SELECT doc_id, list_filter(
      string_split(regexp_replace(text, '[\\t\\n\\r]', ' ', 'g'), ' '),
      x -> x <> '') AS ws
    FROM {table} WHERE text IS NOT NULL
  ), unnest(generate_series(1, len(ws))) AS u(i)
),
agg AS (
  SELECT d.doc_id, CAST(sum(len(v.s)) AS BIGINT) AS n_tokens,
         string_agg(array_to_string(v.s, ' '), ' ' ORDER BY d.wi) AS tokens
  FROM dwords d JOIN v{n_merges} v ON d.w = v.w
  GROUP BY d.doc_id
)
SELECT doc.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.tokens, '') AS tokens
FROM {table} doc LEFT JOIN agg a USING (doc_id)
ORDER BY doc.doc_id
""".strip()
