"""Composite training-data curation pipeline.

The document-side flagship: the canonical corpus-curation chain a
100 TB training-data run performs, composed from the engine's own
stages into ONE lazy Dataset graph (no driver materialization between
steps — blocks stream stage to stage):

    quality gate (vectorized token / alpha-ratio kernels)
      → exact dedup (min-id per text, combiner-first shuffle)
      → deterministic key-stratified sample (md5 rule)
      → curated (doc_id, text, n_tokens)

Stage order is filter-FIRST: the gate is a pure function of ``text``,
so every copy of a text passes or fails together and the min-id winner
is unchanged — gating before the dedup is semantically identical (same
oracle) while the full-corpus hash shuffle moves only surviving rows.

Every step is SQL-expressible, so — unlike most composite pipelines —
the WHOLE chain carries a DuckDB oracle built from the same constants
(`curate_documents_sql`), and the driver checks the composition
end-to-end, not just the pieces.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from fluent_server_ray.stages.dedup import exact_dedup
from fluent_server_ray.stages.sampling import (
    sample_by_key,
    sample_by_key_sql_predicate,
)
from fluent_server_ray.stages.textstats import TOKEN_RE

MIN_TOKENS = 20
MIN_ALPHA = 0.5
SAMPLE_HEX = "80"  # ≈ 50% of surviving doc ids


def curate_documents(ds, min_tokens: int = MIN_TOKENS,
                     min_alpha: float = MIN_ALPHA,
                     hex_threshold: str = SAMPLE_HEX):
    """documents Dataset → curated Dataset (doc_id, text, n_tokens)."""

    def quality_gate(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                           pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"),
                          pa.int64())
        alpha_ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
        )
        keep = pc.and_(
            pc.greater_equal(n_tokens, min_tokens),
            pc.greater_equal(alpha_ratio, min_alpha),
        )
        return pa.table({"doc_id": t["doc_id"], "text": text}).filter(keep)

    def attach_tokens(t: pa.Table) -> pa.Table:
        # recomputed on the (dedup+sample-reduced) survivor set only —
        # cheaper than shuffling a carried column through the dedup
        n_tokens = pc.cast(pc.count_substring_regex(t["text"], TOKEN_RE),
                           pa.int64())
        return pa.table(
            {"doc_id": t["doc_id"], "text": t["text"], "n_tokens": n_tokens}
        )

    gated = ds.map_batches(quality_gate, batch_format="pyarrow",
                           zero_copy_batch=True)
    deduped = exact_dedup(gated)
    sampled = sample_by_key(deduped, "doc_id", hex_threshold)
    return sampled.map_batches(attach_tokens, batch_format="pyarrow",
                               zero_copy_batch=True)


def curate_documents_near_dedup(ds, min_tokens: int = MIN_TOKENS,
                                min_alpha: float = MIN_ALPHA,
                                threshold: float = 0.8):
    """NEAR-dup-aware curation — the full large-crawl chain:

        quality gate → exact dedup → MinHash+LSH near-dup pairs
          → connected components → keep the min-id doc per component

    Near-dup similarity is not transitive, so the keep-one rule runs on
    COMPONENTS of the pair graph (``pair_components``), not on raw
    pairs. The drop set (non-minimal members) is O(near-dup docs) —
    broadcast once via ``ray.put`` and applied as a vectorized
    ``is_in`` filter; the corpus streams. MinHash recall is
    probabilistic → rows-only driver check; the exact-pair variant of
    the same composition (``dedup_clusters``) is oracle-checked.

    Returns a Dataset (doc_id, text).
    """
    import pyarrow.compute as _pc
    import ray

    from fluent_server_ray.stages.dedup import (
        minhash_near_dupes,
        pair_components,
    )

    curated = curate_documents(ds, min_tokens=min_tokens,
                               min_alpha=min_alpha,
                               hex_threshold=None)  # gate+dedup, no sample
    curated = curated.materialize()  # consumed twice (pairs + final filter)
    pairs = minhash_near_dupes(curated, threshold=threshold)
    comp = pair_components(pairs)

    def non_min(t: pa.Table) -> pa.Table:
        keep = _pc.not_equal(t["doc_id"], t["component"])
        return pa.table({"doc_id": t["doc_id"]}).filter(keep)

    drop_tbls = list(
        comp.map_batches(non_min, batch_format="pyarrow",
                         zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not drop_tbls:
        return curated.select_columns(["doc_id", "text"])
    drop_ids = pa.concat_tables(drop_tbls)["doc_id"].combine_chunks()
    drop_ref = ray.put(drop_ids)

    def drop_members(t: pa.Table) -> pa.Table:
        ids = ray.get(drop_ref)
        mask = _pc.invert(_pc.is_in(t["doc_id"], value_set=ids))
        return t.select(["doc_id", "text"]).filter(mask)

    return curated.map_batches(drop_members, batch_format="pyarrow",
                               zero_copy_batch=True)


def lm_prep_documents(ds, min_tokens: int = MIN_TOKENS,
                      min_alpha: float = MIN_ALPHA):
    """The END-TO-END LM training-set prep chain, one lazy graph:

        PII scrub (sequential regex redaction, zero shuffle)
          → quality gate (vectorized token / alpha-ratio kernels)
          → exact dedup (min-id per scrubbed text, ONE combiner-first
            shuffle — the chain's only exchange)
          → deterministic train/val/test split (md5 rule, key-pure)
          → (doc_id, text, n_tokens, split)

    The gate runs on the SCRUBBED text (redaction can only shrink a
    doc below the gate, never inflate it past one), dedup collapses
    docs whose cleaned forms collide (two docs differing only in their
    PII are duplicates after scrubbing — exactly the curation intent),
    and the split is a pure function of the surviving doc_id. The
    WHOLE chain carries a DuckDB oracle from the same constants
    (:func:`lm_prep_documents_sql`)."""
    from fluent_server_ray.stages.assembly import split_of
    from fluent_server_ray.stages.hygiene import SCRUB_PII, make_scrub_fn

    scrub_fn = make_scrub_fn(SCRUB_PII, ("doc_id",), "text")

    def scrub_only(t: pa.Table) -> pa.Table:
        out = scrub_fn(t)
        return pa.table({"doc_id": out["doc_id"],
                         "text": out["text_clean"]})

    def attach_split(t: pa.Table) -> pa.Table:
        return t.append_column("split", split_of(t["doc_id"]))

    scrubbed = ds.map_batches(scrub_only, batch_format="pyarrow",
                              zero_copy_batch=True)
    curated = curate_documents(scrubbed, min_tokens=min_tokens,
                               min_alpha=min_alpha, hex_threshold=None)
    return curated.map_batches(attach_split, batch_format="pyarrow",
                               zero_copy_batch=True)


def lm_prep_documents_sql(min_tokens: int = MIN_TOKENS,
                          min_alpha: float = MIN_ALPHA,
                          table: str = "documents") -> str:
    from fluent_server_ray.stages.assembly import split_case_sql
    from fluent_server_ray.stages.hygiene import SCRUB_PII, scrub_expr_sql

    return f"""
WITH scrubbed AS (
  SELECT doc_id, {scrub_expr_sql(SCRUB_PII, "text")} AS text FROM {table}
), gated AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
      / GREATEST(length(text), 1) AS alpha_ratio
  FROM scrubbed
), kept AS (
  SELECT doc_id, text, n_tokens FROM gated
  WHERE n_tokens >= {min_tokens} AND alpha_ratio >= {min_alpha}
), dedup AS (
  SELECT min(doc_id) AS doc_id, text, min(n_tokens) AS n_tokens
  FROM kept GROUP BY text
)
SELECT doc_id, text, n_tokens, {split_case_sql("doc_id")} AS split
FROM dedup
""".strip()


def curate_documents_sql(min_tokens: int = MIN_TOKENS,
                         min_alpha: float = MIN_ALPHA,
                         hex_threshold: str = SAMPLE_HEX,
                         table: str = "documents") -> str:
    """DuckDB mirror of the full chain (same regexes/thresholds; the
    ratio expressions are the ones `textstats.quality_sql` pins against
    the Arrow kernels)."""
    return f"""
WITH gated AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
      / GREATEST(length(text), 1) AS alpha_ratio
  FROM {table}
), kept AS (
  SELECT doc_id, text, n_tokens FROM gated
  WHERE n_tokens >= {min_tokens} AND alpha_ratio >= {min_alpha}
), dedup AS (
  SELECT min(doc_id) AS doc_id, text, min(n_tokens) AS n_tokens
  FROM kept GROUP BY text
)
SELECT doc_id, text, n_tokens FROM dedup
WHERE {sample_by_key_sql_predicate("doc_id", hex_threshold)}
""".strip()


def curate_documents_near_dedup_sql(min_tokens: int = MIN_TOKENS,
                                    min_alpha: float = MIN_ALPHA,
                                    threshold: float = 0.8,
                                    table: str = "documents") -> str:
    """DuckDB mirror of :func:`curate_documents_near_dedup` — the gate
    + exact-dedup CTEs of :func:`curate_documents_sql` (no sample),
    then the EXACT n-gram-Jaccard pair query + recursive transitive
    closure over the survivor set, keeping the min-id doc per
    component. Valid as a STRICT oracle because the MinHash stage's
    found-pair set equals the exact Jaccard-threshold set on the test
    corpora (deterministic — fixed permutation seeds; verified at
    sf0.001 and sf0.01, and the `dedup_minhash` driver row pins it
    every round). At open-corpus scale MinHash recall is < 1 by
    design; the recall property itself stays pinned in pytest."""
    from fluent_server_ray.stages.dedup import (
        ngram_jaccard_dupes_sql,
        pair_components_sql,
    )

    pairs = ngram_jaccard_dupes_sql(threshold=threshold, table="dedup")
    comp = pair_components_sql(pairs)
    return f"""
WITH gated AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
      / GREATEST(length(text), 1) AS alpha_ratio
  FROM {table}
), kept AS (
  SELECT doc_id, text FROM gated
  WHERE n_tokens >= {min_tokens} AND alpha_ratio >= {min_alpha}
), dedup AS (
  SELECT min(doc_id) AS doc_id, text FROM kept GROUP BY text
), comp AS (
  {comp}
)
SELECT d.doc_id, d.text FROM dedup d
LEFT JOIN comp c USING (doc_id)
WHERE c.component IS NULL OR c.component = d.doc_id
ORDER BY d.doc_id
""".strip()


# ---------------------------------------- quality-curriculum mixing

CURRICULUM_T_HI = -3_400_000  # avg_logprob millionths ≈ corpus tercile
CURRICULUM_T_LO = -3_404_000
CURRICULUM_RATES = {"high": 1.0, "mid": 0.5, "low": 0.125}


def quality_curriculum(ds, t_hi: int = CURRICULUM_T_HI,
                       t_lo: int = CURRICULUM_T_LO,
                       rates: dict | None = None):
    """Quality-weighted data mixing (the CCNet/DoReMi-style curriculum
    step): score every document with the corpus's own unigram LM
    (:func:`textstats.doc_unigram_logprob`), tier it against FIXED
    avg-logprob thresholds (high/mid/low; thresholds are calibrated
    offline from the histogram quantile sketch — keeping them
    parameters keeps this stage a pure map, no global rank pass), and
    keep each tier at its declared rate with the shared deterministic
    md5 coin (:func:`sampling.mixture_sample`) — upsample-quality /
    downsample-noise without ever materializing a sorted corpus.

    The tier compare runs on ``avg_logprob`` (one IEEE division of two
    int64s — bit-exact across engines, so the tier boundary can never
    flip between engine and oracle). Output: (doc_id, tier) of
    survivors.
    """
    from fluent_server_ray.stages.sampling import mixture_sample
    from fluent_server_ray.stages.textstats import doc_unigram_logprob

    rates = dict(CURRICULUM_RATES if rates is None else rates)
    scored = doc_unigram_logprob(ds)

    def tier(t: pa.Table) -> pa.Table:
        avg = t["avg_logprob"]
        hi = pc.greater_equal(avg, pa.scalar(float(t_hi)))
        lo = pc.less(avg, pa.scalar(float(t_lo)))
        tiers = pc.if_else(hi, "high", pc.if_else(lo, "low", "mid"))
        return pa.table({"doc_id": t["doc_id"], "tier": tiers})

    tiered = scored.map_batches(tier, batch_format="pyarrow",
                                zero_copy_batch=True)
    return mixture_sample(tiered, rates, key_col="tier", id_col="doc_id")


def quality_curriculum_sql(t_hi: int = CURRICULUM_T_HI,
                           t_lo: int = CURRICULUM_T_LO,
                           rates: dict | None = None,
                           table: str = "documents") -> str:
    from fluent_server_ray.stages.sampling import mixture_sample_sql
    from fluent_server_ray.stages.textstats import doc_unigram_logprob_sql

    rates = dict(CURRICULUM_RATES if rates is None else rates)
    inner = mixture_sample_sql(rates, key_col="tier", id_col="doc_id",
                               table="tiered")
    return f"""
WITH scored AS ({doc_unigram_logprob_sql(table)}),
tiered AS (
  SELECT doc_id,
    CASE WHEN avg_logprob >= {float(t_hi)} THEN 'high'
         WHEN avg_logprob < {float(t_lo)} THEN 'low'
         ELSE 'mid' END AS tier
  FROM scored
)
{inner}
""".strip()


def export_sft_jsonl(sf_dir: str, out_dir: str):
    """SFT training-data EXPORT: assemble each conversation into one
    rendered document with its per-turn loss-mask spans and write
    newline-delimited JSON shards — the handoff format trainer
    tokenizers consume directly (document text + [start, end, train]
    char spans; no re-rendering on the trainer side).

    Shape: the rendered document (:func:`assembly.conv_to_documents`)
    and the span table (:func:`assembly.sft_loss_spans`) each run
    their one conv-bucket exchange; spans fold to one list row per
    conversation inside their own buckets (map_groups — no extra
    exchange) and meet the documents in a single bucketed hash join.
    Ray's ``write_json`` streams one JSONL shard per block. Returns
    (out_dir, n_docs).
    """
    import pyarrow as pa

    from fluent_server_ray.sources.transcripts import read_transcripts
    from fluent_server_ray.stages.assembly import (conv_to_documents,
                                                   sft_loss_spans)
    from fluent_server_ray.stages.joins import bucketed_hash_join
    from fluent_server_ray.stages.parse import apply_parse

    turns = apply_parse(read_transcripts(sf_dir)).materialize()
    # materialize: docs feeds BOTH the join and the returned count —
    # unmaterialized it would re-run the whole assembly for .count()
    docs = conv_to_documents(turns).materialize()
    spans = sft_loss_spans(turns)

    def fold(g) -> "pa.Table":
        g = g.sort_values(["conv_id", "turn_idx"])
        out = []
        for conv_id, gg in g.groupby("conv_id", sort=False):
            out.append({
                "conv_id": conv_id,
                "spans": [
                    {"turn_idx": int(r.turn_idx),
                     "start": int(r.start_off), "end": int(r.end_off),
                     "train": bool(r.trainable)}
                    for r in gg.itertuples(index=False)
                ],
            })
        return pa.Table.from_pylist(out)

    from fluent_server_ray.stages.assembly import _with_bucket

    folded = (_with_bucket(spans, "conv_id", 64)
              .groupby("_bucket")
              .map_groups(fold, batch_format="pandas"))
    joined = bucketed_hash_join(docs, folded, key="conv_id")

    def rn(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": t["conv_id"],
                         "text": t["doc_text"],
                         "spans": t["spans"]})

    out = joined.map_batches(rn, batch_format="pyarrow")
    out.write_json(out_dir)
    return out_dir, docs.count()


def curation_gate_funnel(ds, min_tokens: int = MIN_TOKENS,
                         min_alpha: float = MIN_ALPHA,
                         hex_threshold: str = SAMPLE_HEX) -> pa.Table:
    """Drop-off accounting for :func:`curate_documents`: how many
    docs survive each PREFIX of the gate chain (input → token gate →
    alpha gate → exact dedup → id-hash sample) — the funnel report a
    curation run publishes so "we kept 31%" decomposes into which
    gate took what.

    Exact counts at every stage: the two quality gates are combiner
    sums; the dedup stage is the exact distinct-text count
    (:func:`aggregate.grouped_distinct_count`'s two-level exchange);
    the sample stage counts distinct texts whose KEEPER (min doc_id,
    the exact_dedup rule) passes the md5 predicate — computed from a
    distributed (text → min id) merge, counted per block. Output:
    (stage_idx, stage, n_docs), 5 rows.
    """
    from fluent_server_ray.stages.aggregate import grouped_agg, skip_empty
    from fluent_server_ray.stages.sampling import _md5_hex

    def flags(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE),
                           pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"),
                          pa.int64())
        alpha_ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()),
            pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()))
        g1 = pc.greater_equal(n_tokens, min_tokens)
        g2 = pc.and_(g1, pc.greater_equal(alpha_ratio, min_alpha))
        return pa.table({"doc_id": t["doc_id"], "text": text,
                         "g1": g1, "g2": g2})

    flagged = ds.select_columns(["doc_id", "text"]).map_batches(
        flags, batch_format="pyarrow", zero_copy_batch=True)
    flagged = flagged.materialize()  # three consumers below

    def count_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n0": pa.array([t.num_rows], pa.int64()),
            "n1": pa.array([pc.sum(pc.cast(t["g1"], pa.int64())).as_py()
                            or 0], pa.int64()),
            "n2": pa.array([pc.sum(pc.cast(t["g2"], pa.int64())).as_py()
                            or 0], pa.int64()),
        })

    parts = pa.concat_tables(
        flagged.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    n0 = int(pc.sum(parts["n0"]).as_py() or 0)
    n1 = int(pc.sum(parts["n1"]).as_py() or 0)
    n2 = int(pc.sum(parts["n2"]).as_py() or 0)

    def survivors(t: pa.Table) -> pa.Table:
        t = t.filter(t["g2"])
        return pa.table({"text": t["text"], "doc_id": t["doc_id"]})

    keepers = grouped_agg(
        flagged.map_batches(skip_empty(survivors), batch_format="pyarrow",
                            zero_copy_batch=True),
        ["text"], [("doc_id", "min")], final="ray")

    def keeper_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id_min"].to_pylist()
        hexes = _md5_hex(ids)
        kept = sum(1 for h in hexes if h[:2] < hex_threshold)
        return pa.table({"n3": pa.array([t.num_rows], pa.int64()),
                         "n4": pa.array([kept], pa.int64())})

    kparts = pa.concat_tables(
        keepers.map_batches(skip_empty(keeper_partial),
                            batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    n3 = int(pc.sum(kparts["n3"]).as_py() or 0) if kparts.num_rows else 0
    n4 = int(pc.sum(kparts["n4"]).as_py() or 0) if kparts.num_rows else 0

    stages = ["input", "min_tokens", "alpha_ratio", "exact_dedup",
              "sample"]
    return pa.table({
        "stage_idx": pa.array(list(range(5)), pa.int64()),
        "stage": pa.array(stages, pa.string()),
        "n_docs": pa.array([n0, n1, n2, n3, n4], pa.int64()),
    })


def curation_gate_funnel_sql(min_tokens: int = MIN_TOKENS,
                             min_alpha: float = MIN_ALPHA,
                             hex_threshold: str = SAMPLE_HEX,
                             table: str = "documents") -> str:
    return f"""
WITH base AS (
  SELECT doc_id, COALESCE(text, '') AS text,
    CAST(len(regexp_extract_all(COALESCE(text, ''), '[^ ]+'))
         AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]'))
         AS DOUBLE)
      / GREATEST(length(COALESCE(text, '')), 1) AS alpha_ratio
  FROM {table}
), g2 AS (
  SELECT doc_id, text FROM base
  WHERE n_tokens >= {min_tokens} AND alpha_ratio >= {min_alpha}
), k AS (
  SELECT text, min(doc_id) AS keeper FROM g2 GROUP BY text
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'input' AS stage,
    (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_docs
  UNION ALL SELECT 1, 'min_tokens',
    (SELECT CAST(count(*) AS BIGINT) FROM base
     WHERE n_tokens >= {min_tokens})
  UNION ALL SELECT 2, 'alpha_ratio',
    (SELECT CAST(count(*) AS BIGINT) FROM g2)
  UNION ALL SELECT 3, 'exact_dedup',
    (SELECT CAST(count(*) AS BIGINT) FROM k)
  UNION ALL SELECT 4, 'sample',
    (SELECT CAST(count(*) AS BIGINT) FROM k
     WHERE substr(md5(COALESCE(CAST(keeper AS VARCHAR), '')), 1, 2)
       < '{hex_threshold}')
) ORDER BY stage_idx
""".strip()
