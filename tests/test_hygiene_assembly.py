"""Behavior tests for the hygiene (scrub / repetition / decontaminate)
and assembly (window fns / conv docs / packing / splits) stages on
constructed corpora — the oracle-equality checks live in
test_training_ops.ORACLE_QUERIES; these pin the semantics the oracle
can't see (injected PII, constructed contamination, packing
invariants, split determinism)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


def test_pii_scrub_redacts_injected_pii(ray_session):
    from fluent_server_ray.stages.hygiene import scrub

    ds = _docs_ds(
        [
            (1, "contact bob@example.com or 10.0.0.1 or 555-123-4567 ok"),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.org and ip 192.168.1.254"),
        ]
    )
    out = scrub(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_email"] == 1
    assert out.loc[1, "n_ip"] == 1
    assert out.loc[1, "n_phone"] == 1
    assert out.loc[1, "text_clean"] == "contact <EMAIL> or <IP> or <PHONE> ok"
    assert out.loc[2, ["n_email", "n_ip", "n_phone"]].sum() == 0
    assert out.loc[2, "text_clean"] == "no pii here"
    assert out.loc[3, "n_email"] == 2 and out.loc[3, "n_ip"] == 1
    assert "<EMAIL>" in out.loc[3, "text_clean"]
    assert "a@b.io" not in out.loc[3, "text_clean"]


def test_scrub_counts_are_sequential(ray_session):
    """Counts are taken on the progressively-scrubbed text: a pattern
    masked by an earlier rule must not be double-counted by a later
    one (the SQL mirror nests regexp_replace identically)."""
    from fluent_server_ray.stages.hygiene import scrub

    # the email's domain ends in digits that would otherwise look like
    # the start of an IP — after email masking the IP count must be 0
    ds = _docs_ds([(1, "x 1.2.3.4@mail.com y")])
    out = scrub(ds).to_pandas()
    assert out.loc[0, "n_email"] == 1
    assert out.loc[0, "n_ip"] == 0
    assert out.loc[0, "text_clean"] == "x <EMAIL> y"


def test_ngram_repetition_flags_boilerplate(ray_session):
    from fluent_server_ray.stages.hygiene import ngram_repetition_batch
    from fluent_server_ray.stages.textstats import apply_doc_stage

    ds = _docs_ds(
        [
            (1, "buy now " * 10 + "end"),       # one dominant 2-gram
            (2, "a b c d e f g h"),              # all distinct
            (3, ""),                             # empty
            (4, "x y"),                          # < 3 tokens
        ]
    )
    out = (
        apply_doc_stage(ds, ngram_repetition_batch)
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 1: tokens = [buy now]*10 + [end]; 2-grams: 20 total,
    # 'now buy' x9, 'buy now' x10 (top), 'now end' x1
    assert out.loc[1, "n_2grams"] == 20
    assert out.loc[1, "top2_count"] == 10
    assert out.loc[1, "top2_frac"] == pytest.approx(0.5)
    assert out.loc[1, "dup3_frac"] > 0.8
    # doc 2: no repeats at all
    assert out.loc[2, "top2_count"] == 1
    assert out.loc[2, "dup3_frac"] == 0.0
    # degenerate docs report zeros, not NaN
    assert out.loc[3, "n_2grams"] == 0 and out.loc[3, "top2_frac"] == 0.0
    assert out.loc[4, "n_2grams"] == 1 and out.loc[4, "n_3grams"] == 0


def test_decontaminate_flags_benchmark_overlap(ray_session):
    from fluent_server_ray.stages.hygiene import decontaminate

    bench_text = "quick brown fox jumps over the lazy dog tonight"
    ds = _docs_ds(
        [
            (0, bench_text),                     # benchmark (id % 29 == 0)
            (1, "totally unrelated words entirely separate content here"),
            (2, "he saw the quick brown fox jumps in the field"),  # overlap
            (3, "fox quick brown scrambled order no shared trigram"),
            (30, "short doc"),                   # < 3 tokens never flagged
        ]
    )
    out = decontaminate(ds).to_pandas().set_index("doc_id")
    assert 0 not in out.index  # bench rows are excluded from output
    assert not out.loc[1, "contaminated"]
    assert out.loc[2, "contaminated"]
    assert not out.loc[3, "contaminated"]
    assert not out.loc[30, "contaminated"]


def test_decontaminate_empty_benchmark(ray_session):
    """No doc_id divisible by bench_mod → empty gram set → nothing
    flagged (and no crash on the empty broadcast)."""
    from fluent_server_ray.stages.hygiene import decontaminate

    ds = _docs_ds([(1, "a b c d"), (2, "a b c d")])
    out = decontaminate(ds).to_pandas()
    assert len(out) == 2 and not out["contaminated"].any()


def test_running_turn_stats_small(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.assembly import running_turn_stats

    t = pa.table(
        {
            "conv_id": ["c1", "c1", "c1", "c2"],
            "turn_idx": pa.array([2, 0, 1, 0], type=pa.int32()),
            "role": ["tool", "user", "assistant", "user"],
            "text": ["zzz", "hi", "yo!!", "solo"],
        }
    )
    out = (
        running_turn_stats(rd.from_arrow(t), n_buckets=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert out["turn_rank"].tolist() == [1, 2, 3, 1]
    assert out["cum_chars"].tolist() == [2, 6, 9, 4]
    assert out["prev_role"].tolist()[:3] == [None, "user", "assistant"]
    assert pd.isna(out["prev_role"].iloc[3])


def test_conv_to_documents_order_and_join(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.assembly import conv_to_documents

    t = pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([5, 1, 0], type=pa.int32()),
            "role": ["assistant", "user", "user"],
            "text": ["fine", "how?", "lone"],
        }
    )
    out = conv_to_documents(rd.from_arrow(t), n_buckets=2).to_pandas()
    out = out.set_index("conv_id")
    assert out.loc["c1", "doc_text"] == "user: how?\nassistant: fine"
    assert out.loc["c1", "n_turns"] == 2
    assert out.loc["c2", "doc_text"] == "user: lone"


def test_pack_sequences_invariants(ray_session):
    """Concat-and-chunk packing: within a bucket, docs ordered by id
    tile the token stream contiguously; every doc starts inside its
    assigned sequence (seq_off < budget) and offsets chain exactly."""
    import ray.data as rd

    from fluent_server_ray.stages.assembly import pack_sequences

    rng = np.random.default_rng(11)
    rows = [
        (int(i), " ".join("w%d" % k for k in rng.integers(0, 50, size=int(n))))
        for i, n in enumerate(rng.integers(1, 40, size=200))
    ]
    out = pack_sequences(_docs_ds(rows), budget=64, n_buckets=4).to_pandas()
    assert (out["seq_off"] < 64).all() and (out["seq_off"] >= 0).all()
    n_tok = {i: len(t.split()) for i, t in rows}
    for b, g in out.groupby("bucket"):
        g = g.sort_values("doc_id")
        run = 0
        for r in g.itertuples():
            assert r.seq_id == run // 64 and r.seq_off == run % 64
            run += n_tok[r.doc_id]
        assert (g["doc_id"] % 4 == b).all()


def test_late_flags_watermark_semantics(ray_session):
    import datetime

    import ray.data as rd

    from fluent_server_ray.stages.windows import late_flags

    base = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "ts": pa.array(
                [base,                                     # 1h before max → late
                 base + datetime.timedelta(seconds=1800),  # == watermark → NOT late (strict <)
                 base + datetime.timedelta(seconds=1801),
                 base + datetime.timedelta(seconds=3600)],  # the max
                type=pa.timestamp("us"),
            ),
        }
    )
    out = late_flags(rd.from_arrow(t), delay_seconds=1800).to_pandas()
    assert out.set_index("event_id")["is_late"].tolist() == [
        True, False, False, False
    ]
    # empty input: typed empty dataset, no crash on the empty max
    # (Ray's to_pandas() drops columns on zero-row datasets, so assert
    # on the Dataset schema, which is what downstream stages consume)
    empty = late_flags(rd.from_arrow(t.slice(0, 0)), delay_seconds=1800)
    assert empty.count() == 0
    assert empty.schema().names == ["event_id", "is_late"]


def test_split_assign_deterministic_and_total(ray_session):
    from fluent_server_ray.stages.assembly import split_assign

    rows = [(i, "t") for i in range(2000)]
    a = split_assign(_docs_ds(rows)).to_pandas()
    b = split_assign(_docs_ds(rows)).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    frac = a["split"].value_counts(normalize=True)
    assert frac["train"] > 0.9
    # ~3.1% each; generous bounds at n=2000
    assert 0.01 < frac["test"] < 0.06 and 0.01 < frac["val"] < 0.06


def test_bottomk_sample_equals_full_sort(ray_session):
    import hashlib

    import ray.data as rd

    from fluent_server_ray.stages.sampling import bottomk_sample

    ids = list(range(300))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(7)
    got = bottomk_sample(ds, k=20).to_pandas()
    want = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
    )[:20]
    assert list(got["skey"]) == [h for h, _ in want]
    assert list(got["doc_id"]) == [i for _, i in want]
    # empty input: typed empty table
    empty = bottomk_sample(rd.from_pandas(pd.DataFrame({"doc_id": ids})).filter(
        lambda r: False), k=5)
    assert len(empty) == 0 and empty.column_names == ["doc_id", "skey"]


def test_per_key_cap_deterministic_and_capped(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.sampling import per_key_cap

    df = pd.DataFrame(
        {"doc_id": range(100), "source": [f"s{i % 4}" for i in range(100)]}
    )
    ds = rd.from_pandas(df).repartition(5)
    a = per_key_cap(ds, cap=7).to_pandas()
    b = per_key_cap(rd.from_pandas(df).repartition(3), cap=7).to_pandas()
    # deterministic regardless of block layout
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("source").size() == 7).all()


def test_funnel_no_goal_events(ray_session):
    import datetime

    import ray.data as rd

    from fluent_server_ray.stages.windows import funnel

    base = datetime.datetime(2024, 1, 1)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "event_type": ["signup", "purchase", "signup"],
            "ts": [base, base + datetime.timedelta(hours=25), base],
        }
    )
    out = funnel(rd.from_pandas(df), within_seconds=86400).to_pandas()
    # user 1's purchase lands outside the 24h window; user 2 never buys
    assert out["converted"].tolist() == [False, False]
    assert out["user_id"].tolist() == [1, 2]


def test_cms_bounds_and_merge_determinism(ray_session):
    """Count-min estimates upper-bound true counts and never exceed
    them by more than the e/width·N bound; block layout cannot change
    the merged sketch (matrices add)."""
    import ray.data as rd

    from fluent_server_ray.stages.sketches import cms_build, cms_query

    rng = np.random.default_rng(7)
    # zipf-ish: key k appears ~ 1000/k times
    keys = [f"tag{k}" for k in range(1, 60) for _ in range(1000 // k)]
    rng.shuffle(keys)
    df = pd.DataFrame({"tag": keys})
    true = df["tag"].value_counts().to_dict()
    n = len(df)

    s1 = cms_build(rd.from_pandas(df).repartition(7), "tag", width=512)
    s2 = cms_build(rd.from_pandas(df).repartition(3), "tag", width=512)
    assert (s1 == s2).all()

    qkeys = sorted(true)
    est = cms_query(s1, qkeys)
    for k, e in zip(qkeys, est):
        assert e >= true[k]
        assert e <= true[k] + (np.e / 512) * n


def test_extract_fields_noncapturing_and_overflow(ray_session):
    """Named-group rewrite must target the first CAPTURING paren
    (skipping (?:...) and escaped parens), and overflowing matches must
    become NULL (TRY_CAST parity), never crash the batch."""
    import ray.data as rd

    from fluent_server_ray.stages.fields import extract_fields

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "props": [
                "level=warn k=7",
                "lvl=info k=99999999999999999999",  # > int64
                "no match here",
            ],
        }
    )
    fields = (
        ("lvl", r"(?:level|lvl)=([a-z]+)", pa.string(), "VARCHAR"),
        ("k", r"k=(-?[0-9]+)", pa.int64(), "BIGINT"),
    )
    out = extract_fields(rd.from_arrow(t), fields=fields).to_pandas()
    assert out["lvl"].tolist() == ["warn", "info", None]
    assert out["k"].tolist()[0] == 7
    assert pd.isna(out["k"].iloc[1]) and pd.isna(out["k"].iloc[2])

    with pytest.raises(ValueError, match="no capturing group"):
        extract_fields(
            rd.from_arrow(t),
            fields=(("x", r"k=[0-9]+", pa.int64(), "BIGINT"),),
        )


def test_grep_filter_semantics(ray_session):
    """fluentd filter_grep truth table: AND over includes, NOT-any
    over excludes, NULL field never matches (dropped by any include,
    kept only when includes are empty and no exclude matches)."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.fields import grep_filter, grep_filter_sql

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "text": ["alpha beta", "alpha", "beta gamma",
                     "alpha beta gamma", None],
        }
    )
    out = grep_filter(rd.from_arrow(t), include=(r"\balpha\b", r"beta"),
                      exclude=("gamma",)).to_pandas()
    assert out["doc_id"].tolist() == [0]

    # includes empty: NULL survives (no exclude matches a NULL)
    out2 = grep_filter(rd.from_arrow(t), exclude=("gamma",)).to_pandas()
    assert sorted(out2["doc_id"].tolist()) == [0, 1, 4]

    # SQL mirror agrees on the same table (NULL-safe COALESCE parity)
    con = duckdb.connect()
    con.register("documents", t)
    for inc, exc, expect in [
        ((r"\balpha\b", "beta"), ("gamma",), [0]),
        ((), ("gamma",), [0, 1, 4]),
    ]:
        sql = grep_filter_sql(include=inc, exclude=exc, select="doc_id")
        got = sorted(con.execute(sql).df()["doc_id"].tolist())
        assert got == expect, (inc, exc)


def test_chunk_windows_semantics(ray_session):
    """Truth table: short doc → one whole-doc chunk; exact stride
    tiling; short tail chunks kept; NULL text → no chunks; empty text
    → one empty chunk. Engine and SQL mirror agree."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import (chunk_windows,
                                                   chunk_windows_sql)

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "text": ["a b c", "a b c d e f", None, ""]})
    out = chunk_windows(rd.from_arrow(t), window=4, stride=2).to_pandas()
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == [
        (0, 0, "a b c"), (0, 1, "c"),
        (1, 0, "a b c d"), (1, 1, "c d e f"), (1, 2, "e f"),
        (3, 0, ""),
    ]
    con = duckdb.connect()
    con.register("documents", t)
    odf = con.execute(chunk_windows_sql(window=4, stride=2)).df()
    assert sorted(map(tuple, odf.itertuples(index=False))) == got

    with pytest.raises(ValueError):
        chunk_windows(rd.from_arrow(t), window=0)


def test_pivot_counts_null_and_undeclared(ray_session):
    """NULL and undeclared pivot values count toward no declared
    column; every declared column exists even when its value never
    occurs (typed zero)."""
    import ray.data as rd

    from fluent_server_ray.stages.features import pivot_counts

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 2], type=pa.int64()),
        "event_type": ["click", None, "click", "weird", "view"],
    })
    out = (pivot_counts(rd.from_arrow(t), "user_id", "event_type",
                        ("click", "view", "signup"))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out["n_click"].tolist() == [1, 1]
    assert out["n_view"].tolist() == [0, 1]
    assert out["n_signup"].tolist() == [0, 0]

    with pytest.raises(ValueError, match="identifier-safe"):
        pivot_counts(rd.from_arrow(t), "user_id", "event_type",
                     ("x'; DROP--",))


def test_zscore_null_and_exactness(ray_session):
    """NULL values are excluded from the moments and carry NULL z;
    the float contract is BIT-exact vs DuckDB on the same table."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from fluent_server_ray.stages.features import zscore, zscore_sql

    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "value": pa.array([1.25, None, 3.75, 10.00], type=pa.float64()),
    })
    out = (zscore(rd.from_arrow(t)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", t)
    odf = (con.execute(zscore_sql()).df()
           .sort_values("event_id").reset_index(drop=True))
    a, b = out["z"].values, odf["z"].values
    assert bool(np.isnan(a[1])) and bool(np.isnan(b[1]))
    mask = ~np.isnan(a)
    assert (a[mask] == b[mask]).all()  # bitwise, no tolerance

    with pytest.raises(ValueError, match="zero variance"):
        zscore(rd.from_arrow(pa.table({
            "event_id": pa.array([0, 1], type=pa.int64()),
            "value": pa.array([2.0, 2.0], type=pa.float64()),
        })))


def test_grouped_zscore_null_and_zero_variance(ray_session):
    """NULL group → NULL z (join-on-NULL); NULL value → NULL z;
    zero-variance group → NULL z for all its rows; other groups
    bit-exact vs the SQL mirror."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from fluent_server_ray.stages.features import (grouped_zscore,
                                                   grouped_zscore_sql)

    t = pa.table({
        "event_id": pa.array(list(range(7)), type=pa.int64()),
        "event_type": ["a", "a", "a", "b", "b", None, "a"],
        "value": pa.array([1.0, 2.0, 3.0, 5.0, 5.0, 9.0, None],
                          type=pa.float64()),
    })
    out = (grouped_zscore(rd.from_arrow(t)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", t)
    odf = (con.execute(grouped_zscore_sql()).df()
           .sort_values("event_id").reset_index(drop=True))
    a, b = out["z"].values, odf["z"].values
    nan_rows = [3, 4, 5, 6]  # zero-var group b, NULL group, NULL value
    for i in nan_rows:
        assert np.isnan(a[i]) and np.isnan(b[i]), i
    m = ~np.isnan(a)
    assert (a[m] == b[m]).all()  # bitwise


def test_mixture_sample_semantics(ray_session):
    """keep-all / fractional / keep-none / undeclared-source branches,
    engine vs SQL mirror (incl. the f=1.0 case a 2-hex threshold
    cannot express)."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.sampling import (mixture_sample,
                                                   mixture_sample_sql)

    t = pa.table({
        "doc_id": pa.array(list(range(40)), type=pa.int64()),
        "source": (["all"] * 10 + ["half"] * 10 + ["none"] * 10
                   + ["undeclared"] * 10),
    })
    fr = {"all": 1.0, "half": 0.5, "none": 0.0}
    out = mixture_sample(rd.from_arrow(t), fr).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    odf = con.execute(mixture_sample_sql(fr)).df()
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == sorted(map(tuple, odf.itertuples(index=False)))
    by_src = out.groupby("source").size().to_dict()
    assert by_src.get("all") == 10          # f=1.0 keeps every row
    assert by_src.get("none", 0) == 0       # f=0 keeps none
    assert by_src.get("undeclared", 0) == 0  # not in the mixture → dropped
    assert 0 < by_src.get("half", 0) < 10   # coin actually splits

    with pytest.raises(ValueError, match="fraction"):
        mixture_sample(rd.from_arrow(t), {"all": 1.5})


def test_token_filter_above_quantile_small(ray_session):
    """Median-length gate on a 4-doc corpus: ceil(0.5*4)=2nd doc's
    histogram bucket becomes the threshold."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import token_filter_above_quantile

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "text": ["a", "a b", "a b c", "a b c d"]})
    out = token_filter_above_quantile(
        rd.from_arrow(t), q=0.5, lo=0.0, hi=10.0, bins=10
    ).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2, 3]


def test_bigram_top_boundaries(ray_session):
    """Pairs never span documents, empty tokens vanish before pairing,
    single-word and NULL docs contribute nothing; engine == SQL."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.textstats import bigram_top, bigram_top_sql

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
                  "text": ["a b  a b", "b a", "solo", None, ""]})
    out = bigram_top(rd.from_arrow(t), k=10).to_pandas()
    got = list(map(tuple, out.itertuples(index=False)))
    # "a b  a b" splits with an empty token that must vanish: pairs
    # (a b)(b a)(a b); doc 1 adds (b a) — and NO cross-doc (b b)
    assert got == [("a b", 2), ("b a", 2)]
    con = duckdb.connect()
    con.register("documents", t)
    odf = con.execute(bigram_top_sql(k=10)).df()
    assert list(map(tuple, odf.itertuples(index=False))) == got

    empty = bigram_top(rd.from_arrow(pa.table(
        {"doc_id": pa.array([0], type=pa.int64()), "text": ["solo"]})))
    assert len(empty) == 0
    assert empty.column_names == ["pair", "n"]


def test_word_postings_distinct_and_cap(ray_session):
    """A repeated word counts its doc once; posting lists sort by the
    NUMERIC doc id; lists above max_docs become NULL but keep their
    exact count; engine == SQL."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.textstats import (word_postings,
                                                    word_postings_sql)

    t = pa.table({"doc_id": pa.array([5, 2, 9, 11], type=pa.int64()),
                  "text": ["a b a", "b c", "a  c", "a x"]})
    out = word_postings(rd.from_arrow(t), max_docs=2).to_pandas()
    got = sorted(
        (w, n, None if pd.isna(dl) else dl)
        for w, n, dl in out.itertuples(index=False)
    )
    # 'a' appears in docs 5,9,11 (> cap 2) → NULL list, exact count 3;
    # doc 11 sorts numerically after 2 and 9
    assert got == [("a", 3, None), ("b", 2, "2,5"), ("c", 2, "2,9"),
                   ("x", 1, "11")]
    con = duckdb.connect()
    con.register("documents", t)
    odf = con.execute(word_postings_sql(max_docs=2)).df()
    assert sorted(
        (w, n, None if pd.isna(dl) else dl)
        for w, n, dl in odf.itertuples(index=False)
    ) == got


def test_percentile_rank_bucket_rule(ray_session):
    """pct = strictly-lower-bucket count / n; clipping at the edges;
    NULL → NULL; bit-exact vs DuckDB."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from fluent_server_ray.stages.features import (percentile_rank,
                                                   percentile_rank_sql)

    t = pa.table({"event_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
                  "value": pa.array([10.0, 20.0, None, 10.4, 999999.0],
                                    type=pa.float64())})
    out = (percentile_rank(rd.from_arrow(t), bins=10, hi=100.0)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # buckets of width 10: {10, 10.4}→b1 (below=0), 20→b2 (below=2),
    # 999999 clips to b9 (below=3); n=4
    assert out["pct"].tolist()[:2] == [0.0, 0.5]
    assert np.isnan(out["pct"].iloc[2])
    assert out["pct"].tolist()[3:] == [0.0, 0.75]
    con = duckdb.connect()
    con.register("events", t)
    odf = (con.execute(percentile_rank_sql(bins=10, hi=100.0)).df()
           .sort_values("event_id").reset_index(drop=True))
    a, b = out["pct"].values, odf["pct"].values
    m = ~np.isnan(a)
    assert (a[m] == b[m]).all() and (np.isnan(a) == np.isnan(b)).all()


def test_encode_with_vocab_semantics(ray_session):
    """id = vocab position, OOV → -1, duplicate tokens keep order,
    empty tokens vanish, tokenless/NULL docs emit no row."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import encode_with_vocab

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "text": ["b a  b", "zzz a", None, ""]})
    out = encode_with_vocab(rd.from_arrow(t), ["b", "a"]).to_pandas()
    assert sorted(map(tuple, out.itertuples(index=False))) == [
        (0, "0,1,0"), (1, "-1,1")]


def test_grouped_zscore_all_null_block(ray_session):
    """A block where one group's values are ALL NULL produces a
    partial with None sums — the driver merge must coalesce, not
    crash (code-review regression)."""
    import numpy as np
    import ray.data as rd

    from fluent_server_ray.stages.features import grouped_zscore

    b1 = pa.table({"event_id": pa.array([0, 1], type=pa.int64()),
                   "event_type": ["a", "a"],
                   "value": pa.array([1.0, 3.0], type=pa.float64())})
    b2 = pa.table({"event_id": pa.array([2, 3], type=pa.int64()),
                   "event_type": ["a", "a"],
                   "value": pa.array([None, None], type=pa.float64())})
    out = (grouped_zscore(rd.from_arrow([b1, b2])).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["z"].tolist()[:2] == [-1.0, 1.0]
    assert np.isnan(out["z"].iloc[2]) and np.isnan(out["z"].iloc[3])


def test_sampling_null_id_matches_sql(ray_session):
    """NULL ids: dropped by any coin-gated branch (md5(NULL) is NULL
    in SQL) but KEPT by mixture's f=1.0 keep-all branch (whose SQL
    predicate never consults the coin) — engine == mirror on both
    (code-review regression)."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.sampling import (mixture_sample,
                                                   mixture_sample_sql,
                                                   weighted_sample,
                                                   weighted_sample_sql)

    t = pa.table({"doc_id": pa.array([1, None, 2, None], type=pa.int64()),
                  "source": ["all", "all", "half", "half"]})
    fr = {"all": 1.0, "half": 0.5}
    out = mixture_sample(rd.from_arrow(t), fr).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    odf = con.execute(mixture_sample_sql(fr)).df()
    key = lambda df: sorted(
        ((-1 if pd.isna(i) else int(i), s)
         for i, s in df.itertuples(index=False)))
    # -1 stands in for a NULL id (sortable); no real id is negative
    assert key(out) == key(odf)
    assert (-1, "all") in key(out)       # keep-all keeps NULL id
    assert (-1, "half") not in key(out)  # coin drops NULL id

    t2 = pa.table({"doc_id": pa.array([None, 7], type=pa.int64()),
                   "n_chars": pa.array([500, 500], type=pa.int64())})
    w = weighted_sample(rd.from_arrow(t2)).to_pandas()
    con.register("documents2", t2)
    osql = weighted_sample_sql(table="documents2")
    ow = con.execute(osql).df()
    assert key(w[["doc_id", "n_chars"]]) == key(ow[["doc_id", "n_chars"]])
    assert not w["doc_id"].isna().any()


def test_token_filter_empty_corpus(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.textstats import token_filter_above_quantile

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    out = token_filter_above_quantile(rd.from_arrow(empty))
    assert out.count() == 0
    # schema survives even though to_pandas() on a 0-row Dataset
    # drops columns (known Ray behavior)
    assert sorted(out.schema().names) == ["doc_id", "n_tokens"]


def test_word_postings_all_capped_stays_string(ray_session):
    """max_docs=0 caps EVERY posting list — the all-None column must
    stay string-typed across blocks (code-review regression)."""
    import ray.data as rd

    from fluent_server_ray.stages.textstats import word_postings

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": ["a b", "b c"]})
    out = word_postings(rd.from_arrow(t), max_docs=0).to_pandas()
    assert len(out) == 3
    assert out["doc_list"].isna().all()
    assert out["n_docs"].tolist() == [1, 1, 2] or sorted(
        out["n_docs"].tolist()) == [1, 1, 2]


def test_null_key_contracts(ray_session):
    """NULL keys across the md5 family: split_assign → 'train' (SQL's
    CASE-on-NULL falls to ELSE), sample_by_key NEVER keeps a NULL key
    (md5(NULL) comparison fails) while a REAL '' key hashes as md5(''),
    rank-based samplers fail LOUDLY."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import split_assign
    from fluent_server_ray.stages.sampling import per_key_cap, sample_by_key

    t = pa.table({"doc_id": pa.array([1, None, 2], type=pa.int64())})
    out = (split_assign(rd.from_arrow(t)).to_pandas())
    null_split = out.loc[out["doc_id"].isna(), "split"].iloc[0]
    assert null_split == "train"
    con = duckdb.connect()
    con.register("documents", t)
    from fluent_server_ray.stages.assembly import split_assign_sql
    odf = con.execute(split_assign_sql()).df()
    assert odf.loc[odf["doc_id"].isna(), "split"].iloc[0] == "train"

    # sample_by_key: NULL key dropped at ANY threshold; '' key follows
    # md5('') = 'd41d...' (kept only when threshold > 'd4')
    k = pa.table({"conv_id": pa.array([None, "", "x"], type=pa.string()),
                  "v": pa.array([1, 2, 3], type=pa.int64())})
    kept_hi = sample_by_key(rd.from_arrow(k), "conv_id",
                            hex_threshold="ff").to_pandas()
    assert kept_hi["conv_id"].isna().sum() == 0
    assert "" in kept_hi["conv_id"].tolist()  # 'd4' < 'ff'
    kept_lo = sample_by_key(rd.from_arrow(k), "conv_id",
                            hex_threshold="40").to_pandas()
    assert (len(kept_lo) == 0
            or "" not in kept_lo["conv_id"].tolist())

    with pytest.raises(Exception, match="NULL id"):
        per_key_cap(rd.from_arrow(pa.table({
            "doc_id": pa.array([1, None], type=pa.int64()),
            "source": ["s", "s"],
        }))).to_pandas()


def test_vocab_empty_corpus_typed(ray_session):
    import ray.data as rd

    from fluent_server_ray.stages.textstats import vocab_top_words

    empty = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                      "text": ["", ""]})
    out = vocab_top_words(rd.from_arrow(empty))
    assert len(out) == 0
    assert out.column_names == ["word", "n"]


def test_concat_multiline_semantics(ray_session):
    """Continuations merge into the nearest earlier leader; a conv
    STARTING with continuations forms a leaderless group 0; NULL text
    counts toward n_lines but is skipped by the join (string_agg
    semantics), an all-NULL group has NULL text."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import (concat_multiline,
                                                   concat_multiline_sql)

    t = pa.table({
        "conv_id": ["c1"] * 5 + ["c2"] * 2 + ["c3"],
        "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1, 0], type=pa.int32()),
        "text": ["boom", "ERR-1 a", "ERR-2 b", "ok", None,
                 "ERR-9 leaderless", "lead", None],
    })
    out = concat_multiline(rd.from_arrow(t)).to_pandas()
    got = sorted(
        (c, s, n, None if pd.isna(x) else x)
        for c, s, n, x in out.itertuples(index=False)
    )
    assert got == [
        ("c1", 0, 3, "boom\nERR-1 a\nERR-2 b"),
        ("c1", 3, 1, "ok"),
        ("c1", 4, 1, None),          # NULL text can't match the
        # continuation pattern → it's a leader of its own NULL group
        ("c2", 0, 1, "ERR-9 leaderless"),  # leaderless group 0
        ("c2", 1, 1, "lead"),
        ("c3", 0, 1, None),
    ]
    con = duckdb.connect()
    con.register("transcripts", t)
    odf = con.execute(concat_multiline_sql(source_cte="transcripts")).df()
    assert sorted(
        (c, s, n, None if pd.isna(x) else x)
        for c, s, n, x in odf.itertuples(index=False)
    ) == got


def test_suppress_semantics(ray_session):
    """A turn equal to any of the previous `lookback` texts in its conv
    is dropped; NULL text never matches (always survives); empty-string
    heartbeats DO collapse; a repeat farther back than the lookback
    window survives. Engine == hand-derived == DuckDB mirror."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import suppress, suppress_sql

    t = pa.table({
        "conv_id": ["c1"] * 8 + ["c2"] * 3,
        "turn_idx": pa.array(list(range(8)) + [0, 1, 2], type=pa.int32()),
        "text": ["a", "a",          # consecutive dup -> drop idx1
                 "b", "a",          # 'a' at distance 2 -> drop idx3
                 None, None,        # NULLs never match -> both survive
                 "", "",            # empty heartbeat collapses -> drop idx7
                 "x", "y", "x"],    # c2: 'x' at distance 2 -> drop idx2
    })
    out = suppress(rd.from_arrow(t), lookback=3).to_pandas()
    got = sorted(
        (c, i, None if pd.isna(x) else x)
        for c, i, x in out.itertuples(index=False)
    )
    assert got == [
        ("c1", 0, "a"), ("c1", 2, "b"), ("c1", 4, None), ("c1", 5, None),
        ("c1", 6, ""), ("c2", 0, "x"), ("c2", 1, "y"),
    ]
    con = duckdb.connect()
    con.register("transcripts", t)
    odf = con.execute(suppress_sql(source_cte="transcripts")).df()
    assert sorted(
        (c, i, None if pd.isna(x) else x)
        for c, i, x in odf.itertuples(index=False)
    ) == got


def test_suppress_lookback_window(ray_session):
    """A repeat farther back than the window survives (lookback=1 keeps
    the alternating pattern intact)."""
    import ray.data as rd

    from fluent_server_ray.stages.assembly import suppress

    t = pa.table({
        "conv_id": ["c"] * 4,
        "turn_idx": pa.array([0, 1, 2, 3], type=pa.int32()),
        "text": ["a", "b", "a", "b"],
    })
    out = suppress(rd.from_arrow(t), lookback=1).to_pandas()
    assert len(out) == 4


def test_suppress_null_conv_partition_matches_sql(ray_session):
    """All NULL conv_ids form ONE partition (SQL PARTITION BY
    semantics): their repeated texts suppress exactly like a real
    conversation's — pandas' default NaN-group drop must not leak
    them through."""
    import duckdb
    import ray.data as rd

    from fluent_server_ray.stages.assembly import suppress, suppress_sql

    t = pa.table({
        "conv_id": pa.array([None, None, None, "c"], type=pa.string()),
        "turn_idx": pa.array([0, 1, 2, 0], type=pa.int32()),
        "text": ["dup", "dup", "dup", "dup"],
    })
    out = suppress(rd.from_arrow(t), lookback=3).to_pandas()

    def norm(df):
        return sorted(
            ("" if pd.isna(c) else c, i, x)
            for c, i, x in df.itertuples(index=False)
        )

    got = norm(out)
    assert got == [("", 0, "dup"), ("c", 0, "dup")]
    con = duckdb.connect()
    con.register("transcripts", t)
    odf = con.execute(suppress_sql(source_cte="transcripts")).df()
    assert norm(odf) == got


def test_throttle_quota_and_null_key(ray_session):
    """At most `limit` rows survive per (key, window), first-come by
    (ts, id); a NULL key is its own partition (SQL PARTITION BY)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.windows import throttle, throttle_sql

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(10):  # one hot window for key 'a'
        rows.append((i, "a", base + pd.Timedelta(seconds=i)))
    rows.append((20, "a", base + pd.Timedelta(seconds=700)))  # next window
    for i in range(4):  # NULL key partition
        rows.append((30 + i, None, base + pd.Timedelta(seconds=i)))
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "ts"])

    got = throttle(rd.from_pandas(df), width_seconds=600,
                   limit=3).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(throttle_sql(width_seconds=600, limit=3)).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    # quota binds: 3 kept of 10 in the hot window, +1 next window,
    # +3 of 4 in the NULL partition
    assert len(got) == 7
    assert got[got.event_type == "a"].event_id.tolist() == [0, 1, 2, 20]


def test_conv_merge_roles_islands(ray_session):
    """Consecutive same-role turns merge; NULL-role runs merge
    (IS DISTINCT FROM); NULL texts skip in the join; all-NULL islands
    yield NULL text — equality with the SQL mirror's semantics pinned
    on an adversarial frame."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.assembly import conv_merge_roles

    df = pd.DataFrame({
        "conv_id": ["a"] * 6 + ["b"] * 3 + ["c"] * 2,
        "turn_idx": [0, 1, 2, 3, 4, 5, 0, 1, 2, 0, 1],
        "role": ["user", "user", "asst", None, None, "user",
                 "asst", "asst", "asst", None, "user"],
        "text": ["t0", "t1", "t2", None, "t4", "t5",
                 "x0", None, "x2", None, "y1"],
    })
    got = conv_merge_roles(rd.from_pandas(df)).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
WITH flagged AS (
  SELECT conv_id, turn_idx, role, text,
    CASE WHEN row_number() OVER w = 1
           OR role IS DISTINCT FROM lag(role) OVER w
         THEN 1 ELSE 0 END AS new_msg
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), islands AS (
  SELECT conv_id, turn_idx, role, text,
    sum(new_msg) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS msg_idx
  FROM flagged)
SELECT conv_id, CAST(msg_idx AS BIGINT) AS msg_idx, min(role) AS role,
  string_agg(text, chr(10) ORDER BY turn_idx) AS text,
  CAST(count(*) AS BIGINT) AS n_merged
FROM islands GROUP BY conv_id, msg_idx ORDER BY conv_id, msg_idx
""").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    assert got[got.conv_id == "a"].text.tolist() == [
        "t0\nt1", "t2", "t4", "t5"]


def test_log_templates_masking(ray_session):
    """Quoted strings mask BEFORE number runs (digits inside quotes
    become <S>, never <N>); NULL text templates as ''."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.fields import log_templates

    df = pd.DataFrame({"text": [
        'CALL tool=search args={"q":"err 42"}',
        'CALL tool=search args={"q":"other"}',
        "ERR-003 purchase failed",
        "ERR-914 error failed",
        None,
        "",
    ]})
    got = log_templates(rd.from_pandas(df)).to_pandas()
    want = {
        "": 2,
        "CALL tool=search args={<S>:<S>}": 2,
        "ERR-<N> error failed": 1,
        "ERR-<N> purchase failed": 1,
    }
    assert dict(zip(got.template, got.n_events)) == want


def test_pseudonymize_matches_duckdb_and_preserves_nulls(ray_session):
    """Salted sha256 pseudonym equals DuckDB's expression; same value
    -> same pseudonym (groupby keys survive); NULL stays NULL;
    non-string columns hash their VARCHAR form."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import (
        pseudonymize,
        pseudonymize_expr_sql,
    )

    import pyarrow as pa

    t = pa.table({
        "conv_id": pa.array(["conv-1", "conv-2", "conv-1", None]),
        "user_id": pa.array([7, 8, 7, 9], type=pa.int64()),
        "n": pa.array([1, 2, 3, 4], type=pa.int64()),
    })
    df = t.to_pandas()
    got = (pseudonymize(rd.from_arrow(t), cols=("conv_id", "user_id"))
           .to_pandas().sort_values("n").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(f"""
        SELECT {pseudonymize_expr_sql('conv_id')} AS conv_id,
               {pseudonymize_expr_sql('user_id')} AS user_id, n
        FROM t ORDER BY n""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.loc[0, "conv_id"] == got.loc[2, "conv_id"]  # stable key
    assert got.conv_id.isna().iloc[3]


def test_pseudonymize_all_null_batch(ray_session):
    """Round-4 review fix: an all-NULL identifier batch gave an empty
    factorize uniques array and np.where's eager branch indexing
    raised IndexError. NULL must stay NULL even when the whole block
    is NULL."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import pseudonymize

    t = pa.table({
        "conv_id": pa.array([None, None], type=pa.string()),
        "n": pa.array([1, 2], type=pa.int64()),
    })
    got = pseudonymize(rd.from_arrow(t), cols=("conv_id",)).to_pandas()
    assert got.conv_id.isna().all()
    assert sorted(got.n) == [1, 2]


def test_sft_loss_spans_offsets_and_mask(ray_session):
    """SFT loss-mask spans: offsets slice the conv_to_documents
    rendering back out exactly (per-turn text equality under stable
    ordering — the engine's core invariant, applied to the mask);
    trainable flags exactly the assistant turns; the final end_off
    equals the document length; spans are separated by exactly the
    one joining newline."""
    import ray.data as rd

    from fluent_server_ray.stages.assembly import (
        conv_to_documents,
        sft_loss_spans,
    )

    t = pa.table({
        "conv_id": ["c1", "c1", "c1", "c2", "c2"],
        "turn_idx": pa.array([5, 1, 9, 0, 2], type=pa.int32()),
        "role": ["assistant", "user", "tool", "user", "assistant"],
        "text": ["fine", "how?", "", "héllo", "wörld"],
    })
    spans = sft_loss_spans(rd.from_arrow(t), n_buckets=2).to_pandas()
    docs = (conv_to_documents(rd.from_arrow(t), n_buckets=2)
            .to_pandas().set_index("conv_id"))
    src = t.to_pandas().set_index(["conv_id", "turn_idx"])
    for conv, g in spans.groupby("conv_id"):
        doc = docs.loc[conv, "doc_text"]
        g = g.sort_values("turn_idx").reset_index(drop=True)
        prev_end = None
        for r in g.itertuples():
            line = doc[r.start_off:r.end_off]
            role, text = src.loc[(conv, r.turn_idx), ["role", "text"]]
            assert line == f"{role}: {text}"
            assert r.trainable == (role == "assistant")
            if prev_end is not None:
                assert r.start_off == prev_end + 1  # the one newline
            prev_end = r.end_off
        assert prev_end == len(doc)


def test_sft_loss_spans_matches_duckdb(ray_session):
    """Driver-style strict check at sf0.001: engine spans equal the
    SQL-window oracle row-for-row."""
    import duckdb
    import ray.data  # noqa: F401

    import __ray_entry__ as e
    from tests.conftest import SF_SMALL

    ray_df = e.queries()["sft_loss_spans"](SF_SMALL).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')")
    duck_df = con.execute(e.oracle_sql()["sft_loss_spans"]).df()
    assert sorted(ray_df.columns) == sorted(duck_df.columns)
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_collapse_repeat_tokens_edges(ray_session):
    """Stutter runs collapse to one token; cross-doc boundaries never
    merge; whitespace canonicalizes; empty/null text survives."""
    import pandas as pd
    import ray.data as rd

    from fluent_server_ray.stages.hygiene import collapse_repeat_tokens

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["the the the cat cat sat", "sat", "sat  sat", "", None],
    })
    got = collapse_repeat_tokens(rd.from_pandas(df)).to_pandas()
    assert got.text.tolist() == ["the cat sat", "sat", "sat", "", ""]
    assert got.n_before.tolist() == [6, 1, 2, 0, 0]
    assert got.n_after.tolist() == [3, 1, 1, 0, 0]


def test_export_sft_jsonl_round_trip(ray_session, tmp_path):
    """End-to-end SFT export: JSONL shards read back with plain
    pandas; every span's [start, end) slice of the document equals
    the rendered 'role: text' line, and train flags mark assistant
    turns only."""
    import glob
    import json

    import pandas as pd

    from fluent_server_ray.pipelines.curation import export_sft_jsonl
    from tests.conftest import SF_SMALL

    out, n = export_sft_jsonl(SF_SMALL, str(tmp_path / "sft"))
    rows = []
    for f in glob.glob(f"{out}/*.json"):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert len(rows) == n > 0
    seen_train = seen_masked = 0
    for r in rows[:50]:
        assert r["text"] and r["spans"]
        for sp in r["spans"]:
            seg = r["text"][sp["start"]:sp["end"]]
            assert "\n" not in seg and seg == seg.strip("\n")
            role = seg.split(": ", 1)[0]
            assert (role == "assistant") == sp["train"]
            seen_train += sp["train"]
            seen_masked += not sp["train"]
    assert seen_train and seen_masked
