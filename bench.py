"""Benchmark harness for the flagship pipeline.

Headline metric: parsed+routed turns/sec through
parse → enrich → route → grouped-counts over a deterministic synthetic
transcripts corpus sized by the input sf (cached under /tmp so both
parallelism levels of --scaling see the identical bytes).

Usage:
    python bench.py              # one run; RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # fresh processes at 4/16 and 8/32 CPUs
                                 # (both N->4N pairs + efficiencies)

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time


class _EmptySchemaNoiseFilter(logging.Filter):
    """Drop the executor's empty-new-schema divergence warning.

    Ray's sort materializes empty range partitions as 0-COLUMN blocks
    (``ray/data/_internal/arrow_block.py`` — ``sort()`` /
    ``sort_and_partition()`` return ``_empty_table()`` for zero rows),
    and the streaming executor then warns ``RefBundle with a different
    schema ... new schema: .`` once per consuming operator. The engine
    already skips zero-row blocks it produces itself
    (``stages.aggregate.skip_empty``), but empty partitions born INSIDE
    Ray's shuffle (boundaries > rows, e.g. a 25-pair result across 32
    sort partitions) are not reachable from user code. Values are
    unaffected (oracle-checked); only the empty-schema variant is
    filtered — a real (typed) schema divergence still warns.
    """

    def filter(self, record):  # noqa: A003 (logging API)
        msg = record.getMessage()
        return not ("different schema" in msg and "new schema: ." in msg)


logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptySchemaNoiseFilter())

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# corpus sizing: sf0.1 → ~2M turns (sandbox stand-in for the 10^12 target)
N_CONVS = {"sf0.001": 2_000, "sf0.01": 20_000}.get(
    os.path.basename(SF_DIR.rstrip("/")), 480_000
)
# scaling runs use a 4x corpus: wall time at 32 cpus must stay well
# above the executor's ~1-2 s fixed cost (Dataset setup, task dispatch,
# driver merge) or the efficiency ratio measures overhead, not the
# dataflow. A real cluster-sizing measurement runs minutes per point.
SCALING_MULT = int(os.environ.get("FSR_SCALING_MULT", "4"))
_IS_SCALING_SUB = os.environ.get("FSR_SCALING_SUB") == "1"
if _IS_SCALING_SUB:
    N_CONVS *= SCALING_MULT
CACHE = (
    f"/tmp/fsr_bench_corpus/{os.path.basename(SF_DIR.rstrip('/'))}"
    + (f"_x{SCALING_MULT}" if _IS_SCALING_SUB else "")
)


def ensure_corpus() -> str:
    marker = os.path.join(CACHE, "_DONE")
    if not os.path.exists(marker):
        from fluent_server_ray.sources.synth import generate_transcripts

        generate_transcripts(
            CACHE, n_convs=N_CONVS, mean_turns=12, seed=42, n_files=32
        )
        open(marker, "w").write("ok")
    return CACHE


def run_once() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fluent_server_ray.pipelines.flagship import build_routed
    from fluent_server_ray.sources.transcripts import read_transcripts
    from fluent_server_ray.stages.aggregate import grouped_counts

    corpus = ensure_corpus()  # parallel generation (Ray is up)

    # ~4 blocks per CPU (round-3 same-day matrix, 4x corpus, M turns/s):
    #   cpus=16: 32blk 12.5 | 64blk 17.2 | 96blk 15.6 | 192blk 12.3
    #   cpus=32: 64blk 21.3 | 128blk 17.2 | 192blk 14.4
    #   cpus=4:   8blk  3.6 | 16blk  4.6 | 32blk  3.2
    # and 1x corpus cpus=32: 64blk 3.52s | 128blk 3.66s | 192blk 3.85s.
    # Fewer tasks = fewer plasma hops + less dispatch; too few starves
    # low-cpu runs. ncpu*4 is the best uniform formula across the
    # matrix (SURVEY §4.2's "2-4 blocks per core"); round 2's ncpu*6
    # left ~20-30% on the table at 16-32 cpus.
    num_blocks = NUM_CPUS * 4

    # warm the page cache so we measure compute+shuffle, not cold disk
    import ray.data as rd

    rd.read_parquet(corpus).count()

    queries: dict[str, float] = {}

    def counts_once():
        # prune at the read (ts/turn_idx never decoded) + projected
        # pipeline: only the kernels feeding the count keys run, and
        # the heartbeat-filter copy carries 5 narrow columns
        src = read_transcripts(
            corpus, override_num_blocks=num_blocks,
            columns=["conv_id", "role", "text", "tool"],
        )
        routed = build_routed(src, columns=["sink", "role", "tool", "tag"])
        return grouped_counts(routed, ["sink", "role", "tool", "tag"]).to_pandas()

    # 3 reps, min: steady-state number, robust to scheduler jitter
    reps = []
    for _ in range(3 if os.environ.get("FSR_COUNTS_ONLY") else 2):
        t0 = time.perf_counter()
        counts = counts_once()
        reps.append(time.perf_counter() - t0)
    t_counts = min(reps)
    n_turns = int(counts["n"].sum())  # routed turns (post-heartbeat-filter)
    queries["flagship_counts"] = round(t_counts, 3)

    if not os.environ.get("FSR_COUNTS_ONLY"):
        t0 = time.perf_counter()
        out = f"/tmp/fsr_bench_out/{NUM_CPUS}"
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        src = read_transcripts(corpus, override_num_blocks=num_blocks)
        build_routed(src).write_parquet(out, partition_cols=["sink"])
        queries["flagship_sinks_write"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(out, ignore_errors=True)

        # vocabulary build over the full corpus text (~500M tokens at
        # sf0.1): explode + local-count combiner → word-bucket exchange
        # → per-bucket top-k — the word-space shuffle at scale
        from fluent_server_ray.stages.textstats import vocab_top_words

        t0 = time.perf_counter()
        vocab_top_words(
            read_transcripts(corpus, override_num_blocks=num_blocks,
                             columns=["text"])
        )
        queries["vocab_corpus_top100"] = round(time.perf_counter() - t0, 3)

        # adjacent-pair collocations over the same corpus text: the
        # pair-forming explode (shifted flat-array self-join) is ~2x
        # the vocab work at identical shuffle shape
        from fluent_server_ray.stages.textstats import bigram_top

        t0 = time.perf_counter()
        bigram_top(
            read_transcripts(corpus, override_num_blocks=num_blocks,
                             columns=["text"])
        )
        queries["bigram_corpus_top100"] = round(time.perf_counter() - t0, 3)

    # training-data ops over the driver tables at this sf (small but
    # representative; the driver compares rounds on these too)
    import __ray_entry__ as entrymod

    for qname in () if os.environ.get("FSR_COUNTS_ONLY") else ("dedup_exact", "dedup_minhash", "ann_cosine_topk",
                  "sessionize", "join_revenue_by_priority",
                  "curation_pipeline", "conv_value_stats",
                  "user_funnel", "window_distinct_users",
                  "lm_prep_pipeline", "dedup_substring",
                  "doc_bm25_topk", "bigram_pmi_top",
                  "orders_segment_counts_salted", "dedup_ngram_jaccard",
                  "doc_sim_pairs", "dedup_containment",
                  "purchase_attribution", "doc_rank_fusion",
                  "token_graph_triangles", "event_motifs_top",
                  "prompt_completion_pairs", "events_profile_full",
                  "user_multi_funnel", "events_rolling_value_sum",
                  "dedup_sorted_neighborhood", "user_rfm_scores",
                  "token_graph_kcore", "events_mannwhitney_pairs",
                  "user_km_survival", "events_twap",
                  "orders_reconciliation", "user_churn_labels",
                  "doc_autocomplete_topk", "nation_revenue_q5",
                  "doc_nb_langid", "multimodal_phash_dupes",
                  "supplier_sole_late_q21", "orders_nested_lines",
                  "doc_gazetteer_tags", "events_rule_matches",
                  "events_weekly_periodogram",
                  "events_pairwise_perm_bh",
                  "events_merkle_fingerprint", "user_cdc_apply",
                  "doc_extractive_summary", "users_cohort_ltv",
                  "source_yules_k", "events_bootstrap_mean_ci"):
        # best-of-2: the box shows time-varying hypervisor steal
        # (BASELINE.md "round-4 end-of-round confirm"); the min of
        # two reps estimates the true cost like flagship's min-of-3.
        # try sits INSIDE the rep loop so a transient failure on rep 2
        # doesn't discard a valid rep-1 timing.
        reps = []
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                res = entrymod.queries()[qname](SF_DIR)
                if hasattr(res, "to_pandas"):
                    res.to_pandas()
                reps.append(time.perf_counter() - t0)
            except Exception:
                pass
        queries[qname] = round(min(reps), 3) if reps else -1.0

    if not os.environ.get("FSR_COUNTS_ONLY"):
        # incremental-ingestion probe: a corpus-scale text index probed
        # by ONE small new shard (~1/64 by conv hash). Note on the
        # per-worker partition cache (dedup._index_bucket_texts): a
        # repeat probe was MEASURED to show no cross-run gain here —
        # Ray assigns bucket tasks to workers with no affinity, so a
        # re-probe hits a given worker's cache with p ~ 1/n_workers
        # (~3% at 32 cpus); see BASELINE.md "index cache affinity".
        # The cache still bounds steady-state re-reads over MANY
        # shards (workers converge on the hot partitions); the bench
        # reports the honest build + single-probe costs.
        try:
            import shutil as _sh

            import pyarrow as _pa
            import pyarrow.compute as _pc

            from fluent_server_ray.stages.aggregate import (
                hash_bucket_array,
            )
            from fluent_server_ray.stages.dedup import (
                build_text_index,
                dedup_against_index,
            )

            def _texts(shard_mod=None):
                d = read_transcripts(corpus, columns=["conv_id", "text"])

                def rn(t):
                    out = _pa.table({"doc_id": t["conv_id"],
                                     "text": t["text"]})
                    if shard_mod is None:
                        return out
                    b = hash_bucket_array(out["doc_id"], 64)
                    return out.filter(_pc.equal(_pa.array(b), shard_mod))

                return d.map_batches(rn, batch_format="pyarrow",
                                     zero_copy_batch=True)

            idx = "/tmp/fsr_bench_incr_idx"
            _sh.rmtree(idx, ignore_errors=True)
            t0 = time.perf_counter()
            build_text_index(_texts(), idx, n_parts=64)
            queries["dedup_incremental_build"] = round(
                time.perf_counter() - t0, 3)
            shard = _texts(0).materialize()
            t0 = time.perf_counter()
            dedup_against_index(shard, idx, n_parts=64).count()
            queries["dedup_incremental_probe"] = round(
                time.perf_counter() - t0, 3)
            _sh.rmtree(idx, ignore_errors=True)
        except Exception:
            queries["dedup_incremental_probe"] = -1.0

    result = {
        "metric": "flagship parse+enrich+route+aggregate wall sec",
        "value": queries["flagship_counts"],
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "num_cpus": NUM_CPUS,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / t_counts, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    # pre-generate the (bigger) scaling corpus at full parallelism so
    # the first timed subprocess (4 cpus) doesn't pay generation
    gen_env = dict(os.environ, RAY_GRAFT_CPUS=str(NUM_CPUS),
                   FSR_SCALING_SUB="1", FSR_GEN_ONLY="1")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=gen_env,
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )

    def sub(ncpu: int) -> dict:
        # counts only: the 8 GB sink write would leave dirty pages
        # flushing through the NEXT subprocess's timed section, and the
        # side-query timings are measured by the plain bench run
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), FSR_COUNTS_ONLY="1",
                   FSR_SCALING_SUB="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Two N->4N pairs. The single-node stand-in has 32 real cores on ONE
    # socket: 4->16 has true 4x hardware headroom (the honest analogue
    # of adding nodes, each with its own memory bandwidth); 8->32 also
    # saturates the socket's shared bandwidth and understates a real
    # 4x-node cluster. Both are reported; headline = 4->16.
    # best-of-2 fresh processes per point: this VM shows ±20%
    # process-level noise (host neighbors); min wall = steady-state
    def best(ncpu: int) -> dict:
        a, b = sub(ncpu), sub(ncpu)
        return a if a["turns_per_sec"] >= b["turns_per_sec"] else b

    results = {}
    queries: dict[str, float] = {}
    measured = {n: best(n) for n in (4, 8, 16, 32)}
    for lo, hi in ((4, 16), (8, 32)):
        r_lo, r_hi = measured[lo], measured[hi]
        eff = (r_hi["turns_per_sec"] / r_lo["turns_per_sec"]) / (hi / lo)
        results[(lo, hi)] = (r_lo, r_hi, eff)
        queries[f"turns_per_sec_{lo}cpu"] = r_lo["turns_per_sec"]
        queries[f"turns_per_sec_{hi}cpu"] = r_hi["turns_per_sec"]
        queries[f"sec_{lo}cpu"] = r_lo["value"]
        queries[f"sec_{hi}cpu"] = r_hi["value"]
        queries[f"efficiency_{lo}to{hi}"] = round(eff, 3)
    r_hi = results[(4, 16)][1]
    return {
        "metric": "scaling efficiency N->4N (turns/sec ratio / cpu ratio), "
                  "4->16 cpus (true 4x hardware); 8->32 also reported",
        "value": queries["efficiency_4to16"],
        "unit": "efficiency",
        "queries": queries,
        "sf": r_hi["sf"],
        "num_cpus": 16,
        "turns": r_hi["turns"],
    }


if __name__ == "__main__":
    if os.environ.get("FSR_GEN_ONLY"):
        import ray

        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
        ensure_corpus()
        ray.shutdown()
        print("{}")
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
