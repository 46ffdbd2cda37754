"""Scale-regression suite (``pytest -m scale`` — excluded from default
CI by pytest.ini).

Mechanizes the two SCALING.md experiments so scale regressions are
caught by a command, not by hand:

- 10x key-offset-replicated fixtures (scripts/make_scaled_fixtures):
  the heavy dedup queries must scale sub-linearly (bucketing/collapse
  doing its job) — the round-1 incident this guards against was a
  single-file scan under-splitting that made doc_repetition_filter 10x
  slower than it should have been.
- planted-skew join (scripts/bench_skew): salted_join must stay exact
  and must not lose badly to the plain sort-merge join it replaces
  (on a quiet machine it wins ~2.8x; the bound here is loose because
  CI shares the sandbox).

Time-ratio assertions use generous bounds: these tests exist to catch
order-of-magnitude regressions (a lost partitioning, an accidental
cross join), not 20% drift — bench.py medians track the latter.
"""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

pytestmark = pytest.mark.scale

SRC_SF = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
FACTOR = 10


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    from make_scaled_fixtures import build_scaled

    dst = str(tmp_path_factory.mktemp("sf_scaled"))
    build_scaled(SRC_SF, dst, FACTOR)
    return dst


def _run_noop(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    return time.perf_counter() - t0


@pytest.mark.parametrize(
    "qname,max_ratio",
    [
        # dedup worst case: every doc in an identity group of 10 —
        # collapse-first must keep the pair stage SUB-linear
        ("minhash_lsh_pairs", 6.0),
        # explode-heavy scan, CPU-bound on saturated cores: near-LINEAR
        # (~10x) is its exact-stats floor — the bound only catches a
        # superlinear blowup (accidental O(n^2) pairing / lost split)
        ("doc_repetition_filter", 13.0),
        # iterative CC on the maximal pair graph: sub-linear via
        # endpoint-only propagation
        ("dedup_clusters", 8.0),
        # round-6 additions (SCALING.md "curation/retrieval tier"):
        # measured 1.9x / 2.3x / 3.6x / 3.0x at 10x — bounds are ~2.5x
        # the measurement to catch order-of-magnitude regressions only.
        # full-vocab (doc, term) shuffle, map-side combined both hops
        ("corpus_tfidf_topterms", 6.0),
        # six chained stages must not amplify each other's shuffles
        ("corpus_curation_pipeline", 7.0),
        # explode + scan, overhead-dominated baseline: near-linear is
        # the exact-scoring floor; the bound catches a lost top-k
        # (global-sort window) or lost early term filter
        ("doc_bm25_search", 9.0),
        # two-level prefix sum: linear row cost, <= 1000-row windows
        ("doc_sequence_packing", 8.0),
        # round-6 session-2 (SCALING.md): measured 1.1x-5.1x at 10x;
        # bounds ~2.5x the measurement.
        # bounded eval broadcast: corpus-linear, NOT |corpus|x|eval|
        ("semantic_decontamination", 4.0),
        # double-quantizer: flat (model-state fits + pruned ADC scan)
        ("embedding_ivfpq_topk", 4.0),
        # regex-stack quality pass is the linear term; shard machinery
        # size-independent — bound catches an orderBy/ntile regression
        ("doc_quality_sort_shards", 11.0),
        # integer micro-unit iterations, dst-keyed map-combined shuffle
        ("page_rank_pages", 7.0),
        # round-7 (SCALING.md r7 tables): measured 1.1x-3.0x at 10x;
        # bounds ~2.5x the measurement.
        # staged-lambda winnowing: scan-linear map pass — the bound
        # catches the O(shingles x windows) recompute coming back
        ("doc_winnowing_fingerprints", 8.0),
        # vocab-level relations after the first collapse: near-flat
        ("corpus_source_drift", 3.0),
        # directed prefix filter, collapse-first: near-flat pair work
        ("containment_dup_pairs", 5.0),
        # canonical-bucket interval join: no dedup exchange, near-flat
        ("session_incident_overlap", 4.0),
        # round-7 session-6 (SCALING.md r7 session-6 tables): measured
        # 1.0x-2.3x at 10x; bounds ~2.5x the measurement. These also
        # re-run the big-SF arithmetic: BOTH session-6 long-overflow
        # bugs (ABC's x10^4 share math, the KMV-era none) crashed at
        # 10x before they were range-analyzed — a bound here turns
        # that class of regression into a test failure.
        # joinless literal-centroid assignment: near-flat
        ("kmeans_lloyd_clusters", 4.0),
        # two-phase: histogram combine + median-bucket-only sort
        ("lineitem_weighted_median", 4.0),
        # two-phase descending cumsum on the cent grid
        ("part_abc_classes", 3.0),
        # bucket-offset numbering, metadata window
        ("doc_global_sequence", 3.0),
        # round-8 (SCALING.md r8 table): measured 1.2x-4.7x at 10x;
        # bounds ~2.5x the measurement.
        # one combined aggregate, min_by tuple state
        ("event_value_ohlc", 3.5),
        # three two-phase ranks over bounded histograms
        ("customer_rfm_segments", 3.5),
        # kNN-sparsified wedge join — the bound guards the round's
        # catch (pre-sparsify this measured 10.1x)
        ("copurchase_link_prediction", 5.0),
        # basket-bounded pair groupBy, linear in orders
        ("part_copurchase_lift", 6.0),
    ],
)
def test_tenx_replication_scales_sublinearly(spark, scaled_dir, qname, max_ratio):
    from amazonmsk_emr_tem_data_spark.queries import REGISTRY

    fn, _ = REGISTRY[qname]
    t1 = _run_noop(fn, spark, SRC_SF)
    t10 = _run_noop(fn, spark, scaled_dir)
    ratio = t10 / max(t1, 1e-6)
    assert ratio < max_ratio, (
        f"{qname}: 10x data took {ratio:.1f}x time (t1={t1:.2f}s "
        f"t10={t10:.2f}s) — scale regression (bound {max_ratio}x)"
    )


def test_exact_dedup_collapses_identity_groups_at_10x(spark, scaled_dir):
    """Correctness under replication: 10 exact copies of every document
    must collapse to single survivors — the 10x survivor count equals
    the 1x survivor count (replication adds no new distinct content)."""
    from amazonmsk_emr_tem_data_spark.operators.dedup import exact_dedup_first
    from amazonmsk_emr_tem_data_spark.sources.files import load_table

    docs1 = load_table(spark, SRC_SF, "documents")
    docs10 = load_table(spark, scaled_dir, "documents")
    assert exact_dedup_first(docs10).count() == exact_dedup_first(docs1).count()


def test_salted_join_exact_and_competitive_under_skew(spark):
    from bench_skew import run_skew_bench

    results = run_skew_bench(spark, n_fact=2_000_000)
    assert set(results) == {
        "plain_join_aqe_skew_off",
        "plain_join_aqe_skew_on",
        "salted_join_32",
    }
    # exactness is asserted inside run_skew_bench; here only guard
    # against salting becoming pathological vs the plan it replaces.
    # 2x, not 1.5x: single-run wall-clock on a shared machine carries
    # 1.2-1.5x load noise (SCALING.md "bench trustworthiness"), which
    # made the tighter bound flake when the full -m scale batch ran
    # back-to-back; genuine pathology (the double-shuffle regression
    # this guards) shows up as >>2x.
    assert results["salted_join_32"] < results["plain_join_aqe_skew_off"] * 2.0


def test_query_cost_attribution_full_registry(spark):
    """The nightly-shaped sweep (r9 VERDICT ask #4's "per registry
    query" scope): cost rows for EVERY registry query at sf0.001 —
    every plan builds, no cartesian anywhere, and every parquet-backed
    query reports a real scan estimate. ~2-3 min (the iterative
    operators run their bounded fits during plan construction), hence
    -m scale."""
    from amazonmsk_emr_tem_data_spark.queries import (
        REGISTRY,
        query_cost_attribution,
    )

    names = [n for n in REGISTRY if n != "query_cost_attribution"]
    rows = query_cost_attribution(spark, SRC_SF, names).collect()
    assert len(rows) == len(names)
    offenders = [r["query"] for r in rows if r["has_cartesian"]]
    assert not offenders, offenders
