"""Generate PLANS.md: physical-plan evidence (pushdown, pruning, join
strategy, exchange count) for EVERY registered query, with detailed
sections for the headline set. Run:
    python scripts/audit_plans.py

The audit helpers are importable — tests/test_plan_quality.py runs the
same counters as a regression gate (no CartesianProduct anywhere, a
BroadcastNestedLoopJoin only where a 1-row scalar aggregate justifies
it, broadcast-vs-SMJ expectations on the headline queries).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Detailed sections (pushdown/ReadSchema evidence) for these:
HEADLINE = [
    "q00_flagship",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q10_window_topk",
    "q20_tumbling_window",
    "q41_ngram_jaccard_topk",
    "q42_minhash_lsh_pairs",
    "q45_lake_roundtrip",
    "q47_range_join",
    "q50_knn_bruteforce",
    "q87_dup_clusters",
    "q90_corpus_dedup",
    "q93_decontam",
    "q95_chunking",
    "q97_curation_pipeline",
    "q98_redaction_audit",
]

# Queries whose plan legitimately contains BroadcastNestedLoopJoin.
# Every entry's broadcast side must be BOUNDED, and the gate VERIFIES
# the bound structurally (verify_bnlj_bounds) instead of trusting this
# comment: `scalar_aggs` BNLJs must broadcast a subtree topped by a
# global aggregate with `Keys: []` (≤ 1 row by construction at any
# scale); `filtered_batches` BNLJs must broadcast a subtree whose
# Filter condition contains the given fragment (an explicit
# constant-bounded query batch). A data-sized relation sneaking into
# the broadcast side matches neither shape and fails the gate.
BNLJ_ALLOWED = {
    # broadcast query batch bounded by the vec_id constant range,
    # non-equi join condition (q_id != n_id)
    "q50_knn_bruteforce": {"scalar_aggs": 0, "filtered_batches": ["vec_id"]},
    # 1-row broadcast centroid-list attach (corpus + queries)
    "q52_ann_ivf": {"scalar_aggs": 2, "filtered_batches": []},
    # 1-row centroid-list (queries + ivf_assign) and codebook
    # (encode + ADC) attaches
    "q139_ann_ivf_pq": {"scalar_aggs": 4, "filtered_batches": []},
    "q54_tfidf_top_term": {"scalar_aggs": 1, "filtered_batches": []},  # corpus count
    "q85_idle_rich_customers": {"scalar_aggs": 1, "filtered_batches": []},  # avg balance
    "q86_part_value_concentration": {"scalar_aggs": 1, "filtered_batches": []},  # total value
    "q90_corpus_dedup": {"scalar_aggs": 1, "filtered_batches": []},  # n_docs
    # (q93's suite doc-count guard no longer BNLJs: since round 11,
    # plans/curation.bounded_bench_grams evaluates the bound via a
    # union-row over the gram relation — no crossJoin in the plan)
    "q109_stream_corpus_dedup": {"scalar_aggs": 1, "filtered_batches": []},  # n_docs
    # 1-row centroid-list attach (ivf_assign), planned once per reference
    # to the assigned relation (pair left/right + final verdict join),
    # plus one more for the r14 numpy-replica audit's own ivf_assign
    "q101_semantic_dedup": {"scalar_aggs": 4, "filtered_batches": []},
    "q102_mixture_sample": {"scalar_aggs": 1, "filtered_batches": []},  # capacity min(n/w)
    # 1-row smoothing totals (ΣT, ΣR) / trigram total N attach
    "q112_dsir_weights": {"scalar_aggs": 1, "filtered_batches": []},
    "q113_trigram_surprisal": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row (n_docs, avgdl) corpus scalar on the BM25 score
    "q164_bm25_topk": {"scalar_aggs": 1, "filtered_batches": []},
    # three 1-row true-distinct audit scalars (one per sketched column)
    "q168_kmv_distinct": {"scalar_aggs": 3, "filtered_batches": []},
    # 1-row exact-intersection audit scalar on the KMV estimate row
    "q171_kmv_join_estimate": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row boundary-cutoff scalar (max c_ts − 3 h) over the sink
    "q122_stream_left_outer_join": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row total-cutoff-mass scalar in the heavy-hitters merge
    "q147_heavy_hitters": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row count-of-vectors scalar attached to the gram triangle and
    # to each of the two mean-relation references (d-row side)
    "q126_embedding_covariance": {"scalar_aggs": 3, "filtered_batches": []},
    # same covariance_matrix finish over the whitened projection
    # (q127 reuses the q126 shape: count scalar on the gram triangle
    # + both mean-relation references)
    "q127_pca_whitening": {"scalar_aggs": 3, "filtered_batches": []},
    # 1-row unigram-total and bigram-total scalars on the PMI score
    "q130_bigram_pmi": {"scalar_aggs": 2, "filtered_batches": []},
    # 1-row global [lo, hi] bounds attached to the scan and to the
    # per-type quantile finish
    "q133_histogram_quantiles": {"scalar_aggs": 2, "filtered_batches": []},
    # 1-row (Σ sqrt tokens, budget) scalar attached to the per-source
    # counts (q102 capacity pattern)
    "q187_temperature_mixture": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row max-timestamp reference scalar on the decay scan
    "q188_decayed_engagement": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row corpus-token-total scalar on the smoothed JSD grid
    "q192_source_token_jsd": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row (n_tok, vocab) train-slice scalar on the backoff score
    "q193_backoff_lm_score": {"scalar_aggs": 1, "filtered_batches": []},
    # one 1-row child-total scalar per audited FK edge (7 edges)
    "q202_referential_integrity": {"scalar_aggs": 7, "filtered_batches": []},
    # 1-row pooled z-statistic scalar on the 2-row arm summary
    "q208_ab_test": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row n_orders denominator scalar on the qualifying pairs
    "q209_basket_pair_lift": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row pe-numerator scalar onto the 1-row (total, diag) scalar,
    # then the combined 1-row po/pe/kappa scalar onto the 9-row grid
    "q210_rater_agreement": {"scalar_aggs": 2, "filtered_batches": []},
    # 1-row ECE scalar onto the <=10-row bin relation
    "q212_calibration_ece": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row chi2/dof/V summary onto the cells; the grand-total attach
    # sits behind the checkpointed cells relation so only one BNLJ is
    # visible in the final plan
    "q213_chi2_independence": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row totals onto the G-row bucket relation, then the 1-row
    # jackknife variance onto the 1-row totals
    "q214_jackknife_ci": {"scalar_aggs": 2, "filtered_batches": []},
    # 1-row Hill-alpha scalar onto the <=max-frequency spectrum rows
    "q215_dup_spectrum": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row |CUSUM| peak scalar onto the per-day series; the grand-mean
    # attach sits behind the checkpointed series so only one BNLJ is
    # visible in the final plan
    "q217_cusum_changepoint": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row IV scalar onto the checkpointed share rows (the bounds
    # and totals attaches sit behind checkpoints)
    "q219_woe_iv": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row user-total scalar onto the per-day duration rollup
    "q223_km_survival": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row part-count scalar onto the users x K candidate explode
    "q224_negative_sampling": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row consensus-rate scalar onto the 3-row labeler rollup
    "q226_weak_labels": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row DOW-centering scalar onto the day-bounded decomposition
    "q229_seasonal_decompose": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row DiD scalar onto the 4-row (arm, period) rollup
    "q230_diff_in_diff": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row chi2/flag scalar onto the 2-row arm rollup
    "q233_srm_check": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row line-dedup summary onto the 1-row corpus summary
    "q238_dataset_card": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row grand total onto the contingency cells before the MI fold
    "q240_mutual_information": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row split-point scalar (max doc_id div 2) attached LAZILY onto
    # the verdict relation before the drift rollup (folded into the
    # plan per the r9 verdict — no job at plan-construction time).
    # Appears twice: the ≤6-row rollup subtree it feeds is referenced
    # by both the half-totals fold and the stage-densify join, and is
    # deliberately NOT checkpointed so the audit sees the full plan.
    "q254_funnel_drift": {"scalar_aggs": 2, "filtered_batches": []},
    # post-refresh mixture: ONE 1-row (tb, ta, z, min) totals scalar
    # onto the <=|sources|-row rollup (q102/q187 pattern; the capacity
    # solve collapses into the same row via the sqrt-weight identity)
    "q256_refresh_mixture": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row carried-offset scalar (yesterday's token total) onto the
    # admitted batch's prefix sum — pack_sequences' incremental
    # contract folded in lazily (the r9 q254 rule)
    "q257_refresh_packing": {"scalar_aggs": 1, "filtered_batches": []},
    # two 1-row bookkeeping rollups (kept-corpus totals × batch
    # totals) joined into the single carry-state row
    "q259_refresh_carry_state": {"scalar_aggs": 1, "filtered_batches": []},
    # 1-row split-point scalar attached lazily to select the NEW
    # half's bench docs (the q254/q257 rule — no construction job)
    "q260_refresh_retro_contam": {"scalar_aggs": 1, "filtered_batches": []},
    # two 1-row bookkeeping rollups (kept-corpus totals × streamed
    # batch totals) joined into the single carry-state row — the
    # streaming twin of q259's attach
    "q264_stream_carry_state": {"scalar_aggs": 1, "filtered_batches": []},
    # streaming twin of q256's totals-row attach (shared _mixture_report)
    "q265_stream_mixture": {"scalar_aggs": 1, "filtered_batches": []},
    # chained packing (round12): refresh-1's carried-offset scalar
    # (q257's attach), refresh-2's attach of the CONSUMED carry row
    # (a projection over refresh-1's two 1-row bookkeeping rollups —
    # still Keys:[] aggs underneath, 1 row by construction), and the
    # carry row's own internal rollup join
    "q268_chain_packing": {"scalar_aggs": 3, "filtered_batches": []},
    # refresh-2 carry row from the consumed refresh-1 carry row: the
    # refresh-2 batch rollup attach + refresh-1's internal rollup join
    # (both 1-row Keys:[] aggregates)
    "q269_chain_carry_state": {"scalar_aggs": 2, "filtered_batches": []},
    # post-chain mixture: q256's ONE 1-row totals attach over the
    # <=|sources|-row rollup (shared _mixture_report)
    "q270_chain_mixture": {"scalar_aggs": 1, "filtered_batches": []},
    # post-chain retro sweep: 1-row m2 split-point scalar attached
    # lazily to select refresh-2's bench docs (q260's shape one link up)
    "q271_chain_retro_contam": {"scalar_aggs": 1, "filtered_batches": []},
}

# Queries whose plan legitimately contains a Window with NO data-column
# partition keys. A partition-less (or constant-partitioned) window
# moves its ENTIRE feeding relation into one partition — the q130
# scale-killer the round-4 judge flagged. The only acceptable feeds are
# registered BOUNDED summaries (row count fixed by a model/config
# constant, not by data size); each entry documents the bound. Global
# top-k must instead use orderBy().limit() == TakeOrderedAndProject
# (operators/sketches.py pattern).
GLOBAL_WINDOW_ALLOWED = {
    # n_shards-row shard summary (_N_GROWTH_SHARDS constant, 10 rows)
    "q129_vocab_growth": "cumulative vocab over the n_shards-row summary",
    # packing.global_cumsum's offset table: <= n_buckets rows by
    # construction (documented at operators/packing.py)
    "q100_pack_sequences": "prefix-sum offset table, n_buckets rows",
    "q107_pack_token_runs": "prefix-sum offset table, n_buckets rows",
    "q128_dense_ids": "prefix-sum offset table, n_buckets rows",
    "q196_training_order_shard": "prefix-sum offset table, n_buckets rows",
    # heavy-hitters candidate merge: <= n_shards * k candidate rows
    # (each shard contributes its local top-k only)
    "q147_heavy_hitters": "shard-topk candidate merge, n_shards*k rows",
    # running sum over the per-DAY summary (calendar-span rows)
    "q207_new_returning": "cumulative reach over per-day rows, span-bounded",
    # hierarchical islands: only the n/512^3 TOP level is partitionless
    # (operators/islands.py — every data-sized level is bucket-keyed)
    "q216_id_gaps": "top-level LEAD over the n/B^levels bucket summary",
    # CUSUM running sum over the per-DAY summary (calendar-span rows)
    "q217_cusum_changepoint": "running CUSUM over per-day rows, span-bounded",
    # sweep-line prefix sum via packing.global_cumsum: the only
    # partitionless window is its <= n_buckets offset table
    "q218_session_concurrency": "prefix-sum offset table, n_buckets rows",
    # KM risk-set and ln-survival folds over the per-DAY duration
    # rollup (observation-span rows)
    "q223_km_survival": "risk/ln-S folds over per-day rows, span-bounded",
    # centered 7-day moving average over the per-DAY summary
    "q229_seasonal_decompose": "centered MA over per-day rows, span-bounded",
    # running remainder over the funnel stage summary: <= 6 rows (the
    # stage count is a code constant, plans/round9_queries._STAGES)
    "q248_filter_funnel": "waterfall remainder over the <=6-row stage summary",
    # packing continuation via packing.global_cumsum: the only
    # partitionless window is its <= n_buckets offset table
    "q257_refresh_packing": "prefix-sum offset table, n_buckets rows",
    # running remainder over the admission stage summary: <= 7 rows
    # (stage count is a code constant, plans/round10_queries._R_STAGES)
    "q258_refresh_waterfall": "waterfall remainder over the <=7-row stage summary",
    # chained packing continuation (round12): two packing.global_cumsum
    # calls (one per refresh) — each's only partitionless window is its
    # <= n_buckets offset table
    "q268_chain_packing": "prefix-sum offset tables (x2), n_buckets rows each",
}

_AGG_NODES = ("HashAggregate", "ObjectHashAggregate", "SortAggregate")


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a formatted-plan Arguments line."""
    groups, depth, start = [], 0, None
    for idx, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = idx + 1
            depth += 1
        elif ch == "]" and depth:
            depth -= 1
            if depth == 0:
                groups.append(s[start:idx])
    return groups


def global_windows(plan: str) -> list[str]:
    """Window nodes whose partition spec contains no column reference
    (empty, or literal-only like ``partitionBy(lit(0))``) — every such
    node funnels its whole input into ONE partition. Returns one
    description per offending node (empty = clean)."""
    tree = _plan_tree(plan)
    details = _node_details(plan)
    out = []
    for _indent, label, nid in tree:
        if label != "Window":
            continue
        block = details.get(nid, "")
        m = re.search(r"^Arguments: (.*)$", block, re.M | re.S)
        if not m:
            continue
        # Arguments: [windowExprs], [partitionSpec], [orderSpec] — but
        # EMPTY specs may be omitted from the print, so a 2-group form
        # is ambiguous: the second group is the order spec (every entry
        # carries ASC/DESC) or the partition spec (bare columns).
        groups = _bracket_groups(m.group(1))
        if len(groups) >= 3:
            part = groups[1]
        elif len(groups) == 2:
            x = groups[1]
            part = "" if (" ASC" in x or " DESC" in x) else x
        else:
            part = ""
        # column references render as name#id — a spec without any is
        # empty or constant, i.e. a single-partition window
        if "#" not in part:
            out.append(f"Window({nid}) partition spec [{part}] has no column keys")
    return out


def _plan_tree(plan: str) -> list[tuple[int, str, int]]:
    """(indent, node label, node id) per line of the formatted plan's
    tree header, in order."""
    out = []
    for line in plan.split("\n\n")[0].splitlines():
        m = re.search(r"(\w[\w ]*?)\s*\((\d+)\)\s*$", line)
        if m:
            out.append((line.index(m.group(1)), m.group(1).strip(), int(m.group(2))))
    return out


def _node_details(plan: str) -> dict[int, str]:
    """node id → detail block text from the formatted plan body."""
    return {
        int(m.group(1)): m.group(0)
        for m in re.finditer(r"^\((\d+)\) .*?(?=^\(\d+\)|\Z)", plan, re.M | re.S)
    }


def _build_side_subtrees(tree: list[tuple[int, str, int]]) -> list[list[tuple[int, str, int]]]:
    """For each BroadcastNestedLoopJoin, the tree lines of its BUILD
    (broadcast) side subtree."""
    sides = []
    for i, (indent, label, _nid) in enumerate(tree):
        if not label.startswith("BroadcastNestedLoopJoin"):
            continue
        subtree = []
        for j in range(i + 1, len(tree)):
            if tree[j][0] <= indent:
                break
            subtree.append(tree[j])
        child_indent = min(x[0] for x in subtree)
        child_starts = [jj for jj, x in enumerate(subtree) if x[0] == child_indent]
        start = child_starts[0] if "BuildLeft" in label else child_starts[-1]
        idx = child_starts.index(start)
        end = child_starts[idx + 1] if idx + 1 < len(child_starts) else len(subtree)
        sides.append(subtree[start:end])
    return sides


def verify_bnlj_bounds(plan: str, allowed: dict) -> list[str]:
    """Check every BNLJ's broadcast side against the allowlist shapes;
    returns human-readable violations (empty = clean)."""
    tree = _plan_tree(plan)
    details = _node_details(plan)
    sides = _build_side_subtrees(tree)
    budget_aggs = allowed.get("scalar_aggs", 0)
    fragments = list(allowed.get("filtered_batches", []))
    violations = []
    for side in sides:
        is_scalar_agg = any(
            label in _AGG_NODES and "Keys: []" in details.get(nid, "")
            for _, label, nid in side
        )
        if is_scalar_agg and budget_aggs > 0:
            budget_aggs -= 1
            continue
        matched = None
        for frag in fragments:
            if any(
                label == "Filter" and frag in details.get(nid, "")
                for _, label, nid in side
            ):
                matched = frag
                break
        if matched is not None:
            fragments.remove(matched)
            continue
        violations.append(
            "BNLJ broadcast side is neither a Keys:[] scalar aggregate nor an "
            f"allowlisted filtered batch: {[x[1] for x in side]}"
        )
    if len(sides) != len(allowed.get("filtered_batches", [])) + allowed.get("scalar_aggs", 0):
        violations.append(
            f"BNLJ count {len(sides)} != allowlisted "
            f"{allowed.get('scalar_aggs', 0)} scalar + "
            f"{len(allowed.get('filtered_batches', []))} filtered"
        )
    return violations


def formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def plan_counters(plan: str) -> dict[str, int]:
    def nodes(kind: str) -> int:
        return len(re.findall(rf"\(\d+\) {kind}\b", plan))

    return {
        "bhj": nodes("BroadcastHashJoin"),
        "smj": nodes("SortMergeJoin"),
        "shj": nodes("ShuffledHashJoin"),
        "bnlj": nodes("BroadcastNestedLoopJoin"),
        "cartesian": nodes("CartesianProduct"),
        "exchanges": nodes("Exchange"),
        "broadcasts": nodes("BroadcastExchange"),
        "pushed": len(
            [l for l in plan.splitlines() if "PushedFilters" in l and "[]" not in l]
        ),
    }


def audit_query(spark, name: str, sf_dir: str) -> tuple[dict[str, int], str]:
    """(counters, formatted plan) for one registered query."""
    from tp_integ_data_pipeline_spark import plans

    df = plans.QUERIES[name](spark, sf_dir)
    plan = formatted_plan(df)
    return plan_counters(plan), plan


def main() -> None:
    from tp_integ_data_pipeline_spark import plans
    from tp_integ_data_pipeline_spark.session import get_session

    spark = get_session("plan-audit", cpus=8)
    sf_dir = "/root/testdata/sf0.01"
    lines = [
        "# PLANS — physical-plan audit (generated by scripts/audit_plans.py)",
        "",
        "Evidence that the 100 TB design rules hold in the actual Catalyst",
        "output at sf0.01: predicates reach the parquet scan, scans read only",
        "needed columns, bounded dims broadcast, and shuffles are the",
        "algorithmic ones (group/join keys), not accidents. The same",
        "counters gate in tests/test_plan_quality.py.",
        "",
        "Cross-engine hash rule (round-6): every ROUND-emitting graded output",
        "whose pre-image can be a tiny negative (covariance q126, PMI q130,",
        "histogram quantile edges q133, DSIR weights q112, surprisal q113,",
        "centroid/variance q118, moments covar/corr q88) adds `+ 0` after the",
        "ROUND on BOTH the Spark and the oracle side — DuckDB's ROUND preserves",
        "the sign of zero on a tiny-negative input while Spark's BigDecimal",
        "round drops it, so -0.0 vs 0.0 is numerically equal but hash-different",
        "(the round-5 q126 residual). ROUNDs over provably non-negative",
        "pre-images (gmean, percent_rank/cume_dist, fill_ratio, abs-error,",
        "BM25/TF-IDF scores, PSI, strictly-positive event values) are left bare.",
        "",
        "## All queries",
        "",
        "| query | BHJ | SMJ | SHJ | BNLJ | Cartesian | exchanges | bcast | pushed-filter scans |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    details: dict[str, str] = {}
    for name in sorted(plans.QUERIES):
        c, plan = audit_query(spark, name, sf_dir)
        lines.append(
            f"| {name} | {c['bhj']} | {c['smj']} | {c['shj']} | {c['bnlj']} "
            f"| {c['cartesian']} | {c['exchanges']} | {c['broadcasts']} | {c['pushed']} |"
        )
        if name in HEADLINE:
            details[name] = plan
    lines.append("")
    for name in HEADLINE:
        plan = details[name]
        c = plan_counters(plan)
        pushed = [
            l.strip() for l in plan.splitlines() if "PushedFilters" in l and "[]" not in l
        ]
        schemas = [l.strip() for l in plan.splitlines() if "ReadSchema" in l]
        lines += [f"## {name}", ""]
        lines += [
            f"- joins: BroadcastHashJoin×{c['bhj']} SortMergeJoin×{c['smj']}"
            f" ShuffledHashJoin×{c['shj']}",
            f"- shuffle exchanges: {c['exchanges']} (broadcast: {c['broadcasts']})",
        ]
        for s in pushed[:4]:
            lines.append(f"- `{s[:160]}`")
        for s in schemas[:4]:
            lines.append(f"- `{s[:160]}`")
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
