"""Incremental near-duplicate detection: a persisted MinHash-LSH index.

`minhash_near_dup_pairs` (operators/dedup.py) dedups a corpus against
ITSELF — an O(corpus) batch job. A growing 100 TB corpus instead needs
the incremental contract: "is anything in this new batch a near-dup of
anything already ingested?" without rescanning ingested text. This
module persists the fixed-width state that question needs and answers
probes by joining the BATCH's band buckets against the stored ones:
cost O(batch × matching buckets), independent of corpus text size.

Storage is NORMALIZED into two parquet tables under `path`:

* ``sigs``  — (id, sig array<long>[num_perm], n): ONE row per doc;
* ``bands`` — (id, band, bucket): ``bands`` narrow rows per doc.

An earlier layout rode the full signature array on every band row —
num_perm longs × bands per doc, a ~``bands``× write/scan amplification
that showed up directly as index-build time (the dominant q103 stage).
The normalized layout appends ~0.5 KB + 3×``bands``×8 B per doc; at
cluster scale, write ``bands`` bucketed on (band, bucket) so probes
co-locate, and ``sigs`` bucketed on id so the verification lookup
joins without a shuffle. Appends per `add` batch use anti-join dedup
on id (same policy as DataLake.write_full).

Probe verification is SIGNATURE-ESTIMATED Jaccard (matching-minhash
fraction; σ = sqrt(t(1−t)/num_perm) ≈ 0.06 at t=0.6 with 64 perms).
Exact verification needs the original shingles — callers that require
it join the candidate ids back to their corpus store and run
`pair_jaccard`, which is exactly what q103 does (making it
oracle-checkable end to end).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.dedup import (
    BANDS,
    NUM_PERM,
    band_hashes,
    minhash_signatures,
    shingles,
)


class NearDupIndex:
    """Persisted MinHash signature store with LSH-bucket probe."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 3,
        num_perm: int = NUM_PERM,
        bands: int = BANDS,
    ):
        self.spark = spark
        self.path = path
        self.k = k
        self.num_perm = num_perm
        self.bands = bands
        os.makedirs(path, exist_ok=True)

    # -- feature pipeline (shared by add and probe) ---------------------

    def _sigs(
        self, df: DataFrame, id_col: str, text_col: str, sig: DataFrame | None
    ) -> DataFrame:
        """(id, sig, n) — one row per doc with ≥ k tokens. Lazily
        checkpointed: every caller fans it into ≥ 2 plan branches
        (sig store + band explode, or probe buckets + psig).

        ``sig`` optionally supplies the precomputed relation for the
        SAME rows (built with this index's k/num_perm — the caller
        guarantees the match, the ordered=/sig= prework-sharing
        discipline); several queries over one corpus then pay the
        feature pipeline once (plans/session_cache.py)."""
        if sig is not None:
            return sig
        sh = shingles(df, id_col, text_col, self.k)
        return minhash_signatures(
            sh, num_perm=self.num_perm, with_sizes=True
        ).localCheckpoint(eager=False)

    def _band_rows(self, sig: DataFrame) -> DataFrame:
        """(id, band, bucket) — `bands` narrow rows per doc. The bucket
        definition is dedup.band_hashes, shared with the batch LSH path
        so persisted buckets stay join-compatible."""
        return sig.select(
            "id",
            F.posexplode(band_hashes(F.col("sig"), self.bands, self.num_perm)).alias(
                "band", "bucket"
            ),
        )

    # -- state ----------------------------------------------------------

    def _table_path(self, name: str) -> str:
        return os.path.join(self.path, name)

    def _read(self, name: str) -> DataFrame | None:
        p = self._table_path(name)
        if not os.path.isdir(p) or not any(
            f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
        ):
            return None
        return self.spark.read.parquet(p)

    def _tombstones(self) -> DataFrame | None:
        return self._read("tombstones")

    def _live(self, df: DataFrame) -> DataFrame:
        """Filter tombstoned ids out of a sigs/bands relation."""
        t = self._tombstones()
        return df if t is None else df.join(t.select("id").distinct(), "id", "left_anti")

    def indexed_ids(self) -> DataFrame:
        existing = self._read("sigs")
        if existing is None:
            return self.spark.range(0).select(F.col("id"))
        return self._live(existing).select("id")

    def remove(self, ids: DataFrame, id_col: str = "id") -> None:
        """Logically delete documents from the index: append their ids
        to a tombstone table that every read path anti-joins — O(batch)
        regardless of index size, the only affordable delete against an
        append-only 100 TB store (a physical rewrite per removal batch
        would be O(index)). Tombstoned ids stop appearing in probes and
        ``indexed_ids`` immediately; the rows are physically dropped at
        the next :meth:`compact`. A removed id cannot be RE-ADDED until
        compaction (the add-side dedup keys on the sigs table, and a
        tombstone must kill every existing row of that id — a re-add
        before compaction would be killed by the same tombstone)."""
        ids.select(F.col(id_col).alias("id")).distinct().write.mode("append").parquet(
            self._table_path("tombstones")
        )

    def compact(self) -> None:
        """Physically apply tombstones: rewrite sigs and bands without
        the deleted ids, then clear the tombstone table. Deliberately
        O(live index) — run it on the maintenance cadence, not per
        delete. The rewrite goes through a temp directory and a rename
        swap per table (bands first, sigs last — same ordering
        rationale as :meth:`add`); a crash mid-swap leaves either the
        old or the new directory for each table, never a half-written
        one, and tombstones are cleared only after both swaps so a
        retry re-applies them idempotently."""
        import shutil

        if self._tombstones() is None:
            return
        for name in ("bands", "sigs"):
            current = self._read(name)
            if current is None:
                continue
            live = self._live(current)
            tmp = self._table_path(f"{name}.compacting")
            shutil.rmtree(tmp, ignore_errors=True)
            live.write.mode("overwrite").parquet(tmp)
            old = self._table_path(f"{name}.old")
            shutil.rmtree(old, ignore_errors=True)
            os.rename(self._table_path(name), old)
            os.rename(tmp, self._table_path(name))
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(self._table_path("tombstones"), ignore_errors=True)

    def add(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        *,
        sig: DataFrame | None = None,
    ) -> None:
        """Index a batch: append its band and signature rows, skipping
        ids already indexed (re-delivery safe — same anti-join policy
        as the lake writers). Documents shorter than k tokens have no
        shingles and are unindexable; they are skipped.

        Write order is bands FIRST, sigs LAST: the sigs table is the
        commit marker the dedup anti-join keys on, so a crash between
        the two writes leaves only orphan BAND rows, which a re-add
        re-appends (duplicate band rows are probe-invisible — the
        candidate set is `.distinct()` — they only nudge the hot-bucket
        width guard). The reverse order would mark ids as indexed while
        their band rows are permanently missing: silent probe misses.
        The checkpointed `_sigs` relation feeds both writes, so the
        feature pipeline still runs once; ``sig`` optionally supplies
        it precomputed (see :meth:`_sigs`)."""
        sig = self._sigs(df, id_col, text_col, sig)
        existing = self._read("sigs")
        if existing is not None:
            sig = sig.join(existing.select("id"), "id", "left_anti")
        self._band_rows(sig).write.mode("append").parquet(self._table_path("bands"))
        sig.write.mode("append").parquet(self._table_path("sigs"))

    def probe(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
        max_bucket: int = 1000, hot_bucket: str = "salt",
        *, sig: DataFrame | None = None,
    ) -> DataFrame:
        """Candidate near-dups of the batch against the INDEX (not
        within the batch — run minhash_near_dup_pairs on the batch for
        that): (probe_id, index_id, est_jaccard), where est_jaccard is
        the matching-minhash fraction of the two signatures. Bucket
        join → distinct pairs → one zip_with estimate per pair.

        Stored buckets wider than ``max_bucket`` are hot — the same
        skew guard as `lsh_candidate_pairs`, same two policies:
        ``hot_bucket="salt"`` (default) splits the hot bucket's
        candidate join across ``ceil(w / max_bucket)`` salted sub-tasks
        (index rows salted by id, the small probe side replicated to
        every salt), preserving every candidate while bounding per-task
        fan-out; ``"drop"`` excludes the bucket entirely (recall hole
        on boilerplate corpora, but no quadratic pair bill at all).
        The width count runs only over index rows in buckets the BATCH
        touches (semi-join first), so the guard's cost tracks the
        matching buckets, not the whole index; at cluster scale, write
        the band table bucketed on (band, bucket) and the semi-join
        prunes the scan itself."""
        if hot_bucket not in ("salt", "drop"):
            raise ValueError(f"hot_bucket must be 'salt' or 'drop', got {hot_bucket!r}")
        existing = self._read("bands")
        if existing is not None:
            existing = self._live(existing)
        if existing is None:
            # Schema of the empty result mirrors the populated one: id
            # columns take the probe id column's type (not a hardcoded
            # long) so empty-index and populated-index probes stay
            # union/join-compatible for any id type.
            id_type = df.schema[id_col].dataType.simpleString()
            return self.spark.createDataFrame(
                [], f"probe_id {id_type}, index_id {id_type}, est_jaccard double"
            )
        # The feature pipeline is checkpointed in _sigs (it feeds the
        # band explode AND psig); `touched` likewise feeds the width
        # guard and both candidate paths — lazy localCheckpoint caps
        # each at one evaluation, the same pattern dup_clusters uses
        # for its per-round edge set.
        sig = self._sigs(df, id_col, text_col, sig)
        feats = self._band_rows(sig)
        touched = existing.join(
            F.broadcast(feats.select("band", "bucket").distinct()),
            ["band", "bucket"],
            "left_semi",
        ).localCheckpoint(eager=False)
        widths = touched.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__w"))
        pfeats = feats.select("band", "bucket", F.col("id").alias("probe_id"))
        if hot_bucket == "drop":
            narrow = touched.join(
                widths.filter(F.col("__w") <= max_bucket).select("band", "bucket"),
                ["band", "bucket"],
            )
            cand_raw = pfeats.join(
                narrow.select("band", "bucket", F.col("id").alias("index_id")),
                ["band", "bucket"],
            )
        else:
            # salt mode, two paths keyed off the TINY hot-bucket list
            # (broadcast; empty on a healthy corpus): narrow buckets
            # take the plain bucket equi-join at uncapped cost; only
            # HOT buckets pay the salted shape — index rows salted by
            # id, the (small) probe side replicated to every salt.
            hot_list = widths.filter(F.col("__w") > max_bucket).withColumn(
                "__s", F.expr(f"int(ceil(__w / {int(max_bucket)}))")
            ).select("band", "bucket", "__s")
            narrow = touched.join(F.broadcast(hot_list), ["band", "bucket"], "left_anti")
            cand_narrow = pfeats.join(
                narrow.select("band", "bucket", F.col("id").alias("index_id")),
                ["band", "bucket"],
            )
            index_hot = touched.join(F.broadcast(hot_list), ["band", "bucket"]).select(
                "band",
                "bucket",
                F.pmod(F.xxhash64("id"), F.col("__s")).alias("__salt"),
                F.col("id").alias("index_id"),
            )
            probe_hot = (
                pfeats.join(F.broadcast(hot_list), ["band", "bucket"])
                .select(
                    "band",
                    "bucket",
                    F.explode(
                        F.expr("sequence(0, cast(__s - 1 as bigint))")
                    ).alias("__salt"),
                    "probe_id",
                )
            )
            cand_hot = probe_hot.join(index_hot, ["band", "bucket", "__salt"])
            cand_raw = cand_narrow.select("probe_id", "index_id").unionByName(
                cand_hot.select("probe_id", "index_id")
            )
        cand = (
            cand_raw.filter(F.col("probe_id") != F.col("index_id"))
            .select("probe_id", "index_id")
            .distinct()
        )
        psig = sig.select(F.col("id").alias("probe_id"), F.col("sig").alias("__ps"))
        # signatures only for docs in touched buckets — candidates can
        # only come from there, so the sig-table scan joins against a
        # bucket-pruned id set, never the full index
        isig = self._read("sigs").join(
            touched.select("id").distinct(), "id", "left_semi"
        ).select(F.col("id").alias("index_id"), F.col("sig").alias("__is"))
        matches = F.expr(
            "aggregate(zip_with(__ps, __is, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
        )
        return (
            cand.join(psig, "probe_id")
            .join(isig, "index_id")
            .select(
                "probe_id",
                "index_id",
                (matches / F.lit(self.num_perm)).alias("est_jaccard"),
            )
        )
