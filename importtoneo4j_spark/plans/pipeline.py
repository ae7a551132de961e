"""The staged KG-construction pipeline driver.

Mirrors the reference's production entry (import.sh:19-110): a chain of
stages with durable artifacts between them — there the exchange format was
files on disk between java/picard/VEP/GATK processes; here each stage writes
a checkpointed table + a completion marker, so a killed run resumes from the
last completed stage (import.sh's staged design, generalized), and
re-running an already-imported run_id is a no-op (Main.java:73-76
exactly-once-per-analysis semantics).

Stages::

    ingest       transcripts -> valid + rejects (quarantine w/ reason)
    extract      Arrow-batched assertion extraction (fan-out)
    link         vocabulary + same_as + MinHash-LSH similarity edges
    canonicalize connected components -> (surface -> canonical_id)
    materialize  triples + nodes + lineage manifest
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from importtoneo4j_spark.operators.canonicalize import assign_canonical_ids
from importtoneo4j_spark.operators.enrich import enrich_nodes, missing_keys
from importtoneo4j_spark.operators.extract import extract_assertions
from importtoneo4j_spark.operators.link import link_edges, mention_vocabulary
from importtoneo4j_spark.operators.materialize import (
    canonical_nodes,
    canonical_triples,
    lineage_manifest,
    node_bucket,
)
from importtoneo4j_spark.operators.merge import (
    assert_unique,
    merge_nodes,
    new_keys_only,
)
from importtoneo4j_spark.sources.tables import TableStore
from importtoneo4j_spark.sources.transcripts import (
    assert_unique_turns,
    read_transcripts,
    tag_rejects,
    with_stable_order_tagged,
)

STAGES = ["ingest", "extract", "link", "canonicalize", "materialize"]


@dataclass
class KGPipeline:
    spark: SparkSession
    input_path: str
    workdir: str
    run_id: str = "run-001"
    mode: str = "overwrite"  # 'overwrite' (ref -n) | 'append' (ref re-run upsert)
    fail_fast: bool = True  # F4: abort on structural violations (the
    # reference aborts on duplicate analysisId, Main.java:73-76, and on
    # constraint violations, Neo4j.java:163-167); opt out to first-wins
    # through a known-dirty corpus
    bucket_subj: int = 0  # >0: write triples hash-bucketed on subj with
    # this bucket count (catalog table; co-located self/edge joins run
    # shuffle-free — SCALE.md bucket(N, subj) layout). 0 (default) keeps
    # the pred-partitioned parquet-dir layout.
    metrics: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.store = TableStore(self.spark, self.workdir)

    # ------------------------------------------------------------------ util
    def _done(self, stage: str) -> bool:
        m = self.store.read_marker(stage)
        return bool(m and m.get("run_id") == self.run_id)

    def _mark(self, stage: str, **payload) -> None:
        self.store.write_marker(stage, {"run_id": self.run_id, **payload})

    def _already_imported(self) -> bool:
        m = self.store.read_marker("materialize")
        return bool(m and self.run_id in m.get("imported_runs", []))

    def _prev_runs(self) -> list[str]:
        m = self.store.read_marker("materialize")
        return m.get("imported_runs", []) if m else []

    # ---------------------------------------------------------------- stages
    def _write_counted(self, df: DataFrame, name: str, **write_kwargs) -> int:
        """Write a stage table and return its row count from an Observation
        attached to the same action — no second counting job."""
        obs = Observation(f"{name}_rows")
        self.store.write(df.observe(obs, F.count(F.lit(1)).alias("n")), name, **write_kwargs)
        return int(obs.get["n"])

    def stage_ingest(self) -> None:
        """ONE input scan, one write: reject tagging, stable ordering, the
        F4 duplicate flag and the valid/reject counters all ride the same
        window + write job (a separate rejects pass would re-read the whole
        corpus — 2x input I/O at 100 TB). The table lands partitioned by
        validity, so downstream valid reads partition-prune and the
        quarantine stays queryable (warn-and-skip F3, never dropped)."""
        raw = read_transcripts(self.spark, self.input_path)
        tagged = with_stable_order_tagged(tag_rejects(raw), flag_dups=self.fail_fast)
        # repartition on conv_id: downstream extraction and ordering windows
        # shuffle once here and reuse the layout
        tagged = tagged.repartition("conv_id").withColumn(
            "_ok", F.col("reject_reason").isNull()
        )
        obs = Observation("ingest_rows")
        metrics = [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_ok").cast("int")).alias("n_valid"),
        ]
        if self.fail_fast:
            metrics.append(F.sum("_dup").alias("dups"))
            to_write = tagged.observe(obs, *metrics).drop("_dup")
        else:
            to_write = tagged.observe(obs, *metrics)
        self.store.write(to_write, "ingested", partition_by=["_ok"])
        got = obs.get
        n, n_valid = int(got["n"]), int(got["n_valid"] or 0)
        if n == 0:
            # dynamic partitioning writes no files for an empty frame;
            # rewrite unpartitioned so the schema survives (empty input ->
            # 0 triples, not a read error)
            self.store.write(to_write.limit(0), "ingested")
        if self.fail_fast and int(got["dups"] or 0) > 0:
            # abort before the marker (Main.java:73-76); detailed offender
            # lookup only on the failure path
            assert_unique_turns(self._valid())  # raises with a sample
            raise ValueError("duplicate (conv_id, turn_idx) detected")
        self.metrics["ingest"] = {"valid": n_valid, "rejected": n - n_valid}
        self._mark("ingest", valid=n_valid, rejected=n - n_valid)

    def _valid(self) -> DataFrame:
        """The valid-turn view of the ingested table (partition-pruned).
        The validity flag compares as string: partition-column inference
        reads the directory value back as 'true'/'false', while the
        empty-input layout keeps a real boolean column."""
        return (
            self.store.read("ingested")
            .filter(F.col("_ok").cast("string") == "true")
            .drop("_ok", "reject_reason")
        )

    def stage_extract(self) -> None:
        valid = self._valid()
        extracted = extract_assertions(valid)
        n = self._write_counted(extracted, "extracted")
        self.metrics["extract"] = {"assertions": n}
        self._mark("extract", assertions=n)

    def stage_link(self) -> None:
        extracted = self.store.read("extracted")
        vocab = mention_vocabulary(extracted)
        n_vocab = self._write_counted(vocab, "vocab")
        edges = link_edges(extracted, self.store.read("vocab"))
        n_edges = self._write_counted(edges, "link_edges")
        self.spark.catalog.clearCache()  # drop the vocab-level LSH caches
        self.metrics["link"] = {"vocab": n_vocab, "edges": n_edges}
        self._mark("link", vocab=n_vocab, edges=n_edges)

    def stage_canonicalize(self) -> None:
        vocab = self.store.read("vocab")
        edges = self.store.read("link_edges")
        links = assign_canonical_ids(vocab, edges)
        if self.mode == "append" and self.store.exists("links") and self._prev_runs():
            # cross-run id stability: a surface already in the snapshot keeps
            # its canonical_id; only genuinely new surfaces are appended with
            # this run's assignment. Limitation (documented): new evidence
            # that would MERGE two existing entities needs an overwrite
            # re-canonicalization (the periodic batch fold — see
            # streaming/incremental.py docstring); the reference has the
            # same property, since it MERGEs on exact keys only.
            fresh = new_keys_only(links, self.store.read("links"), ["surface"])
            self.store.write(fresh, "links", mode="append")
            n = self.store.read("links").select(
                F.approx_count_distinct("canonical_id").alias("n")
            ).first()["n"]
        else:
            obs = Observation("entities")
            self.store.write(
                links.observe(obs, F.approx_count_distinct("canonical_id").alias("n")),
                "links",
            )
            n = int(obs.get["n"])  # approx is fine for a metric; exact count
            # would need a distinct shuffle just for observability
        self.metrics["canonicalize"] = {"entities": n}
        self._mark("canonicalize", entities=n)

    def stage_materialize(self) -> None:
        extracted = self.store.read("extracted").cache()  # scanned by both
        # the triples and the nodes branch (subj + obj unions)
        links = self.store.read("links")
        triples = canonical_triples(extracted, links)
        nodes = canonical_nodes(extracted, links).withColumn(
            "_bucket", node_bucket(F.col("entity_id"))
        )

        prev_runs = self._prev_runs()
        if self.mode == "append" and self.store.exists("triples") and prev_runs:
            snapshot = self.store.read("triples")
            delta = new_keys_only(triples, snapshot, ["subj", "pred", "obj"])
            self.store.write(delta, "triples_delta")  # ref delta-VCF sink analog
            # appending into a bucketed table would silently break its
            # bucket guarantee -> demote to plain layout (flat files match
            # the bucketed dir shape; partitioned appends only on the
            # pred-partitioned layout)
            was_bucketed = self.spark.catalog.tableExists(
                self.store.catalog_name("triples")
            )
            self.spark.sql(
                f"DROP TABLE IF EXISTS {self.store.catalog_name('triples')}"
            )
            self.store.write(
                self.store.read("triples_delta"),
                "triples",
                mode="append",
                partition_by=None if was_bucketed else ["pred"],
            )
            # node upsert (not insert-new-only): labels/surfaces/mention
            # counts accumulate onto existing nodes across runs, matching
            # the reference's re-run MERGE (addNodeLabel) — ADVICE r1 fix.
            # Staged through a sibling table: parquet can't overwrite the
            # path it is scanning.
            nodes_snap = self.store.read("nodes").drop("_bucket")
            merged = merge_nodes(nodes_snap, nodes.drop("_bucket")).withColumn(
                "_bucket", node_bucket(F.col("entity_id"))
            )
            n_nodes = self._write_counted(merged, "nodes_next")
            self.store.write(
                self.store.read("nodes_next"), "nodes", partition_by=["_bucket"]
            )
            self.store.drop("nodes_next")
        else:
            # NOTE: no repartition("subj") before the write — the hot entity
            # owns ~20% of triples, so hash-partitioning by subj pins that
            # partition to one core (measured: flat materialize time from 8
            # to 32 cores). The dedup's (subj,pred,obj) hash partitioning is
            # already balanced; subj-locality comes from the pred-partitioned
            # layout below plus bucket(N, subj) on a real catalog.
            # sortWithinPartitions = the reference's sort-before-load
            # (import.sh SortVcf stage, O1): no shuffle, but every parquet
            # row group is (subj, obj)-ordered -> min/max row-group skipping
            # on subj point lookups + better RLE/dictionary compression.
            if self.bucket_subj > 0:
                self.store.write_bucketed(
                    triples,
                    "triples",
                    bucket_cols=["subj"],
                    n_buckets=self.bucket_subj,
                    sort_cols=["subj", "obj"],
                )
            else:
                n_trip = self._write_counted(
                    triples.sortWithinPartitions("subj", "obj"),
                    "triples",
                    partition_by=["pred"],
                )
                if n_trip == 0:
                    self.store.write(triples.limit(0), "triples")
            n_nodes = self._write_counted(
                nodes.sortWithinPartitions("entity_id"),
                "nodes",
                partition_by=["_bucket"],
            )
            # dynamic partitioning writes no files for empty frames; keep
            # empty tables readable (schema preserved, unpartitioned)
            if n_nodes == 0:
                self.store.write(nodes.limit(0), "nodes")
            empty_delta = triples.limit(0)
            self.store.write(empty_delta, "triples_delta")

        if self.fail_fast:
            # F4 on the graph sink: entity_id is the node MERGE key and must
            # be unique (Neo4j.java:163-167 throws on >1 index hit)
            assert_unique(self.store.read("nodes"), ["entity_id"], what="entity_id")
        final = self.store.read("triples")
        lineage = lineage_manifest(
            final, self.run_id, "materialize", hash_cols=["subj", "pred", "obj"]
        )
        self.store.write(lineage, "lineage", mode="append" if prev_runs else "overwrite")
        # triple count + global checksum derived from the manifest (bit_xor is
        # associative: xor of per-partition checksums == xor of row hashes) —
        # no extra full scans of the triples table
        lin_rows = [
            (r["output_rows"], int(r["checksum"]))
            for r in self.store.read("lineage")
            .filter(F.col("run_id") == self.run_id)
            .select("output_rows", "checksum")
            .collect()
        ]
        n_triples = sum(n for n, _ in lin_rows)
        ux = 0
        for _, c in lin_rows:
            ux ^= c & 0xFFFFFFFFFFFFFFFF
        signed = ux - 2**64 if ux >= 2**63 else ux
        checksum = f"{n_triples}:{signed}" if lin_rows else "0:None"
        extracted.unpersist()
        self.metrics["materialize"] = {
            "triples": n_triples,
            "nodes": n_nodes,
            "checksum": checksum,
        }
        self._mark(
            "materialize",
            triples=n_triples,
            nodes=n_nodes,
            checksum=checksum,
            imported_runs=sorted(set(prev_runs) | {self.run_id}),
        )

    # --------------------------------------------------------- enrich (EP2)
    def enrich(self, attrs: DataFrame, fail_on_miss: bool | None = None) -> dict:
        """Second-pass node enrichment (the reference's ``-a`` annotation
        import, VariantDatabase.java:320-352): join an external attribute
        table on entity_id, first-wins-merge its columns into the node
        properties, integrity-check misses. Idempotent: re-applying the same
        attrs adds nothing (keys already present are first-wins-filtered).
        Runs after materialize; requires the nodes table."""
        if not self.store.exists("nodes"):
            raise ValueError("enrich requires a materialized nodes table")
        fom = self.fail_fast if fail_on_miss is None else fail_on_miss
        nodes = self.store.read("nodes")
        enriched = enrich_nodes(nodes, attrs, fail_on_miss=fom)
        n_miss = 0 if fom else missing_keys(nodes, attrs).count()
        # stage through a sibling table: parquet can't overwrite a path
        # while scanning it
        n_nodes = self._write_counted(enriched, "nodes_enriched")
        pby = ["_bucket"] if "_bucket" in enriched.columns else None
        self.store.write(
            self.store.read("nodes_enriched"), "nodes", partition_by=pby
        )
        self.store.drop("nodes_enriched")
        self.metrics["enrich"] = {"nodes": n_nodes, "misses": n_miss}
        self._mark("enrich", nodes=n_nodes, misses=n_miss)
        return self.metrics["enrich"]

    # ------------------------------------------------------------------- run
    def run(self, resume: bool = True) -> dict:
        t0 = time.time()
        if self._already_imported():
            # exactly-once per run_id (Main.java:73-76): a repeat import of
            # the same analysis is a no-op, not a duplicate graph
            self.metrics["skipped"] = True
            self.metrics["wall_sec"] = 0.0
            return self.metrics
        fns = {
            "ingest": self.stage_ingest,
            "extract": self.stage_extract,
            "link": self.stage_link,
            "canonicalize": self.stage_canonicalize,
            "materialize": self.stage_materialize,
        }
        stage_secs: dict[str, float] = {}
        for stage in STAGES:
            if resume and stage != "materialize" and self._done(stage):
                self.metrics[stage] = {"resumed": True, **(self.store.read_marker(stage) or {})}
                continue
            ts = time.time()
            fns[stage]()
            stage_secs[stage] = round(time.time() - ts, 3)
        self.metrics["stage_secs"] = stage_secs
        self.metrics["wall_sec"] = time.time() - t0
        return self.metrics

    # ------------------------------------------------------------ dataframes
    def triples(self) -> DataFrame:
        return self.store.read("triples")

    def nodes(self) -> DataFrame:
        return self.store.read("nodes")

    def rejects(self) -> DataFrame:
        return (
            self.store.read("ingested")
            .filter(F.col("_ok").cast("string") == "false")
            .select("conv_id", "turn_idx", "reject_reason")
        )

    def lineage(self) -> DataFrame:
        return self.store.read("lineage")
