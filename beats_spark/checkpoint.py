"""Checkpoint manifest + resume — the registrar/ack model, Spark-shaped.

Beats persists per-file offsets through the registrar after outputs ACK a
batch (reference: /root/reference/filebeat/registrar/registrar.go:33-64,
ack flow /root/reference/libbeat/publisher/pipeline/ttl_batch.go:95-99) for
at-least-once delivery. The Spark equivalent in this engine:

- each sink write is atomic at the directory level (parquet _SUCCESS; with
  Iceberg this is a snapshot commit — effectively exactly-once per sink);
- after a sink commits, we record a manifest entry {sink, rows, job_id};
- a resumed run consults the manifest and processes ONLY sinks that have no
  committed entry — no loss, no duplication at sink granularity, which is
  strictly stronger than the reference's at-least-once (duplicates possible
  after crash, registrar.go comment).

The manifest is a plain JSON file next to the output: on a cluster this
lives on the shared store (S3/HDFS) and is written by the driver only after
the sink's write action returned — the same "ack then persist offset"
ordering as the registrar.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.routing import SINK_COL

MANIFEST = "_beats_manifest.json"


def _manifest_path(base: str) -> str:
    return os.path.join(base, MANIFEST)


def read_manifest(base: str) -> dict[str, Any]:
    p = _manifest_path(base)
    if not os.path.exists(p):
        return {"job_id": None, "sinks": {}}
    with open(p) as f:
        return json.load(f)


def _write_manifest(base: str, manifest: dict) -> None:
    # atomic replace: write-temp + rename, same guarantee the registrar's
    # statestore flush provides
    os.makedirs(base, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=base, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(base))


def checkpointed_fan_out(
    routed: DataFrame,
    base: str,
    job_id: str,
    target: str = SINK_COL,
    file_format: str = "parquet",
    fail_after: int | None = None,
) -> dict[str, Any]:
    """Write each sink as its own committed dataset, updating the manifest
    after every sink commit; on re-run, sinks already committed for this
    job_id are skipped (resume).

    `fail_after` (tests only): simulate a crash after N sink commits.

    Scale note: per-sink writes here filter the routed frame once per sink.
    For the throughput path use routing.fan_out (single-pass partitionBy);
    this writer is the RESUMABLE path — per-sink atomic commit + manifest is
    what buys checkpoint/restart. With Iceberg both combine (branch writes +
    snapshot per sink). The routed frame is persisted inside the function so
    the upstream DAG computes ONCE (populated by the sink-discovery pass);
    per-sink row counts come from the freshly written files (cheap columnar
    count — parquet footer metadata), never from re-running the lineage.
    """
    spark = routed.sparkSession
    manifest = read_manifest(base)
    if manifest.get("job_id") != job_id:
        # a new job invalidates every previous commit: remove sink dirs the
        # old manifest committed, else a run routing to fewer/different
        # sinks leaves stale `_sink=*` data that spark.read.parquet(base)
        # would silently union in. (Local FS here; on S3/HDFS this is the
        # same recursive-delete call via the Hadoop FileSystem API.)
        import shutil

        if os.path.isdir(base):
            for d in os.listdir(base):
                if d.startswith(f"{target}="):
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        manifest = {"job_id": job_id, "sinks": {}, "started_at": time.time()}
        _write_manifest(base, manifest)

    routed = routed.persist()
    try:
        # this pass materializes the cache; every per-sink write below reads
        # the cached partitions instead of recomputing parse→enrich→route
        sinks = [r[0] for r in routed.select(target).distinct().collect()]
        done = 0
        for sink in sorted(sinks):
            if sink in manifest["sinks"]:
                continue  # committed by a previous attempt — resume skips it
            part = routed.filter(F.col(target) == sink).drop(target)
            path = os.path.join(base, f"{target}={sink}")
            part.write.format(file_format).mode("overwrite").save(path)
            rows = spark.read.format(file_format).load(path).count()
            manifest["sinks"][sink] = {"rows": rows, "committed_at": time.time()}
            _write_manifest(base, manifest)
            done += 1
            if fail_after is not None and done >= fail_after:
                raise RuntimeError(f"simulated crash after {done} sink commits")
    finally:
        routed.unpersist()
    return manifest


def verify_manifest(spark, base: str, target: str = SINK_COL) -> dict[str, bool]:
    """Re-count each committed sink directory against the manifest — the
    'registrar metrics' check (states current == persisted)."""
    manifest = read_manifest(base)
    out = {}
    for sink, entry in manifest["sinks"].items():
        n = spark.read.parquet(os.path.join(base, f"{target}={sink}")).count()
        out[sink] = n == entry["rows"]
    return out
