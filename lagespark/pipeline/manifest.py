"""Stage checkpoint manifests with per-partition lineage + row/byte metrics
(BASELINE.json:6,14: "Every stage checkpoints … with per-partition lineage
and row/byte metrics so a killed job resumes mid-tiling").

Sandbox degradation (SURVEY.md §0): no Iceberg runtime jar is available, so
"Iceberg table" degrades to Hive-partitioned parquet + a JSON manifest we
write ourselves. The writer keeps the surface format-pluggable (`fmt`
parameter) so a real cluster swaps in format("iceberg") and inherits its
snapshot/manifest machinery instead of ours.

Manifest layout (one JSON per stage, committed atomically via temp+rename):
  {
    "stage": str, "manifest_id": str, "inputs": [manifest_id, ...],
    "partition_col": str,
    "partitions": {value: {"rows": int, "bytes": int}},
    "observed_rows": int,        # from df.observe() during the write
    "complete": true
  }

Resume contract: a stage with a complete manifest is skipped. An incomplete
stage recomputes ONLY missing partitions: the input is filtered to the
missing partition values (→ Catalyst partition pruning does the skipping)
and written with dynamic partitionOverwriteMode so present partitions are
left untouched.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lagespark_manifest.json")


def read_stage(spark, out_dir: str, verify: bool = True):
    """Read a checkpointed stage back (the src-iceberg degradation's read
    side): returns (DataFrame, manifest). With verify=True the on-disk
    partition set is checked against the manifest — a torn write (partition
    present on disk but absent from the committed manifest, or vice versa)
    fails fast instead of silently serving partial data."""
    man = read_manifest(out_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {out_dir} — stage incomplete")
    if not man.get("complete"):
        raise RuntimeError(f"stage {man.get('stage')} manifest is incomplete")
    if verify:
        on_disk = set(_partition_metrics(out_dir, man["partition_col"]))
        declared = set(man["partitions"])
        if on_disk != declared:
            raise RuntimeError(
                f"stage {man['stage']}: partitions on disk {sorted(on_disk)} "
                f"!= manifest {sorted(declared)}"
            )
    return spark.read.parquet(out_dir), man


def read_manifest(out_dir: str) -> dict | None:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _partition_metrics(out_dir: str, partition_col: str) -> dict:
    """Per-partition rows/bytes from the written parquet files (rows via
    parquet footers — no data scan)."""
    import pyarrow.parquet as pq

    parts: dict[str, dict] = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith(f"{partition_col}="):
            continue
        val = name.split("=", 1)[1]
        rows = 0
        nbytes = 0
        pdir = os.path.join(out_dir, name)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                fp = os.path.join(pdir, f)
                nbytes += os.path.getsize(fp)
                rows += pq.read_metadata(fp).num_rows
        parts[val] = {"rows": rows, "bytes": nbytes}
    return parts


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    partition_col: str,
    inputs: list[str] | None = None,
    fmt: str = "parquet",
    resume: bool = False,
) -> dict:
    """Write a checkpointed stage; returns its manifest. With resume=True and
    an existing incomplete output, only missing partitions are recomputed."""
    man = read_manifest(out_dir)
    if man and man.get("complete") and man.get("inputs") == (inputs or []):
        return man  # stage done with the SAME inputs — skip entirely
    if man and man.get("complete"):
        # lineage invalidation: an upstream stage recomputed (different input
        # manifest ids) → this stage's data is stale and must rebuild fully
        man = None
        resume = False

    done_vals: set[str] = set()
    if resume and os.path.isdir(out_dir):
        # partitions already on disk (from the killed run) are kept as-is
        done_vals = set(_partition_metrics(out_dir, partition_col))
        if done_vals:
            df = df.filter(
                ~F.col(partition_col).cast("string").isin(sorted(done_vals))
            )

    obs = Observation(f"{stage}_metrics")
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    # dynamic overwrite ONLY on the resume path (keeps the partitions the
    # killed run completed); a fresh or lineage-invalidated rebuild must use
    # static overwrite so partitions absent from the new DataFrame are
    # DELETED — otherwise stale leftovers would be re-recorded into the new
    # manifest and served as verified data
    (
        df.write.format(fmt)
        .option("partitionOverwriteMode", "dynamic" if done_vals else "static")
        .mode("overwrite")
        .partitionBy(partition_col)
        .save(out_dir)
    )
    observed = int(obs.get["rows"]) if obs.get else 0

    manifest = {
        "stage": stage,
        "manifest_id": uuid.uuid4().hex,
        "inputs": inputs or [],
        "partition_col": partition_col,
        "partitions": _partition_metrics(out_dir, partition_col),
        "observed_rows": observed,
        "resumed_partitions_kept": sorted(done_vals),
        # snapshot lineage: prior manifest ids of this stage directory
        # (Iceberg-snapshot-style history, newest last)
        "snapshots": (man.get("snapshots", []) + [man["manifest_id"]]) if man else [],
        "complete": True,
    }
    tmp = _manifest_path(out_dir) + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))  # atomic commit
    return manifest


def stage_done(out_dir: str, inputs: list[str] | None = None) -> bool:
    """True iff the stage committed completely WITH the same inputs — lets a
    caller skip building the stage's DataFrame entirely. This matters for
    plans whose CONSTRUCTION runs jobs (iterative operators like
    duplicate_components fire per-round actions while the frame is being
    built, long before write_stage could skip the write)."""
    man = read_manifest(out_dir)
    return bool(man and man.get("complete") and man.get("inputs") == (inputs or []))
