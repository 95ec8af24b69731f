"""Checkpointed streaming sink: foreachBatch → partitioned parquet with
idempotent batch commits + the same manifest/metrics surface as the batch
pipeline (BASELINE.json:6's checkpoint-everything posture, streaming side).

Exactly-once: Structured Streaming replays a micro-batch after a crash with
the SAME batchId; the sink skips batches whose commit marker exists, so
replays are no-ops. (The built-in file sink gives this via its own sink log;
this sink exists to add per-batch row/byte metrics and manifest lineage in
the engine's own format.)
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame


def _marker(out_dir: str, batch_id: int) -> str:
    return os.path.join(out_dir, "_commits", f"batch_{batch_id}.json")


def write_stream_checkpointed(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_col: str,
    query_name: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query writing `df` to out_dir (partitioned parquet)
    with idempotent per-batch commits + metrics manifest. Returns the query."""
    os.makedirs(os.path.join(out_dir, "_commits"), exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker(out_dir, batch_id)
        if os.path.exists(marker):  # replayed batch → no-op (exactly-once)
            return
        rows = batch_df.count()
        (
            batch_df.write.mode("append")
            .partitionBy(partition_col)
            .parquet(out_dir)
        )
        tmp = marker + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows": rows}, f)
        os.replace(tmp, marker)  # atomic commit

    w = df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if query_name:
        w = w.queryName(query_name)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_manifest(out_dir: str) -> dict:
    """Aggregate the per-batch commit markers into a manifest view."""
    cdir = os.path.join(out_dir, "_commits")
    batches = []
    if os.path.isdir(cdir):
        for name in sorted(os.listdir(cdir)):
            if name.endswith(".json"):
                with open(os.path.join(cdir, name)) as f:
                    batches.append(json.load(f))
    return {
        "batches": batches,
        "total_rows": sum(b["rows"] for b in batches),
        "complete_batches": len(batches),
    }
