"""Incremental recrawl via Structured Streaming (optional extension).

The reference is single-shot batch (cmd/root.go:36-68; ``mode: diff``
is fatal-unsupported at resources.go:73-75). Parity therefore does
NOT require streaming — resumability comes from lake snapshots + the
frontier ``state`` column. This module adds the natural Spark
extension: new page snapshots landing in a directory are harvested
incrementally with ``Trigger.AvailableNow`` semantics, reusing the
same extract/process kernels via ``foreachBatch`` so the batch and
streaming paths cannot drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.lake import Lake
from ..sources.config import Source


def incremental_harvest(
    spark: SparkSession,
    lake: Lake,
    sources: list[Source],
    pages_stream_dir: str,
    checkpoint_dir: str,
    run_date: str = "2024-01-01",
    bucket: str = "gleaner",
    context_maps: dict[str, dict] | None = None,
):
    """Start an available-now streaming harvest over a directory of
    page parquet drops. Returns the StreamingQuery (await it with
    .awaitTermination())."""
    from ..operators import harvest as hv
    from ..sources.corpus import PAGES_SCHEMA

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_stream_dir)
    )

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        frontier_like = batch_df.selectExpr(
            "url",
            "url as loc",
            "cast(0 as long) as position",
        )
        # within a micro-batch the page set IS the frontier slice
        from pyspark.sql import functions as F

        fetched = batch_df.select("url", "html", "text").withColumn(
            "source_name", F.lit("stream")
        ).withColumn("position", F.lit(0).cast("long"))
        extracted = hv.extract_documents(fetched, {"stream": 0})
        # same contextmaps as the batch path: without them, executor-
        # side validity checks would reject documents whose @context
        # the config maps to a local file, silently diverging the
        # streaming lake from a batch harvest of the identical pages
        processed = hv.process_documents(extracted, sources,
                                         context_maps=context_maps)
        seen_src = lake.table("documents").read(spark)
        seen = seen_src.select("source_name", "unique_id") if seen_src is not None else None
        new_docs = hv.dedup_new_documents(spark, processed, seen)
        docs_out = hv.documents_table(new_docs)
        if docs_out.limit(1).count():
            lake.table("documents").append(docs_out, run_id=f"stream-{batch_id}")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
