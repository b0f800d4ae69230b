from gp_ann_spark.streaming.ingest import (  # noqa: F401
    ingest_stream,
    lang_counts_stream,
)
