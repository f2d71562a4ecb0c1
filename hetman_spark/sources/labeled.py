"""S6: pre-labeled push source (aggregator mode).

The reference's aggregator receives Loki-style payloads over HTTP and
fans each record into every workflow's channel with its upstream
labels attached (/root/reference/internal/cmd/aggregator.go:29-85).
Batch rebuild (SURVEY §2.1 S6): a second source table whose rows
already carry a `labels` map column, unioned with the file-source
frame before the parse stage; the tag merge gives those labels top
precedence (labels > parsed > add_tags, loki.go:33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LABELS_TYPE = "map<string,string>"


def with_labels(df: DataFrame, labels: dict[str, str] | None = None) -> DataFrame:
    """Attach a constant labels map (or an empty/null one)."""
    if labels:
        lit_map = F.create_map(*[x for k, v in sorted(labels.items()) for x in (F.lit(k), F.lit(v))])
        return df.withColumn("labels", lit_map)
    return df.withColumn("labels", F.lit(None).cast(LABELS_TYPE))


def union_labeled(file_source: DataFrame, labeled_source: DataFrame) -> DataFrame:
    """Union the tailed-file frame with an already-labeled push frame,
    normalizing the `labels` column on both sides (missing -> null)."""
    a = file_source if "labels" in file_source.columns else with_labels(file_source)
    b = labeled_source if "labels" in labeled_source.columns else with_labels(labeled_source)
    return a.unionByName(b.select(a.columns))
