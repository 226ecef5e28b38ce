"""Round-7 batch 1: mixed-format image decode through the sniff →
dispatch seam (VERDICT r06 next-step 3 — the decode_image
NotImplementedError is gone for stdlib-decodable containers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from matt3r_data_ingestion_serverless_spark.plans.registry import register
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# mixed-format corpus decode: even docs are P6 PPM, odd docs are PNG
# ---------------------------------------------------------------------------

_MIXED_SQL = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'png' END AS fmt,
         CASE WHEN doc_id % 2 = 0 THEN 8 + doc_id % 5 ELSE 9 + doc_id % 4 END AS w,
         CASE WHEN doc_id % 2 = 0 THEN 6 + doc_id % 3 ELSE 5 + doc_id % 4 END AS h
  FROM documents
),
s AS (SELECT doc_id, fmt, w, h, unnest(range(0, w * h * 3)) AS i FROM d),
v AS (
  SELECT doc_id, fmt, w, i, i % 3 AS c, (i // 3) % w AS x, i // (3 * w) AS y
  FROM s
),
p AS (
  SELECT doc_id, fmt, i,  c,
         CASE WHEN fmt = 'ppm'
              THEN (doc_id * 7 + y * 13 + x * 5 + c * 29) % 256
              ELSE (doc_id * 11 + y * 3 + x * 7 + c * 19) % 256
         END AS pv
  FROM v
)
SELECT doc_id,
       any_value(fmt) AS fmt,
       CAST(count(*) // 3 AS BIGINT) AS n_pixels,
       CAST(sum(CASE WHEN c = 0 THEN pv ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN c = 1 THEN pv ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN c = 2 THEN pv ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(sum(pv * (i + 1)) AS BIGINT) AS checksum
FROM p GROUP BY doc_id
"""


@register("mm_mixed_format_decode", _MIXED_SQL)
def mm_mixed_format_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-container ingest (operators/multimodal.py:
    sniff_format/decode_image/mixed_image_features): every blob is
    routed by MAGIC BYTES alone — even doc_ids arrive as P6 PPM, odd as
    PNG (zlib + CRC-32 + scanline filters), and decode_image picks the
    decoder with no per-row format hint. The graded columns are
    integer-exact aggregates of the DECODED pixels of both formats in
    one pass; the oracle regenerates each format's pixels
    arithmetically, so a mis-sniff (wrong decoder per row) or any
    decode bug in either branch breaks the hash.

    Scale: pure map-side — sniff + decode + reduce run inside the
    executor Arrow batch; only 7-column feature rows shuffle. This is
    the shape a 100 TB multimodal crawl needs: one scan over a mixed
    object corpus, no per-format shuffle split."""
    from matt3r_data_ingestion_serverless_spark.operators.multimodal import (
        mixed_image_features,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    return mixed_image_features(docs)
