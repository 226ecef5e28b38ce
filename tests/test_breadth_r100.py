"""Tests for the decode_image sniff → dispatch seam and the
mixed-format corpus query (plans/breadth_r100.py)."""

from __future__ import annotations

import numpy as np
import pytest

from matt3r_data_ingestion_serverless_spark.operators.multimodal import (
    _png_pixels,
    decode_image,
    decode_ppm,
    decode_png,
    sniff_format,
    synth_png,
    synth_ppm,
    synth_wav,
)
from matt3r_data_ingestion_serverless_spark.plans.breadth_r100 import (
    mm_mixed_format_decode,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_sniff_format_magic_bytes():
    assert sniff_format(synth_ppm(4)) == "ppm"
    assert sniff_format(synth_png(5)) == "png"
    assert sniff_format(synth_wav(6)) == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert sniff_format(b"GIF89a" + b"\x00" * 16) == "gif"
    assert sniff_format(b"plain text") == "unknown"
    assert sniff_format(b"") == "unknown"


def test_decode_image_dispatches_by_content():
    for doc_id in (0, 2, 10):  # even → both formats decodable directly
        w, h, px = decode_image(synth_ppm(doc_id))
        ww, hh, pp = decode_ppm(synth_ppm(doc_id))
        assert (w, h) == (ww, hh) and (px == pp).all()
    for doc_id in (1, 3, 11):
        w, h, px = decode_image(synth_png(doc_id))
        assert (px == _png_pixels(doc_id)).all()


def test_decode_image_raises_only_for_external_codecs():
    with pytest.raises(NotImplementedError, match="gif"):
        decode_image(b"GIF89a" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="unknown"):
        decode_image(b"not an image")
    # wav is sniffable but not an IMAGE decode — stays at the seam
    with pytest.raises(NotImplementedError, match="wav"):
        decode_image(synth_wav(1))
    # jpeg now dispatches to a real decoder: garbage after the magic is
    # a loud ValueError from the marker walk, never a silent result
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_mixed_format_decode_matches_python(spark):
    from matt3r_data_ingestion_serverless_spark.operators.multimodal import synth_jpeg

    rows = mm_mixed_format_decode(spark, SF_SMOKE).collect()
    docs = {d.doc_id for d in load_table(spark, SF_SMOKE, "documents").collect()}
    assert {r.doc_id for r in rows} == docs
    fmts = {r.fmt for r in rows}
    assert fmts == {"ppm", "png", "jpeg"}
    for r in rows[:30]:
        blob = (synth_ppm, synth_png, synth_jpeg)[r.doc_id % 3](r.doc_id)
        assert r.fmt == ("ppm", "png", "jpeg")[r.doc_id % 3]
        w, h, px = decode_image(blob)
        v = px.astype(np.int64)
        flat = v.reshape(-1)
        assert r.n_pixels == w * h
        assert (r.sum_r, r.sum_g, r.sum_b) == (
            int(v[:, :, 0].sum()),
            int(v[:, :, 1].sum()),
            int(v[:, :, 2].sum()),
        )
        assert r.checksum == int((flat * np.arange(1, flat.size + 1)).sum())


def test_mixed_format_decode_oracle_parity(spark):
    from tests.oracle_harness import compare, duckdb_con

    from matt3r_data_ingestion_serverless_spark.plans.breadth_r100 import _MIXED_SQL

    con = duckdb_con(SF_SMOKE)
    problems = compare(mm_mixed_format_decode(spark, SF_SMOKE), con, _MIXED_SQL)
    assert problems == []


# -- z-order clustering -------------------------------------------------------


def test_zorder2_matches_python_twin(spark):
    import random

    from pyspark.sql import functions as F

    from matt3r_data_ingestion_serverless_spark.functions.zorder import (
        zorder2,
        zorder2_py,
    )

    rng = random.Random(7)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    rows += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder2(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == zorder2_py(r.a, r.b), (r.a, r.b)


def test_zorder_scan_prunes_both_dimensions(spark):
    """The point of z-clustering: a predicate on EITHER key prunes
    files from the same one-column manifest stats — a 1-D range layout
    prunes only its own key."""
    from matt3r_data_ingestion_serverless_spark.plans.breadth_r100 import (
        _ZORDER_FILES,
        _zorder_table,
    )

    tbl, _root, box = _zorder_table(spark, SF_SMOKE)
    (k1lo, k1hi), (k2lo, k2hi) = box
    total = len(tbl.manifest()["file_list"])
    assert total == _ZORDER_FILES
    # 2-D box of 1/64 of the plane: strict minority of files opened
    read_2d, _ = tbl.files_scanned({"o_orderkey": (k1lo, k1hi), "o_custkey": (k2lo, k2hi)})
    assert read_2d < total / 2, (read_2d, total)
    # each 1-D predicate alone also prunes (the z-curve bounds BOTH)
    read_k1, _ = tbl.files_scanned({"o_orderkey": (k1lo, k1hi)})
    read_k2, _ = tbl.files_scanned({"o_custkey": (k2lo, k2hi)})
    assert read_k1 < total, read_k1
    assert read_k2 < total, read_k2
    assert read_2d <= min(read_k1, read_k2)


def test_zorder_scan_loses_no_rows(spark):
    from pyspark.sql import functions as F

    from matt3r_data_ingestion_serverless_spark.plans.breadth_r100 import (
        _zorder_table,
        j18_lakehouse_zorder_skipping,
    )

    tbl, _root, box = _zorder_table(spark, SF_SMOKE)
    (k1lo, k1hi), (k2lo, k2hi) = box
    expect = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(
            F.col("o_orderkey").between(k1lo, k1hi)
            & F.col("o_custkey").between(k2lo, k2hi)
        )
        .count()
    )
    got = j18_lakehouse_zorder_skipping(spark, SF_SMOKE).agg(F.sum("n")).first()[0]
    assert got == expect and expect > 0


def test_zorder_oracle_parity(spark):
    from tests.oracle_harness import compare, duckdb_con

    from matt3r_data_ingestion_serverless_spark.plans.breadth_r100 import (
        _J18_SQL,
        j18_lakehouse_zorder_skipping,
    )

    con = duckdb_con(SF_SMOKE)
    problems = compare(j18_lakehouse_zorder_skipping(spark, SF_SMOKE), con, _J18_SQL)
    assert problems == []


# -- metadata-only aggregation -------------------------------------------------


def test_metadata_only_agg_opens_no_data_files(spark):
    """The whole point: the aggregate is answered from the manifest.
    Boobytrap the snapshot read — the query must never call it."""
    from matt3r_data_ingestion_serverless_spark.operators.lakehouse import (
        LakehouseTable,
    )
    from matt3r_data_ingestion_serverless_spark.plans.breadth_r100 import (
        j19_metadata_only_agg,
    )

    orig = LakehouseTable.read
    LakehouseTable.read = None  # any data read -> TypeError
    try:
        row = j19_metadata_only_agg(spark, SF_SMOKE).first()
    finally:
        LakehouseTable.read = orig
    assert row.n_rows > 0 and row.min_k <= row.max_k


def test_metadata_only_agg_oracle_parity(spark):
    from tests.oracle_harness import compare, duckdb_con

    from matt3r_data_ingestion_serverless_spark.plans.breadth_r100 import (
        _J19_SQL,
        j19_metadata_only_agg,
    )

    con = duckdb_con(SF_SMOKE)
    assert compare(j19_metadata_only_agg(spark, SF_SMOKE), con, _J19_SQL) == []
