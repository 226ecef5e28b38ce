"""Manifest-tracked parquet table with snapshot isolation, key-range
file pruning, and time travel (SURVEY.md §2.6 J1-J3 extension tier;
VERDICT r02 next-step 3).

No Delta/Iceberg packages are installable in this container, so this is
the minimal honest subset of a lakehouse table format, built on plain
parquet + JSON manifests:

- a **snapshot manifest** per commit (``_manifest/v<N>.json``) listing
  the data files that make up that version, each with row count and
  per-column min/max stats harvested from the parquet FOOTER (no data
  scan — the stats already exist in the row-group metadata);
- an atomically-renamed ``CURRENT`` pointer, so readers always see a
  complete snapshot and a crashed writer leaves the table untouched;
- **MERGE INTO with file pruning**: only data files whose key range
  overlaps the incoming batch are read back and rewritten; every other
  file is carried into the next snapshot by reference. At 100 TB a
  batch touches a handful of files, so merge cost tracks the batch —
  the same contract Iceberg/Delta give via their manifests — while the
  row-level semantics stay :func:`merge.merge_plan`'s single full-outer
  join over the PRUNED target;
- **file-skipping scans**: a range predicate consults the manifest and
  reads only overlapping files — the query's parquet scan then gets
  Catalyst's usual row-group pushdown on top.

Old data files are never deleted by a commit — superseded snapshots
remain readable (``read(version=...)``), which is exactly Iceberg's
time-travel contract; a `vacuum` would garbage-collect unreferenced
files past a retention horizon (not needed in-container).

Scale stance: the driver-side work per commit is O(#files touched)
footer reads + one small JSON write — the data path is all Spark jobs.
On a real cluster the footer harvest would ride the write tasks
(commit-message pattern); reading footers from the driver keeps the
local implementation simple and is still metadata-only I/O.

Reference parity: the reference's S3 existence-check + skip-on-overlap
merge (parse_canserver_filtered_log.py:327-344) is the degenerate
single-file form of this — its "manifest" is the S3 key listing and its
"stats" the hour encoded in the filename.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.operators.merge import merge_plan

def _file_stats(path: str, stats_cols: list[str]) -> tuple[int, dict]:
    """(row_count, {col: [min, max]}) from the parquet footer only."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path).metadata
    idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
    stats: dict[str, list] = {}
    for col in stats_cols:
        if col not in idx:
            continue
        lo = hi = None
        ok = True
        for rg in range(meta.num_row_groups):
            c = meta.row_group(rg).column(idx[col])
            s = c.statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            mn, mx = s.min, s.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    ok = False
                    break
            if not isinstance(mn, (int, float, str)):
                ok = False  # non-JSON-portable stats (timestamps, …)
                break
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if ok and lo is not None:
            stats[col] = [lo, hi]
    return meta.num_rows, stats


class LakehouseTable:
    """Handle on a manifest-tracked parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._mdir = os.path.join(path, "_manifest")

    # -- manifest plumbing -------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version}.json")

    def current_version(self) -> int:
        with open(os.path.join(self._mdir, "CURRENT")) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [
            {k: m[k] for k in ("version", "operation", "files", "rows")}
            for m in (
                self.manifest(v) for v in range(1, self.current_version() + 1)
            )
        ]

    def _commit(
        self,
        version: int,
        operation: str,
        files: list[dict],
        schema_json: str | None = None,
    ) -> None:
        man = {
            "version": version,
            "operation": operation,
            "files": len(files),
            "rows": sum(f["rows"] for f in files),
            # table schema AT THIS SNAPSHOT: read() applies it explicitly,
            # so files written before a column was added project it as
            # null — schema evolution without rewriting old files (and
            # without mergeSchema's all-footers read)
            "schema_json": schema_json,
            "file_list": files,
        }
        tmp = self._manifest_path(version) + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.rename(tmp, self._manifest_path(version))
        cur_tmp = os.path.join(self._mdir, f"CURRENT.tmp-{os.getpid()}")
        with open(cur_tmp, "w") as f:
            f.write(str(version))
        os.rename(cur_tmp, os.path.join(self._mdir, "CURRENT"))  # atomic publish

    def _write_data_files(self, df: DataFrame, version: int, stats_cols: list[str]) -> list[dict]:
        sub = os.path.join("data", f"commit-{version}-{uuid.uuid4().hex[:8]}")
        out = os.path.join(self.path, sub)
        df.write.mode("overwrite").parquet(out)
        files = []
        for name in sorted(os.listdir(out)):
            if not name.endswith(".parquet"):
                continue
            rows, stats = _file_stats(os.path.join(out, name), stats_cols)
            if rows:
                files.append({"path": os.path.join(sub, name), "rows": rows, "stats": stats})
        return files

    # -- public API --------------------------------------------------------
    @classmethod
    def create(
        cls,
        df: DataFrame,
        path: str,
        *,
        stats_cols: list[str] | None = None,
    ) -> "LakehouseTable":
        """Write ``df`` as version 1. ``stats_cols`` default to every
        column (footer stats are skipped per-column where the physical
        type has no usable min/max)."""
        t = cls(df.sparkSession, path)
        os.makedirs(t._mdir, exist_ok=True)
        cols = list(stats_cols or df.columns)
        files = t._write_data_files(df, 1, cols)
        t._commit(1, "create", files, schema_json=df.schema.json())
        t._stats_cols = cols
        return t

    def read(self, version: int | None = None) -> DataFrame:
        """The snapshot as a DataFrame — exactly the files the manifest
        lists, so concurrent commits never tear a read. The manifest's
        schema is applied explicitly: files from before a column
        existed project it as null (schema evolution on read, no
        mergeSchema footer sweep)."""
        man = self.manifest(version)
        paths = [os.path.join(self.path, f["path"]) for f in man["file_list"]]
        reader = self.spark.read
        if man.get("schema_json"):
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(man["schema_json"])))
        return reader.parquet(*paths)

    def _split_by_range(
        self, man: dict, bounds: dict[str, tuple]
    ) -> tuple[list[dict], list[dict]]:
        """(overlapping, disjoint) file entries vs per-column [lo, hi]
        bounds. A file lacking stats for a bound column is conservatively
        'overlapping'. Disjointness on ANY column proves no key match."""
        hit, miss = [], []
        for entry in man["file_list"]:
            overlaps = True
            for col, (lo, hi) in bounds.items():
                st = entry["stats"].get(col)
                if st is not None and (st[1] < lo or st[0] > hi):
                    overlaps = False
                    break
            (hit if overlaps else miss).append(entry)
        return hit, miss

    def scan(self, bounds: dict[str, tuple]) -> DataFrame:
        """File-skipping read: only files whose stats overlap ``bounds``
        are opened (the caller still applies the exact row filter — the
        manifest prune is a superset, like Iceberg's). ``bounds`` maps
        column → (lo, hi), inclusive."""
        man = self.manifest()
        hit, _ = self._split_by_range(man, bounds)
        if not hit:
            return self.read().limit(0)
        return self.spark.read.parquet(
            *[os.path.join(self.path, f["path"]) for f in hit]
        )

    def files_scanned(self, bounds: dict[str, tuple]) -> tuple[int, int]:
        """(files read, files total) for a bounded scan — the pruning
        ratio tests/SCALE.md cite."""
        man = self.manifest()
        hit, _ = self._split_by_range(man, bounds)
        return len(hit), man["files"]

    def _touched_files(
        self, man: dict, source_df: DataFrame, keys: list[str]
    ) -> tuple[list[dict], list[dict]]:
        """(touched, untouched) file entries: a file is touched iff at
        least one source key row falls inside its [min, max] stats on
        every stat-covered key column. Exact at file granularity and
        robust to scattered batches; files lacking stats on all key
        columns are conservatively touched."""
        entries = man["file_list"]
        stat_keys = [k for k in keys if any(k in e["stats"] for e in entries)]
        hit_ids: set[int] = {
            i for i, e in enumerate(entries) if not any(k in e["stats"] for k in stat_keys)
        }
        candidates = [i for i in range(len(entries)) if i not in hit_ids]
        if candidates and len(candidates) <= 64:
            # small manifest: one scan with a per-file ANY(k in range)
            # flag — map-side partials, no join, no shuffle beyond the
            # 1-row agg. Past ~64 files the expression list stops
            # paying; the interval join below takes over.
            aggs = []
            for i in candidates:
                st = entries[i]["stats"]
                cond = F.lit(True)
                for k in stat_keys:
                    if k in st:
                        lo, hi = st[k]
                        cond = cond & (F.col(k) >= lo) & (F.col(k) <= hi)
                aggs.append(F.max(F.when(cond, 1)).alias(f"_f{i}"))
            row = source_df.agg(*aggs).collect()[0]
            hit_ids |= {i for i in candidates if row[f"_f{i}"] is not None}
            touched = [e for i, e in enumerate(entries) if i in hit_ids]
            untouched = [e for i, e in enumerate(entries) if i not in hit_ids]
            return touched, untouched
        if candidates:
            from pyspark.sql.types import LongType, StructField, StructType

            fields = [StructField("_fid", LongType())]
            rows = []
            for i in candidates:
                st = entries[i]["stats"]
                row = [i]
                for k in stat_keys:
                    lo, hi = st.get(k, (None, None))
                    row += [lo, hi]
                rows.append(tuple(row))
            for k in stat_keys:
                t = source_df.schema[k].dataType
                fields += [StructField(f"_lo_{k}", t), StructField(f"_hi_{k}", t)]
            iv = self.spark.createDataFrame(rows, StructType(fields))
            cond = F.lit(True)
            for k in stat_keys:
                lo, hi = F.col(f"_lo_{k}"), F.col(f"_hi_{k}")
                # a file missing stats for k is unconstrained on k
                cond = cond & (
                    lo.isNull() | ((F.col(k) >= lo) & (F.col(k) <= hi))
                )
            hits = (
                source_df.select(*stat_keys)
                .join(F.broadcast(iv), cond)
                .select("_fid")
                .distinct()
                .collect()
            )
            hit_ids |= {r._fid for r in hits}
        touched = [e for i, e in enumerate(entries) if i in hit_ids]
        untouched = [e for i, e in enumerate(entries) if i not in hit_ids]
        return touched, untouched

    def merge(
        self,
        source_df: DataFrame,
        keys: list[str],
        *,
        update_cols: list[str] | None = None,
        delete_condition=None,
        insert: bool = True,
        evolve_schema: bool = False,
    ) -> "LakehouseTable":
        """MERGE INTO with manifest pruning: data files that cannot
        contain any source key are carried into the new snapshot BY
        REFERENCE (no read, no rewrite); the rest union into the target
        side of one :func:`merge_plan` full-outer join.

        The touched-file set comes from joining the source's key column
        against the manifest's per-file [min, max] intervals (the
        Delta-style touched-files pass) — NOT from the source's single
        global min/max, which a batch mixing low-key updates with
        high-key inserts would stretch across the whole keyspace,
        defeating pruning entirely. The interval table is file-count
        rows, broadcast; the scan over the source is one batch-sized
        job that returns only distinct file ids.

        ``evolve_schema=True``: source columns absent from the table are
        ADDED to the schema (nulls on target-only rows); old data files
        are never rewritten — read() projects the missing columns as
        null via the manifest schema."""
        man = self.manifest()
        stats_cols = getattr(self, "_stats_cols", None) or list(
            {c for f in man["file_list"] for c in f["stats"]}
        )
        hit, miss = self._touched_files(man, source_df, keys)
        version = man["version"] + 1
        snapshot_schema = self.read().schema if man["file_list"] else source_df.schema
        new_cols = []
        if evolve_schema:
            have = set(f.name for f in snapshot_schema.fields)
            new_cols = [
                f for f in source_df.schema.fields
                if f.name not in have and f.name != "_del"
            ]
        if hit:
            target = self.spark.read.schema(snapshot_schema).parquet(
                *[os.path.join(self.path, f["path"]) for f in hit]
            )
            for f in new_cols:
                target = target.withColumn(f.name, F.lit(None).cast(f.dataType))
            merged = merge_plan(
                target,
                source_df,
                keys,
                update_cols=update_cols,
                delete_condition=delete_condition,
                insert=insert,
            )
        else:
            merged = source_df
            if delete_condition is not None:
                merged = merged.filter(~delete_condition)
            keep = set(f.name for f in snapshot_schema.fields) | {
                f.name for f in new_cols
            }
            merged = merged.select(*[c for c in merged.columns if c in keep])
        new_files = self._write_data_files(merged, version, stats_cols)
        self._commit(version, "merge", miss + new_files, schema_json=merged.schema.json())
        self.last_merge_pruned = (len(miss), man["files"])
        return self

    def compact(self, target_files: int = 4) -> "LakehouseTable":
        """OPTIMIZE: bin-pack the current snapshot into ``target_files``
        files and commit a snapshot that references ONLY the rewritten
        files — content-identical, file-count-reduced. At 100 TB this is
        the periodic small-file compaction every lakehouse runs against
        streaming-ingest fragmentation; prior snapshots (and time
        travel into them) are untouched."""
        man = self.manifest()
        stats_cols = getattr(self, "_stats_cols", None) or list(
            {c for f in man["file_list"] for c in f["stats"]}
        )
        df = self.read()
        version = man["version"] + 1
        files = self._write_data_files(
            df.repartition(target_files), version, stats_cols
        )
        self._commit(version, "compact", files, schema_json=man.get("schema_json"))
        return self

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Garbage-collect data files referenced ONLY by snapshots older
        than the newest ``retain_versions``; those old manifests are
        dropped too (time travel beyond the horizon is surrendered —
        that is vacuum's documented trade everywhere). Returns deleted
        file paths."""
        cur = self.current_version()
        keep_versions = list(range(max(1, cur - retain_versions + 1), cur + 1))
        keep_files = {
            f["path"] for v in keep_versions for f in self.manifest(v)["file_list"]
        }
        dropped: list[str] = []
        for v in range(1, keep_versions[0]):
            for f in self.manifest(v)["file_list"]:
                if f["path"] not in keep_files and f["path"] not in dropped:
                    dropped.append(f["path"])
            os.remove(self._manifest_path(v))
        for rel in dropped:
            try:
                os.remove(os.path.join(self.path, rel))
            except FileNotFoundError:
                pass
        return dropped
