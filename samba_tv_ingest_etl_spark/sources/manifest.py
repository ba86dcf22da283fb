"""Manifest-committed table: atomic MULTI-partition commits on plain
parquet — the minimal MVCC discipline Delta/Iceberg formalize,
reduced to what the mutation suite needs.

Layout of a manifest table directory::

    <table>/
      data/<partition>=<value>/<uuid>/part-*.parquet   (immutable)
      _manifests/manifest_<version>.json               (immutable)
      _CURRENT                                         (atomic pointer)

A manifest maps every live partition value to the file-set directory
holding its current rows. A commit (a) writes NEW data directories (a
full Spark job per touched partition — existing files are never
modified), (b) writes the next manifest listing old dirs for
untouched partitions and new dirs for touched ones, then (c) swaps
the one-line ``_CURRENT`` pointer with the same checked-rename
discipline as ``atomic_overwrite``. Readers resolve ``_CURRENT`` →
manifest → directory list, so they see the pre-commit or post-commit
table, never a mix — this is the multi-partition atomicity the
dynamic-partition-overwrite backend trades away (its commits are
per-partition). Old versions remain readable until vacuumed
(time travel for free, at the cost of space until cleanup).

Scale notes: the manifest is O(partitions) JSON, not O(files) — each
entry points at a directory; listing happens at read time, pruned to
the partitions the reader asks for. Readers select partitions BEFORE
Spark ever lists a directory, which replaces hive partition pruning
(and beats it on object stores: no full-table LIST)."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .writer import _fs


class ManifestTable:
    def __init__(self, spark: SparkSession, path: str, partition_col: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.partition_col = partition_col

    # -- internals ----------------------------------------------------
    def _jpath(self, p: str):
        return self.spark.sparkContext._jvm.org.apache.hadoop.fs.Path(p)

    def _read_text(self, fs, p: str) -> str:
        stream = fs.open(self._jpath(p))
        try:
            out = []
            while True:
                b = stream.read()
                if b < 0:
                    break
                out.append(chr(b))
            return "".join(out)
        finally:
            stream.close()

    def _write_text_atomic(self, fs, p: str, content: str) -> None:
        tmp = p + ".__tmp__"
        stream = fs.create(self._jpath(tmp), True)
        try:
            stream.write(bytearray(content.encode("utf-8")))
        finally:
            stream.close()
        # single-file rename-over: delete-then-rename with checked
        # returns (the pointer is recoverable from _manifests if a
        # crash lands between the two)
        target = self._jpath(p)
        if fs.exists(target) and not fs.delete(target, False):
            raise RuntimeError(f"manifest: cannot replace {p}")
        if not fs.rename(self._jpath(tmp), target):
            raise RuntimeError(f"manifest: pointer swap failed for {p}")

    def _current_version(self, fs) -> int:
        cur = f"{self.path}/_CURRENT"
        if not fs.exists(self._jpath(cur)):
            return 0
        return int(self._read_text(fs, cur).strip())

    def _manifest(self, version: int) -> dict:
        fs, _ = _fs(self.spark, self.path)
        if version == 0:
            return {}
        return json.loads(
            self._read_text(
                fs, f"{self.path}/_manifests/manifest_{version}.json"
            )
        )

    # -- public API ---------------------------------------------------
    def exists(self) -> bool:
        fs, _ = _fs(self.spark, self.path)
        return bool(fs.exists(self._jpath(f"{self.path}/_CURRENT")))

    def version(self) -> int:
        fs, _ = _fs(self.spark, self.path)
        return self._current_version(fs)

    def read(self, partitions: list | None = None, version: int | None = None) -> DataFrame:
        """Snapshot read; ``partitions`` prunes to the listed values
        BEFORE any filesystem listing. ``version`` time-travels."""
        fs, _ = _fs(self.spark, self.path)
        v = self._current_version(fs) if version is None else version
        manifest = self._manifest(v)
        if partitions is not None:
            wanted = {str(p) for p in partitions}
            manifest = {k: d for k, d in manifest.items() if k in wanted}
        if not manifest:
            raise ValueError(
                f"manifest read of {self.path}: no live partitions"
            )
        from functools import reduce

        from pyspark.sql import functions as F

        parts = [
            self.spark.read.parquet(entry["dir"]).withColumn(
                self.partition_col,
                F.lit(key).cast(entry["type"]),
            )
            for key, entry in sorted(manifest.items())
        ]
        return reduce(lambda a, b: a.unionByName(b), parts)

    def commit(self, updates: dict) -> int:
        """Atomically replace the listed partitions: ``updates`` maps
        partition value -> DataFrame (or None to DROP the partition).
        All other partitions carry over unchanged. Returns the new
        version. Readers never observe a partial commit — they hold
        the old manifest until the pointer swap."""
        fs, _ = _fs(self.spark, self.path)
        base = self._current_version(fs)
        manifest = dict(self._manifest(base))
        col = self.partition_col
        for value, df in updates.items():
            key = str(value)
            if df is None:
                manifest.pop(key, None)
                continue
            dest = (
                f"{self.path}/data/{col}={key}/{uuid.uuid4().hex[:12]}"
            )
            # the partition value lives in the manifest (typed), the
            # files never store the column — same storage shape as
            # hive partitioning, resolved without directory listing
            dtype = dict(df.dtypes)[col]
            df.drop(col).write.parquet(dest)
            manifest[key] = {"dir": dest, "type": dtype}
        nxt = base + 1
        mdir = self._jpath(f"{self.path}/_manifests")
        if not fs.exists(mdir):
            fs.mkdirs(mdir)
        mpath = f"{self.path}/_manifests/manifest_{nxt}.json"
        stream = fs.create(self._jpath(mpath), False)  # immutable: no overwrite
        try:
            stream.write(
                bytearray(json.dumps(manifest, sort_keys=True).encode())
            )
        finally:
            stream.close()
        self._write_text_atomic(fs, f"{self.path}/_CURRENT", str(nxt))
        return nxt

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Drop data directories referenced ONLY by manifests older
        than the ``keep_versions`` most recent (and those manifests).
        Never touches directories any kept version references."""
        fs, _ = _fs(self.spark, self.path)
        cur = self._current_version(fs)
        keep = set(range(max(1, cur - keep_versions + 1), cur + 1))
        live = set()
        for v in keep:
            live |= {e["dir"] for e in self._manifest(v).values()}
        removed = []
        mdir = self._jpath(f"{self.path}/_manifests")
        if fs.exists(mdir):
            for st in fs.listStatus(mdir):
                name = st.getPath().getName()
                v = int(name.removeprefix("manifest_").removesuffix(".json"))
                if v in keep:
                    continue
                for d in (e["dir"] for e in self._manifest(v).values()):
                    if d not in live and fs.exists(self._jpath(d)):
                        if not fs.delete(self._jpath(d), True):
                            raise RuntimeError(f"vacuum failed: {d}")
                        removed.append(d)
                        live.add(d)  # don't double-delete
                fs.delete(st.getPath(), False)
        return sorted(set(removed))
