"""Contract-schema registry — catalog-less schema enforcement for the lake.

The reference re-derives its projection from ``information_schema`` every
run (extractors/ingest_mysql_data.py:164-200), so ANY upstream schema
change flows into the lake silently: a dropped column just vanishes from
new files, a type change lands as a different parquet physical type and
breaks readers later, at query time, far from the cause. Production
lakehouses solve this with table-format schema enforcement (Delta/Iceberg
reject incompatible appends at WRITE time); without those jars, this
registry is the same contract kept as versioned JSON next to the
execution log:

- first ingest PINS the source schema (version 0);
- a later source schema that ADDS nullable columns is an allowed
  evolution: a new version is recorded and the append proceeds
  (``read_lake``'s mergeSchema surfaces old rows as NULL);
- a DROPPED column or a TYPE CHANGE raises ``SchemaDriftError`` BEFORE
  anything is written — loud at the write, not wrong at the read.

Registry I/O is one tiny JSON file per version per ingestion id —
metadata-scale, driver-side, same durability story as the control table.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T


class SchemaDriftError(RuntimeError):
    """Incompatible source schema change (drop / type change)."""


@dataclass(frozen=True)
class SchemaDecision:
    version: int
    evolved: bool  # True when this run recorded a NEW version
    added_columns: tuple[str, ...]


class SchemaRegistry:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    # -- storage ----------------------------------------------------------
    def _dir(self, ingestion_id: int) -> str:
        return f"{self.path}/id={ingestion_id}"

    def _fs(self, p):
        return p.getFileSystem(self._conf)

    def _latest(self, ingestion_id: int) -> tuple[int, T.StructType] | None:
        p = self._jvm.org.apache.hadoop.fs.Path(self._dir(ingestion_id))
        fs = self._fs(p)
        if not fs.exists(p):
            return None
        best = -1
        best_file = None
        for s in fs.listStatus(p):
            m = re.fullmatch(r"schema-v(\d+)\.json", s.getPath().getName())
            if m and int(m.group(1)) > best:
                best, best_file = int(m.group(1)), s.getPath()
        if best_file is None:
            return None
        stream = self._fs(best_file).open(best_file)
        try:
            # py4j passes buffers BY COPY, so stream.read(bytearray) can
            # never fill a Python buffer — drain JVM-side via commons-io
            text = self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return best, T.StructType.fromJson(json.loads(text))

    def _write(self, ingestion_id: int, version: int, schema: T.StructType) -> None:
        d = self._jvm.org.apache.hadoop.fs.Path(self._dir(ingestion_id))
        fs = self._fs(d)
        fs.mkdirs(d)
        f = self._jvm.org.apache.hadoop.fs.Path(
            f"{self._dir(ingestion_id)}/schema-v{version}.json"
        )
        out = fs.create(f, False)  # no overwrite: versions are immutable
        try:
            out.write(bytearray(json.dumps(schema.jsonValue()).encode()))
        finally:
            out.close()

    # -- contract ---------------------------------------------------------
    def check_and_evolve(
        self, ingestion_id: int, schema: T.StructType, _retries: int = 3
    ) -> SchemaDecision:
        """Validate a source schema against the pinned contract.

        Returns the (possibly new) contract version. Additive nullable
        columns evolve the contract; drops and type changes raise
        ``SchemaDriftError`` with the exact columns named.
        """
        latest = self._latest(ingestion_id)
        if latest is None:
            try:
                self._write(ingestion_id, 0, schema)
            except Exception:
                # two concurrent FIRST-TIME writers raced on the version-0
                # pin (create is no-overwrite, exactly one wins). Re-enter:
                # _latest now sees the winner's pin, so the loser validates
                # against it like any later writer — identical schemas
                # converge, drift raises. Same bounded-retry contract as the
                # evolution race below.
                if _retries <= 0:
                    raise
                return self.check_and_evolve(ingestion_id, schema, _retries - 1)
            return SchemaDecision(0, True, tuple(f.name for f in schema.fields))
        version, pinned = latest
        pin = {f.name: f.dataType for f in pinned.fields}
        src = {f.name: f.dataType for f in schema.fields}
        dropped = sorted(set(pin) - set(src))
        if dropped:
            raise SchemaDriftError(
                f"id {ingestion_id}: source dropped contract column(s) "
                f"{dropped} (contract v{version}); refusing to append — "
                "bump the contract explicitly if the drop is intended"
            )
        changed = sorted(
            name for name in pin if src[name].simpleString() != pin[name].simpleString()
        )
        if changed:
            detail = ", ".join(
                f"{n}: {pin[n].simpleString()} -> {src[n].simpleString()}"
                for n in changed
            )
            raise SchemaDriftError(
                f"id {ingestion_id}: source changed column type(s) ({detail}) "
                f"vs contract v{version}; refusing to append"
            )
        added = tuple(sorted(set(src) - set(pin)))
        if not added:
            return SchemaDecision(version, False, ())
        try:
            self._write(ingestion_id, version + 1, schema)
        except Exception:
            # two concurrent evolvers raced on the same version file
            # (create is no-overwrite, so exactly one wins). Re-validate
            # against whatever won: identical-or-compatible schemas
            # converge, a genuinely different one raises drift as usual.
            # Bounded retries so a persistent FS failure (permissions,
            # quota) surfaces instead of spinning.
            if _retries <= 0:
                raise
            return self.check_and_evolve(ingestion_id, schema, _retries - 1)
        return SchemaDecision(version + 1, True, added)
