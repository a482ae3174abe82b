"""Iceberg backend for the snapshot store (ROADMAP item 3 / r01 verdict
item 8) — a config switch, not a code change.

``snapshot_store(spark, base_dir)`` returns:

- :class:`IcebergStore` when the Iceberg Spark runtime is on the
  classpath AND an Iceberg catalog is configured
  (``spark.sql.catalog.<name>`` = ``org.apache.iceberg.spark.SparkCatalog``);
- the parquet+manifest :class:`engine.checkpoint.SnapshotStore`
  otherwise (this sandbox has no Iceberg jar — the fallback is the
  tested default).

``IcebergStore`` implements the identical contract (``write → manifest
row with snapshot_id``, ``read(version)``, ``latest(stage,
fingerprint)``, ``history``) on real Iceberg tables:

- write    → ``df.writeTo(cat.ns.stage).append()`` with the stage
  fingerprint stamped as a snapshot summary property
  (``snapshot-property.*`` write options) — commit atomicity comes from
  the Iceberg catalog instead of the directory rename;
- history  → the ``.snapshots`` metadata table;
- read     → ``VERSION AS OF <snapshot_id>`` time travel.

The class is importable and unit-checked for its guard behavior here;
its write/read paths execute only on a cluster image that ships the
runtime jar (kept intentionally thin so the contract tests in
tests/test_engine.py — which run against the fallback — pin the
semantics both backends must satisfy).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def configured_catalog(spark: SparkSession) -> str | None:
    """Name of the first configured Iceberg catalog, or None."""
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 and "SparkCatalog" in v:
            return k.rsplit(".", 1)[1]
    return None


class IcebergStore:
    """Iceberg-tables implementation of the SnapshotStore contract."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "greenex"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jar not on the classpath — use "
                "engine.checkpoint.SnapshotStore (snapshot_store() picks "
                "automatically)"
            )
        self.spark = spark
        self.catalog = catalog
        self.ns = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _table(self, stage: str) -> str:
        return f"{self.catalog}.{self.ns}.{stage}"

    def history(self, stage: str) -> list[dict]:
        t = self._table(stage)
        try:
            snaps = self.spark.sql(
                f"SELECT snapshot_id, committed_at, summary FROM {t}.snapshots "
                "ORDER BY committed_at"
            ).collect()
        except Exception:
            return []
        return [
            {
                "stage": stage,
                "snapshot_id": str(s["snapshot_id"]),
                "fingerprint": (s["summary"] or {}).get("fingerprint"),
                # added-records = rows of THIS write (the parquet
                # SnapshotStore contract); total-records is cumulative
                "rows": int((s["summary"] or {}).get("added-records", -1)),
                "committed": True,  # Iceberg snapshots exist iff committed
                "ts": s["committed_at"].timestamp(),
            }
            for s in snaps
        ]

    def latest(self, stage: str, fingerprint: str) -> dict | None:
        rows = [m for m in self.history(stage) if m["fingerprint"] == fingerprint]
        return rows[-1] if rows else None

    def write(
        self,
        stage: str,
        df: DataFrame,
        fingerprint: str,
        partition_by: list[str] | None = None,
    ) -> dict:
        t = self._table(stage)
        t0 = time.time()
        w = df.writeTo(t).option("snapshot-property.fingerprint", fingerprint)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        # explicit existence check — a blanket append-then-create would
        # mask real append failures (schema drift, commit conflicts) as
        # a misleading TableAlreadyExists
        if self.spark.catalog.tableExists(t):
            w.append()
        else:
            w.create()
        wall_ms = int((time.time() - t0) * 1000)
        entry = self.latest(stage, fingerprint)
        assert entry is not None, "Iceberg commit did not surface a snapshot"
        entry = dict(entry)
        entry["wall_ms"] = wall_ms
        entry["path"] = t
        return entry

    def read(self, stage: str, snapshot_id: str | None = None) -> DataFrame:
        t = self._table(stage)
        if snapshot_id is None:
            rows = self.history(stage)
            if not rows:
                raise FileNotFoundError(f"no committed snapshot for stage {stage}")
            snapshot_id = rows[-1]["snapshot_id"]
        return self.spark.sql(f"SELECT * FROM {t} VERSION AS OF {snapshot_id}")

    def drop(self, stage: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self._table(stage)}")


def snapshot_store(spark: SparkSession, base_dir: str, backend: str = "auto"):
    """Factory: ``auto`` picks Iceberg when jar+catalog are present,
    else the parquet+manifest fallback; ``parquet`` / ``iceberg`` force
    a backend (forcing iceberg without the jar raises)."""
    from .checkpoint import SnapshotStore

    if backend == "parquet":
        return SnapshotStore(spark, base_dir)
    cat = configured_catalog(spark) if iceberg_available(spark) else None
    if backend == "iceberg":
        if cat is None:
            raise RuntimeError(
                "backend='iceberg' requires the runtime jar and a "
                "spark.sql.catalog.<name> = SparkCatalog configuration"
            )
        return IcebergStore(spark, cat)
    return IcebergStore(spark, cat) if cat is not None else SnapshotStore(spark, base_dir)
