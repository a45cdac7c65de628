"""Catalog layer: table registration + metadata introspection.

Replaces the reference's AWS Glue Data Catalog calls:

- ``list_data_types``  ~ ``athena_client.list_table_metadata``
  (reference app/main.py:124-128 returns only table names).
- ``describe_table``   ~ ``athena_client.get_table_metadata``
  (reference app/main.py:194-198 returns ``[{"Name","Type"}]``).
- ``list_key_values``  ~ ``SELECT DISTINCT species FROM t``
  (reference app/main.py:184-185).

Tables are plain Parquet directories/files registered as temp views;
at 100 TB the same interface fronts a Hive/Delta catalog — only
``register_dir`` changes (``spark.table`` instead of
``spark.read.parquet``). Metadata lookups go through a small TTL
cache (reference caches them in Redis, app/main.py:119-196).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ensembl_lakehouse_spark.service.cache import KVCache
from ensembl_lakehouse_spark.sources.tables import load_table

# Catalog metadata cache keys are namespaced so registration-time
# invalidation clears ONLY metadata — never `query_cache:*` result
# handles (r1 verdict: invalidate_prefix("") nuked the whole cache).
META_PREFIX = "meta:"

# The driver fixture tables (TESTDATA.md). `gene` appears when a
# caller registers one explicitly (tests build it from FIXTURES.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Mandatory-filter key per table: the reference forces a
# ``species='...'`` equality on every query (app/main.py:479). Our
# fixtures have no species column, so low-cardinality columns stand
# in (FIXTURES.md §2 role mapping).
DEFAULT_KEY_COLUMN: dict[str, str] = {
    "gene": "species",
    "lineitem": "l_returnflag",
    "orders": "o_orderstatus",
    "customer": "c_mktsegment",
    "events": "event_type",
    "documents": "lang",
}


@dataclass(frozen=True)
class ColumnInfo:
    name: str
    type: str  # Spark simpleString, e.g. "bigint", "string"

    def as_reference_shape(self) -> dict[str, str]:
        """The reference's ``{"Name": ..., "Type": ...}`` shape
        (app/main.py:198)."""
        return {"Name": self.name, "Type": self.type}


class Catalog:
    """Engine catalog over parquet-backed temp views."""

    def __init__(self, spark: SparkSession, cache: KVCache | None = None):
        self.spark = spark
        self.cache = cache if cache is not None else KVCache()
        self._tables: dict[str, str] = {}  # name -> source path ('' = pre-registered view)
        #: name -> content identity of the registered view (path /
        #: snapshot version / unique df token) — see view_fingerprint
        self._view_state: dict[str, str] = {}

    # -- registration -------------------------------------------------

    def view_fingerprint(self) -> str:
        """Content fingerprint of the catalog's registered-view
        state. The raw-SQL semantic cache folds this into its key:
        the same SQL text against a DIFFERENT registration state
        (a re-registered snapshot that advanced, a re-pointed
        parquet path) must not share a cache entry, or /sql serves
        pre-advance rows for the 44-day TTL. DataFrame registrations
        fingerprint as unique tokens (their content has no stable
        identity), trading cache sharing for correctness."""
        import hashlib as _hashlib
        import json as _json

        canon = _json.dumps(sorted(self._view_state.items()))
        return _hashlib.sha256(canon.encode()).hexdigest()[:16]

    def register_parquet(self, name: str, path: str) -> None:
        """Register ``path`` as table ``name``. The basename is
        honored: ``register_parquet("documents", ".../snap.parquet")``
        reads that file, not a rebuilt ``{name}.parquet`` (load_table
        assumes fixture naming, so it only serves the fast path when
        the basename already matches — it still supplies the lake's
        physical quirks, e.g. the nanos-timestamp events dispatch)."""
        if os.path.basename(path) == f"{name}.parquet":
            df = load_table(self.spark, os.path.dirname(path), name)
        else:
            df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        self._tables[name] = path
        self._view_state[name] = f"parquet:{path}"
        self.cache.invalidate_prefix(META_PREFIX)  # metadata changed

    def register_dataframe(self, name: str, df: DataFrame) -> None:
        import uuid as _uuid

        df.createOrReplaceTempView(name)
        self._tables[name] = ""
        self._view_state[name] = f"df:{_uuid.uuid4().hex}"
        self.cache.invalidate_prefix(META_PREFIX)

    def register_snapshot(
        self, name: str, table_dir: str, version: int | None = None
    ) -> None:
        """Register a snapshots.py table (optionally a time-travel
        version) as queryable view ``name`` — the versioned lakehouse
        layer surfaced through the SAME catalog the fixture lake and
        the raw-SQL endpoint use, so ``GET /sql`` can join a curated
        snapshot against the source tables. The view pins the
        registration-time file list (snapshot isolation: later
        commits don't shift a registered reader); re-register to
        advance."""
        from ensembl_lakehouse_spark import snapshots as SN

        resolved = (
            SN.current_version(table_dir) if version is None else version
        )
        df = SN.read_snapshot(self.spark, table_dir, version=resolved)
        df.createOrReplaceTempView(name)
        self._tables[name] = table_dir
        self._view_state[name] = f"snapshot:{table_dir}@v{resolved}"
        self.cache.invalidate_prefix(META_PREFIX)

    def register_dir(self, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> None:
        """Register every fixture table under ``sf_dir``."""
        for name in tables:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                self.register_parquet(name, path)

    # -- introspection (reference endpoints) --------------------------

    def _catalog_tables(self) -> list[str]:
        """Tables known to the Spark catalog itself — in a
        warehouse-backed session (warehouse.py) these come from the
        persistent metastore and survive restarts, the Glue analog."""
        try:
            return [t.name for t in self.spark.catalog.listTables()]
        except Exception:  # pragma: no cover - catalog unavailable
            return []

    def list_data_types(self) -> list[str]:
        """Table names, cached (reference GET /data_types,
        app/main.py:117-131, Redis key ``data_types``). Unions the
        engine's registered views with Spark-catalog (metastore)
        tables so a restarted warehouse session serves its durable
        tables without re-registration."""
        cached = self.cache.get(META_PREFIX + "data_types")
        if cached is not None:
            return cached
        names = sorted(set(self._tables) | set(self._catalog_tables()))
        self.cache.set(META_PREFIX + "data_types", names)
        return names

    def has_table(self, name: str) -> bool:
        if name in self._tables:
            return True
        try:
            return self.spark.catalog.tableExists(name)
        except Exception:  # pragma: no cover
            return False

    def table(self, name: str) -> DataFrame:
        if not self.has_table(name):
            raise KeyError(f"Selected data type: {name} does not exist!")
        return self.spark.table(name)

    def describe_table(self, name: str) -> list[ColumnInfo]:
        """Column names + types, cached (reference
        GET /filters/{data_type}, app/main.py:189-198, Redis key
        ``{data_type}_table_metadata``)."""
        key = f"{META_PREFIX}{name}_table_metadata"
        cached = self.cache.get(key)
        if cached is not None:
            return cached
        schema = self.table(name).schema
        cols = [ColumnInfo(f.name, f.dataType.simpleString()) for f in schema.fields]
        self.cache.set(key, cols)
        return cols

    def key_column(self, name: str) -> str | None:
        return DEFAULT_KEY_COLUMN.get(name)

    def list_key_values(self, name: str) -> list[str]:
        """Distinct values of the table's mandatory key column,
        cached (reference ``SELECT DISTINCT species from {t}``,
        app/main.py:179-187, Redis key ``{data_type}_species``).

        Runs as a hash-distinct on one column: column pruning means
        the scan reads a single column, and partial (map-side)
        aggregation makes the shuffle carry only unique values — at
        100 TB this is a few-KB shuffle for a low-cardinality key.
        """
        cache_key = f"{META_PREFIX}{name}_species"
        cached = self.cache.get(cache_key)
        if cached is not None:
            return cached
        key_col = self.key_column(name)
        if key_col is None:
            raise KeyError(f"No key column configured for table {name}")
        rows = self.table(name).select(key_col).distinct().collect()
        values = sorted(r[0] for r in rows if r[0] is not None)
        self.cache.set(cache_key, values)
        return values
