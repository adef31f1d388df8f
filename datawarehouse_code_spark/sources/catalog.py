"""Table catalog: name → DataFrame.

Replaces the reference's full-table scan source + conditional routing
(O1/O2, warehouse.py:25-43: ``SELECT * FROM …`` + ``fetchall()`` into
driver memory, with an if/else on table name routing reads across two
MySQL databases).  Here routing is a dict of table → path, reads are
lazy Spark scans (no driver materialization ever), and Catalyst does
column pruning / filter pushdown into the parquet scan for free.

Also covers the multi-table bag-union entry point (O3,
warehouse.py:30-38: ``data_list.extend``) as `read_union`.
"""

from __future__ import annotations

import contextlib
import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_code_spark.sources.schemas import SCHEMAS

TABLES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    """Routing: table name → storage path (the O2 dict-catalog)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    return f"{sf_dir}/{name}.parquet"


def read_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Lazy parquet scan with schema verification (fail fast on drift).

    The declared schema (schemas.SCHEMAS) is authoritative; a column
    mismatch raises instead of silently mis-binding the way the
    reference's positional `row[8]` access would (warehouse.py:140).
    """
    path = table_path(sf_dir or DEFAULT_SF_DIR, name)
    if name == "events":
        df = _read_events(spark, path)
    else:
        df = spark.read.parquet(path)
    want = SCHEMAS[name]
    got = {f.name: f.dataType for f in df.schema.fields}
    missing = [f.name for f in want.fields if f.name not in got]
    if missing:
        raise ValueError(
            f"table {name!r} missing declared columns {missing}; found {sorted(got)}"
        )
    drifted = [
        (f.name, str(got[f.name]), str(f.dataType))
        for f in want.fields
        if got[f.name] != f.dataType
    ]
    if drifted:
        raise ValueError(f"table {name!r} type drift (column, found, declared): {drifted}")
    # project to the declared column order (stable downstream positional use)
    return df.select(*[f.name for f in want.fields])


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts arrives in one of two layouts: a typed parquet
    timestamp (read directly), or TIMESTAMP(NANOS), which Spark's
    reader rejects outright (PARQUET_TYPE_ILLEGAL).  For the latter,
    read it as raw nanos (`nanosAsLong`) and floor to microseconds
    JVM-side — the same truncation DuckDB applies — yielding a
    timestamp_ntz column.  Stays fully vectorized; no driver
    round-trip.
    """
    from pyspark.sql import functions as F

    # Scope the legacy conf to this read: leaving it set session-wide
    # would silently return ANY later nanos column as bigint instead
    # of failing loudly (the schema is resolved eagerly at read time,
    # so restoring immediately afterwards is safe).
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        df.schema  # force footer/schema resolution under the conf
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def read_union(spark: SparkSession, names: list[str], sf_dir: str | None = None) -> DataFrame:
    """Bag union of same-schema tables (O3) — `unionByName`, not positional."""
    dfs = [read_table(spark, n, sf_dir) for n in names]
    return functools.reduce(lambda a, b: a.unionByName(b), dfs)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Expose every catalog table as a temp view for the SQL API (O23)."""
    for name in TABLES:
        read_table(spark, name, sf_dir).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """CSV connector with the declared schema (no inferSchema in engine paths)."""
    return spark.read.schema(SCHEMAS[table]).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, table: str) -> DataFrame:
    """JSON-lines connector with the declared schema."""
    return spark.read.schema(SCHEMAS[table]).json(path)


@contextlib.contextmanager
def read_json_audited(spark: SparkSession, path: str, table: str):
    """JSON-lines read with corrupt-record quarantine, as a context
    manager yielding (good, bad): malformed lines land in `bad` with
    their raw text instead of silently becoming all-NULL rows
    (PERMISSIVE) or killing the job (FAILFAST).  The ingest shape a
    real landing zone needs — load what parses, audit what doesn't,
    lose nothing.

    The source frame is cached before splitting: Spark disallows
    querying ONLY the corrupt-record column of a raw JSON scan
    (SPARK-26243), and without the cache the two branches would also
    re-parse every file twice.  The context-manager shape exists so
    that cache is RELEASED on exit — a plain function returning the
    two frames would pin every audited file in executor memory for
    the session with no handle to unpersist.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [*SCHEMAS[table].fields, T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    try:
        good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
        bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
            F.col("_corrupt_record").alias("raw_line")
        )
        yield good, bad
    finally:
        raw.unpersist()


def read_orc(spark: SparkSession, path: str, table: str) -> DataFrame:
    """ORC connector with the declared schema."""
    return spark.read.schema(SCHEMAS[table]).orc(path)


def _project_to_expected(df: DataFrame, expected: str) -> DataFrame:
    """The shared schema-contract projection of read_evolving and
    read_avro: columns the files predate are added as typed NULLs and
    the frame is projected to exactly the expected DDL's columns in
    order — ONE definition so a contract change (e.g. type-conflict
    handling) can't silently diverge between the readers."""
    from pyspark.sql.types import StructType

    want = StructType.fromDDL(expected)
    have = {f.name for f in df.schema.fields}
    for f in want.fields:
        if f.name not in have:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df.select(*[f.name for f in want.fields])


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro datasource module is on the session's
    classpath.  Avro has been an EXTERNAL module since Spark 2.4 —
    the distribution ships avro-core jars but not the
    ``org.apache.spark:spark-avro`` datasource, so availability is a
    deployment property (``--packages``), probed through Spark's own
    datasource registry.  A bare Class.forName probe is NOT enough:
    Spark 4 ships some ``org.apache.spark.sql.avro`` classes in core
    (for from_avro/to_avro expression plumbing) while the file-source
    registration still lives in the external module — lookupDataSource
    is the check the read path itself performs."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
    except Exception as e:  # noqa: BLE001 — filtered below, others re-raise
        # Only the registry's missing-provider error means "module not
        # deployed" (Spark 4: SparkClassNotFoundException with error
        # class DATA_SOURCE_NOT_FOUND, "Failed to find the data source";
        # Spark 3: ClassNotFoundException "Failed to find data source").
        # Anything else — stopped session, py4j gateway failure — is a
        # REAL error; swallowing it would tell a user whose cluster HAS
        # spark-avro to deploy a package that is already present while
        # masking the actual failure.
        msg = str(e)
        if "DATA_SOURCE_NOT_FOUND" in msg or (
            "Failed to find" in msg and "data source" in msg.lower()
        ) or "ClassNotFoundException" in msg:
            return False
        raise
    return True


def read_avro(
    spark: SparkSession, path: str, expected: str | None = None
) -> DataFrame:
    """Avro connector — the second-most-common lake interchange format
    after parquet, with the same schema-contract treatment as
    `read_evolving`: `expected` (optional DDL string) adds columns the
    files predate as typed NULLs and projects to exactly the expected
    columns in order, so a reader compiled against the current schema
    works over any historical file mix.  Avro carries a writer schema
    per FILE (not per row group), so evolution across files is the
    normal case, not an option flag.

    Raises loudly when the spark-avro module is absent (this container
    — no network for the jar; see test_avro.py's skip) instead of
    letting Spark's "Failed to find data source" surface mid-plan.
    """
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro datasource not on the classpath — deploy with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    df = spark.read.format("avro").load(path)
    if expected is None:
        return df
    return _project_to_expected(df, expected)


def write_avro(df: DataFrame, path: str, mode: str = "error") -> None:
    """Avro sink (same availability gate as `read_avro`)."""
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro datasource not on the classpath — deploy with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    df.write.format("avro").mode(mode).save(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    dbtable: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source — parity with the reference's MySQL reads (warehouse.py:25-43).

    Unlike the reference's single-threaded ``fetchall()``, reads are
    split into `num_partitions` parallel range scans when a numeric
    `partition_column` is given — the difference between a driver
    bottleneck and a distributed scan at 100 TB.  Untested in this
    container (no JDBC driver jar); kept for API parity.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_evolving(
    spark: SparkSession, path: str, expected: str | None = None
) -> DataFrame:
    """Read a long-lived parquet table whose schema grew over time:
    `mergeSchema=true` unions every file's footer schema, so files
    written BEFORE a column existed surface it as NULL instead of
    failing or silently dropping it (the default read takes one
    file's schema — which columns you see would depend on which
    footer Spark sampled).

    `expected` (optional DDL string) pins the contract: after the
    merge, missing columns are added as typed NULLs and the frame is
    projected to exactly the expected columns in order — so a reader
    compiled against the current schema works over any historical
    mix, and a column the table NEVER had still appears (all-NULL)
    rather than breaking the consumer.

    What this deliberately does NOT do: type changes.  Parquet footer
    merging cannot widen int32→int64 or int→double across files —
    Spark raises on conflicting types, and that failure SHOULD be
    loud (a silent cast corrupts old data); evolve types by rewriting
    history, not at read time.

    Scale note: schema merging reads footers, not data — Spark
    samples (spark.sql.files.maxPartitionBytes-bounded) footers in a
    distributed job; cost is per-FILE metadata, worth it only on
    evolving tables, which is why it is opt-in here and off in plain
    read_table.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected is None:
        return df
    return _project_to_expected(df, expected)
