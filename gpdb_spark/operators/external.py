"""External tables with single-row error handling (SREH).

Reference: CREATE EXTERNAL TABLE (gram.y:5420-5484) scans files/URLs in
parallel across segments (fileam.c:235, url_curl.c) with SREH — bad rows
diverted to an error log instead of failing the load (cdbsreh.c), bounded
by SEGMENT REJECT LIMIT.

Spark mapping: spark.read.csv/json with mode=PERMISSIVE and
columnNameOfCorruptRecord gives per-row error capture; the reject-limit
check is a count over the corrupt column. Spark's file readers already
parallelize splits, which is gpfdist's whole job.

Cloud object-store protocols (the reference's s3/gpcloud external
protocol, /root/reference/gpcontrib/gpcloud/): in Spark these are just
filesystem URI schemes on the SAME readers — ``s3a://bucket/key``
(hadoop-aws), ``gs://``, ``abfss://`` — with parallel split listing,
ranged reads, and predicate pushdown handled by the Hadoop FS layer.
Every reader in this module takes any such URI unchanged; there is no
separate protocol implementation to write. Credentials/endpoint come
from the standard Hadoop configs (``spark.hadoop.fs.s3a.*``), which is
gpcloud's s3.conf analog. Tested against a ``file://`` stand-in (no
object store in the test container; the URI-scheme path through
``spark.read`` is identical).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


@dataclass
class ExternalReadResult:
    good: DataFrame
    errors: DataFrame
    n_rejected: int


class RejectLimitExceeded(Exception):
    pass


def read_external_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = False,
    delimiter: str = ",",
    reject_limit: int | None = None,
    null_marker: str | None = None,
) -> ExternalReadResult:
    """READABLE EXTERNAL TABLE ... FORMAT 'csv' (LOG ERRORS SEGMENT REJECT
    LIMIT n ROWS).

    Returns (good rows, error rows, reject count); raises
    RejectLimitExceeded when the bad-row count exceeds ``reject_limit``
    (cdbsreh.c's behavior).
    """
    full = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
    )
    if null_marker is not None:
        # COPY text format's NULL marker (commands/copy.c: \N default
        # for text, empty string for CSV)
        reader = reader.option("nullValue", null_marker)
    raw = reader.csv(path).cache()
    errors = raw.where(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    good = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    n_rejected = errors.count()
    if reject_limit is not None and n_rejected > reject_limit:
        raise RejectLimitExceeded(
            f"{n_rejected} rejected rows > SEGMENT REJECT LIMIT {reject_limit}"
        )
    return ExternalReadResult(good=good, errors=errors, n_rejected=n_rejected)


def write_external_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """WRITABLE EXTERNAL TABLE: parallel unload (each task writes its
    split — the gpfdist-writer analog)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_external_program(
    spark: SparkSession,
    command: str,
    schema: StructType,
    n_segments: int | None = None,
    delimiter: str = ",",
    reject_limit: int | None = None,
) -> ExternalReadResult:
    """CREATE EXTERNAL TABLE ... EXECUTE 'command' / COPY FROM PROGRAM
    (reference: command-pipe external source, url_execute.c; EXECUTE
    grammar in gram.y).

    The reference runs the command once per segment with GP_SEGMENT_ID /
    GP_SEGMENT_COUNT in the environment so the program can emit its
    shard. Spark mapping: a one-row-per-segment seed, repartitioned so
    each command runs in its own task ON AN EXECUTOR (distributed, not a
    driver pipe), stdout captured as lines, then the same PERMISSIVE
    CSV parse + SREH accounting as the file reader. Scale shape: the
    seed is n_segments rows; all data flows executor-side.
    """
    import pandas as _pd

    n = n_segments or spark.sparkContext.defaultParallelism
    seed = spark.range(n).repartition(n, "id")

    def run_cmd(batches):
        import os
        import subprocess

        for pdf in batches:
            for seg in pdf["id"].tolist():
                env = dict(
                    os.environ,
                    GP_SEGMENT_ID=str(seg),
                    GP_SEGMENT_COUNT=str(n),
                )
                proc = subprocess.run(
                    command,
                    shell=True,
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                )
                lines = [
                    ln for ln in proc.stdout.splitlines() if ln.strip()
                ]
                yield _pd.DataFrame({"line": lines})

    raw_lines = seed.mapInPandas(run_cmd, "line string")
    full = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    # from_csv takes a DDL string, not a StructType
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in full.fields
    )
    parsed = raw_lines.select(
        F.from_csv(
            F.col("line"),
            ddl,
            {
                "sep": delimiter,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record",
            },
        ).alias("r")
    ).cache()
    names = [f.name for f in schema.fields]
    corrupt = F.col("r._corrupt_record")
    errors = parsed.where(corrupt.isNotNull()).select(
        corrupt.alias("_corrupt_record")
    )
    good = parsed.where(corrupt.isNull()).select(
        *[F.col(f"r.{fname}").alias(fname) for fname in names]
    )
    n_rejected = errors.count()
    if reject_limit is not None and n_rejected > reject_limit:
        raise RejectLimitExceeded(
            f"{n_rejected} rejected rows > SEGMENT REJECT LIMIT {reject_limit}"
        )
    return ExternalReadResult(good=good, errors=errors, n_rejected=n_rejected)


def read_external_fixedwidth(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, int, str]],
    reject_limit: int | None = None,
) -> ExternalReadResult:
    """Fixed-width external table format
    (/root/reference/contrib/formatter_fixedwidth/fixedwidth.c — the
    shipped custom-formatter example: each field is a fixed byte width,
    blank-padded, no delimiters).

    ``fields``: (name, width, spark_type) in record order. Realized as a
    parallel text read + substring/trim/cast projections — all JVM-side,
    splittable like any text source. SREH (cdbsreh.c) parity: rows whose
    non-string casts fail land in the reject set instead of erroring,
    bounded by ``reject_limit``.
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    expected_len = sum(w for _, w, _ in fields)
    pos = 1
    cols, ok = [], F.length("value") == expected_len
    for name, width, typ in fields:
        s = F.trim(F.substring("value", pos, width))
        if typ != "string":
            cast = s.try_cast(typ)
            ok = ok & (cast.isNotNull() | (s == ""))
            cols.append(cast.alias(name))
        else:
            cols.append(s.alias(name))
        pos += width
    good = raw.where(ok).select(*cols)
    rejects = raw.where(~ok).select(F.col("value").alias("raw_line"))
    n_rejected = rejects.count()
    if reject_limit is not None and n_rejected > reject_limit:
        raise RejectLimitExceeded(
            f"{n_rejected} malformed rows exceeds SEGMENT REJECT LIMIT "
            f"{reject_limit}"
        )
    return ExternalReadResult(good=good, errors=rejects, n_rejected=n_rejected)
