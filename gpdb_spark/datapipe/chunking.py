"""Document chunking, sequence packing, and deterministic shuffle — the
three operators a pretraining-data pipeline runs between "clean corpus"
and "training batches".

The reference engine has no analog (it stops at SQL over relations); these
are net-new Spark-first operators in the spirit of SURVEY.md §7's
training-data-pipeline mandate, built entirely from JVM expressions so the
hot path stays inside whole-stage codegen.

Scale notes (100 TB):

* ``chunk_documents`` is a per-row flatMap (``posexplode`` over a
  ``sequence`` of starts) — embarrassingly parallel, no shuffle, output
  size bounded by ``ceil(len/step)`` chunks per doc.
* ``pack_assignments`` needs a GLOBAL prefix sum of token counts in
  doc_id order. A naive ``Window.orderBy(doc_id)`` is a single-partition
  sort — a scale-killer. We use the classic two-level formulation: bucket
  docs by ``doc_id // bucket_size``, aggregate per-bucket totals (tiny
  relation, one row per bucket), cumsum THAT with a window (single
  partition over n_docs/bucket_size rows — at 1e10 docs and 1e6-doc
  buckets this is 1e4 rows), broadcast-join the bucket offsets back, and
  finish with a within-bucket window partitioned by bucket (parallel).
  No driver collect at all; the only narrow stage touches one row per
  bucket.
* ``shuffle_shards`` is a stateless md5 keying + per-shard window — the
  shard count bounds window partition size, and the md5 family is
  engine-portable (same doctrine as datapipe/dedup.py) so any downstream
  SQL engine can reproduce the exact training order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------------------
# chunking
# --------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window character chunks: starts 1, 1+step, 2*step+1, ...
    with ``step = size - overlap``; the final chunk may be short. Docs
    with ``len <= size`` yield exactly one chunk. Pure JVM
    (sequence → posexplode → substring), no shuffle."""
    if size <= 0:
        raise ValueError("size must be > 0")
    if not 0 <= overlap < size:
        # a negative overlap would mean step > size: characters between
        # consecutive windows appear in NO chunk — silent data loss
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    step = size - overlap
    ln = F.length(F.col(text_col))
    # integer ceil: 1 + (L - size + step - 1) DIV step
    n_chunks = F.when(ln <= size, F.lit(1)).otherwise(
        F.expr(f"CAST(1 + (length({text_col}) - {size} + {step - 1}) DIV {step} AS INT)")
    )
    d = df.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(F.sequence(F.lit(1), n_chunks)).alias("__i", "chunk_idx"),
    )
    start = (F.col("chunk_idx") - 1) * step + 1
    chunk = F.substring(F.col(text_col), start, size)
    return d.select(
        F.col(id_col),
        F.col("chunk_idx"),
        start.cast("int").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )


# --------------------------------------------------------------------------
# scalable global prefix sum (two-level, no driver traffic)
# --------------------------------------------------------------------------

def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    bucket_size: int = 4096,
) -> DataFrame:
    """Exclusive global prefix sum of ``value_col`` in ``order_col``
    order, without a global sort: per-bucket totals are cumsum'd on a
    tiny one-row-per-bucket relation, then broadcast back and combined
    with a within-bucket window. Result column ``out_col`` =
    sum of values of all rows strictly before this row.

    ``order_col`` must be an integral column: the bucket key is
    ``id DIV bucket_size``, and a string id would (a) bucket by numeric
    value while the within-bucket window sorts lexicographically —
    two different orders — and (b) CAST to NULL for non-numeric
    strings, silently dropping every row at the bucket join. Callers
    with string ids should rank them first (e.g. the md5-ordered
    keying of shuffle_shards, or zipWithIndex)."""
    dtype = dict(df.dtypes).get(order_col, "")
    if dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"prefix_sum order_col {order_col!r} must be integral, "
            f"got {dtype or 'unknown'}"
        )
    bkt = F.expr(f"CAST({order_col} AS BIGINT) DIV {bucket_size}")
    d = df.withColumn("__bkt", bkt)
    totals = d.groupBy("__bkt").agg(F.sum(value_col).alias("__tot"))
    w_b = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__off")
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            out_col,
            (
                F.col("__off")
                + F.coalesce(F.sum(value_col).over(w_in), F.lit(0))
            ).cast("long"),
        )
        .drop("__bkt", "__off")
    )


def pack_assignments(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """GPT-style concat-and-split packing: concatenate all docs in
    ``id_col`` order and cut every ``budget`` tokens. Emits, per doc,
    the global token offset and the first/last training-sequence (bin)
    it lands in — ``bin_start == bin_end`` iff the doc is not split
    across a sequence boundary.

    Zero-token docs: ``greatest(n_tokens, 1)`` pins ``bin_end`` to
    ``bin_start`` (an empty doc occupies its offset's bin and nothing
    else). Without the guard, ``tok_offset - 1`` can be negative at
    offset 0 and negative integer division diverges across engines
    (Spark DIV truncates toward zero, DuckDB // floors)."""
    d = prefix_sum(df, id_col, token_col, "tok_offset", bucket_size)
    return d.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.col("tok_offset"),
        F.expr(f"CAST(tok_offset DIV {budget} AS BIGINT)").alias("bin_start"),
        F.expr(
            f"CAST((tok_offset + greatest({token_col}, 1) - 1)"
            f" DIV {budget} AS BIGINT)"
        ).alias("bin_end"),
    )


# --------------------------------------------------------------------------
# deterministic global shuffle
# --------------------------------------------------------------------------

def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "42",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic, engine-portable training-data shuffle: sort key =
    md5(id:seed) (uniform, reproducible anywhere md5 exists), shard =
    first 16 hash bits mod n_shards, position = rank of the key within
    the shard. The per-shard window bounds sort size to ~N/n_shards.

    ``id_col`` must be non-NULL and unique (a PK): NULL ids would all
    share one sort key with a NULL tiebreaker, making their positions
    collide nondeterministically — the contract this operator exists
    to provide."""
    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed)))
    d = df.withColumn("sort_key", key).withColumn(
        "shard",
        (F.conv(F.substring("sort_key", 1, 4), 16, 10).cast("long") % n_shards)
        .cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return d.withColumn("position", F.row_number().over(w))
