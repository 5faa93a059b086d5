"""Deduplication queries over the documents fixture (north-star operators).

All families are oracle-checked: exact and token-Jaccard directly; the
hash-based families (MinHash LSH, SimHash) through the PORTABLE
md5-derived hash family (datapipe/dedup.py _token_hash/_seeded_rehash),
which DuckDB re-derives end to end. Only the label-propagation clusters
query and the approximate ANN paths remain rows-only.
tests/test_datapipe.py additionally validates the hash families against
exact-Jaccard ground truth computed in-Spark.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import query, t
from gpdb_spark.datapipe import dedup as D


def _hex15(expr: str) -> str:
    """DuckDB SQL for the integer Spark's conv(substr(<hex>,1,15),16,10)
    parses: hex digit d at position p contributes d * 16^(15-p); all
    powers of 16 are powers of two, exact in doubles, so the unrolled
    sum is exact. ``expr`` must be an md5-hex column/expression."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {p}, 1)) - 1)"
        f" * {16 ** (15 - p)}"
        for p in range(1, 16)
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content digest, keep min id
    (one digest-keyed shuffle; the 100 TB-safe baseline)."""
    d = t(spark, sf_dir, "documents")
    return D.exact_dedup(d)


@query(
    "dedup_jaccard_pairs",
    # the df > 50% stopword-posting cutoff is mirrored in the freq CTE so
    # the oracle computes jaccard over the same filtered shingle universe
    oracle="""
    WITH toks0 AS (
        SELECT doc_id AS id,
               unnest(list_distinct(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> ''))) AS tok
        FROM documents
    ), freq AS (
        SELECT tok FROM toks0 GROUP BY tok
        HAVING count(*) <= 0.5 * (SELECT count(*) FROM documents)
    ), toks AS (
        SELECT id, tok FROM toks0 WHERE tok IN (SELECT tok FROM freq)
    ), sizes AS (
        SELECT id, count(*) AS sz FROM toks GROUP BY id
    ), inter AS (
        SELECT a.id AS a, b.id AS b, count(*) AS i
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT a, b,
           (floor(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) * 1e6) / 1e6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = a
    JOIN sizes sb ON sb.id = b
    WHERE (floor(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) * 1e6) / 1e6) >= 0.82
    """,
)
def dedup_jaccard_pairs(spark, sf_dir):
    """Token-set Jaccard near-dup pairs via inverted-index self-join —
    O(postings) shuffle, never O(n^2); ultra-frequent shingles dropped
    (df > 50%) to bound the worst posting list."""
    d = t(spark, sf_dir, "documents")
    return D.jaccard_pairs(d, ngram=1, threshold=0.82, max_df_frac=0.5)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             list_distinct(list_filter(
                 string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS tk
      FROM documents
    ),
    sh AS (
      SELECT doc_id, CAST({_hex15("hx")} AS BIGINT) AS hv
      FROM (SELECT doc_id, md5(w) AS hx
            FROM (SELECT doc_id, unnest(tk) AS w FROM docs) u0) u
    ),
    rh AS (
      SELECT doc_id, i,
             md5(CAST(hv AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS hx
      FROM sh, generate_series(0, 63) g(i)
    ),
    comp AS (
      SELECT doc_id, i, min(CAST({_hex15("hx")} AS BIGINT)) AS mh
      FROM rh GROUP BY doc_id, i
    ),
    bnd AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS bucket
      FROM comp GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT ba.doc_id AS a, bb.doc_id AS b
      FROM bnd ba JOIN bnd bb ON ba.band = bb.band AND ba.bucket = bb.bucket
                             AND ba.doc_id < bb.doc_id
    ),
    est AS (
      SELECT c.a, c.b,
             floor(sum(CASE WHEN ca.mh = cb.mh THEN 1 ELSE 0 END)
                   / 64.0 * 1e6) / 1e6
                 AS est_jaccard
      FROM cand c
      JOIN comp ca ON ca.doc_id = c.a
      JOIN comp cb ON cb.doc_id = c.b AND cb.i = ca.i
      GROUP BY c.a, c.b
    )
    SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= 0.7
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(k=64) + 16-band LSH near-dup candidates with estimated
    Jaccard >= 0.7. ORACLED (was rows-only): in portable mode the
    permutation family is md5-derived (dedup._seeded_rehash — min over
    shingles of the 60-bit md5 of "shinglehash:seed"), so DuckDB
    re-derives signatures, band buckets (decimal-joined slices) and the
    est-Jaccard verification end to end. est values are multiples of
    1/64 — exactly representable, so round(.,6) is engine-identical.
    Recall/precision vs exact Jaccard asserted in tests/test_datapipe.py;
    the xxhash64 family (portable=False) remains the cheap in-engine
    path."""
    d = t(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, k=64, bands=16, threshold=0.7, portable=True)


def dedup_minhash_clusters_fast(spark, sf_dir):
    """Scale-path MinHash dedup under the xxhash64 hash family — the
    benched fast path (bench.py times THIS variant for round-over-round
    continuity). Not registered in queries(): a rows-only driver row can
    never attest it, so the registered `dedup_minhash_clusters` below is
    the identical operator under the portable (oracle-re-derivable) hash
    family; transitive-closure properties of this fast path are asserted
    in tests/test_datapipe.py."""
    d = t(spark, sf_dir, "documents")
    return D.minhash_dedup_clusters(d, k=64, bands=16)


@query(
    "dedup_minhash_clusters",
    oracle=f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id,
             list_distinct(list_filter(
                 string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS tk
      FROM documents
    ),
    sh AS (
      SELECT doc_id, CAST({_hex15("hx")} AS BIGINT) AS hv
      FROM (SELECT doc_id, md5(w) AS hx
            FROM (SELECT doc_id, unnest(tk) AS w FROM docs) u0) u
    ),
    rh AS (
      SELECT doc_id, i,
             md5(CAST(hv AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS hx
      FROM sh, generate_series(0, 63) g(i)
    ),
    comp AS (
      SELECT doc_id, i, min(CAST({_hex15("hx")} AS BIGINT)) AS mh
      FROM rh GROUP BY doc_id, i
    ),
    bnd AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS bucket
      FROM comp GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT ba.doc_id AS a, bb.doc_id AS b
      FROM bnd ba JOIN bnd bb ON ba.band = bb.band AND ba.bucket = bb.bucket
                             AND ba.doc_id < bb.doc_id
    ),
    edges AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM docs
      UNION
      SELECT reach.id, e.b AS r FROM reach JOIN edges e ON e.a = reach.r
    )
    SELECT id AS doc_id, min(r) AS keep_id FROM reach GROUP BY id
    """,
)
def dedup_minhash_clusters(spark, sf_dir):
    """The scale-path cluster operator under the PORTABLE md5-derived
    hash family — fully oracle-checked: DuckDB re-derives signatures,
    band buckets, the bucket-sharing graph, and closes it transitively
    with a recursive CTE (reach = min reachable id), which must equal
    the engine's bucket-min label-propagation fixpoint. One query
    validates both the hash plumbing and the connected-components
    convergence against an independent engine."""
    d = t(spark, sf_dir, "documents")
    return D.minhash_dedup_clusters(d, k=64, bands=16, portable=True)


_HEX15 = _hex15("md5(w)")


@query(
    "dedup_simhash",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             list_distinct(list_filter(
                 string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS tk
      FROM documents
    ),
    th AS (
      SELECT doc_id, CAST({_HEX15} AS BIGINT) AS hv
      FROM (SELECT doc_id, unnest(tk) AS w FROM docs) u
    ),
    bits AS (
      SELECT doc_id, j,
             CASE WHEN sum(CASE WHEN ((hv >> CAST(j AS INT)) & 1) = 1
                           THEN 1 ELSE -1 END) > 0
                  THEN 1 ELSE 0 END AS b
      FROM th, generate_series(0, 47) g(j)
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id,
             CAST(sum(b * CAST(power(2, 47 - j) AS BIGINT)) AS BIGINT) AS sig
      FROM bits GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, j // 12 AS chunk,
             CAST(sum(b * CAST(power(2, 11 - (j % 12)) AS BIGINT)) AS BIGINT)
                 AS val
      FROM bits GROUP BY doc_id, j // 12
    ),
    cand AS (
      SELECT DISTINCT ca.doc_id AS a, cb.doc_id AS b, sa.sig AS sig_a,
             sb.sig AS sig_b
      FROM chunks ca
      JOIN chunks cb ON ca.chunk = cb.chunk AND ca.val = cb.val
                     AND ca.doc_id < cb.doc_id
      JOIN sig sa ON sa.doc_id = ca.doc_id
      JOIN sig sb ON sb.doc_id = cb.doc_id
    )
    SELECT a, b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash-48 near-dup pairs (hamming <= 3) via 12-bit-chunk candidate
    join (pigeonhole). ORACLED (was rows-only): the portable md5-derived
    token hash (dedup._token_hash) is computable by any engine, so DuckDB
    re-derives the full pipeline — per-token 60-bit hashes from md5 hex,
    48 sign-bit votes, bit packing with exact power-of-two arithmetic,
    chunk equi-join, xor/popcount hamming filter. Fingerprint portability
    is itself the feature: downstream consumers can verify signatures
    without Spark."""
    d = t(spark, sf_dir, "documents")
    return D.simhash_pairs(d, max_hamming=3)


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ), toksnz AS (
        SELECT id, tk FROM toks WHERE len(tk) > 0
    ), sh AS (
        SELECT id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 1)),
                   i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
        FROM toksnz
    ), sizes AS (
        SELECT id, count(*) AS sz FROM sh GROUP BY id
    ), inter AS (
        SELECT a.id AS a, b.id AS b, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT a, b, (floor(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) * 1e6) / 1e6) AS jaccard
    FROM inter JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
    WHERE (floor(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) * 1e6) / 1e6) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Word-3-gram shingle Jaccard pairs (>= 0.5) — the shingled variant
    that catches reordered/near-identical passages."""
    d = t(spark, sf_dir, "documents")
    return D.jaccard_pairs(d, ngram=3, threshold=0.5)
