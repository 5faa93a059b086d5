"""BPE tokenizer-application query with a REAL cross-engine oracle.

The oracle is generated from the SAME frozen merge table the engine
broadcasts: each token is wrapped in STX/ETX sentinels (chr(2)/chr(3),
absent from text) so a merge (a,b) is one leftmost-nonoverlapping
string replace of "<a><b>" with "<ab>" — no shared delimiter, so
consecutive merges match correctly. Applying merges in RANK ORDER with
global leftmost replaces is equivalent to the canonical lowest-rank
iterative algorithm whenever the table is well-ordered (every compound
symbol's components have lower rank than the compound — true of any
table an actual BPE trainer emits, and asserted for ours in
tests/test_bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.registry import query, t
from gpdb_spark.datapipe.bpe import DEFAULT_MERGES, bpe_encode

_O, _C = "chr(2)", "chr(3)"


def _wrap(sym: str) -> str:
    return f"{_O} || '{sym}' || {_C}"


def _bpe_oracle() -> str:
    # per-word symbol string: each char wrapped, then the </w> marker
    seq = (
        f"array_to_string(list_transform(string_split_regex(w, ''),"
        f" ch -> {_O} || ch || {_C}), '') || {_wrap('</w>')}"
    )
    for a, b in DEFAULT_MERGES:
        seq = f"replace({seq}, {_wrap(a)} || {_wrap(b)}, {_wrap(a + b)})"
    word_tokens = (
        f"string_split(trim({seq}, chr(2) || chr(3)), {_C} || {_O})"
    )
    doc_tokens = (
        "flatten(list_transform(list_filter("
        "string_split_regex(trim(lower(text)), '\\s+'), w -> w <> ''), "
        f"w -> {word_tokens}))"
    )
    return f"""
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_bpe_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct_bpe,
           coalesce(array_to_string(list_slice(toks, 1, 12), ' '), '')
               AS head_tokens
    FROM (SELECT doc_id, {doc_tokens} AS toks FROM documents) d
    """


@query("text_bpe_encode", oracle=_bpe_oracle())
def text_bpe_encode(spark, sf_dir):
    """Apply the frozen BPE merge table to every document —
    Arrow-batched mapInPandas with a per-worker word cache, zero
    shuffles (datapipe/bpe.py). Oracle: the identical merge table
    compiled to rank-ordered sentinel-wrapped replaces in DuckDB."""
    d = t(spark, sf_dir, "documents")
    return bpe_encode(d)
