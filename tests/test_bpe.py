"""BPE application: distributed path vs pure-Python reference, merge-table
well-orderedness (the precondition for the rank-ordered oracle), and the
no-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpdb_spark.datapipe.bpe import DEFAULT_MERGES, bpe_encode, encode_word
from gpdb_spark.registry import t


def test_merge_table_well_ordered():
    """Every compound symbol used by a merge must itself be produced by a
    LOWER-rank merge (or be a primitive char / the </w> marker). This is
    what makes rank-ordered global replace == iterative lowest-rank BPE,
    i.e. what makes the SQL oracle valid."""
    produced = set()
    for rank, (a, b) in enumerate(DEFAULT_MERGES):
        for sym in (a, b):
            base = sym[:-4] if sym.endswith("</w>") else sym
            assert len(base) <= 1 or sym in produced, (rank, sym)
        produced.add(a + b)


def test_sequential_replace_equals_iterative():
    """Rank-ordered replace pass must equal the canonical iterative
    algorithm on every fixture word (the equivalence the oracle relies
    on)."""
    ranks = {p: i for i, p in enumerate(DEFAULT_MERGES)}

    def sequential(word: str) -> list[str]:
        syms = list(word) + ["</w>"]
        for a, b in DEFAULT_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = [
        "table", "scan", "query", "hash", "row", "data", "batch",
        "aaa", "tata", "scanscan", "queryquery", "x", "", "the",
    ]
    for w in words:
        assert encode_word(w, ranks) == sequential(w), w


def test_distributed_matches_reference(spark, sf_dir):
    ranks = {p: i for i, p in enumerate(DEFAULT_MERGES)}
    d = t(spark, sf_dir, "documents").limit(80)
    got = {r["doc_id"]: r for r in bpe_encode(d).collect()}
    for row in d.select("doc_id", "text").collect():
        toks = []
        for w in str(row["text"]).lower().split():
            toks.extend(encode_word(w, ranks))
        g = got[row["doc_id"]]
        assert g["n_bpe_tokens"] == len(toks)
        assert g["n_distinct_bpe"] == len(set(toks))
        assert g["head_tokens"] == " ".join(toks[:12])


def test_bpe_plan_no_shuffle(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    plan = bpe_encode(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
