"""BPE tokenizer APPLICATION at corpus scale.

Training a byte-pair-encoding vocabulary is an offline, driver-side
concern (the pair-count statistics it needs are exactly what
``vocab_pair_counts`` computes distributed); *applying* a frozen merge
table to 100 TB of text is the data-pipeline operator, and that is what
this module provides: ``bpe_encode`` — Arrow-batched ``mapInPandas``
over documents, merge table broadcast via closure capture (a merge
table is a few hundred KB even for 50k merges — far under broadcast
limits), zero shuffles.

Pure-Python reference (``encode_word``) doubles as the pytest parity
oracle; the distributed path must agree token-for-token. The merge
algorithm is the canonical one (Sennrich et al. 2016, public): repeat
[find lowest-rank adjacent pair, merge all its occurrences left-to-
right] until no ranked pair remains.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# frozen demo merge table (rank order) over the fixture corpus alphabet;
# real use passes a trained table. Character-level start: words are split
# into single characters plus a </w> end marker.
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"), ("t", "a"), ("a", "</w>"), ("s", "</w>"),
    ("r", "o"), ("ta", "b"), ("l", "e</w>"), ("q", "u"),
    ("tab", "l"), ("h", "a"), ("s", "c"), ("a", "n"),
    ("qu", "e"), ("r", "y"), ("o", "w"), ("ha", "s"), ("sc", "an"),
]


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical BPE encode of one word with a frozen rank table."""
    symbols = list(word) + ["</w>"]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = symbols[best_i], symbols[best_i + 1]
        merged, i = [], 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(symbols[i])
                i += 1
        symbols = merged
    return symbols


def bpe_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: Iterable[tuple[str, str]] | None = None,
) -> DataFrame:
    """Distributed BPE application: per doc, whitespace-split then
    per-word merge loop; emits token count, distinct-token count and the
    first 12 tokens (bounded output). Arrow-batched; the merge table
    rides the serialized closure to every worker once."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges or DEFAULT_MERGES)}
    out_schema = (
        f"{id_col} long, n_bpe_tokens int, n_distinct_bpe int, head_tokens string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_tok, n_dis, heads = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in str(text).lower().split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                ids.append(doc_id)
                n_tok.append(len(toks))
                n_dis.append(len(set(toks)))
                heads.append(" ".join(toks[:12]))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bpe_tokens": pd.array(n_tok, dtype="int32"),
                    "n_distinct_bpe": pd.array(n_dis, dtype="int32"),
                    "head_tokens": heads,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
