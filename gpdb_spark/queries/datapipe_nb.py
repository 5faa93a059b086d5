"""Naive-Bayes corpus classifier query — train + score declaratively,
oracled end-to-end (datapipe/nbayes.py)."""

from __future__ import annotations

from gpdb_spark.registry import query, t

_TOKS = """
    SELECT doc_id AS id, lang AS label, tok FROM (
        SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                  w -> w <> '')) AS tok
        FROM documents) x
"""


@query(
    "text_nb_langid",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    counts AS (SELECT label, tok, count(*) AS n FROM toks GROUP BY label, tok),
    totals AS (SELECT label, count(*) AS total FROM toks GROUP BY label),
    vv AS (SELECT count(DISTINCT tok) AS v FROM toks),
    nd AS (SELECT count(*) AS n FROM documents),
    priors AS (SELECT lang AS label,
                      floor(ln(CAST(count(*) AS DOUBLE) / nd.n) * 1e12) / 1e12
                        AS log_prior
               FROM documents, nd GROUP BY lang, nd.n),
    model AS (SELECT c.label AS m_label, c.tok,
                     floor(ln(CAST(c.n + 1 AS DOUBLE)
                              / CAST(t.total + vv.v AS DOUBLE)) * 1e12) / 1e12
                       AS log_p
              FROM counts c JOIN totals t USING (label), vv),
    dflt AS (SELECT label AS m_label,
                    floor(ln(1.0 / CAST(total + vv.v AS DOUBLE)) * 1e12) / 1e12
                      AS log_default
             FROM totals, vv),
    scored AS (SELECT tk.id, tk.label, d.m_label,
                      sum(CAST(COALESCE(m.log_p, d.log_default)
                               AS DECIMAL(30,15))) AS loglik
               FROM toks tk
               CROSS JOIN dflt d
               LEFT JOIN model m ON m.m_label = d.m_label AND m.tok = tk.tok
               GROUP BY tk.id, tk.label, d.m_label),
    ranked AS (SELECT s.id, s.label, s.m_label,
                      row_number() OVER (
                          PARTITION BY s.id
                          ORDER BY s.loglik + CAST(p.log_prior AS DECIMAL(30,15))
                                   DESC, s.m_label) AS r
               FROM scored s JOIN priors p ON p.label = s.m_label)
    SELECT id AS doc_id, label AS lang, m_label AS pred,
           m_label = label AS is_correct
    FROM ranked WHERE r = 1
    """,
)
def text_nb_langid(spark, sf_dir):
    """Multinomial Naive Bayes trained on (text, lang) and re-scored over
    the corpus — the declarative quality/language classifier of a
    pretraining pipeline. Model = |labels| x |vocab| broadcast relation;
    two corpus passes, each one keyed shuffle; floored log terms +
    exact decimal sums make the argmax engine-reproducible
    (datapipe/nbayes.py)."""
    from gpdb_spark.datapipe.nbayes import nb_classify

    return nb_classify(t(spark, sf_dir, "documents"))
