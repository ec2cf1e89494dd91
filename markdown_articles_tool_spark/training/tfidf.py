"""Corpus TF-IDF: per-document top-k salient terms.

The classic two-sided relational shape a 100-TB keyword/tagging pass
needs: term frequencies are per-document (narrow groupBy), document
frequencies are corpus-wide (second groupBy on term), and the join
back is a SHUFFLE join on term — the vocabulary of a web crawl is far
too large to broadcast, and partitioning by term is exactly how the DF
side distributes.  The corpus size enters as a broadcast 1-row
aggregate (no driver-side count action; the plan stays lazy).

Spec (mirrored by the DuckDB twin in oracle_sql()['tfidf_topk']):
terms = lowercased text split on ``[^a-z0-9]+`` (empties dropped);
tf = occurrences of term in doc; df = docs containing term;
score = tf * (ln((N + 1) / (df + 1)) + 1)  (smoothed idf);
top-k per doc by (score desc, term asc) via row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TERM_SPLIT_RE = '[^a-z0-9]+'


def tfidf_topk(df: DataFrame, k: int = 5,
               id_col: str = 'doc_id', text_col: str = 'text') -> DataFrame:
    from .util import ensure_parallelism

    terms = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias('doc_id'),
                F.explode(F.split(F.lower(F.col(text_col)), TERM_SPLIT_RE)).alias('term'))
        .where(F.col('term') != '')
    )
    tf = terms.groupBy('doc_id', 'term').agg(F.count(F.lit(1)).alias('tf'))
    # tf rows are distinct (doc, term) pairs, so counting them per term
    # IS the document frequency — no second distinct pass
    dfreq = tf.groupBy('term').agg(F.count(F.lit(1)).alias('df'))
    n_docs = df.agg(F.count(F.lit(1)).alias('n_docs'))
    scored = (
        tf.join(dfreq, 'term')
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            'score',
            F.col('tf') * (F.log((F.col('n_docs') + 1) / (F.col('df') + 1)) + 1),
        )
    )
    w = Window.partitionBy('doc_id').orderBy(F.col('score').desc(), F.col('term'))
    return (
        scored.withColumn('rank', F.row_number().over(w))
        .where(F.col('rank') <= k)
        .select('doc_id', 'rank', 'term', F.col('tf').cast('long').alias('tf'),
                F.col('df').cast('long').alias('df'), F.round('score', 9).alias('score'))
    )
