"""Domain-level quality aggregation and blocklist-driven filtering.

Web-scale training pipelines (C4, Gopher/MassiveWeb, RefinedWeb) make
KEEP decisions at two granularities: per-document (the Gopher rules in
``textstats.gopher_filter``) and per-DOMAIN — a source that mass-emits
near-identical templated pages is spam even when each page passes the
per-doc rules.  The standard domain signal is lexical diversity: a
template farm's vocabulary barely grows while its token count explodes,
so the type-token ratio collapses.

Two operators:

* ``source_diversity`` — the per-source dim: distinct terms, total
  terms, docs, and an integer-exact spam verdict
  (``n_terms > flag_ratio * n_distinct``, i.e. TTR < 1/flag_ratio).
  The verdict compares integers, never a float ratio, so it is exact
  and engine-portable (the DuckDB oracle states the same inequality).
* ``domain_filter`` — the corpus pass: broadcast the (host-sized) dim
  back onto the (corpus-sized) docs and keep docs from clean sources.

Distribution shape at 10^12 docs: the term explode shuffles on
(source, term) — COUNT(DISTINCT term) per source is computed by
Catalyst as a two-level aggregate (partial distinct per map partition
first), so a mega-source's term stream collapses to its vocabulary
size BEFORE the exchange; the dim is host-cardinality and broadcasts;
the corpus-side filter is scan-side.  No window, no corpus-keyed
shuffle.

Term split matches ``training/tfidf.py``: lowercase, split on
``[^a-z0-9]+``, drop empties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TERM_SPLIT_RE = '[^a-z0-9]+'


def _terms(df: DataFrame, source_col: str, text_col: str) -> DataFrame:
    return (
        df.select(
            source_col,
            F.explode(F.split(F.lower(F.col(text_col)), TERM_SPLIT_RE)).alias('term'),
        )
        .where(F.col('term') != '')
    )


def source_diversity(
    df: DataFrame,
    source_col: str = 'source',
    text_col: str = 'text',
    flag_ratio: int = 45,
) -> DataFrame:
    """Per-source lexical-diversity dim with an integer-exact spam
    verdict: ``spam`` iff total terms exceed ``flag_ratio`` times the
    distinct-term count (type-token ratio below 1/flag_ratio).

    Output: (source, n_docs, n_terms, n_distinct_terms, spam) — one
    row per source, host-cardinality (broadcastable downstream).
    """
    terms = _terms(df, source_col, text_col)
    dim = terms.groupBy(source_col).agg(
        F.count('*').alias('n_terms'),
        F.count_distinct('term').alias('n_distinct_terms'),
    )
    docs = df.groupBy(source_col).agg(F.count('*').alias('n_docs'))
    # both sides are host-cardinality aggregates; broadcast the term
    # dim so the dim assembly never sort-merges
    return (
        docs.join(F.broadcast(dim), source_col, 'left')
        .select(
            source_col,
            'n_docs',
            F.coalesce('n_terms', F.lit(0)).alias('n_terms'),
            F.coalesce('n_distinct_terms', F.lit(0)).alias('n_distinct_terms'),
            (
                F.coalesce('n_terms', F.lit(0))
                > F.lit(int(flag_ratio)) * F.coalesce('n_distinct_terms', F.lit(0))
            ).alias('spam'),
        )
    )


def domain_filter(
    df: DataFrame,
    source_col: str = 'source',
    text_col: str = 'text',
    flag_ratio: int = 45,
    dim: DataFrame | None = None,
) -> DataFrame:
    """Corpus pass: keep docs whose source is NOT spam-flagged.  The
    dim (pass a precomputed one via ``dim=`` to reuse across jobs) is
    host-sized and broadcast onto the corpus — the doc side never
    shuffles."""
    if dim is None:
        dim = source_diversity(df, source_col, text_col, flag_ratio)
    clean = dim.where(~F.col('spam')).select(source_col)
    return df.join(F.broadcast(clean), source_col)
