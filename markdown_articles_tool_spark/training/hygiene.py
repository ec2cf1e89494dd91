"""The composed corpus-hygiene pipeline: mojibake repair → PII scrub →
Gopher quality verdict, as ONE pipelined Spark plan.

This is the shape a release run actually executes, and the shape that
matters at 10^12 documents: the three stages chain through a single
projection lineage — three Arrow passes back-to-back over one scan,
zero joins, zero hash shuffles (a join between hygiene stages would
shuffle the full corpus text; `gopher_filter`'s ``carry=`` rides the
pii counts and clean sha through the quality projection instead).
Every stage is stateless, so the same function serves batch frames and
Structured-Streaming frames unchanged
(``streaming/incremental.start_incremental_scrub``).

Driver-checked as the ``clean_corpus`` query against three independent
machineries (chained sequential twins for the clean text, DuckDB SQL
for the quality verdict over it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .mojibake import fix_mojibake
from .pii import pii_redact
from .textstats import gopher_filter


def scrub(
    df: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    plant=None,
    keep_text: bool = False,
) -> DataFrame:
    """(docs) → (id_col, n_pii, keep, clean_sha [, clean_text]).

    ``plant(id, text) -> text`` is the synthetic-corpus hook applied
    inside the first Arrow pass (requires integer ids; production runs
    leave it None).  ``keep_text`` carries the scrubbed text through to
    the output (the release-run case); off by default so driver/bench
    outputs stay narrow."""
    fixed = fix_mojibake(df, id_col=id_col, text_col=text_col, plant=plant)
    scrubbed = pii_redact(fixed, text_col='fixed')
    n_pii = (F.col('n_emails') + F.col('n_ips')
             + F.col('n_ccs') + F.col('n_phones')).cast('int')
    cols = ['doc_id', n_pii.alias('n_pii'),
            F.col('redacted_sha').alias('clean_sha'), 'redacted']
    carry = ['n_pii', 'clean_sha'] + (['redacted'] if keep_text else [])
    out = gopher_filter(scrubbed.select(*cols), text_col='redacted',
                        carry=tuple(carry))
    final = ['doc_id', 'n_pii', 'keep', 'clean_sha'] + (
        [F.col('redacted').alias('clean_text')] if keep_text else [])
    out = out.select(*final)
    if id_col != 'doc_id':
        out = out.withColumnRenamed('doc_id', id_col)
    return out
