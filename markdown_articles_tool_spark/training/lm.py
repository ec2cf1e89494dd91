"""Count-based n-gram language model + perplexity quality filter
(the CCNet recipe: Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data" — train a small LM on a
clean slice, score every document's perplexity, split the corpus into
head/middle/tail quality buckets).  Smoothing is stupid backoff
(Brants et al. 2007, "Large Language Models in Machine Translation"
§4: score = relative frequency when the n-gram was seen, else
``alpha *`` the (n-1)-gram score — the standard at-scale choice
because it needs no discounting pass over the count table).

The reference tool has no corpus-quality notion at all (it transforms
one article at a time); this module is part of the engine-added
training-data surface (SURVEY.md §2.8).

Determinism spec (implemented independently by the sequential twin in
``tools/oracle_kernels.py`` — keep the two in sync by spec, not by
shared code):

* normalize: ``text.lower()`` then ASCII digits ``[0-9]`` → ``'0'``
  (CCNet's digit bucketing);
* tokens: regex ``[a-z0-9_']+|[^a-z0-9_\\s]`` over the normalized
  text — word runs (apostrophe included) or single punctuation marks;
  non-Latin scripts fall through to the per-character class, which is
  exactly the crude-but-deterministic behaviour we want from a spec
  (the real CCNet uses SentencePiece; not installable here);
* padded sequence: ``[BOS, BOS] + tokens + [EOS]`` with
  ``BOS='\\x01'``, ``EOS='\\x02'`` (unreachable by the tokenizer:
  control chars are punctuation-class singletons, and \\x01/\\x02
  never survive as multi-char word runs);
* counts: ALL consecutive 1/2/3-grams of the padded sequence (so BOS
  contexts are first-class and every kept trigram's context bigram is
  also in the table); gram key = tokens joined by ``'\\0'``;
* pruning: orders 2 and 3 keep grams with ``count >= min_count``
  (count(uv) >= count(uvw), so min-count pruning never orphans a
  context); optional ``top_k`` per order, ties broken by
  (-count, gram) — top-k CAN orphan contexts, which scoring already
  tolerates (a missing context just backs off);
* scoring position j (for j in 2..len(seq)-1, i.e. every real token
  plus EOS), with u,v = seq[j-2], seq[j-1], w = seq[j]:

      if c3(u,v,w) > 0 and c2(u,v) > 0:  p = c3/c2ctx
      elif c2(v,w) > 0 and c1(v) > 0:    p = alpha   * c2/c1ctx
      elif c1(w) > 0:                    p = alpha^2 * c1(w)/N
      else:                              p = alpha^2 * 1/N     (OOV)

  with ``alpha = 0.4`` and ``N =`` the padded-token total
  (sum of all unigram counts, BOS/EOS included);
* log10 per token, summed with ``math.fsum`` (exactly-rounded, so the
  result is independent of summation order — the engine and the twin
  match bit-for-bit without agreeing on a loop shape);
* ``ppl = round(10 ** (-fsum / n_scored), 6)`` with
  ``n_scored = len(tokens) + 1`` (the EOS prediction counts — an
  empty document still scores its EOS).

Scale shape:

* **training** is one Arrow pass emitting per-batch pre-combined
  (order, gram, partial_count) rows — a map-side combine, so the
  gram shuffle moves distinct-grams-per-batch, not tokens — then ONE
  ``groupBy(order, gram)`` sum.  The count table is vocabulary-sized,
  not corpus-sized;
* the **model is a bounded broadcast artifact** (CCNet ships its LMs
  the same way): ``min_count`` pruning bounds orders 2-3, ``top_k``
  hard-caps each order when a corpus is adversarially diverse.  The
  collect that materializes it is bounded by that cap — the one
  deliberate driver-side materialization, same class as the 2,048-row
  IVF quantizer sample;
* **scoring** is embarrassingly parallel: one pandas_udf pass, a
  per-batch memo on the trigram key keeps the Python work sublinear in
  tokens on repetitive web text;
* **bucketing** never uses a global window (``ntile() OVER (ORDER BY
  ppl)`` with no partition key would sort the corpus in ONE task).
  ``ppl_ntile`` rides the SHARED two-level prefix-count machinery
  (``training/util.global_rank`` — range partition by (ppl, doc_id),
  per-partition counts, exclusive prefix, broadcast bases, rank =
  base + local row_number) and adds only the SQL-standard NTILE
  formula from (rank, n, k).  Partition-count invariant; DuckDB's own
  ``ntile(3)`` is the oracle twin.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

BOS = '\x01'
EOS = '\x02'
ALPHA = 0.4
_TOKEN_RE = re.compile(r"[a-z0-9_']+|[^a-z0-9_\s]")
_DIGIT_RE = re.compile(r'[0-9]')


def lm_tokens(text: str) -> list:
    """Normalize + tokenize per the module spec (engine side)."""
    return _TOKEN_RE.findall(_DIGIT_RE.sub('0', (text or '').lower()))


# ------------------------------------------------------------ training


def ngram_counts(
    df: DataFrame,
    text_col: str = 'text',
    min_count: int = 2,
    top_k: int | None = None,
) -> DataFrame:
    """(docs) → (order, gram, count) model table.

    One mapInPandas pass over the text column emits per-batch
    pre-combined partial counts (map-side combine: the shuffle carries
    distinct grams per batch, not one row per token), then a single
    ``groupBy(order, gram)`` sum.  Orders 2-3 are min-count pruned;
    ``top_k`` (per order, ties (-count, gram)) optionally hard-caps the
    table so the broadcast stays bounded on adversarial vocabularies.
    """
    from .util import ensure_parallelism

    out_schema = StructType([
        StructField('order', IntegerType()),
        StructField('gram', StringType()),
        StructField('count', LongType()),
    ])

    def _partial(batches):
        from collections import Counter
        for pdf in batches:
            counters = {1: Counter(), 2: Counter(), 3: Counter()}
            for t in pdf[text_col]:
                seq = [BOS, BOS] + lm_tokens(t) + [EOS]
                counters[1].update(seq)
                counters[2].update(
                    seq[i] + '\0' + seq[i + 1] for i in range(len(seq) - 1)
                )
                counters[3].update(
                    seq[i] + '\0' + seq[i + 1] + '\0' + seq[i + 2]
                    for i in range(len(seq) - 2)
                )
            rows = [
                (order, gram, cnt)
                for order, c in counters.items()
                for gram, cnt in c.items()
            ]
            yield pd.DataFrame(rows, columns=['order', 'gram', 'count'])

    counts = (
        ensure_parallelism(df)
        .select(text_col)
        .mapInPandas(_partial, out_schema)
        .groupBy('order', 'gram')
        .agg(F.sum('count').alias('count'))
        .where((F.col('order') == 1) | (F.col('count') >= int(min_count)))
    )
    if top_k is not None:
        # per-order top-k WITHOUT a per-order single-task sort: a
        # Window.partitionBy('order') would land the entire order-1
        # unigram table — the unbounded, vocabulary-sized table top_k
        # exists to cap — in ONE window partition (and top_k=200k is
        # far above Catalyst's windowGroupLimitThreshold, so no
        # automatic two-level rewrite applies).  grouped_topk salts
        # each order across 32 buckets, takes per-bucket top-k, then
        # ranks the bounded survivors — identical output (the
        # (-count, gram) order is total).
        from .util import grouped_topk

        counts = grouped_topk(
            counts, ['order'], [F.col('count').desc(), 'gram'], int(top_k),
            salt_on=['gram'],
        )
    return counts


def collect_lm(counts_df: DataFrame) -> dict:
    """Materialize the pruned count table as the broadcastable model
    artifact ``{1: {gram: count}, 2: {...}, 3: {...}, 'N': total}``.
    Bounded by the pruning caps (see module docstring)."""
    model = {1: {}, 2: {}, 3: {}}
    for row in counts_df.collect():
        model[row['order']][row['gram']] = row['count']
    model['N'] = sum(model[1].values())
    if model['N'] == 0:
        raise ValueError(
            'empty training slice: the LM has no counts (every scoring '
            'branch would divide by N=0) — check the train_where filter'
        )
    return model


# ------------------------------------------------------------- scoring


MEMO_CAP = 1 << 20  # distinct (u,v,w) entries per scoring memo


def score_tokens(toks: list, model: dict, memo: dict | None = None) -> tuple:
    """(log10-prob fsum, n_scored) for one token list under the spec.
    ``memo`` caches per (u,v,w) across documents of one batch.  It is
    a pure cache (results never depend on its contents), and it is
    BOUNDED: at ``MEMO_CAP`` entries it resets — on adversarially
    diverse text an unbounded per-batch memo would otherwise grow to
    rival the model itself (one entry per distinct trigram seen, with
    10k-doc Arrow batches that is millions of keys)."""
    c1, c2, c3 = model[1], model[2], model[3]
    n_total = model['N']
    if memo is None:
        memo = {}
    seq = [BOS, BOS] + list(toks) + [EOS]
    logs = []
    for j in range(2, len(seq)):
        key = seq[j - 2] + '\0' + seq[j - 1] + '\0' + seq[j]
        lp = memo.get(key)
        if lp is None:
            u, v, w = seq[j - 2], seq[j - 1], seq[j]
            tri = c3.get(key, 0)
            ctx2 = c2.get(u + '\0' + v, 0)
            if tri and ctx2:
                p = tri / ctx2
            else:
                bi = c2.get(v + '\0' + w, 0)
                ctx1 = c1.get(v, 0)
                if bi and ctx1:
                    p = ALPHA * (bi / ctx1)
                else:
                    uni = c1.get(w, 0)
                    if uni:
                        p = ALPHA * ALPHA * (uni / n_total)
                    else:
                        p = ALPHA * ALPHA * (1.0 / n_total)
            lp = math.log10(p)
            if len(memo) >= MEMO_CAP:
                memo.clear()
            memo[key] = lp
        logs.append(lp)
    return math.fsum(logs), len(seq) - 2


def lm_perplexity(
    df: DataFrame,
    model: dict,
    id_col: str = 'doc_id',
    text_col: str = 'text',
) -> DataFrame:
    """(docs, broadcast model) → (doc_id, n_scored, ppl).

    One pandas_udf pass; the model rides a SparkContext broadcast (one
    copy per executor, not per task).  ppl is round-6 so the published
    value is a stable spec quantity (the fsum underneath is already
    order-independent)."""
    from .util import ensure_parallelism

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(model)

    out_schema = StructType([
        StructField('n_scored', IntegerType()),
        StructField('ppl', DoubleType()),
    ])

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(out_schema)
    def score_udf(text: pd.Series) -> pd.DataFrame:
        m = bc.value
        memo: dict = {}
        rows = []
        for t in text:
            lsum, n = score_tokens(lm_tokens(t), m, memo)
            rows.append((n, round(10.0 ** (-lsum / n), 6)))
        return pd.DataFrame(rows, columns=['n_scored', 'ppl'])

    r = F.col('_r')
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias('doc_id'), score_udf(F.col(text_col)).alias('_r'))
        .select('doc_id', r['n_scored'].alias('n_scored'), r['ppl'].alias('ppl'))
    )


def perplexity_pipeline(
    df: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    train_where=None,
    min_count: int = 2,
    top_k: int | None = 200_000,
) -> DataFrame:
    """Train on the ``train_where`` slice (CCNet's "clean reference
    corpus" — e.g. ``F.col('lang') == 'en'``; None = whole input),
    score EVERY document.  Returns (doc_id, n_scored, ppl).

    ``top_k`` defaults ON (200k grams per order) because min-count
    pruning alone does NOT bound order 1 — the unigram table grows
    with corpus VOCABULARY (every typo/URL token at 10^12 docs), and
    an unbounded broadcast model is exactly the kind of silently-
    growing driver artifact that dies first at scale.  A pruned-away
    unigram scores through the OOV branch, which the spec already
    defines.  At the test scales the cap is far above the vocabulary
    (33 unigrams at sf0.1), so defaults change nothing there."""
    train = df.where(train_where) if train_where is not None else df
    model = collect_lm(ngram_counts(train, text_col, min_count, top_k))
    return lm_perplexity(df, model, id_col=id_col, text_col=text_col)


# ----------------------------------------------------------- bucketing


def ppl_ntile(scored: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, ppl) → (doc_id, ppl, tile) with tile = SQL-standard
    NTILE(k) over (ORDER BY ppl, doc_id) — computed WITHOUT a global
    single-partition window.  The rank machinery is the shared
    ``training/util.global_rank`` (two-level prefix count, partition-
    count invariant; it localCheckpoints so the upstream scoring UDF
    runs once, not once per rank job); this function only adds the
    SQL-standard NTILE formula over (rank, n, k)."""
    from .util import global_rank

    ranked = global_rank(
        scored.select('doc_id', 'ppl'), ['ppl', 'doc_id'],
        rank_col='_rank', total_col='_n',
    )
    rank = F.col('_rank')
    # SQL-standard NTILE: q, rem = divmod(n, k); the first rem tiles
    # hold q+1 rows each, the rest q rows.
    q = F.floor(F.col('_n') / k)
    rem = F.col('_n') % k
    boundary = rem * (q + 1)
    tile = (
        F.when(rank <= boundary, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((rank - boundary - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast('int')
    )
    return ranked.select('doc_id', 'ppl', tile.alias('tile'))


def ppl_buckets(
    df: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    train_where=None,
    min_count: int = 2,
) -> DataFrame:
    """CCNet head/middle/tail split: perplexity_pipeline → exact
    3-tile by (ppl, doc_id) → named buckets."""
    scored = perplexity_pipeline(
        df, id_col=id_col, text_col=text_col,
        train_where=train_where, min_count=min_count,
    )
    tiles = ppl_ntile(scored.select('doc_id', 'ppl'), k=3)
    bucket = (
        F.when(F.col('tile') == 1, F.lit('head'))
        .when(F.col('tile') == 2, F.lit('middle'))
        .otherwise(F.lit('tail'))
    )
    return tiles.select('doc_id', 'ppl', bucket.alias('bucket'))
