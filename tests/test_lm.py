"""LM perplexity tier (the CCNet recipe, SURVEY.md §2.8): engine vs the
independent sequential twin in tools/oracle_kernels.py, plus the
distributed exact-NTILE machinery that replaces the single-partition
global window."""

from __future__ import annotations

import math
import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

import oracle_kernels as ok  # noqa: E402

from markdown_articles_tool_spark.training import lm  # noqa: E402

TRAIN = [
    'The quick brown fox jumps over the lazy dog. The quick brown fox '
    'naps afterwards, obviously.',
    'Distributed systems trade latency for throughput in subtle ways; '
    'the quick path is rarely the correct path.',
    "Columnar formats let scans skip data the query never touches — "
    "that's the whole trick, really.",
    'In 2024 the corpus held 1,234,567 documents; by 2025 it doubled. '
    'Digits bucket to zero so years share statistics.',
    'the quick brown fox jumps over the lazy dog again and again and '
    'again because repetition builds n-gram mass',
]

SCORE = TRAIN + [
    '',  # empty doc still predicts EOS
    '完全に別の文字体系 mixed with english words',
    '!!!',
    'unseen zebra quagga okapi vocabulary everywhere',
    "don't split the apostrophe: it's part of the word run",
]


def _soup(rng: random.Random, n: int) -> str:
    pool = (
        list('abcdefghij AB .,!?;:()[]{}') + ['0', '5', '9', "'", '_', '\t', '\n']
        + ['é', 'ß', '中', '\x01', '\x02', '—', '…']
    )
    return ''.join(rng.choice(pool) for _ in range(n))


class TestTokenizerTwin:
    def test_goldens(self):
        assert lm.lm_tokens('Hello, World 42!') == [
            'hello', ',', 'world', '00', '!']
        assert lm.lm_tokens("don't-stop") == ["don't", '-', 'stop']
        assert lm.lm_tokens('') == []
        assert lm.lm_tokens(None) == []
        # non-Latin falls through to per-char punctuation class
        assert lm.lm_tokens('中文 ab') == ['中', '文', 'ab']

    def test_matches_twin_on_soup(self):
        rng = random.Random(42)
        for trial in range(300):
            s = _soup(rng, rng.randrange(0, 80))
            assert lm.lm_tokens(s) == ok._lm_tokens_seq(s), repr(s)

    def test_bos_eos_unreachable(self):
        # control chars tokenize as singletons, never multi-char runs,
        # so a document can never forge a BOS/BOS context
        assert lm.lm_tokens('\x01\x01x') == ['\x01', '\x01', 'x']
        assert all(len(t) == 1 for t in lm.lm_tokens('\x01\x02\x01'))


class TestTrainerTwin:
    def _engine_model(self, spark, texts, **kw):
        df = spark.createDataFrame([(t,) for t in texts], 'text string')
        return lm.collect_lm(lm.ngram_counts(df, **kw))

    def test_counts_match_twin(self, spark):
        got = self._engine_model(spark, TRAIN, min_count=2)
        want = ok.lm_counts_seq(TRAIN, min_count=2)
        assert got == want
        assert got['N'] == sum(got[1].values())

    def test_min_count_1_and_top_k_match_twin(self, spark):
        got = self._engine_model(spark, TRAIN, min_count=1, top_k=10)
        want = ok.lm_counts_seq(TRAIN, min_count=1, top_k=10)
        assert got == want
        assert all(len(got[o]) <= 10 for o in (1, 2, 3))

    def test_empty_training_slice_raises(self, spark):
        df = spark.createDataFrame([], 'text string')
        with pytest.raises(ValueError, match='empty training slice'):
            lm.collect_lm(lm.ngram_counts(df))


class TestScorerTwin:
    def test_ppl_matches_twin_per_doc(self):
        model = ok.lm_counts_seq(TRAIN, min_count=2)
        for t in SCORE:
            lsum, n = lm.score_tokens(lm.lm_tokens(t), model)
            got = (n, round(10.0 ** (-lsum / n), 6))
            assert got == ok.lm_ppl_seq(t, model), repr(t)

    def test_empty_doc_scores_eos_only(self):
        model = ok.lm_counts_seq(TRAIN, min_count=2)
        lsum, n = lm.score_tokens([], model)
        assert n == 1  # the EOS prediction
        assert math.isfinite(lsum)

    def test_memo_does_not_change_result(self):
        model = ok.lm_counts_seq(TRAIN, min_count=2)
        memo: dict = {}
        for t in SCORE:  # shared memo across docs, like the batch UDF
            a = lm.score_tokens(lm.lm_tokens(t), model, memo)
            b = lm.score_tokens(lm.lm_tokens(t), model, None)
            assert a == b

    def test_seen_text_beats_gibberish(self):
        model = ok.lm_counts_seq(TRAIN, min_count=1)
        _, ppl_seen = ok.lm_ppl_seq(TRAIN[0], model)
        _, ppl_junk = ok.lm_ppl_seq('zxq vvw qqq jjj kkk', model)
        assert ppl_seen < ppl_junk


class TestPipelineSpark:
    def test_pipeline_matches_sequential_composition(self, spark):
        rows = [(i, t, 'en' if i % 3 else 'xx') for i, t in enumerate(SCORE)]
        df = spark.createDataFrame(rows, 'doc_id long, text string, lang string')
        got = {
            r['doc_id']: (r['n_scored'], r['ppl'])
            for r in lm.perplexity_pipeline(
                df, train_where=F.col('lang') == 'en'
            ).collect()
        }
        model = ok.lm_counts_seq(
            [t for i, t, lg in rows if lg == 'en'], min_count=2)
        for i, t, _ in rows:
            assert got[i] == ok.lm_ppl_seq(t, model), i

    def test_scoring_udf_single_arrow_eval(self, spark):
        import re

        df = spark.createDataFrame([(i, 'a b c') for i in range(8)],
                                   'doc_id long, text string')
        model = {1: {'a': 3}, 2: {}, 3: {}, 'N': 3}
        plan = lm.lm_perplexity(df, model)._jdf.queryExecution().executedPlan().toString()
        # one ArrowEvalPython node even though two fields are extracted
        assert len(re.findall(r'ArrowEvalPython', plan)) <= 1, plan


class TestNtile:
    def _naive(self, vals, k):
        n = len(vals)
        q, rem = divmod(n, k)
        out = {}
        for rank, key in enumerate(sorted(vals), start=1):
            if rank <= rem * (q + 1):
                t = (rank - 1) // (q + 1) + 1
            else:
                t = rem + (rank - rem * (q + 1) - 1) // max(q, 1) + 1
            out[key] = t
        return out

    @pytest.mark.parametrize('n,k', [(1, 3), (2, 3), (3, 3), (7, 3), (40, 3), (41, 4), (9, 10)])
    def test_exact_and_partition_invariant(self, spark, n, k):
        rng = random.Random(n * 1000 + k)
        rows = [(i, round(rng.uniform(1.0, 9.0), 3)) for i in range(n)]
        want = self._naive([(p, i) for i, p in rows], k)
        for parts in (1, 3, 7):
            df = spark.createDataFrame(rows, 'doc_id long, ppl double').repartition(parts)
            got = {(r['ppl'], r['doc_id']): r['tile']
                   for r in lm.ppl_ntile(df, k=k).collect()}
            assert got == want, (n, k, parts)

    def test_ties_break_on_doc_id(self, spark):
        rows = [(i, 5.0) for i in range(6)]
        df = spark.createDataFrame(rows, 'doc_id long, ppl double')
        got = {r['doc_id']: r['tile'] for r in lm.ppl_ntile(df, k=3).collect()}
        assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3}

    def test_buckets_named_and_sized(self, spark):
        rows = [(i, f'text number {i} ' * (1 + i % 5), 'en') for i in range(30)]
        df = spark.createDataFrame(rows, 'doc_id long, text string, lang string')
        out = lm.ppl_buckets(df, train_where=F.col('lang') == 'en').collect()
        sizes = {}
        for r in out:
            sizes[r['bucket']] = sizes.get(r['bucket'], 0) + 1
        assert sizes == {'head': 10, 'middle': 10, 'tail': 10}
        # head has the lowest (best) perplexities
        by_bucket = {b: [r['ppl'] for r in out if r['bucket'] == b] for b in sizes}
        assert max(by_bucket['head']) <= min(by_bucket['tail'])
