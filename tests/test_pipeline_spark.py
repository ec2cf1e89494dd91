"""Differential tests: the distributed pipeline must produce
byte-identical ``text_out`` per url and the same images inventory as
the sequential reference-semantics oracle, across configurations
(SURVEY.md §5 rebuild test plan, point b)."""

import pytest

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.core.linkflow import DedupVariant, TransformConfig
from markdown_articles_tool_spark.core.pathalgebra import PathConfig
from markdown_articles_tool_spark.oracle import ReferenceOracle
from markdown_articles_tool_spark.pipeline import transform_documents

N_DOCS = 36  # covers all six document classes, six docs each


def _spark_docs(spark, n=N_DOCS):
    return spark.createDataFrame(corpus.docs_list(n), 'url string, text string')


def _run_both(spark, cfg, n=N_DOCS):
    res = transform_documents(_spark_docs(spark, n), cfg)
    got_texts = {r['url']: r['text_out'] for r in res.docs_out.collect()}
    got_images = {r['real_path']: bytes(r['content']) for r in res.images_out.collect()}
    want = ReferenceOracle(cfg, corpus.ModelAssetStore()).run(corpus.docs_list(n))
    return got_texts, got_images, want


def _assert_match(got_texts, got_images, want):
    assert set(got_texts) == set(want.texts)
    mismatches = [u for u in want.texts if got_texts[u] != want.texts[u]]
    assert not mismatches, (
        f'{len(mismatches)} text mismatches; first: {mismatches[0]}\n'
        f'GOT:\n{got_texts[mismatches[0]]!r}\nWANT:\n{want.texts[mismatches[0]]!r}'
    )
    assert set(got_images) == set(want.images)
    img_mis = [p for p in want.images if got_images[p] != want.images[p]]
    assert not img_mis, f'image byte mismatches: {img_mis[:5]}'


@pytest.mark.parametrize(
    'name,cfg',
    [
        ('plain', TransformConfig(skip_all_errors=True)),
        (
            'content_dedup',
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH),
        ),
        (
            'name_hash',
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.NAMES_HASHING),
        ),
        ('replace_names', TransformConfig(skip_all_errors=True, replace_image_names=True)),
        (
            'replace_names_dedup',
            TransformConfig(
                skip_all_errors=True,
                replace_image_names=True,
                deduplication=DedupVariant.CONTENT_HASH,
            ),
        ),
        (
            'download_incorrect_mime',
            TransformConfig(skip_all_errors=True, download_incorrect_mime_types=True),
        ),
        (
            'hierarchy',
            TransformConfig(
                skip_all_errors=True,
                paths=PathConfig(save_hierarchy=True),
                deduplication=DedupVariant.CONTENT_HASH,
            ),
        ),
        (
            'public_path',
            TransformConfig(
                skip_all_errors=True,
                paths=PathConfig(img_public_path='/static/img'),
                deduplication=DedupVariant.CONTENT_HASH,
            ),
        ),
        (
            'skip_list',
            TransformConfig(
                skip_all_errors=True,
                skip_list=frozenset({'https://www.google.com/', './pic/pic1_50.png'}),
            ),
        ),
        (
            'md_html_chain',
            TransformConfig(skip_all_errors=True, input_formats=('md', 'html')),
        ),
    ],
)
def test_differential(spark, name, cfg):
    got_texts, got_images, want = _run_both(spark, cfg)
    _assert_match(got_texts, got_images, want)


def test_skip_list_large_broadcast_join(spark):
    """P2 above the size threshold: a 10k-entry skip list must compile
    to a broadcast hash join (not a 10k-term IN literal) and stay
    byte-identical vs the oracle."""
    big = {f'https://neverseen.example/x{i}.png' for i in range(10_000)}
    big |= {'https://www.google.com/', './pic/pic1_50.png'}
    cfg = TransformConfig(skip_all_errors=True, skip_list=frozenset(big))
    res = transform_documents(_spark_docs(spark), cfg)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted')
    plan = res.docs_out._jdf.queryExecution().explainString(mode)
    assert 'BroadcastExchange' in plan or 'BroadcastHashJoin' in plan, 'skip list not broadcast-joined'
    assert plan.count('neverseen.example') == 0, '10k-term IN literal leaked into the plan'
    got_texts = {r['url']: r['text_out'] for r in res.docs_out.collect()}
    got_images = {r['real_path']: bytes(r['content']) for r in res.images_out.collect()}
    want = ReferenceOracle(cfg, corpus.ModelAssetStore()).run(corpus.docs_list(N_DOCS))
    _assert_match(got_texts, got_images, want)


def test_no_image_docs_untouched(spark):
    cfg = TransformConfig(skip_all_errors=True)
    got_texts, _, _ = _run_both(spark, cfg)
    for i in range(N_DOCS):
        if i % 6 == 5:  # noimg class
            assert got_texts[corpus.doc_url(i)] == corpus.doc_text(i)


def test_determinism_two_runs(spark):
    cfg = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH)
    a = _run_both(spark, cfg)
    b = _run_both(spark, cfg)
    assert a[0] == b[0]
    assert a[1] == b[1]


def test_differential_fat_docs(spark):
    """The bench corpus variant (fat docs) is byte-identical too."""
    cfg = TransformConfig(
        skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH
    )
    docs = [(corpus.doc_url(i), corpus.doc_text(i, fat=True)) for i in range(12)]
    res = transform_documents(
        spark.createDataFrame(docs, 'url string, text string'), cfg
    )
    got = {r['url']: r['text_out'] for r in res.docs_out.collect()}
    want = ReferenceOracle(cfg, corpus.ModelAssetStore()).run(docs)
    assert got == want.texts


def test_mime_gate_col_parity(spark):
    """Column-algebra MIME gate ≡ python guess_mime_type over an
    adversarial URL corpus."""
    from pyspark.sql import functions as F
    from markdown_articles_tool_spark.core.wwwtools import guess_mime_type
    from markdown_articles_tool_spark.operators.udfs import mime_gate_col

    urls = [
        'https://h/a.png', 'https://h/a.PNG', 'https://h/a.jpe', 'https://h/a',
        'https://h/u/1?s=80&v=4', 'https://www.google.com/', './pic/x.png',
        'pic/x.jpeg', 'https://h/x.tar.gz', 'https://h/x.svgz', 'https://h/x.tgz',
        'https://h/x.gz', 'https://h/x.png.gz', 'https://h/x.PNG.gz',
        'https://h/.hidden', 'https://h/.hidden.png', 'https://h/a.b.c.gif',
        'data:image/png;base64,xxx', 'data:broken', 'https://h/dir.d/x',
        'https://h/trailing.', 'a b.png', 'https://h/q?x=.png',
        'https://cubox.pro/c/filters:no_upscale()?u=x.jpg%3Fs%3D1',
        'https://h/x.Z', 'https://h/x.png.Z', 'ftp://h/y.gif', 'x',
    ]
    urls += [f'https://h/f{i}.{ext}' for i, ext in enumerate(
        ['png', 'jpg', 'jpeg', 'gif', 'bmp', 'webp', 'svg', 'ico', 'tif', 'txt', 'html', 'zzz'])]
    df = spark.createDataFrame([(u,) for u in urls], 'u string')
    got = {r['u']: r['g'] for r in df.select('u', mime_gate_col(F.col('u')).alias('g')).collect()}
    for u in urls:
        want = guess_mime_type(u) is not None
        assert got[u] == want, f'{u}: col={got[u]} py={want}'


def test_differential_local_articles(spark):
    """Local-article mode: base_url '' → links resolve against the
    article directory and read from the local asset store (S5)."""
    from markdown_articles_tool_spark.core.pathalgebra import PathConfig

    cfg = TransformConfig(
        skip_all_errors=True,
        derive_base_url_from_doc_url=False,
        paths=PathConfig(article_file_path='/work/article.md', article_base_url=''),
    )
    docs = [
        ('file:a1', 'pre ![](img/one.png) post\n![](../up/two.jpg)\n![](missing.png)\n'),
        ('file:a2', '![](img/one.png)\n'),
    ]
    local_assets = {
        '/work/img/one.png': b'ONE',
        '/up/two.jpg': b'TWO',
    }
    res = transform_documents(
        spark.createDataFrame(docs, 'url string, text string'), cfg, local_assets=local_assets
    )
    got = {r['url']: r['text_out'] for r in res.docs_out.collect()}
    got_imgs = {r['real_path']: bytes(r['content']) for r in res.images_out.collect()}
    want = ReferenceOracle(cfg, {}, local_assets=local_assets).run(docs)
    assert got == want.texts
    assert got_imgs == want.images
    # sanity on the actual semantics
    assert got['file:a1'].startswith('pre ![](images/one.png) post')


@pytest.mark.parametrize(
    'name,cfg',
    [
        (
            'chain_with_content_dedup',
            TransformConfig(
                skip_all_errors=True,
                input_formats=('md', 'html'),
                deduplication=DedupVariant.CONTENT_HASH,
            ),
        ),
        (
            'html_first_chain',
            TransformConfig(skip_all_errors=True, input_formats=('html', 'md')),
        ),
        (
            'kitchen_sink',
            TransformConfig(
                skip_all_errors=True,
                deduplication=DedupVariant.CONTENT_HASH,
                replace_image_names=True,
                paths=PathConfig(save_hierarchy=True, img_public_path='/cdn/img'),
                skip_list=frozenset({'https://www.google.com/'}),
            ),
        ),
        (
            'names_hashing_hierarchy',
            TransformConfig(
                skip_all_errors=True,
                deduplication=DedupVariant.NAMES_HASHING,
                paths=PathConfig(save_hierarchy=True),
            ),
        ),
    ],
)
def test_differential_combos(spark, name, cfg):
    """Cross-pass dedup state, pass-order permutation, and stacked-flag
    configurations — byte-identical vs the oracle."""
    got_texts, got_images, want = _run_both(spark, cfg, n=48)
    _assert_match(got_texts, got_images, want)
