"""HTML table extraction: spec edges (golden), engine-vs-twin
differential over the corpus + hypothesis soup, Spark operator shape."""

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

from markdown_articles_tool_spark import corpus
from markdown_articles_tool_spark.core.htmltables import extract_tables

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
from oracle_kernels import html_tables_seq  # noqa: E402


GOLDENS = {
    # header + data row
    '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>':
        [(0, 0, 0, 'A'), (0, 0, 1, 'B'), (0, 1, 0, '1'), (0, 1, 1, '2')],
    # implicit </td> and </tr> (web soup)
    '<table><tr><td>a<td>b<tr><td>c</table>':
        [(0, 0, 0, 'a'), (0, 0, 1, 'b'), (0, 1, 0, 'c')],
    # nested table: inner text must not leak into the outer cell;
    # nested table gets its own document-order index
    '<table><tr><td>outer <table><tr><td>inner</td></tr></table> tail</td></tr></table>':
        [(0, 0, 0, 'outer tail'), (1, 0, 0, 'inner')],
    # entities + whitespace normalization
    '<table><tr><td> a &amp;  b\n c </td></tr></table>': [(0, 0, 0, 'a & b c')],
    # empty row dropped, empty cell kept
    '<table><tr></tr><tr><td></td></tr></table>': [(0, 0, 0, '')],
    # text outside cells is ignored; stray td outside any table ignored
    '<td>stray</td><table>noise<tr>gap<td>z</td></tr></table>': [(0, 0, 0, 'z')],
    # unterminated table flushes
    '<table><tr><td>y': [(0, 0, 0, 'y')],
    # marked-section soup must not crash
    '<table><tr><td>x</td></tr></table><![weird]': [(0, 0, 0, 'x')],
    # no tables -> no rows
    '<p>hello</p>': [],
}


class TestKernel:
    def test_goldens_engine_and_twin(self):
        for html, want in GOLDENS.items():
            assert extract_tables(html) == want, html
            assert html_tables_seq(html) == want, html

    def test_corpus_differential(self):
        total = 0
        for i in range(150):
            h = corpus.doc_html(i)
            a = extract_tables(h)
            assert a == html_tables_seq(h), i
            total += len(a)
        assert total > 100  # the corpus genuinely rotates tables in

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet='<>/table rdh!&;ax-[]"=\n\t ', max_size=220))
    def test_soup_differential(self, soup):
        assert extract_tables(soup) == html_tables_seq(soup)


@pytest.mark.usefixtures('spark')
class TestOperator:
    def test_operator_matches_kernel_and_prunes(self, spark):
        from markdown_articles_tool_spark.operators.htmltables import extract_html_tables

        pages = corpus.pages_df(spark, 30)
        got = sorted(
            tuple(r) for r in extract_html_tables(pages).collect()
        )
        want = sorted(
            (corpus.doc_url(i), t, r, c, cell)
            for i in range(30)
            for t, r, c, cell in extract_tables(corpus.doc_html(i))
        )
        assert got == want
        plan = extract_html_tables(pages)._jdf.queryExecution().executedPlan().toString()
        assert 'Exchange' not in plan  # embarrassingly parallel, no shuffle
