"""Formatter stages (R2-R6)."""

import pytest
from pyspark.sql import functions as F

from markdown_articles_tool_spark.formatters import (
    FORMATTERS,
    format_documents,
    get_formatter,
    render_markdown_html,
)


class TestMdIdentity:
    def test_bytes_identical(self, spark):
        text = '# T\n\nпривет ![a](x.png)\n'
        df = spark.createDataFrame([('u1', text)], 'url string, text_out string')
        out = format_documents(df, 'md').collect()[0]
        assert bytes(out['content']) == text.encode('utf-8')
        assert out['out_format'] == 'md'


class TestHtmlRenderer:
    def test_structure(self):
        html = render_markdown_html(
            '# Title\n\npara with **bold** and `code` and ![alt](i.png)\n\n'
            '- item1\n- item2\n\n```\nraw ![no](x.png)\n```\n'
        )
        assert '<h1>Title</h1>' in html
        assert '<strong>bold</strong>' in html
        assert '<code>code</code>' in html
        assert '<img alt="alt" src="i.png" />' in html
        assert '<ul>' in html and '<li>item1</li>' in html
        assert '<pre><code>raw ![no](x.png)</code></pre>' in html

    def test_shell(self, spark):
        df = spark.createDataFrame([('u1', '# H')], 'url string, text_out string')
        content = bytes(format_documents(df, 'html').collect()[0]['content']).decode()
        assert content.startswith('<html>\n<head><style>')
        assert content.endswith('</body>\n</html>')

    def test_escaping(self):
        assert '&lt;script&gt;' in render_markdown_html('<script> & stuff')


class TestDispatch:
    def test_known(self):
        assert set(FORMATTERS) == {'md', 'html', 'pdf', 'docx'}

    def test_unknown_raises(self):
        with pytest.raises(AssertionError):
            get_formatter('epub')

    def test_pdf_stub_raises_at_execution(self, spark):
        df = spark.createDataFrame([('u1', 'x')], 'url string, text_out string')
        out = format_documents(df, 'pdf')
        with pytest.raises(Exception, match='weasyprint'):
            out.collect()
