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
        assert '<h1 id="title">Title</h1>' in html
        assert '<strong>bold</strong>' in html
        assert '<code>code</code>' in html
        assert '<img alt="alt" src="i.png" />' in html
        assert '<ul>' in html and '<li>item1</li>' in html
        # fence renders through codehilite structure (pygments present);
        # guess_lang highlights the content, so check the text survives
        # modulo highlighting spans
        assert '<div class="codehilite"><pre><span></span><code class="language-' in html
        import re as _re

        assert 'raw ![no](x.png)' in _re.sub(r'<[^>]+>', '', html)

    def test_codehilite_golden(self):
        """The reference's pygments pieces, byte-for-byte: custom
        _wrap_code class injection + real highlighted spans
        (formatters/html.py:10-21 + codehilite defaults)."""
        html = render_markdown_html('```python\nprint("hi")\n```\n')
        assert html == (
            '<div class="codehilite"><pre><span></span>'
            '<code class="language-python"><span class="nb">print</span>'
            '<span class="p">(</span><span class="s2">&quot;hi&quot;</span>'
            '<span class="p">)</span>\n</code></pre></div>'
        )

    def test_toc_ids_unique(self):
        html = render_markdown_html('# A B!\n\ntext\n\n# A B!\n')
        assert '<h1 id="a-b">A B!</h1>' in html
        assert '<h1 id="a-b_1">A B!</h1>' in html

    def test_pipe_table(self):
        html = render_markdown_html('| x | y |\n|---|:-:|\n| 1 | 2 |\n')
        assert '<table>\n<thead>\n<tr>' in html
        assert '<th>x</th>' in html
        assert '<th style="text-align: center;">y</th>' in html
        assert '<td>1</td>' in html and '</tbody>\n</table>' in html

    def test_shell(self, spark):
        df = spark.createDataFrame([('u1', '# H')], 'url string, text_out string')
        content = bytes(format_documents(df, 'html').collect()[0]['content']).decode()
        assert content.startswith('<html>\n<head><style>\n')
        assert content.endswith('</body>\n</html>')
        # real pygments style defs in the shell, exactly as the
        # reference emits them (formatters/html.py:38)
        from markdown_articles_tool_spark.formatters import CustomHtmlFormatter

        defs = CustomHtmlFormatter().get_style_defs()
        assert defs in content
        assert '.k { color:' in defs  # keyword rule present → non-empty stylesheet

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
