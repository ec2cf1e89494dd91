"""Output formatters (R2-R6, SURVEY.md §2.6) as column stages.

* ``md`` — identity utf-8 encode (formatters/simple.py:6-17): a pure
  Column expression.
* ``html`` — markdown → HTML render wrapped in the reference's fixed
  ``<html><head><style>…`` shell (formatters/html.py:23-39).  The
  renderer is a from-scratch minimal block/inline markdown-to-HTML
  converter running in a pandas UDF; parity with the reference is
  *structural* (python-markdown + pygments are not available here, and
  the reference's own HTML output is not part of the byte-identical
  gate — that gate covers the ``md`` transform).
* ``pdf`` / ``docx`` — require weasyprint / python-docx; import-gated
  stubs that raise ``NotImplementedError`` with a clear message when
  the libraries are absent (formatters/pdf.py, formatters/docx.py).
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator, List

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BinaryType

HTML_HEAD = '<html>\n<head><style>\n</style></head>\n<body>\n'
HTML_TAIL = '\n</body>\n</html>'

_FENCE_RE = re.compile(r'^ {0,3}(`{3,}|~{3,})\s*(\S*)\s*$')
_HEADING_RE = re.compile(r'^(#{1,6})\s+(.*?)\s*#*\s*$')
_ULIST_RE = re.compile(r'^\s{0,3}[-*+]\s+(.*)$')
_OLIST_RE = re.compile(r'^\s{0,3}\d+\.\s+(.*)$')
_IMG_RE = re.compile(r'!\[([^\]]*)\]\(([^)\s]*)(?:\s+"[^"]*")?\)')
_LINK_RE = re.compile(r'(?<!!)\[([^\]]+)\]\(([^)\s]*)(?:\s+"[^"]*")?\)')
_BOLD_RE = re.compile(r'\*\*(.+?)\*\*')
_EM_RE = re.compile(r'(?<!\*)\*([^*\s][^*]*?)\*(?!\*)')
_CODE_RE = re.compile(r'`([^`]+)`')


def _inline(text: str) -> str:
    text = _html.escape(text, quote=False)
    text = _CODE_RE.sub(lambda m: f'<code>{m.group(1)}</code>', text)
    text = _IMG_RE.sub(lambda m: f'<img alt="{m.group(1)}" src="{m.group(2)}" />', text)
    text = _LINK_RE.sub(lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', text)
    text = _BOLD_RE.sub(lambda m: f'<strong>{m.group(1)}</strong>', text)
    text = _EM_RE.sub(lambda m: f'<em>{m.group(1)}</em>', text)
    return text


def render_markdown_html(text: str) -> str:
    """Minimal block-level markdown renderer (from scratch)."""
    out: List[str] = []
    lines = text.split('\n')
    para: List[str] = []
    list_tag = None
    fence = None
    code_buf: List[str] = []

    def flush_para():
        if para:
            out.append(f'<p>{_inline(" ".join(para))}</p>')
            para.clear()

    def close_list():
        nonlocal list_tag
        if list_tag:
            out.append(f'</{list_tag}>')
            list_tag = None

    for line in lines:
        if fence is not None:
            m = _FENCE_RE.match(line)
            if m and m.group(1)[0] == fence[0] and len(m.group(1)) >= len(fence):
                out.append(
                    '<pre><code>' + _html.escape('\n'.join(code_buf)) + '</code></pre>'
                )
                fence = None
                code_buf = []
            else:
                code_buf.append(line)
            continue
        m = _FENCE_RE.match(line)
        if m and not para:
            flush_para()
            close_list()
            fence = m.group(1)
            continue
        if not line.strip():
            flush_para()
            close_list()
            continue
        h = _HEADING_RE.match(line)
        if h:
            flush_para()
            close_list()
            out.append(f'<h{len(h.group(1))}>{_inline(h.group(2))}</h{len(h.group(1))}>')
            continue
        ul = _ULIST_RE.match(line)
        ol = _OLIST_RE.match(line)
        if ul or ol:
            flush_para()
            tag = 'ul' if ul else 'ol'
            if list_tag != tag:
                close_list()
                out.append(f'<{tag}>')
                list_tag = tag
            out.append(f'<li>{_inline((ul or ol).group(1))}</li>')
            continue
        para.append(line.strip())
    if fence is not None:
        out.append('<pre><code>' + _html.escape('\n'.join(code_buf)) + '</code></pre>')
    flush_para()
    close_list()
    return '\n'.join(out)


# --------------------------------------------------------------- stages


def format_md(text_col: Column) -> Column:
    """R2: identity utf-8 bytes (formatters/simple.py:6-17)."""
    return F.encode(text_col, 'utf-8')


@pandas_udf(BinaryType())
def format_html_udf(text: pd.Series) -> pd.Series:
    return text.map(
        lambda t: (HTML_HEAD + render_markdown_html(t or '') + HTML_TAIL).encode('utf-8')
    )


def format_html(text_col: Column) -> Column:
    """R3: markdown → HTML in the reference's fixed shell."""
    return format_html_udf(text_col)


def _unavailable_formatter(name: str, lib: str):
    @pandas_udf(BinaryType())
    def fail_udf(text: pd.Series) -> pd.Series:
        raise NotImplementedError(
            f'{name} formatter requires {lib}, which is not installed in this '
            f'environment; install it and this stage renders via the same '
            f'column contract (binary out)'
        )

    return fail_udf


def format_pdf(text_col: Column) -> Column:
    """R4 (stub unless weasyprint present; output is timestamp-bearing →
    out of byte-identical scope by design, SURVEY.md §2.6)."""
    try:
        import weasyprint  # noqa: F401
    except ImportError:
        return _unavailable_formatter('pdf', 'weasyprint')(text_col)
    raise NotImplementedError('weasyprint present but renderer not wired yet')


def format_docx(text_col: Column) -> Column:
    """R5 (stub unless python-docx present)."""
    try:
        import docx  # noqa: F401
    except ImportError:
        return _unavailable_formatter('docx', 'python-docx')(text_col)
    raise NotImplementedError('python-docx present but renderer not wired yet')


FORMATTERS = {'md': format_md, 'html': format_html, 'pdf': format_pdf, 'docx': format_docx}


def get_formatter(output_format: str):
    """R6 dispatch (formatters/helpers.py:6-15)."""
    if output_format not in FORMATTERS:
        raise AssertionError(f'unknown output format: {output_format}')
    return FORMATTERS[output_format]


def format_documents(docs_out: DataFrame, output_format: str = 'md') -> DataFrame:
    """S7 article sink shape: (url, out_format, content binary)."""
    fmt = get_formatter(output_format)
    return docs_out.select(
        'url', F.lit(output_format).alias('out_format'), fmt(F.col('text_out')).alias('content')
    )
