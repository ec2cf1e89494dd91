"""Output formatters (R2-R6, SURVEY.md §2.6) as column stages.

* ``md`` — identity utf-8 encode (formatters/simple.py:6-17): a pure
  Column expression.
* ``html`` — markdown → HTML render wrapped in the reference's shell
  (formatters/html.py:23-39): ``<html>\n<head><style>\n{pygments
  style defs}\n</style></head>\n<body>\n{md}\n</body>\n</html>``.
  pygments IS installed here, so the two pygments-touching pieces are
  REAL and match the reference exactly: the ``<style>`` shell comes
  from the same ``CustomHtmlFormatter().get_style_defs()`` call, and
  fenced code blocks render through the reference's custom
  ``_wrap_code`` formatter with codehilite's lexer-selection semantics
  (formatters/html.py:10-21; markdown.extensions.codehilite defaults:
  guess_lang, css_class='codehilite', lang_prefix='language-').  The
  block/inline markdown renderer around them is from scratch
  (python-markdown itself is absent); headings carry toc-style ids and
  pipe tables render in python-markdown's table shape.  Full
  python-markdown byte parity stays out of scope while that library is
  absent (DIVERGENCES.md #11).
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

try:
    from pygments import highlight as _pyg_highlight
    from pygments.formatters import HtmlFormatter as _PygHtmlFormatter
    from pygments.lexers import get_lexer_by_name as _get_lexer_by_name
    from pygments.lexers import guess_lexer as _guess_lexer

    _HAVE_PYGMENTS = True
except ImportError:  # pragma: no cover - pygments is installed here
    _HAVE_PYGMENTS = False


if _HAVE_PYGMENTS:

    class CustomHtmlFormatter(_PygHtmlFormatter):
        """The reference's pygments formatter (formatters/html.py:10-21):
        injects ``{lang_prefix}{lang}`` as the ``<code>`` class."""

        def __init__(self, lang_str='', **options):
            super().__init__(**options)
            self.lang_str = lang_str

        def _wrap_code(self, source):
            yield 0, f'<code class="{self.lang_str}">'
            yield from source
            yield 0, '</code>'

    def _style_defs() -> str:
        return CustomHtmlFormatter().get_style_defs()

    def _render_fence(src: str, lang: str) -> str:
        """codehilite's lexer selection + the custom formatter
        (markdown.extensions.codehilite.CodeHilite.hilite semantics:
        named lexer, else guess, else plaintext; lang_str from the
        explicit language or the guessed lexer's first alias)."""
        try:
            lexer = _get_lexer_by_name(lang) if lang else _guess_lexer(src)
        except Exception:
            try:
                lexer = _guess_lexer(src) if lang else _get_lexer_by_name('text')
            except Exception:
                lexer = _get_lexer_by_name('text')
        lang_str = f'language-{lang or lexer.aliases[0]}'
        formatter = CustomHtmlFormatter(
            lang_str=lang_str, cssclass='codehilite', wrapcode=True
        )
        return _pyg_highlight(src, lexer, formatter).rstrip('\n')

else:  # pragma: no cover

    def _style_defs() -> str:
        return ''

    def _render_fence(src: str, lang: str) -> str:
        return '<pre><code>' + _html.escape(src) + '</code></pre>'


def html_shell(body: str) -> str:
    """The reference's exact output shell (formatters/html.py:38-39)."""
    return (
        f'<html>\n<head><style>\n{_style_defs()}\n</style></head>\n'
        f'<body>\n{body}\n</body>\n</html>'
    )


_TOC_NONWORD_RE = re.compile(r'[^\w\s-]')
_TOC_DASH_RE = re.compile(r'[-\s]+')


def _toc_slugify(value: str, seen: dict) -> str:
    """toc-extension id slugs (markdown.extensions.toc.slugify +
    unique): NFKD → ascii → lower → strip non-word → dashes; duplicate
    ids get ``_1``, ``_2``, … suffixes."""
    import unicodedata

    v = unicodedata.normalize('NFKD', value).encode('ascii', 'ignore').decode('ascii')
    v = _TOC_NONWORD_RE.sub('', v).strip().lower()
    slug = _TOC_DASH_RE.sub('-', v)
    if slug in seen:
        seen[slug] += 1
        return f'{slug}_{seen[slug]}'
    seen[slug] = 0
    return slug

_FENCE_RE = re.compile(r'^ {0,3}(`{3,}|~{3,})\s*(\S*)\s*$')
_HEADING_RE = re.compile(r'^(#{1,6})\s+(.*?)\s*#*\s*$')
_ULIST_RE = re.compile(r'^\s{0,3}[-*+]\s+(.*)$')
_OLIST_RE = re.compile(r'^\s{0,3}\d+\.\s+(.*)$')
_ANYLIST_RE = re.compile(r'^(\s*)([-*+]|\d+\.)\s+(.*)$')
_HR_RE = re.compile(r'^ {0,3}((\*[ \t]*){3,}|(-[ \t]*){3,}|(_[ \t]*){3,})$')
_BLOCKQUOTE_RE = re.compile(r'^ {0,3}> ?(.*)$')
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


def _slug_source(text: str) -> str:
    """Heading text as the toc extension sees it: rendered content, not
    raw markdown — links/images collapse to their labels, emphasis and
    code markers drop."""
    t = _IMG_RE.sub(lambda m: m.group(1), text)
    t = _LINK_RE.sub(lambda m: m.group(1), t)
    t = _CODE_RE.sub(lambda m: m.group(1), t)
    t = _BOLD_RE.sub(lambda m: m.group(1), t)
    return _EM_RE.sub(lambda m: m.group(1), t)


def _render_list_items(items: List[tuple]) -> str:
    """Render [(indent, tag, text)] item runs as (possibly nested)
    lists.  A deeper-indented item (any increase >= 2 spaces) nests
    inside the preceding item's ``<li>``; a tag switch among siblings
    closes the list and opens the other kind."""
    out: List[str] = []
    i = 0
    while i < len(items):
        tag = items[i][1]
        out.append(f'<{tag}>')
        while i < len(items) and items[i][1] == tag:
            ind, _t, txt = items[i]
            j = i + 1
            while j < len(items) and items[j][0] >= ind + 2:
                j += 1
            children = items[i + 1:j]
            if children:
                out.append(f'<li>{_inline(txt)}\n{_render_list_items(children)}\n</li>')
            else:
                out.append(f'<li>{_inline(txt)}</li>')
            i = j
        out.append(f'</{tag}>')
    return '\n'.join(out)


_TABLE_SEP_CELL_RE = re.compile(r':?-+:?')


def _is_table_sep(line: str) -> bool:
    s = line.strip()
    if '|' not in s:
        return False
    cells = [c.strip() for c in s.strip('|').split('|')]
    return bool(cells) and all(_TABLE_SEP_CELL_RE.fullmatch(c) for c in cells)


def _split_row(line: str) -> List[str]:
    cells = line.strip().strip('|').split('|')
    return [c.strip() for c in cells]


def _table_align(sep_cells: List[str]) -> List[str]:
    out = []
    for c in sep_cells:
        left, right = c.startswith(':'), c.endswith(':')
        out.append(
            'center' if left and right else 'right' if right else 'left' if left else ''
        )
    return out


def render_markdown_html(text: str, _slugs_seen: dict | None = None) -> str:
    """Minimal block-level markdown renderer (from scratch; fenced code
    goes through pygments/codehilite, headings carry toc ids, pipe
    tables render in python-markdown's table shape).

    ``_slugs_seen`` threads the per-document slug registry through the
    blockquote recursion so heading ids stay unique across the WHOLE
    document, quoted headings included."""
    out: List[str] = []
    lines = text.split('\n')
    para: List[str] = []
    fence = None
    fence_lang = ''
    code_buf: List[str] = []
    slugs_seen: dict = {} if _slugs_seen is None else _slugs_seen

    def flush_para():
        if para:
            out.append(f'<p>{_inline(" ".join(para))}</p>')
            para.clear()

    i = 0
    while i < len(lines):
        line = lines[i]
        if fence is not None:
            m = _FENCE_RE.match(line)
            if m and m.group(1)[0] == fence[0] and len(m.group(1)) >= len(fence):
                out.append(_render_fence('\n'.join(code_buf), fence_lang))
                fence = None
                code_buf = []
            else:
                code_buf.append(line)
            i += 1
            continue
        m = _FENCE_RE.match(line)
        if m and not para:
            flush_para()
            fence, fence_lang = m.group(1), m.group(2)
            i += 1
            continue
        if not line.strip():
            flush_para()
            i += 1
            continue
        # thematic break — BEFORE the list check ('- - -' matches both)
        if _HR_RE.match(line):
            flush_para()
            out.append('<hr />')
            i += 1
            continue
        h = _HEADING_RE.match(line)
        if h:
            flush_para()
            hid = _toc_slugify(_slug_source(h.group(2)), slugs_seen)
            lvl = len(h.group(1))
            out.append(f'<h{lvl} id="{hid}">{_inline(h.group(2))}</h{lvl}>')
            i += 1
            continue
        # blockquote run: strip one '>' level, render inner markdown
        # recursively (nested quotes fall out of the recursion; lazy
        # continuation lines are NOT joined — DIVERGENCES #11)
        if _BLOCKQUOTE_RE.match(line) and not para:
            inner: List[str] = []
            while i < len(lines):
                bm = _BLOCKQUOTE_RE.match(lines[i])
                if not bm:
                    break
                inner.append(bm.group(1))
                i += 1
            inner_html = render_markdown_html('\n'.join(inner), _slugs_seen=slugs_seen)
            out.append(f'<blockquote>\n{inner_html}\n</blockquote>')
            continue
        # pipe table: header row + delimiter row ('tables' extension shape)
        if (
            '|' in line
            and not para
            and i + 1 < len(lines)
            and _is_table_sep(lines[i + 1])
        ):
            header = _split_row(line)
            align = _table_align(_split_row(lines[i + 1]))
            align += [''] * (len(header) - len(align))

            def cell(tag, idx, content):
                style = f' style="text-align: {align[idx]};"' if idx < len(align) and align[idx] else ''
                return f'<{tag}{style}>{_inline(content)}</{tag}>'

            out.append('<table>\n<thead>\n<tr>')
            out.extend(cell('th', j, c) for j, c in enumerate(header))
            out.append('</tr>\n</thead>\n<tbody>')
            i += 2
            while i < len(lines) and '|' in lines[i] and lines[i].strip():
                row = _split_row(lines[i])
                row += [''] * (len(header) - len(row))
                out.append('<tr>')
                out.extend(cell('td', j, c) for j, c in enumerate(row[: len(header)]))
                out.append('</tr>')
                i += 1
            out.append('</tbody>\n</table>')
            continue
        if (_ULIST_RE.match(line) or _OLIST_RE.match(line)) and not para:
            # list run: consecutive item lines (any indent); nesting by
            # indentation handled in _render_list_items
            items: List[tuple] = []
            while i < len(lines):
                lm = _ANYLIST_RE.match(lines[i])
                if not lm or _HR_RE.match(lines[i]):
                    break
                tag = 'ol' if lm.group(2)[0].isdigit() else 'ul'
                items.append((len(lm.group(1)), tag, lm.group(3)))
                i += 1
            out.append(_render_list_items(items))
            continue
        para.append(line.strip())
        i += 1
    if fence is not None:
        out.append(_render_fence('\n'.join(code_buf), fence_lang))
    flush_para()
    return '\n'.join(out)


# --------------------------------------------------------------- stages


def format_md(text_col: Column) -> Column:
    """R2: identity utf-8 bytes (formatters/simple.py:6-17)."""
    return F.encode(text_col, 'utf-8')


@pandas_udf(BinaryType())
def format_html_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: html_shell(render_markdown_html(t or '')).encode('utf-8'))


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
