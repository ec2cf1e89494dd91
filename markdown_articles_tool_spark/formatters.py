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
* ``pdf`` / ``docx`` — from-scratch minimal writers (r4): a real
  single-font PDF (own objects/content streams/xref; round-tripped by
  core/pdftext.py) and a real OOXML package (stdlib zipfile +
  hand-built WordprocessingML), with structural parity to the element
  classes the reference's renderers walk (headings 1-6, bold/em runs,
  code blocks, list items).  The reference's weasyprint visual layout
  / python-docx object model stay out of scope (libraries absent,
  DIVERGENCES.md #11); both writers are deterministic, unlike
  weasyprint's timestamp-bearing output.
"""

from __future__ import annotations

import html as _html
import re
from typing import List

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


# ---------------------------------------------- PDF / DOCX writers (r4)
#
# The reference renders PDF via markdown→HTML→weasyprint
# (formatters/pdf.py:11-29) and DOCX via markdown→HTML→BeautifulSoup→
# python-docx walking h1-6/img/code/p(bold/em)/ul/ol
# (formatters/docx.py:23-70).  Neither library exists in this
# container, and weasyprint output is timestamp-bearing (out of the
# byte-identical scope by design, SURVEY.md §2.6) — so these are
# FROM-SCRATCH minimal writers with STRUCTURAL parity: the same
# element classes the reference's DOCX walk handles (headings 1-6,
# paragraphs with bold/em runs, code blocks, list items), produced as
# a real single-font PDF (our own objects/content-streams/xref — which
# core/pdftext.py round-trips, the self-check the test pins) and a
# real OOXML .docx (stdlib zipfile + hand-built WordprocessingML).
# Both are DETERMINISTIC (no wall-clock metadata — unlike weasyprint).


_BLOCK_STRIP_INLINE = (
    (_IMG_RE, lambda m: m.group(1)),
    (_LINK_RE, lambda m: m.group(1)),
    (_CODE_RE, lambda m: m.group(1)),
)


def _iter_blocks(text: str):
    """Simplified block events for the PDF/DOCX writers — the element
    classes the reference's DOCX walk handles: ('heading', lvl, text),
    ('para', text), ('code', lang, src), ('item', marker, text).
    Tables/blockquotes degrade to paragraphs (per-row / per-line);
    thematic breaks are skipped (the reference's walk ignores <hr>)."""
    lines = text.split('\n')
    para: List[str] = []
    fence = None
    lang = ''
    buf: List[str] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        if fence is not None:
            m = _FENCE_RE.match(line)
            if m and m.group(1)[0] == fence[0] and len(m.group(1)) >= len(fence):
                yield ('code', lang, '\n'.join(buf))
                fence, buf = None, []
            else:
                buf.append(line)
            i += 1
            continue
        m = _FENCE_RE.match(line)
        if m and not para:
            fence, lang = m.group(1), m.group(2)
            i += 1
            continue
        if not line.strip():
            if para:
                yield ('para', ' '.join(para))
                para = []
            i += 1
            continue
        if _HR_RE.match(line):
            if para:
                yield ('para', ' '.join(para))
                para = []
            i += 1
            continue
        h = _HEADING_RE.match(line)
        if h:
            if para:
                yield ('para', ' '.join(para))
                para = []
            yield ('heading', len(h.group(1)), h.group(2))
            i += 1
            continue
        lm = _ANYLIST_RE.match(line)
        if lm and not para:
            marker = '1.' if lm.group(2)[0].isdigit() else '-'
            yield ('item', marker, lm.group(3))
            i += 1
            continue
        bq = _BLOCKQUOTE_RE.match(line)
        if bq and not para:
            yield ('para', bq.group(1))
            i += 1
            continue
        para.append(line.strip())
        i += 1
    if fence is not None:
        yield ('code', lang, '\n'.join(buf))
    if para:
        yield ('para', ' '.join(para))


def _plain_inline(text: str) -> str:
    """Inline markdown → display text (labels keep, markers drop)."""
    for rx, sub in _BLOCK_STRIP_INLINE:
        text = rx.sub(sub, text)
    text = _BOLD_RE.sub(lambda m: m.group(1), text)
    return _EM_RE.sub(lambda m: m.group(1), text)


# ----- PDF: single Courier font, 72pt margins, deterministic ----------

_PDF_CHARS_PER_LINE = 78      # 468pt usable / 6pt per Courier-10 char
_PDF_LINES_PER_PAGE = 54
_PDF_SIZES = {1: 18, 2: 16, 3: 14, 4: 13, 5: 12, 6: 11}


def _pdf_escape(s: str) -> bytes:
    b = s.encode('latin-1', errors='replace')
    return b.replace(b'\\', b'\\\\').replace(b'(', b'\\(').replace(b')', b'\\)')


def _wrap(s: str, width: int) -> List[str]:
    out: List[str] = []
    cur: List[str] = []
    n = 0
    for w in s.split():
        add = len(w) + (1 if cur else 0)
        if n + add > width and cur:
            out.append(' '.join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    if cur:
        out.append(' '.join(cur))
    return out or ['']


def render_markdown_pdf(text: str) -> bytes:
    """Markdown → a minimal real PDF: one Courier text column, pages of
    54 lines, heading sizes 18..11pt, code verbatim, list prefixes.
    core/pdftext.py extracts the full text back (round-trip test)."""
    # layout into (size, line) rows
    rows: List[tuple] = []
    for ev in _iter_blocks(text or ''):
        if ev[0] == 'heading':
            for li in _wrap(_plain_inline(ev[2]), _PDF_CHARS_PER_LINE):
                rows.append((_PDF_SIZES[ev[1]], li))
            rows.append((10, ''))
        elif ev[0] == 'code':
            for li in ev[2].split('\n'):
                rows.append((10, li[:_PDF_CHARS_PER_LINE]))
            rows.append((10, ''))
        elif ev[0] == 'item':
            wrapped = _wrap(_plain_inline(ev[2]), _PDF_CHARS_PER_LINE - 3)
            rows.append((10, f'{ev[1]} {wrapped[0]}'))
            rows.extend((10, f'   {li}') for li in wrapped[1:])
        else:
            for li in _wrap(_plain_inline(ev[1]), _PDF_CHARS_PER_LINE):
                rows.append((10, li))
            rows.append((10, ''))
    while rows and rows[-1][1] == '':
        rows.pop()
    pages = [rows[i:i + _PDF_LINES_PER_PAGE] for i in range(0, len(rows), _PDF_LINES_PER_PAGE)] or [[]]

    objects: List[bytes] = []   # 1-indexed bodies

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = add(b'<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>')
    page_ids = []
    kids_id = len(objects) + 2 * len(pages) + 1   # pages node comes after page+content pairs
    for page in pages:
        # one BT/ET block per visible line at an explicit y position:
        # core/pdftext.py then recovers the exact line structure
        # (pdf_text joins non-empty blocks with '\n')
        buf = []
        for k, (size, line) in enumerate(page):
            if line:
                buf.append(
                    b'BT /F1 %d Tf 1 0 0 1 72 %d Tm (' % (size, 756 - 12 * k)
                    + _pdf_escape(line) + b') Tj ET'
                )
        stream = b'\n'.join(buf)
        content = add(b'<< /Length %d >>\nstream\n' % len(stream) + stream + b'\nendstream')
        page_ids.append(add(
            b'<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] '
            b'/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>'
            % (kids_id, font, content)
        ))
    pages_id = add(
        b'<< /Type /Pages /Kids [' + b' '.join(b'%d 0 R' % p for p in page_ids)
        + b'] /Count %d >>' % len(page_ids)
    )
    assert pages_id == kids_id
    catalog = add(b'<< /Type /Catalog /Pages %d 0 R >>' % pages_id)

    out = bytearray(b'%PDF-1.4\n')
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b'%d 0 obj\n' % i + body + b'\nendobj\n'
    xref = len(out)
    out += b'xref\n0 %d\n' % (len(objects) + 1)
    out += b'0000000000 65535 f \n'
    for off in offsets[1:]:
        out += b'%010d 00000 n \n' % off
    out += (
        b'trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n'
        % (len(objects) + 1, catalog, xref)
    )
    return bytes(out)


# ----- DOCX: minimal OOXML package (stdlib zipfile) -------------------

_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-'
    'officedocument.wordprocessingml.document.main+xml"/>'
    '<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-'
    'officedocument.wordprocessingml.styles+xml"/>'
    '</Types>'
)
_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships/officeDocument" Target="word/document.xml"/>'
    '</Relationships>'
)
_DOCX_DOC_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships/styles" Target="styles.xml"/>'
    '</Relationships>'
)
_W = 'http://schemas.openxmlformats.org/wordprocessingml/2006/main'
_DOCX_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    f'<w:styles xmlns:w="{_W}">'
    + ''.join(
        f'<w:style w:type="paragraph" w:styleId="Heading{i}">'
        f'<w:name w:val="heading {i}"/><w:rPr><w:b/><w:sz w:val="{40 - 4 * i}"/></w:rPr>'
        f'</w:style>'
        for i in range(1, 7)
    )
    + '<w:style w:type="paragraph" w:styleId="Code">'
    '<w:name w:val="Code"/><w:rPr><w:rFonts w:ascii="Courier New" w:hAnsi="Courier New"/></w:rPr>'
    '</w:style>'
    '<w:style w:type="paragraph" w:styleId="ListParagraph">'
    '<w:name w:val="List Paragraph"/></w:style>'
    '</w:styles>'
)


def _xml_escape(s: str) -> str:
    return _html.escape(s, quote=False)


def _docx_runs(text: str) -> str:
    """Bold/em inline runs — the formatting classes the reference's
    DOCX walk reproduces (formatters/docx.py:44-59)."""
    for rx, sub in _BLOCK_STRIP_INLINE:
        text = rx.sub(sub, text)
    runs: List[str] = []
    pos = 0
    for m in re.finditer(r'\*\*(.+?)\*\*|(?<!\*)\*([^*\s][^*]*?)\*(?!\*)', text):
        if m.start() > pos:
            runs.append(f'<w:r><w:t xml:space="preserve">{_xml_escape(text[pos:m.start()])}</w:t></w:r>')
        if m.group(1) is not None:
            runs.append(
                f'<w:r><w:rPr><w:b/></w:rPr>'
                f'<w:t xml:space="preserve">{_xml_escape(m.group(1))}</w:t></w:r>'
            )
        else:
            runs.append(
                f'<w:r><w:rPr><w:i/></w:rPr>'
                f'<w:t xml:space="preserve">{_xml_escape(m.group(2))}</w:t></w:r>'
            )
        pos = m.end()
    if pos < len(text) or not runs:
        runs.append(f'<w:r><w:t xml:space="preserve">{_xml_escape(text[pos:])}</w:t></w:r>')
    return ''.join(runs)


def render_markdown_docx(text: str) -> bytes:
    """Markdown → a minimal real .docx (WordprocessingML): Heading1-6
    paragraph styles, bold/em runs, Courier code paragraphs, list
    paragraphs with textual markers.  Deterministic zip (fixed
    timestamps, fixed member order)."""
    import io
    import zipfile

    paras: List[str] = []
    for ev in _iter_blocks(text or ''):
        if ev[0] == 'heading':
            paras.append(
                f'<w:p><w:pPr><w:pStyle w:val="Heading{ev[1]}"/></w:pPr>'
                f'{_docx_runs(ev[2])}</w:p>'
            )
        elif ev[0] == 'code':
            for li in ev[2].split('\n'):
                paras.append(
                    f'<w:p><w:pPr><w:pStyle w:val="Code"/></w:pPr>'
                    f'<w:r><w:t xml:space="preserve">{_xml_escape(li)}</w:t></w:r></w:p>'
                )
        elif ev[0] == 'item':
            paras.append(
                f'<w:p><w:pPr><w:pStyle w:val="ListParagraph"/></w:pPr>'
                f'<w:r><w:t xml:space="preserve">{_xml_escape(ev[1] + " ")}</w:t></w:r>'
                f'{_docx_runs(ev[2])}</w:p>'
            )
        else:
            paras.append(f'<w:p>{_docx_runs(ev[1])}</w:p>')
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<w:document xmlns:w="{_W}"><w:body>'
        + ''.join(paras)
        + '<w:sectPr/></w:body></w:document>'
    )
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, 'w', zipfile.ZIP_DEFLATED) as z:
        for name, data in (
            ('[Content_Types].xml', _DOCX_CONTENT_TYPES),
            ('_rels/.rels', _DOCX_RELS),
            ('word/_rels/document.xml.rels', _DOCX_DOC_RELS),
            ('word/styles.xml', _DOCX_STYLES),
            ('word/document.xml', document),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return bio.getvalue()


@pandas_udf(BinaryType())
def format_pdf_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: render_markdown_pdf(t or ''))


@pandas_udf(BinaryType())
def format_docx_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: render_markdown_docx(t or ''))


def format_pdf(text_col: Column) -> Column:
    """R4: from-scratch minimal PDF writer (structural parity; the
    reference's weasyprint visual layout is out of scope and its
    output is timestamp-bearing — ours is deterministic)."""
    return format_pdf_udf(text_col)


def format_docx(text_col: Column) -> Column:
    """R5: from-scratch minimal OOXML writer (structural parity with
    the reference's python-docx element walk)."""
    return format_docx_udf(text_col)


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
