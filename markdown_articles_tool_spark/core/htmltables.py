"""HTML table extraction — structured (table, row, cell) records out
of crawl pages.

The extraction tier turns a page's ``<table>`` markup into relational
rows a pipeline can query/join, the way every web-data stack needs
price lists, specs, and league tables surfaced.  From-scratch on the
stdlib ``HTMLParser`` (the same tolerant grammar and marked-section
crash armor as the main-content extractor); an INDEPENDENT
second implementation (manual tag scanner) lives in
``tools/oracle_kernels.html_tables_seq`` for the driver's hash gate.

Spec (shared with the twin):

* tables are indexed in DOCUMENT ORDER of their ``<table>`` open tag
  (nested tables get their own index in that same order);
* a row starts at ``<tr>`` (an open row is implicitly flushed — web
  soup omits ``</tr>`` constantly) and belongs to the INNERMOST open
  table; rows are indexed per table;
* a cell starts at ``<td>`` or ``<th>`` (an open cell is implicitly
  closed by the next cell/row/table boundary); its text is the
  concatenated character data of the cell EXCLUDING any nested
  table's content (the nested table is its own table — its text must
  not double-report into the parent cell), whitespace-normalized via
  ``' '.join(text.split())``;
* empty rows (``<tr>`` with no cells) are dropped; cells may be
  empty strings; character references are unescaped (stdlib
  ``convert_charrefs``).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Tuple


class _Frame:
    __slots__ = ('idx', 'rows', 'row', 'cell')

    def __init__(self, idx: int):
        self.idx = idx
        self.rows: List[List[str]] = []
        self.row: List[str] | None = None
        self.cell: List[str] | None = None


class _TableGrabber(HTMLParser):
    def parse_marked_section(self, i: int, report: int = 1) -> int:
        # same '<![foo]' web-soup armor as maincontent/mdparse (r4,
        # DIVERGENCES #14)
        try:
            return super().parse_marked_section(i, report)
        except (AssertionError, NotImplementedError):
            j = self.rawdata.find('>', i + 1)
            return j + 1 if j >= 0 else -1

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.stack: List[_Frame] = []
        self.done: List[Tuple[int, List[List[str]]]] = []
        self.n_seen = 0

    # -- helpers -------------------------------------------------------
    def _close_cell(self):
        f = self.stack[-1]
        if f.cell is not None:
            if f.row is None:
                f.row = []   # cell outside <tr>: soup — give it a row
            f.row.append(' '.join(''.join(f.cell).split()))
            f.cell = None

    def _close_row(self):
        f = self.stack[-1]
        self._close_cell()
        if f.row is not None:
            if f.row:
                f.rows.append(f.row)
            f.row = None

    # -- parser events -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == 'table':
            self.stack.append(_Frame(self.n_seen))
            self.n_seen += 1
        elif not self.stack:
            return
        elif tag == 'tr':
            self._close_row()
            self.stack[-1].row = []
        elif tag in ('td', 'th'):
            self._close_cell()
            self.stack[-1].cell = []

    def handle_endtag(self, tag):
        if not self.stack:
            return
        if tag == 'table':
            self._close_row()
            f = self.stack.pop()
            self.done.append((f.idx, f.rows))
        elif tag == 'tr':
            self._close_row()
        elif tag in ('td', 'th'):
            self._close_cell()

    def handle_data(self, data):
        if self.stack and self.stack[-1].cell is not None:
            self.stack[-1].cell.append(data)


def extract_tables(html) -> List[Tuple[int, int, int, str]]:
    """Flattened (table_idx, row_idx, col_idx, cell) records of one
    document, ordered by (table_idx, row_idx, col_idx)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode('utf-8', errors='replace')
    p = _TableGrabber()
    p.feed(html)
    p.close()
    while p.stack:   # unterminated <table> soup: flush what we have
        p._close_row()
        f = p.stack.pop()
        p.done.append((f.idx, f.rows))
    out = []
    for t_idx, rows in sorted(p.done):
        for r_idx, row in enumerate(rows):
            for c_idx, cell in enumerate(row):
                out.append((t_idx, r_idx, c_idx, cell))
    return out
