"""Kernel-independence gate (r2 judge advice #3 / ADVICE low #5).

The sequential oracle (tools/gen_oracleref.py) must not share sketch
kernels with the engine under test — otherwise a semantic bug inside a
shared kernel passes the driver's DuckDB gate by agreeing with itself.
These tests pin:

1. engine kernel == independent oracle kernel (tools/oracle_kernels.py)
   across edge cases and random inputs — a divergence in EITHER
   implementation fails here before it can silently corrupt oracleref;
2. hand-pinned golden constants (computed once, stored as literals) so
   both implementations drifting together is also caught.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

import oracle_extract as ox  # noqa: E402
import oracle_kernels as ok  # noqa: E402

from markdown_articles_tool_spark.training import dedup as D  # noqa: E402
from markdown_articles_tool_spark.training import similarity as S  # noqa: E402

TEXTS = [
    '',
    None,
    'a',
    ' ',
    'ab',
    'abcde',
    'abcdef',
    'hello world',
    'Hello  WORLD\t\nhello world',
    'Der große Überblick мир мир test 123 !@# ' * 20,
    'the quick brown fox jumps over the lazy dog ' * 10,
    '😀 emoji ✓ text ' * 3,
]


class TestTextKernels:
    @pytest.mark.parametrize('t', TEXTS)
    def test_minhash_signature(self, t):
        assert ok.minhash_signature(t, 64, 5) == D.minhash_signature(t, 64, 5)
        assert ok.minhash_signature(t, 16, 3) == D.minhash_signature(t, 16, 3)

    @pytest.mark.parametrize('t', TEXTS)
    def test_simhash(self, t):
        assert ok.simhash64(t) == D.simhash64(t)
        # the vectorized batch kernel too
        assert D._simhash_batch([t]) == [D.simhash64(t)]

    @pytest.mark.parametrize('t', TEXTS)
    def test_word_ngrams(self, t):
        assert ok.word_ngram_set(t, 3) == D.word_ngrams_seq(t, 3)

    def test_jaccard(self):
        a, b = frozenset({'x y z', 'y z w'}), frozenset({'x y z', 'q r s'})
        assert ok.jaccard(a, b) == D.ngram_jaccard_seq(a, b)
        assert ok.jaccard(frozenset(), frozenset()) == 0.0

    def test_golden_constants(self):
        """Hand-pinned literals — catch BOTH implementations drifting
        together (e.g. an edit to the shingle scheme that forgets to
        regenerate oracleref)."""
        assert ok.minhash_signature('hello world', 8, 5)[:3] == [
            12479632922541722, 272962221328054682, 133697535932217053,
        ]
        assert ok.simhash64('the quick brown fox') == 202806156967688757
        assert ok.simhash64('') == 0

    @pytest.mark.parametrize('t', TEXTS)
    def test_winnow_fingerprints(self, t):
        assert set(D.winnow_fingerprints(t or '', 25, 16)) == ok.winnow_fingerprint_set(t or '', 25, 16)
        assert set(D.winnow_fingerprints(t or '', 5, 4)) == ok.winnow_fingerprint_set(t or '', 5, 4)

    def test_winnow_guarantee_and_ties(self):
        """Winnowing guarantee: any shared substring of >= k+w-1 chars
        yields >= 1 shared fingerprint; rightmost-tie selection agrees
        between the numpy reversed-argmin and the scan twin on
        repetitive (tie-heavy) inputs."""
        shared = 'this exact span of text is long enough to fingerprint reliably'
        a = 'prefix one two three ' + shared + ' suffix alpha'
        b = 'completely different lead-in ' + shared + ' other tail'
        fa, fb = set(D.winnow_fingerprints(a)), set(D.winnow_fingerprints(b))
        assert fa & fb
        assert not (set(D.winnow_fingerprints('nothing in common here at all qqq'))
                    & set(D.winnow_fingerprints('zzz totally unrelated content')))
        for rep in ('ab' * 200, 'x' * 500, 'abcabcabc' * 40):
            assert set(D.winnow_fingerprints(rep, 5, 8)) == ok.winnow_fingerprint_set(rep, 5, 8)


class TestEmbeddingKernels:
    @pytest.fixture(scope='class')
    def mat(self):
        rng = np.random.default_rng(7)
        # float32-valued (like the embeddings table) in float64 math
        return rng.standard_normal((300, 24)).astype('float32').astype('float64')

    def test_band_keys(self, mat):
        assert (ok.pack_band_keys(mat, 64, 8) == S._pack_band_keys(mat, 64, 8)).all()
        assert (ok.pack_band_keys(mat, 32, 8) == S._pack_band_keys(mat, 32, 8)).all()

    def test_band_keys_golden(self):
        assert ok.pack_band_keys(np.ones((1, 4)), 16, 8)[0].tolist() == [61, 109]

    def test_kmeans_and_ivf(self, mat):
        c1 = ok.kmeans_centroids(mat, 8)
        c2 = S.kmeans_centroids_from_matrix(mat, 8)
        assert np.array_equal(c1, c2)
        assert np.array_equal(ok.ivf_assign(mat, c1, 4), S.ivf_assign(mat, c2, 4))

    def test_cosine_fold(self, mat):
        for i, j in [(0, 1), (2, 2), (5, 17)]:
            a, b = list(mat[i]), list(mat[j])
            assert ok.cosine(a, b) == S.cosine_seq(a, b)
        assert ok.cosine([0.0, 0.0], [1.0, 2.0]) == 0.0

    def test_round_half_up(self):
        for x in [0.1234567895, -0.9999999995, 1.5e-10, 0.123456789349999]:
            assert ok.round9(x) == S.spark_round9(x)
        assert ok.round_half_up(2.675, 2) == S.spark_round(2.675, 2)


class TestMainContent:
    """Engine kernel (core/maincontent.py) vs independent oracle kernel
    (oracle_kernels.main_content_*) — born de-shared; any drift fails
    here."""

    FRAGS = [
        None, b'', b'plain text no tags at all but long enough to keep here ok',
        b'<p>short</p>',
        b'<div><p>nested paragraph with enough characters to be kept</p>trailing</div>',
        b'<ul><li><a href="/x">all link text in this list item block</a></li></ul>',
        b'</p>unbalanced close<p>opened but never closed with sufficient length here',
        b'<script>drop<p>this too</p></script><p>kept paragraph of ample length indeed</p>',
        b'<br/><hr><p>void elements<br>split this rather long paragraph into parts</p>',
        b'<P>UPPERCASE tags folded to lower by the parser with enough text to keep</P>',
        '<p>entités &amp; caract&egrave;res unicodés résolus correctement ici même</p>'.encode(),
        b'\xff\xfe broken utf8 <p>still parsed with replacement chars and kept if long</p>',
        b'<table><tr><td>cell one has plenty of textual content to keep</td>'
        b'<td><a href="/y">link</a></td></tr></table>',
        b'<noscript><p>dropped</p></noscript><aside>cookie</aside>'
        b'<main><p>the real main content sentence lives here</p></main>',
        b'<nav><a href="/1">one</a><a href="/2">two</a></nav><article><h1>A headline '
        b'that is long enough to keep</h1><p>body text of suitable length right here'
        b'</p></article><footer><a href="/t">terms</a></footer>',
    ]

    def test_kernels_agree_on_fragments_and_corpus(self):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.core import maincontent as mc

        for f in self.FRAGS + [corpus.doc_html(i) for i in range(80)]:
            eng = mc.extract_blocks(f)
            ora = ok.main_content_blocks(f)
            assert [(b.ord, b.tag, b.text, b.total_raw, b.link_raw, b.kept) for b in eng] == ora
            assert mc.main_text(eng) == ok.main_content_text(ora)
            assert mc.spans(eng) == ok.main_content_spans(ora)

    def test_boilerplate_actually_stripped(self):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.core import maincontent as mc

        text = mc.main_text(mc.extract_blocks(corpus.doc_html(3)))
        assert 'cookies' not in text          # aside dropped
        assert 'Category' not in text         # nav link farm dropped
        assert 'Related post' not in text     # link-dense div dropped
        assert 'Privacy' not in text          # footer dropped
        assert len(text) > 100                # article prose kept

    def test_span_offsets_index_main_text(self):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.core import maincontent as mc

        blocks = mc.extract_blocks(corpus.doc_html(7))
        text = mc.main_text(blocks)
        for (ordi, tag, n_chars, dens, kept, start, end), b in zip(mc.spans(blocks), blocks):
            if kept:
                assert text[start:end] == b.text
            else:
                assert (start, end) == (-1, -1)


class TestPdfText:
    """Engine kernel (core/pdftext.py) vs independent oracle kernel
    (oracle_kernels.pdf_blocks) — regex-based vs manual scanners."""

    def frags(self):
        import zlib

        from markdown_articles_tool_spark import corpus

        return [corpus.doc_pdf(i) for i in range(80)] + [
            None, b'', b'not a pdf at all',
            b'%PDF-1.4\nstream\nBT (plain) Tj ET\nendstream\n',
            b'stream\nBT (no eol before endstream) Tj ETendstream',
            b'stream\nBT (esc \\(x\\) \\n \\101 \\8) Tj ET\nendstream\n',
            b'stream\nBT [ (arr1) -3 (arr2) ] TJ (solo) Tj (dropped) Td ET\nendstream\n',
            b'stream\nBT (nested (parens) ok) Tj ET\nendstream\n',
            b"stream\nBT (quote op) ' ET\nendstream\n",
            b'stream\r\nBT (crlf stream) Tj ET\r\nendstream\n',
            b'stream\n' + zlib.compress(b'BT (deflated text here) Tj ET') + b'\nendstream\n',
            b'stream\nBT ET\nendstream\nstream\nBT (second stream) Tj ET\nendstream\n',
            b'endstream stream\nBT (tricky) Tj ET\nendstream',
            b'stream\nBT [ (unclosed array TJ (x) Tj ET\nendstream\n',
            # malformed boundary shapes (code-review r3): a 'stream'
            # embedded in 'endstream' is not a keyword; a candidate
            # whose first endstream lacks a preceding EOL is discarded,
            # not extended to the next endstream
            b'endstream\nBT (x) Tj ET\nendstream',
            b'stream\nAAAendstream\nBT (y) Tj ET\nendstream',
            b'stream\nAAAendstream\nstream\nBT (z) Tj ET\nendstream\n',
            # hex strings (r4): <..> Tj, odd digit count, embedded
            # whitespace/junk, hex inside TJ arrays, dict <<>> non-string,
            # unterminated '<', hex with quote operator
            b'stream\nBT <48656C6C6F> Tj ET\nendstream\n',
            b'stream\nBT <48656C6C6F7> Tj ET\nendstream\n',
            b'stream\nBT <48 65\n6C zz 6C6F> Tj ET\nendstream\n',
            b'stream\nBT [ <6869> -200 (lit) <21> ] TJ ET\nendstream\n',
            b'stream\nBT <</MCID 0>> BDC (kept) Tj ET\nendstream\n',
            b'stream\nBT <6869 Tj (after) Tj ET\nendstream\n',
            b"stream\nBT <686F> ' ET\nendstream\n",
            b'stream\nBT <> Tj (x) Tj ET\nendstream\n',
            b'stream\nBT <4A4B> Td (dropped-hex-op) Tj ET\nendstream\n',
        ] + self.tounicode_frags() + self.lzw_frags() + self.objstm_frags() + self.encoding_frags()

    def test_lzw_roundtrip_and_decoders_agree(self):
        """corpus.lzw_encode → both independent decoders (engine
        per-byte accumulator vs twin whole-stream bit cursor) recover
        the input, across width bumps and the 12-bit table-ceiling
        clear; invalid streams raise in both."""
        import random

        from markdown_articles_tool_spark.core.pdftext import lzw_decode
        from markdown_articles_tool_spark.corpus import lzw_encode

        rng = random.Random(11)
        cases = [b'', b'A', b'TOBEORNOTTOBEORTOBEORNOT', bytes(range(256)) * 2]
        for n in (700, 760, 3000, 40000):
            cases.append(bytes(rng.randrange(256) for _ in range(n)))
            cases.append(bytes(rng.randrange(3) for _ in range(n)))
        for d in cases:
            enc = lzw_encode(d)
            assert lzw_decode(enc) == d
            assert ok._lzw_decode_twin(enc) == d
        for bad in (b'\xff\xff\xff', b'\x7f\xff\x00'):
            for dec in (lzw_decode, ok._lzw_decode_twin):
                try:
                    dec(bad)
                except ValueError:
                    pass

    @staticmethod
    def lzw_frags():
        from markdown_articles_tool_spark.corpus import lzw_encode

        payload = b'BT (lzw text here) Tj ET\nBT [ (a) -2 (b) ] TJ ET'
        return [
            b'1 0 obj\n<< /Filter /LZWDecode >>\nstream\n' + lzw_encode(payload)
            + b'\nendstream\nendobj\n',
            # marker present but stream is NOT lzw: raw fallback
            b'1 0 obj\n<< /Filter /LZWDecode >>\nstream\n' + payload
            + b'\nendstream\nendobj\n',
            # no marker: lzw bytes stay undecoded (no guessing)
            b'1 0 obj\n<< >>\nstream\n' + lzw_encode(payload) + b'\nendstream\nendobj\n',
            # marker in a PREVIOUS object must not leak into this stream
            b'1 0 obj\n<< /Filter /LZWDecode >>\nendobj\n2 0 obj\n<< >>\nstream\n'
            + payload + b'\nendstream\nendobj\n',
        ]

    @staticmethod
    def tounicode_frags():
        """ToUnicode CMap shapes (r4): identity 2-byte bfrange, 1-byte
        bfchar fallback, array bfrange, Flate CMaps, dangling refs,
        malformed CMap bodies, Tf state across blocks."""
        import zlib

        def doc(cmap: bytes, content: bytes, compress=False, font_extra=b''):
            if compress:
                cmap = zlib.compress(cmap)
            return (
                b'1 0 obj\n<< /Resources << /Font << /FX 5 0 R >> >> >>\nendobj\n'
                b'5 0 obj\n<< /Type /Font ' + font_extra + b'/ToUnicode 7 0 R >>\nendobj\n'
                b'7 0 obj\n<< >>\nstream\n' + cmap + b'\nendstream\nendobj\n'
                b'9 0 obj\n<< >>\nstream\n' + content + b'\nendstream\nendobj\n'
            )

        ident = b'1 beginbfrange <0000> <FFFF> <0000> endbfrange'
        one = (b'2 beginbfchar <41> <03A9> <42> <00480069> endbfchar\n'
               b'1 beginbfrange <61> <63> <0391> endbfrange')
        arr = b'1 beginbfrange <41> <43> [ <0058> <0059> <005A> ] endbfrange'
        u16 = 'héllo ünïcode'.encode('utf-16-be').hex().encode()
        return [
            doc(ident, b'BT /FX 12 Tf <' + u16 + b'> Tj ET\n'),
            doc(ident, b'BT /FX 12 Tf <' + u16 + b'> Tj ET\n', compress=True),
            doc(one, b'BT /FX 9 Tf (AaBbc) Tj <4161> Tj ET\n'),
            doc(arr, b'BT /FX 9 Tf (ABCD) Tj ET\n'),
            # font state persists across BT blocks within a stream
            doc(one, b'BT /FX 9 Tf (Aa) Tj ET\nBT (bB) Tj ET\n'),
            # string BEFORE any Tf: raw; after: mapped
            doc(one, b'BT (Aa raw) Tj /FX 9 Tf (Aa mapped) Tj ET\n'),
            # odd trailing byte under a 2-byte cmap is dropped
            doc(ident, b'BT /FX 12 Tf <004100> Tj ET\n'),
            # unmapped 2-byte code -> replacement char
            doc(b'1 beginbfchar <0041> <005A> endbfchar', b'BT /FX 12 Tf <00410042> Tj ET\n'),
            # dangling /ToUnicode ref: no cmap, text stays raw
            doc(ident, b'BT /FX 12 Tf (plain) Tj ET\n')[:40] +
            b'5 0 obj\n<< /ToUnicode 99 0 R >>\nendobj\n'
            b'9 0 obj\n<< >>\nstream\nBT /FX 12 Tf (plain) Tj ET\n\nendstream\nendobj\n',
            # malformed cmap bodies: never crash, parse what's valid
            doc(b'beginbfchar <41', b'BT /FX 9 Tf (A) Tj ET\n'),
            doc(b'beginbfrange <41> <3F> <99> endbfrange', b'BT /FX 9 Tf (A) Tj ET\n'),
            doc(b'beginbfrange <41> [ <58> endbfrange', b'BT /FX 9 Tf (A) Tj ET\n'),
            doc(b'beginbfchar <xyz> <41> <42> <43> endbfchar', b'BT /FX 9 Tf (AB) Tj ET\n'),
            # unknown font name in Tf: raw
            doc(one, b'BT /NOPE 9 Tf (Aa) Tj ET\n'),
        ]

    @staticmethod
    def objstm_frags():
        """PDF 1.5 object-stream shapes (r5): font + resource dicts
        packed inside /ObjStm containers (Flate and raw), malformed
        headers, a container whose stream must be excluded from text
        enumeration, and an xref-stream exclusion case."""
        import zlib

        o20 = b'<< /Type /Page /Resources << /Font << /FZ 21 0 R >> >> >>'
        o21 = b'<< /Type /Font /ToUnicode 22 0 R >>'
        # objects serialized o21 first (offset 0) then o20 — the header
        # binds numbers to offsets positionally
        header = ('21 0 20 %d' % (len(o21) + 1)).encode()
        first = len(header) + 1
        payload = header + b'\n' + o21 + b'\n' + o20
        cmap = b'1 beginbfchar <41> <03A9> endbfchar'
        tail = (b'22 0 obj\n<< >>\nstream\n' + cmap + b'\nendstream\nendobj\n'
                b'30 0 obj\n<< >>\nstream\nBT /FZ 9 Tf (AB) Tj ET\nendstream\nendobj\n')

        def stm(pl, dict_extra=b''):
            return (b'19 0 obj\n<< /Type /ObjStm /N 2 /First '
                    + str(first).encode() + dict_extra
                    + b' >>\nstream\n' + pl + b'\nendstream\nendobj\n')

        return [
            stm(zlib.compress(payload), b' /Filter /FlateDecode') + tail,
            stm(payload) + tail,                             # raw payload
            # malformed: /First beyond payload -> container skipped
            (b'19 0 obj\n<< /Type /ObjStm /N 2 /First 9999 >>\nstream\n'
             + payload + b'\nendstream\nendobj\n' + tail),
            # missing /N -> skipped
            (b'19 0 obj\n<< /Type /ObjStm /First ' + str(first).encode()
             + b' >>\nstream\n' + payload + b'\nendstream\nendobj\n' + tail),
            # header shorter than 2N ints -> partial pairs only
            (b'19 0 obj\n<< /Type /ObjStm /N 5 /First ' + str(first).encode()
             + b' >>\nstream\n' + payload + b'\nendstream\nendobj\n' + tail),
            # a BT inside an ObjStm payload must NOT become text
            (b'19 0 obj\n<< /Type /ObjStm /N 1 /First 4 >>\nstream\n'
             + b'7 0 BT (hidden in container) Tj ET\nendstream\nendobj\n'
             b'30 0 obj\n<< >>\nstream\nBT (visible) Tj ET\nendstream\nendobj\n'),
            # xref streams are binary, excluded from enumeration
            (b'40 0 obj\n<< /Type /XRef /W [1 2 1] >>\nstream\n'
             b'\x01\x02BT (junk) Tj ET\x03\nendstream\nendobj\n'
             b'30 0 obj\n<< >>\nstream\nBT (real) Tj ET\nendstream\nendobj\n'),
        ]

    @staticmethod
    def encoding_frags():
        """Font /Encoding fallback shapes (r5): WinAnsi / MacRoman
        direct names, inline dict with /Differences, indirect encoding
        object, uniXXXX names, unknown names, ToUnicode priority."""
        def doc(font, extra=b'', content=b'BT /FE 9 Tf (abe \\351\\200) Tj ET'):
            return (b'2 0 obj\n<< /Resources << /Font << /FE 3 0 R >> >> >>\nendobj\n'
                    b'3 0 obj\n' + font + b'\nendobj\n' + extra +
                    b'40 0 obj\n<< >>\nstream\n' + content + b'\nendstream\nendobj\n')

        return [
            doc(b'<< /Type /Font /Encoding /WinAnsiEncoding >>'),
            doc(b'<< /Type /Font /Encoding /MacRomanEncoding >>'),
            doc(b'<< /Type /Font /Encoding << /BaseEncoding /WinAnsiEncoding'
                b' /Differences [ 97 /alpha /nosuchglyph 101 /uni0041 /u00E9 ] >> >>'),
            doc(b'<< /Type /Font /Encoding 7 0 R >>',
                extra=b'7 0 obj\n<< /Differences [ 98 /Euro 233 /oe ] >>\nendobj\n'),
            # dangling encoding ref -> no table, raw text
            doc(b'<< /Type /Font /Encoding 99 0 R >>'),
            # unknown direct encoding name -> no table
            doc(b'<< /Type /Font /Encoding /PDFDocEncoding >>'),
            # ToUnicode beats /Encoding when both parse
            doc(b'<< /Type /Font /Encoding /WinAnsiEncoding /ToUnicode 8 0 R >>',
                extra=b'8 0 obj\n<< >>\nstream\n1 beginbfchar <61> <005A> endbfchar'
                      b'\nendstream\nendobj\n'),
            # Differences with out-of-range and wrapping codes
            doc(b'<< /Type /Font /Encoding << /Differences'
                b' [ 300 /A 255 /bullet /ignored-wraps-past-255 ] >> >>'),
        ]

    def test_objstm_and_encoding_golden(self):
        """Pinned end-to-end behavior of the r5 PDF tier."""
        from markdown_articles_tool_spark.core import pdftext as P

        flate = self.objstm_frags()[0]
        assert P.extract_pdf_blocks(flate) == [(1, 0, 'ΩB')]
        raw = self.objstm_frags()[1]
        assert P.extract_pdf_blocks(raw) == [(1, 0, 'ΩB')]
        hidden = self.objstm_frags()[5]
        assert P.extract_pdf_blocks(hidden) == [(0, 0, 'visible')]
        xref = self.objstm_frags()[6]
        assert P.extract_pdf_blocks(xref) == [(0, 0, 'real')]
        win = self.encoding_frags()[0]
        assert P.extract_pdf_blocks(win) == [(0, 0, 'abe é€')]
        diff = self.encoding_frags()[2]
        # 97->alpha, 98->nosuchglyph(U+FFFD), 101->uni0041; e9/80 from cp1252
        assert P.extract_pdf_blocks(diff) == [(0, 0, 'α�A é€')]
        pri = self.encoding_frags()[6]
        # ToUnicode wins: 'a'->Z via bfchar, other bytes chr() fallback
        # (the CMap stream precedes the content stream -> stream_idx 1)
        assert P.extract_pdf_blocks(pri) == [(1, 0, 'Zbe \xe9\x80')]

    def test_kernels_agree(self):
        from markdown_articles_tool_spark.core import pdftext as P

        for f in self.frags():
            eng = P.extract_pdf_blocks(f)
            assert eng == ok.pdf_blocks(f), (f[:60] if f else f)
            assert P.pdf_text(eng) == ok.pdf_text(ok.pdf_blocks(f))
            assert P.pdf_spans(eng) == ok.pdf_spans(ok.pdf_blocks(f))

    def test_semantics_golden(self):
        from markdown_articles_tool_spark.core import pdftext as P

        blocks = P.extract_pdf_blocks(
            b'stream\nBT [ (a) -3 (b) ] TJ (c) Tj (skip) Td ET\nendstream\n'
            b'stream\n' + __import__('zlib').compress(b"BT (d) ' ET") + b'\nendstream\n'
        )
        assert blocks == [(0, 0, 'abc'), (1, 0, 'd')]
        assert P.pdf_text(blocks) == 'abc\nd'

    def test_escapes_golden(self):
        from markdown_articles_tool_spark.core import pdftext as P

        blocks = P.extract_pdf_blocks(
            b'stream\nBT (x\\(1\\) \\n\\t \\101\\102 y\\\n z) Tj ET\nendstream\n'
        )
        assert blocks == [(0, 0, 'x(1) \n\t AB y z')]


class TestBpe:
    """Engine BPE (training/bpe.py: leftmost-lowest-rank single merge
    per iteration, memoized) vs independent twin (oracle_kernels
    .bpe_encode: published GPT-2 all-occurrences loop)."""

    def test_encode_agrees_on_corpus(self):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.training import bpe

        for t in TEXTS:
            assert bpe.encode(t or '') == ok.bpe_encode(t or '', bpe.MERGES, bpe.PRETOK_PATTERN)
        for i in range(150):
            t = corpus.doc_text(i)
            assert bpe.encode(t) == ok.bpe_encode(t, bpe.MERGES, bpe.PRETOK_PATTERN), i

    def test_merge_table_pinned_to_trainer(self):
        """The embedded vocab must be exactly what train_merges yields
        on the seed corpus — the table cannot silently drift."""
        from markdown_articles_tool_spark.training import bpe

        assert bpe.train_merges(bpe.seed_corpus(), 1024) == bpe.MERGES
        assert len(bpe.MERGES) == 607  # freq-2 cutoff exhausts before 1024

    def test_golden(self):
        from markdown_articles_tool_spark.training import bpe

        ids = bpe.encode('The quick brown fox jumps over the lazy dog near the riverbank.')
        assert ids[:8] == [84, 386, 609, 608, 591, 592, 593, 326]
        assert len(ids) == 24
        # every id in vocab range; round-trippable byte coverage
        assert all(0 <= x < 256 + len(bpe.MERGES) for x in ids)
        assert bpe.encode('') == []
        assert bpe.tokens_sha([1, 2, 3]) == ok.bpe_tokens_sha([1, 2, 3])


class TestExtraction:
    """Engine extraction (core/mdparse.py: single-pass tokenizer,
    stdlib HTMLParser) vs independent oracle (tools/oracle_extract.py:
    event-list two-pass scanner, hand-rolled tag scanner) — the r4
    de-sharing of the flagship E1-E4 hash gate."""

    MD_FRAGS = [
        '', ' ', '\n', '![](a.png)', '![alt](http://h/x.png =300x)',
        '![a](b.png "title")', "![a](<u v.png> 'ttl')",
        '![r][d]\n\n[d]: http://x/y.png', '![r][]\n\n[d]: u.png',
        '![d]\n\n[d]: u.png', '![miss][nope]', '\\![not](x.png)',
        '`![code](x.png)`', '``a`` ![real](y.png)',
        '```\n![fenced](x.png)\n```\n![after](z.png)',
        '~~~~\n![f](x)\n~~~~\n',
        '    ![indented](code.png)', '\t![tab](code.png)',
        'para\n    ![cont](kept.png)',     # lazy continuation is scanned
        '<div>\n<img src="a.png">\n</div>\n\n![md](b.png)',
        '<img src=bare.gif alt=x>', "<img SRC='q.png'/>", '<img src>',
        '<!-- <img src="c.png"> -->', '<![CDATA[x]]><img src="d.png">',
        '<![bogus] ><img src="e.png">', '<![a][r]',
        '![nest ![in](x.png)](y.png)', '![unbal](a(b.png',
        '![](filters:no_upscale()?u=1)', '![](a.png =1000x0010)',
        '![](a.png =x)', '![](a.png  =300x)', '![](a png =300x)',
        '[d]: first.png\n[d]: second.png\n![d]',
        '![é](café.png)', '![](a.png\t=300x)',
    ]

    def test_md_extraction_agrees(self):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.core import mdparse as mp

        for t in self.MD_FRAGS:
            assert mp.extract_image_links(t) == ox.md_image_links(t), repr(t)
        for i in range(240):
            t = corpus.doc_text(i)
            assert mp.extract_image_links(t) == ox.md_image_links(t), i
        for i in range(80):
            t = corpus.doc_text(i, fat=True)
            assert mp.extract_image_links(t) == ox.md_image_links(t), i

    def test_html_extraction_agrees(self):
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.core import mdparse as mp

        frags = [
            '', '<img>', '<img src="a.png">', '<IMG SRC="b.png" />',
            '<img alt="x" src=unquoted>', '<img src>', '<img src="">',
            '<img src="a" src="b">', '<img src src="c.png">',
            '<p><img\nsrc="nl.png"></p>', '<img data-src="no" src="yes.png">',
            '<img src="a&amp;b.png">', '<img src="a&#65;.png">',
            '<!-- <img src="no.png"> --><img src="yes.png">',
            '<script><img src="no.png"></script><img src="ok.png">',
            '<style>i{}</style><img src=s.png>',
            '<?pi <img src="no.png"> ?><img src="pi.png">',
            '<!doctype html><img src="d.png">', '<3 <img src="e.png">',
            '<img src="unterminated', '<div', '<img src=\'sq.png\' >',
        ]
        for h in frags:
            assert mp.extract_html_img_srcs(h) == ox.html_img_srcs(h), repr(h)
        for i in range(120):
            h = corpus.doc_html(i).decode('utf-8', errors='replace')
            assert mp.extract_html_img_srcs(h) == ox.html_img_srcs(h), i

    def test_marked_section_soup_never_crashes_engine(self):
        # r4 fuzz finding: stdlib HTMLParser raises AssertionError /
        # NotImplementedError on '<![a]' / '<![[' web soup; the engine
        # grabber must survive (crawl-scale input robustness)
        from markdown_articles_tool_spark.core import mdparse as mp

        for t in ['<![a][r]', '<![[x]]>', '<![ ]>', '<![if x]><img src="m.png">',
                  '<![CDATA[<img src="no.png">]]>', '<![weird']:
            assert mp.extract_image_links(t) == ox.md_image_links(t), repr(t)

    def test_marked_section_soup_never_crashes_maincontent(self):
        # r5 (ADVICE r4): the same stdlib crash class existed in
        # maincontent._Extractor — one '<![foo]' document would kill a
        # whole Spark task in the main_content / content_spans batch
        # queries and the streaming main-content path. Engine and twin
        # must both survive and agree.
        from markdown_articles_tool_spark.core import maincontent as mc

        for t in ['<p>x</p><![weird]', '<![a][r]', '<![[x]]>', '<![ ]>',
                  '<![if x]><p>cond</p>', '<![CDATA[secret]]><p>y</p>', '<![trunc']:
            html = t.encode('utf-8')
            eng = mc.extract_blocks(html)
            ora = ok.main_content_blocks(html)
            assert [(b.ord, b.tag, b.text, b.total_raw, b.link_raw, b.kept)
                    for b in eng] == ora, repr(t)

    def test_transform_fold_agrees_across_configs(self):
        """Full sequential transform: engine ReferenceOracle vs the
        independent IndependentOracle — texts and images byte-equal
        under every oracleref-expressible config."""
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.core.linkflow import DedupVariant, TransformConfig
        from markdown_articles_tool_spark.core.pathalgebra import PathConfig
        from markdown_articles_tool_spark.oracle import ReferenceOracle

        docs = corpus.docs_list(120)
        store = corpus.ModelAssetStore()
        configs = [
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH),
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.DISABLED),
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.NAMES_HASHING),
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH,
                            replace_image_names=True),
            TransformConfig(skip_all_errors=True, download_incorrect_mime_types=True,
                            deduplication=DedupVariant.CONTENT_HASH),
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH,
                            skip_list=frozenset({'https://www.google.com/'})),
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH,
                            paths=PathConfig(img_public_path='https://cdn.example/i')),
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH,
                            input_formats=('html',)),
            TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH,
                            input_formats=('md', 'html')),
        ]
        for cfg in configs:
            eng = ReferenceOracle(cfg, store).run(docs)
            twin = ox.IndependentOracle(cfg, store).run(docs)
            assert eng.texts == twin.texts, cfg
            assert eng.images == twin.images, cfg

    def test_filename_and_url_twins_agree(self):
        from markdown_articles_tool_spark.core import wwwtools as ww

        urls = [
            'http://h/a/b.png', 'https://h/x?q=1', 'http://h/p;param',
            'C:/x.png', 'C:', 'ftps://h/f.gif', 'noscheme/rel.png',
            'http://h/a%20b.png', 'http://h/.hidden', 'http://h/dir/',
            'http://h/a.tar.gz', 'http://h', 'x', '/leads.png', '//h/p.png',
        ]
        for u in urls:
            for ct in (None, 'image/png', 'image/jpeg; charset=x', 'nope/x'):
                for cd in (None, 'attachment; filename=a.png'):
                    try:
                        a, ae = ww.filename_from_url(u, ct, cd), None
                    except (KeyError, ValueError) as e:
                        a, ae = None, type(e).__name__
                    try:
                        b, be = ox.filename_from_url(u, ct, cd), None
                    except (KeyError, ValueError) as e:
                        b, be = None, type(e).__name__
                    assert (a, ae) == (b, be), (u, ct, cd)
            assert ww.get_base_url(u) == ox.get_base_url(u), u
            assert ww.remove_protocol_prefix(u) == ox.remove_protocol_prefix(u), u
            assert ww.guess_mime_type(u) == ox.guess_mime(u), u

    def test_extraction_golden(self):
        """Hand-pinned literals: both implementations drifting together
        is also caught (same discipline as the sketch goldens)."""
        got = ox.md_image_links(
            '![a](u.png =300x)\n![b][r]\n\n[r]: http://d/e.png\n'
            '```\n![no](x.png)\n```\n<img src="f.gif">\n'
        )
        assert got == [('u.png', 300, None), ('http://d/e.png', None, None),
                       ('f.gif', None, None)]
        assert ox.split_size_suffix('a.png =1000x0010') == ('a.png', 1000, 10)
        assert ox.split_size_suffix('a.png =x250') == ('a.png', None, 250)
        assert ox.split_size_suffix('a b =300x') == ('a b =300x', None, None)
        assert ox.filename_from_url('http://h/Caf%C3%A9 Pic.PNG', 'image/png') == 'cafc3a9-pic.png'


class TestMediaFeatures:
    def test_engine_matches_twin(self):
        """numpy bincount histogram vs the twin's pure byte loop —
        identical rounded ratios and sequential-fold entropy."""
        import math

        import numpy as np

        blobs = [b'', b'\x00', b'\xff' * 100, bytes(range(256)) * 7,
                 b'mixed bytes \x01\x80\xf0' * 33]
        for b in blobs:
            twin = ok.media_features_seq(b)
            if b:
                counts = np.bincount(np.frombuffer(b, dtype=np.uint8) >> 4, minlength=16)
                ratios = [round(int(c) / len(b), 6) for c in counts]
            else:
                ratios = [0.0] * 16
            ent = 0.0
            for p in ratios:
                if p > 0:
                    ent -= p * math.log2(p)
            ent = round(ent, 6)
            assert twin == [(k, ratios[k], ent) for k in range(16)]
        # goldens
        assert ok.media_features_seq(b'\x00\x10')[:2] == [(0, 0.5, 1.0), (1, 0.5, 1.0)]
        assert ok.media_features_seq(b'')[0] == (0, 0.0, 0.0)


class TestSniff:
    def test_magic(self):
        from markdown_articles_tool_spark.training.multimodal import _sniff

        for b in [b'\x89PNG\r\n', b'\xff\xd8\xffdata', b'GIF89a', b'RIFFxxxx',
                  b'RESI1234', b'plain', b'']:
            assert ok.sniff_magic(b) == _sniff(b)


# ----------------------------- property-based equivalence (hypothesis)

from hypothesis import given, settings, strategies as st  # noqa: E402

_html_soup = st.lists(
    st.sampled_from(list('abc <>/&;#"=\n\t()ÿπ') + [
        '<p>', '</p>', '<div>', '</div>', '<a href="x">', '</a>', '<script>',
        '</script>', '<nav>', '</nav>', '<br/>', '<li>', '</li>', '&amp;', '&#65;',
        '<div class="comment">', '<div id=sidebar>', '<p class="x menu y">',
        '<div class="ok">', '<span id="share-bar">', '</span>',
        # r5: marked-section soup — the stdlib parser raises on these
        # shapes unless parse_marked_section is overridden (ADVICE r4)
        '<![a]', '<![[', '<![CDATA[x]]>', '<![if x]>', '<![weird', '<![ ]>',
    ]),
    max_size=40,
).map(''.join)

_pdf_soup = st.binary(max_size=40).flatmap(lambda junk: st.sampled_from([
    junk,
    b'stream\n' + junk + b'\nendstream',
    b'stream\nBT (' + junk.replace(b'\\', b'').replace(b'(', b'').replace(b')', b'')
    + b') Tj ET\nendstream',
    b'BT' + junk + b'ET',
    junk + b'endstream' + junk,
    b'stream\nBT <' + junk.replace(b'>', b'') + b'> Tj ET\nendstream',
    b'stream\nBT <' + junk + b'> Tj ET\nendstream',
    b'stream\nBT [ <4A> ' + junk.replace(b'[', b'').replace(b']', b'')
    + b' ] TJ ET\nendstream',
]))

_texts = st.text(max_size=200)


class TestPropertyEquivalence:
    @given(_html_soup)
    @settings(max_examples=300, deadline=None)
    def test_maincontent_kernels_agree_on_soup(self, s):
        from markdown_articles_tool_spark.core import maincontent as mc

        html = s.encode('utf-8', errors='surrogatepass')
        eng = mc.extract_blocks(html)
        ora = ok.main_content_blocks(html)
        assert [(b.ord, b.tag, b.text, b.total_raw, b.link_raw, b.kept) for b in eng] == ora

    @given(_pdf_soup)
    @settings(max_examples=300, deadline=None)
    def test_pdf_kernels_agree_on_soup(self, b):
        from markdown_articles_tool_spark.core import pdftext as P

        assert P.extract_pdf_blocks(b) == ok.pdf_blocks(b)

    @given(st.lists(_texts, max_size=8))
    @settings(max_examples=150, deadline=None)
    def test_simhash_batch_equals_scalar(self, texts):
        assert D._simhash_batch(texts) == [D.simhash64(t) for t in texts]

    @given(_texts)
    @settings(max_examples=150, deadline=None)
    def test_minhash_indep_equals_engine(self, t):
        assert ok.minhash_signature(t, 16, 5) == D.minhash_signature(t, 16, 5)

    _md_soup = st.lists(st.sampled_from([
        '![', '](', ')', '[', ']', '`', '``', '```', '~~~', '\n', '\n\n', ' ',
        '    ', '\t', 'word', 'x.png', 'http://h/a.png', ' =300x', ' =x25',
        ' =3x4', '\\', '!', '=', '<', '>', '"t"', "'t'", '<img src="u.png">',
        '<div>', '</div>', '[r]: http://d/e.png', '![a][r]', '![a][]', '![a]',
        'ref', ':', 'é', '<u.png>', '<![CDATA[x]]>', '<![foo]>', '<![',
        '<!-- c -->', '<!--', '-->', '<!doctype html>', '<img src=bare>',
        "<img src='s.png' alt='a'>", '<img/>', '<img src>', ']]>',
    ]), max_size=30).map(''.join)

    @given(_md_soup)
    @settings(max_examples=400, deadline=None)
    def test_md_extraction_twins_agree_on_soup(self, s):
        from markdown_articles_tool_spark.core import mdparse as mp

        assert mp.extract_image_links(s) == ox.md_image_links(s)

    _url_soup = st.lists(st.sampled_from([
        'http://', 'https://', 'ftp://', 'ftps://', 'h', 'x', '/', '.', 'png',
        'jpg', '?', '#', ';', ':', '%20', 'a b', '=', '&', 'é', 'C:', '//',
        'file:', ' ', '\t', 'host.com', '@', '[', ']',
    ]), max_size=12).map(''.join)

    @given(_url_soup, st.sampled_from([None, 'image/png', 'image/jpeg; charset=x', 'nope/x']))
    @settings(max_examples=400, deadline=None)
    def test_filename_twins_agree_on_soup(self, u, ct):
        from markdown_articles_tool_spark.core import wwwtools as ww

        def call(f):
            try:
                return ('v', f(u, ct, None))
            except (KeyError, ValueError) as e:
                return (type(e).__name__, None)

        assert call(ww.filename_from_url) == call(ox.filename_from_url)

    @given(st.lists(_md_soup, min_size=1, max_size=4))
    @settings(max_examples=120, deadline=None)
    def test_full_transform_oracles_agree_on_soup(self, texts):
        """Whole-corpus transform on random markdown soup: the engine
        oracle and the independent oracle produce identical rewritten
        texts AND image stores — fuzzes the complete fold (resolve,
        MIME gate, fetch model, dedup state, paths, ordered rewrite),
        not just the extraction kernels."""
        from markdown_articles_tool_spark import corpus
        from markdown_articles_tool_spark.core.linkflow import DedupVariant, TransformConfig
        from markdown_articles_tool_spark.oracle import ReferenceOracle

        docs = [(f'https://h{i}.example/d/x{i}.md', t) for i, t in enumerate(texts)]
        cfg = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH)
        store = corpus.ModelAssetStore()
        eng = ReferenceOracle(cfg, store).run(docs)
        twin = ox.IndependentOracle(cfg, store).run(docs)
        assert eng.texts == twin.texts
        assert eng.images == twin.images
