"""Mojibake repair tier: engine (regex scan + codec round-trip) vs the
index-walk twin with its from-scratch strict UTF-8 decoder."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

import oracle_kernels as ok  # noqa: E402

from markdown_articles_tool_spark.training import mojibake as mj  # noqa: E402


def _mis_latin1(s: str) -> str:
    return s.encode('utf-8').decode('latin-1')


class TestFromScratchUtf8Decoder:
    def test_matches_codec_on_random_bytes(self):
        rng = random.Random(2)
        for _ in range(30000):
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 12)))
            try:
                want = b.decode('utf-8')
            except UnicodeDecodeError:
                want = None
            assert ok._utf8_decode_seq(b) == want, b.hex()

    def test_rejects_overlong_surrogate_range_truncation(self):
        for hx in ('c080', 'c1bf', 'e08080', 'eda080', 'edbfbf', 'f4908080',
                   'f58080', 'ff', 'c2', 'e0a0', 'f09f98'):
            assert ok._utf8_decode_seq(bytes.fromhex(hx)) is None, hx

    def test_accepts_boundaries(self):
        for hx, want in (('7f', '\x7f'), ('c280', '\x80'), ('dfbf', '߿'),
                         ('e0a080', 'ࠀ'), ('ed9fbf', '퟿'),
                         ('ee8080', ''), ('efbfbf', '￿'),
                         ('f0908080', '\U00010000'), ('f48fbfbf', '\U0010ffff')):
            assert ok._utf8_decode_seq(bytes.fromhex(hx)) == want, hx


class TestFixGoldens:
    def test_classic_repairs(self):
        assert mj.fix_text('cafÃ© time') == ('café time', 1, 1)
        # four separate high-char runs: Ã©, Ã<nbsp>, â€", â€¦
        assert mj.fix_text(_mis_latin1('déjà — vu…')) == ('déjà — vu…', 4, 1)
        # cp1252 curly quotes / euro
        damaged = ok and 'â€œquotedâ€\x9d costs â‚¬5'
        assert mj.fix_text(damaged)[0] == '“quoted” costs €5'

    def test_double_encoding_two_rounds(self):
        twice = _mis_latin1(_mis_latin1('Österreich'))
        fixed, n, rounds = mj.fix_text('x ' + twice)
        assert fixed == 'x Österreich'
        assert rounds == 2

    def test_legit_text_untouched(self):
        for s in ('Привет мир', 'Füße für alle', 'naïve é café', '中文測試',
                  'mixed Привет and café', ''):
            assert mj.fix_text(s) == (s, 0, 0)

    def test_lone_high_char_never_touched(self):
        # a single high char can't be a whole multi-byte sequence
        assert mj.fix_text('A é B') == ('A é B', 0, 0)

    def test_invalid_high_runs_untouched(self):
        # adjacent legit Latin-1 letters that are not valid UTF-8
        for s in ('Füße', 'ÃÃÃ', '\x80\x81'):
            out = mj.fix_text(s)
            assert out == (s, 0, 0), s

    def test_documented_false_positive(self):
        # a VERBATIM 'Ã©' meant literally is repaired — the ftfy trade
        assert mj.fix_text('the string Ã© itself')[1] == 1


class TestTwinParity:
    def test_fuzz_matches_twin(self):
        rng = random.Random(7)

        def mis_cp1252(s):
            out = []
            for byte in s.encode('utf-8'):
                try:
                    out.append(bytes([byte]).decode('cp1252'))
                except UnicodeDecodeError:
                    out.append(chr(byte))
            return ''.join(out)

        atoms = ['hello ', _mis_latin1('déjà vu — café…'),
                 mis_cp1252('smörgåsbord “quotes”'),
                 _mis_latin1(_mis_latin1('é double')), 'Привет ', 'Füße ',
                 'naïve ', '中文', 'é', '€—', _mis_latin1('𝄞 astral'),
                 '\x80\x81', 'ÃÃÃ', 'Â ', ' ', '', 'x']
        for _ in range(8000):
            s = ''.join(rng.choice(atoms) for _ in range(rng.randrange(1, 6)))
            assert mj.fix_text(s) == ok.mojibake_fix_seq(s), repr(s)

    def test_plant_rotations_match_twin(self):
        from markdown_articles_tool_spark.corpus import mojibake_plant

        for i in range(60):
            t = mojibake_plant(i, f'doc {i}. ')
            assert mj.fix_text(t) == ok.mojibake_fix_seq(t), i
        # rotation activity: 0-2 and 4 repair, 3 and 5 stay untouched
        acts = [mj.fix_text(mojibake_plant(i, 'x. '))[1] > 0 for i in range(6)]
        assert acts == [True, True, True, False, True, False]
        # the double-encoded rotation takes exactly two rounds
        assert mj.fix_text(mojibake_plant(2, 'x. '))[2] == 2


class TestSparkOperator:
    def test_operator_matches_twin_and_plan(self, spark):
        import hashlib
        import re

        from markdown_articles_tool_spark.corpus import mojibake_plant

        rows = [(i, f'body {i}. ') for i in range(30)]
        df = spark.createDataFrame(rows, 'doc_id long, text string')
        out = {r['doc_id']: r for r in
               mj.fix_mojibake(df, plant=mojibake_plant).collect()}
        for i, t in rows:
            fixed, n, rounds = ok.mojibake_fix_seq(mojibake_plant(i, t))
            r = out[i]
            assert (r['n_runs_fixed'], r['n_rounds']) == (n, rounds), i
            assert r['fixed'] == fixed
            assert r['fixed_sha'] == hashlib.sha256(fixed.encode()).hexdigest()
        plan = mj.fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r'ArrowEvalPython', plan)) <= 1, plan
        assert 'Exchange' not in plan
