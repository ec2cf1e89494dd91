"""Mojibake repair — fixing UTF-8 text that was mis-decoded as
Latin-1 / Windows-1252 somewhere upstream (``Ã©`` for ``é``,
``â€”`` for ``—``), the classic web-crawl encoding disease and the
core trick of the public ``ftfy`` tool (Speer 2019): if a span of
suspicious characters maps back to bytes under the WRONG decoding and
those bytes parse as valid UTF-8, the UTF-8 reading is overwhelmingly
the intended one, because valid multi-byte UTF-8 arising by chance in
real Latin-1 text is vanishingly rare.

Deterministic spec (implemented independently by
``tools/oracle_kernels.mojibake_fix_seq``, which uses a FROM-SCRATCH
strict UTF-8 decoder — lead-byte classes, continuation checks,
overlong/surrogate/out-of-range rejection — vs the engine's codec
round-trip; keep in sync by spec, not shared code):

* the repair unit is each MAXIMAL run of characters with
  ``ord(ch) >= 0x80`` and length ≥2 — sound because no byte of a
  multi-byte UTF-8 sequence is ASCII, so a mis-decoded character can
  never sit adjacent to the mojibake it belongs to across an ASCII
  gap, and a lone high char (``ü`` in real German) can never be a
  whole multi-byte sequence;
* char → byte map: code points < 0x100 map to that byte (the Latin-1
  reading); the 27 Windows-1252 specials (``€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž
  ' ' " " • – — ˜ ™ š › œ ž Ÿ``) map to 0x80-0x9F (the cp1252
  reading); any other char in the run (Cyrillic, CJK, …) makes the
  run UNMAPPABLE and it is left untouched;
* the mapped bytes must decode as STRICT UTF-8 (overlong encodings,
  surrogates, and > U+10FFFF rejected — Python's own strict codec
  behaviour); on failure the run is left untouched;
* repaired runs are re-scanned up to 3 total rounds over the whole
  text (double-encoded mojibake resolves in two), stopping at a fixed
  point;
* per document the operator reports the repaired text, its sha256,
  the number of runs repaired (summed over rounds), and the number of
  rounds that changed anything.

Known, documented false-positive: genuine text containing a verbatim
mojibake-shaped pair (the literal string ``Ã©`` meant as itself) is
"repaired" — the same trade ftfy makes, and the reason the operator
returns counts so a caller can gate on fix density.

Scale shape: pure per-document Python over Arrow batches — ONE
``pandas_udf`` pass, zero shuffles, embarrassingly parallel.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

# the 27 Windows-1252 codepoints above U+00FF, mapped back to their
# 0x80-0x9F byte (spec data, same table both sides)
CP1252_SPECIALS = {
    '€': 0x80, '‚': 0x82, 'ƒ': 0x83, '„': 0x84,
    '…': 0x85, '†': 0x86, '‡': 0x87, 'ˆ': 0x88,
    '‰': 0x89, 'Š': 0x8a, '‹': 0x8b, 'Œ': 0x8c,
    'Ž': 0x8e, '‘': 0x91, '’': 0x92, '“': 0x93,
    '”': 0x94, '•': 0x95, '–': 0x96, '—': 0x97,
    '˜': 0x98, '™': 0x99, 'š': 0x9a, '›': 0x9b,
    'œ': 0x9c, 'ž': 0x9e, 'Ÿ': 0x9f,
}

_HIGH_RUN = re.compile('[\\x80-\\U0010FFFF]{2,}')
MAX_ROUNDS = 3


def _run_bytes(run: str):
    """Map a high-char run to its Latin-1/cp1252 byte reading, or
    None if any char has no byte-level origin."""
    out = bytearray()
    for ch in run:
        cp = ord(ch)
        if cp < 0x100:
            out.append(cp)
        else:
            b = CP1252_SPECIALS.get(ch)
            if b is None:
                return None
            out.append(b)
    return bytes(out)


def fix_text(text: str):
    """(text) → (fixed, n_runs_fixed, n_rounds_changed) per the module
    spec (engine machinery: regex run scan + codec round-trip)."""
    out = text or ''
    total, rounds = 0, 0
    for _ in range(MAX_ROUNDS):
        fixed_this_round = 0

        def repl(m):
            nonlocal fixed_this_round
            raw = _run_bytes(m.group())
            if raw is None:
                return m.group()
            try:
                decoded = raw.decode('utf-8')
            except UnicodeDecodeError:
                return m.group()
            fixed_this_round += 1
            return decoded

        new = _HIGH_RUN.sub(repl, out)
        if fixed_this_round == 0:
            break
        out = new
        total += fixed_this_round
        rounds += 1
    return out, total, rounds


def fix_mojibake(
    df: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    plant=None,
) -> DataFrame:
    """(docs) → (doc_id, n_runs_fixed, n_rounds, fixed_sha, fixed) in
    ONE Arrow pass, no shuffle.  ``plant(doc_id, text) -> text``
    optionally rewrites each document inside the same pass (the
    synthetic-corpus hook, as in training/pii.py)."""
    from .util import ensure_parallelism

    out_schema = StructType([
        StructField('n_runs_fixed', IntegerType()),
        StructField('n_rounds', IntegerType()),
        StructField('fixed_sha', StringType()),
        StructField('fixed', StringType()),
    ])

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(out_schema)
    def fix(doc_id: pd.Series, text: pd.Series) -> pd.DataFrame:
        import hashlib
        rows = []
        for d, t in zip(doc_id, text):
            if plant is not None:
                t = plant(int(d), t)
            fixed, n, r = fix_text(t)
            rows.append((n, r,
                         hashlib.sha256(fixed.encode('utf-8')).hexdigest(),
                         fixed))
        return pd.DataFrame(rows, columns=[
            'n_runs_fixed', 'n_rounds', 'fixed_sha', 'fixed'])

    r = F.col('_r')
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias('doc_id'),
                fix(F.col(id_col), F.col(text_col)).alias('_r'))
        .select('doc_id', r['n_runs_fixed'].alias('n_runs_fixed'),
                r['n_rounds'].alias('n_rounds'),
                r['fixed_sha'].alias('fixed_sha'),
                r['fixed'].alias('fixed'))
    )
