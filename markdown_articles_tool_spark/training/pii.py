"""PII detection + redaction — the scrub pass every public
training-data pipeline runs before release (emails, IP addresses,
payment-card numbers, phone numbers → typed placeholders), and a
standard component of the open web-corpus recipes (e.g. the BigScience
ROOTS / BigCode StarCoder data-governance pipelines redact exactly
these classes).  The reference tool has no corpus-hygiene notion; this
module is part of the engine-added training-data surface
(SURVEY.md §2.8).

Everything here is a DETERMINISTIC SCANNER SPEC, implemented twice:
here with regex machinery (coarse character-class runs found by the
compiled-pattern engine, then validated), and in
``tools/oracle_kernels.pii_redact_seq`` with explicit index walks —
keep the two in sync by spec, not shared code.

Detection passes run in a fixed order, each over the residue of the
previous (placeholders contain ``<>`` which no character class
includes, so a replacement can never seed a later match):

1. **email** → ``<EMAIL>``.  Candidate = maximal run of local chars
   ``L = [A-Za-z0-9._%+-]`` immediately followed by ``@`` and a
   non-empty maximal run of domain chars ``[A-Za-z0-9.-]``.  The
   domain is right-trimmed of ``.``/``-``, then must split on ``.``
   into ≥2 non-empty labels with the FINAL label all-alpha and ≥2
   chars.  On failure the scan resumes after the whole candidate (so
   ``a@b@c.com`` yields nothing on both sides).  The match covers
   local@trimmed-domain.
2. **ipv4** → ``<IP>``.  Candidate = maximal run of ``[0-9.]``; valid
   iff it splits on ``.`` into EXACTLY 4 octets, each 1-3 digits with
   value ≤255, and neither adjacent char is ASCII alphanumeric (so
   ``v1.2.3.4`` version strings and ``10.2.3.4.5`` never match).
3. **card** → ``<CC>``.  Candidate = maximal run of ``[0-9 -]``,
   trimmed to its first/last digit; valid iff the trimmed core has no
   two adjacent separators, 13-19 digits total, the digits pass the
   Luhn check, and neither char adjacent to the CORE is ASCII
   alphanumeric — nor is the preceding char ``+`` (a ``+`` prefix
   marks an international PHONE, even when its 13-15 digits happen to
   pass Luhn).  Only the core is replaced (surrounding prose spaces
   survive).
4. **phone** → ``<PHONE>``.  Candidate = maximal run of
   ``[0-9()+ -]``, trimmed of spaces/dashes at both ends; valid iff
   the core starts with ``+``/``(``/digit and ends with digit/``)``;
   ``+`` appears at most once and only first; at most one balanced
   ``(...)`` pair holding only ≥1 digits, preceded by start/``+``/a
   separator; no two adjacent separators (space/dash); digit count
   7-15; and (the anti-prose rule) a leading ``+`` or a paren group
   or ≥2 separators — so ``2024 2025`` in prose never matches.
   Neither char adjacent to the core may be ASCII alphanumeric.

Interplay is part of the spec: ``user@10.1.2.3`` fails the email pass
(numeric final label) and the ``10.1.2.3`` then IP-matches; a
13-15-digit separated run that FAILS Luhn falls through to the phone
pass and may redact there (16+ digits exceed the phone cap and stay);
dots are NOT phone separators, so a failed IPv4 (``999.1.2.3``) never
phone-matches.  A documented maximal-run consequence: two numeric
entities separated ONLY by spaces/dashes (``<card> <phone>``) merge
into one over-long candidate and neither redacts — any intervening
punctuation or word restores both.

Scale shape: detection is pure per-document Python over one Arrow
batch — one ``pandas_udf`` pass, zero shuffles, embarrassingly
parallel; counts are ints and the redacted text is hashed by the
caller when only the fingerprint is needed.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

_EMAIL_COARSE = re.compile(r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')
_IP_COARSE = re.compile(r'[0-9.]+')
_CC_COARSE = re.compile(r'[0-9 -]+')
_PHONE_COARSE = re.compile(r'[0-9()+ -]+')
_ALNUM = re.compile(r'[A-Za-z0-9]')


def luhn_valid(digits: str) -> bool:
    """Luhn checksum over a digit string (engine machinery: reversed
    enumerate with in-loop doubling)."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def luhn_check_digit(partial: str) -> int:
    """The digit that makes ``partial + digit`` Luhn-valid."""
    for d in range(10):
        if luhn_valid(partial + str(d)):
            return d
    raise AssertionError('unreachable')


def _alnum_at(text: str, idx: int) -> bool:
    return 0 <= idx < len(text) and _ALNUM.match(text[idx]) is not None


def _email_spans(text: str):
    for m in _EMAIL_COARSE.finditer(text):
        local, _, domain = m.group().partition('@')
        core = domain.rstrip('.-')
        labels = core.split('.')
        if len(labels) >= 2 and all(labels):
            last = labels[-1]
            if len(last) >= 2 and last.isalpha():
                yield m.start(), m.start() + len(local) + 1 + len(core)


def _ip_spans(text: str):
    for m in _IP_COARSE.finditer(text):
        parts = m.group().split('.')
        if (len(parts) == 4
                and all(p and len(p) <= 3 and int(p) <= 255 for p in parts)
                and not _alnum_at(text, m.start() - 1)
                and not _alnum_at(text, m.end())):
            yield m.start(), m.end()


def _cc_spans(text: str):
    for m in _CC_COARSE.finditer(text):
        run = m.group()
        first = next((i for i, c in enumerate(run) if c.isdigit()), None)
        if first is None:
            continue
        last = max(i for i, c in enumerate(run) if c.isdigit())
        core = run[first:last + 1]
        digits = core.replace(' ', '').replace('-', '')
        before = m.start() + first - 1
        if (13 <= len(digits) <= 19
                and not re.search(r'[ -]{2}', core)
                and luhn_valid(digits)
                and not _alnum_at(text, before)
                and not (0 <= before < len(text) and text[before] == '+')
                and not _alnum_at(text, m.start() + last + 1)):
            yield m.start() + first, m.start() + last + 1


def _phone_core_valid(core: str) -> bool:
    if not core or core[0] not in '+(0123456789':
        return False
    if not (core[-1].isdigit() or core[-1] == ')'):
        return False
    if core.count('+') > (1 if core[0] == '+' else 0):
        return False
    n_open, n_close = core.count('('), core.count(')')
    if n_open > 1 or n_close > 1 or n_open != n_close:
        return False
    if n_open:
        o, c = core.index('('), core.index(')')
        if not (o < c and c - o > 1 and all(ch.isdigit() for ch in core[o + 1:c])):
            return False
        if not (o == 0 or core[o - 1] in '+ -'):
            return False
    if re.search(r'[ -]{2}', core):
        return False
    n_digits = sum(ch.isdigit() for ch in core)
    if not 7 <= n_digits <= 15:
        return False
    n_seps = core.count(' ') + core.count('-')
    return core[0] == '+' or n_open == 1 or n_seps >= 2


def _phone_spans(text: str):
    for m in _PHONE_COARSE.finditer(text):
        core = m.group().strip(' -')
        if not core:
            continue
        start = m.start() + (len(m.group()) - len(m.group().lstrip(' -')))
        end = start + len(core)
        if (_phone_core_valid(core)
                and not _alnum_at(text, start - 1)
                and not _alnum_at(text, end)):
            yield start, end


_PASSES = (
    (_email_spans, '<EMAIL>', 'n_emails'),
    (_ip_spans, '<IP>', 'n_ips'),
    (_cc_spans, '<CC>', 'n_ccs'),
    (_phone_spans, '<PHONE>', 'n_phones'),
)


def redact_text(text: str):
    """(text) → (redacted, n_emails, n_ips, n_ccs, n_phones) per the
    module spec."""
    out = text or ''
    counts = []
    for spans, placeholder, _name in _PASSES:
        pieces, pos, n = [], 0, 0
        for s, e in spans(out):
            pieces.append(out[pos:s])
            pieces.append(placeholder)
            pos = e
            n += 1
        pieces.append(out[pos:])
        out = ''.join(pieces)
        counts.append(n)
    return (out, *counts)


def pii_redact(
    df: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    plant=None,
) -> DataFrame:
    """(docs) → (doc_id, n_emails, n_ips, n_ccs, n_phones,
    redacted_sha, redacted) in ONE Arrow pass, no shuffle.

    ``plant(doc_id, text) -> text`` optionally rewrites each document
    INSIDE the same pass before detection (the synthetic-corpus hook:
    corpus.pii_plant appends deterministic PII sentences so the
    detectors fire non-vacuously; one Arrow eval either way)."""
    from .util import ensure_parallelism

    out_schema = StructType([
        StructField('n_emails', IntegerType()),
        StructField('n_ips', IntegerType()),
        StructField('n_ccs', IntegerType()),
        StructField('n_phones', IntegerType()),
        StructField('redacted_sha', StringType()),
        StructField('redacted', StringType()),
    ])

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(out_schema)
    def scrub(doc_id: pd.Series, text: pd.Series) -> pd.DataFrame:
        import hashlib
        rows = []
        for d, t in zip(doc_id, text):
            if plant is not None:
                t = plant(int(d), t)
            red, ne, nip, ncc, nph = redact_text(t)
            rows.append((ne, nip, ncc, nph,
                         hashlib.sha256(red.encode('utf-8')).hexdigest(), red))
        return pd.DataFrame(rows, columns=[
            'n_emails', 'n_ips', 'n_ccs', 'n_phones', 'redacted_sha', 'redacted'])

    r = F.col('_r')
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias('doc_id'),
                scrub(F.col(id_col), F.col(text_col)).alias('_r'))
        .select('doc_id', r['n_emails'].alias('n_emails'),
                r['n_ips'].alias('n_ips'), r['n_ccs'].alias('n_ccs'),
                r['n_phones'].alias('n_phones'),
                r['redacted_sha'].alias('redacted_sha'),
                r['redacted'].alias('redacted'))
    )
