"""Real byte-pair-merge tokenization (BPE) over Arrow batches.

The r3 ``token_stats`` operator counts tokens with a regex proxy
(training/textstats.py) — cheap, but not what a training-data pipeline
actually runs per document.  This module is a genuine BPE tokenizer:

* GPT-2-style byte-level BPE: pre-tokenize with ``PRETOK_PATTERN``,
  encode each pre-token to UTF-8 bytes, then greedily apply the merge
  with the lowest rank until no merge applies (the standard algorithm
  used by GPT-2/tiktoken-class tokenizers, reimplemented from the
  published algorithm — no tokenizer library exists in this container).
* ``MERGES`` is a small embedded vocab: 607 merges trained by
  ``train_merges`` (count adjacent pairs weighted by word frequency,
  merge the most frequent, smallest-pair tie-break, stop below pair
  frequency 2 — which exhausts at 607 of the requested 1024) on a
  deterministic seed corpus of 256 synthetic documents.  ``tests/test_training_ops.py``
  re-trains and pins equality so the table can't silently drift from
  the trainer.
* Engine path: one pandas_udf pass, memoized per distinct pre-token
  (natural-language batches repeat most words, so the merge loop runs
  once per distinct word, not once per occurrence).  The independent
  oracle twin (tools/oracle_kernels.bpe_encode) re-implements the merge
  loop with different machinery (repeated lowest-rank full scans) and
  takes the merge table as a data argument.

The regex-proxy estimator stays in textstats as the cheap path.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

# the pre-tokenizer is part of the tokenizer SPEC (shared data, like
# the minhash permutation constants): leading-space word / number /
# punctuation clusters, trailing-whitespace lookahead — a GPT-2-shaped
# pattern restricted to constructs Python re supports
PRETOK_PATTERN = r" ?[^\W\d_]+| ?\d+| ?[^\w\s]+|\s+(?!\S)|\s+"

# 607 merges trained on the deterministic seed corpus (train_merges;
# pinned by tests). (a, b) at index k merges symbol pair a+b -> 256+k.
MERGES: List[Tuple[int, int]] = [
    (108, 101), (93, 40), (33, 91), (112, 115), (105, 109), (47, 47),
    (58, 261), (104, 116), (109, 112), (116, 259), (263, 265), (101, 120),
    (97, 264), (267, 268), (269, 256), (260, 103), (258, 257), (209, 130),
    (110, 103), (97, 108), (112, 274), (32, 208), (208, 190), (106, 112),
    (279, 103), (105, 99), (105, 110), (114, 101), (48, 48), (32, 61),
    (112, 281), (208, 186), (209, 129), (99, 97), (208, 189), (278, 208),
    (97, 103), (292, 101), (116, 104), (283, 102), (111, 116), (96, 96),
    (105, 100), (208, 181), (208, 184), (101, 114), (260, 293), (104, 296),
    (271, 303), (53, 48), (46, 47), (103, 275), (111, 117), (114, 121),
    (115, 105), (208, 176), (209, 128), (256, 309), (272, 306), (275, 298),
    (287, 291), (289, 256), (307, 313), (32, 258), (97, 110), (102, 105),
    (111, 114), (114, 99), (32, 294), (108, 282), (324, 101), (49, 48),
    (50, 48), (56, 48), (49, 284), (50, 305), (32, 272), (32, 288),
    (40, 41), (51, 284), (70, 115), (82, 101), (85, 114), (100, 117),
    (102, 275), (108, 116), (110, 97), (110, 111), (110, 342), (115, 101),
    (117, 259), (118, 315), (119, 119), (139, 208), (209, 145), (209, 349),
    (256, 344), (277, 178), (277, 184), (297, 96), (299, 273), (300, 290),
    (301, 115), (302, 338), (308, 323), (310, 122), (312, 300), (316, 185),
    (321, 341), (334, 63), (336, 360), (337, 361), (339, 112), (340, 345),
    (346, 317), (359, 108), (364, 358), (366, 101), (32, 91), (32, 115),
    (32, 116), (100, 101), (108, 111), (109, 101), (111, 103), (111, 110),
    (322, 103), (325, 107), (32, 100), (61, 34), (104, 101), (108, 97),
    (49, 52), (49, 50), (49, 57), (49, 51), (49, 54), (49, 55),
    (49, 56), (49, 53), (50, 52), (50, 50), (50, 51), (32, 65),
    (32, 72), (32, 85), (32, 87), (32, 89), (32, 96), (32, 273),
    (32, 283), (32, 289), (32, 367), (32, 383), (34, 41), (34, 258),
    (40, 411), (41, 96), (41, 410), (47, 41), (69, 73), (71, 72),
    (73, 264), (82, 76), (83, 317), (86, 315), (97, 100), (98, 301),
    (99, 111), (103, 111), (105, 112), (105, 115), (105, 274), (107, 426),
    (108, 289), (109, 423), (109, 427), (110, 100), (110, 296), (112, 114),
    (112, 121), (112, 293), (116, 320), (131, 273), (137, 350), (140, 209),
    (149, 209), (159, 362), (161, 273), (173, 273), (176, 208), (177, 208),
    (178, 356), (180, 208), (180, 291), (182, 299), (183, 311), (187, 357),
    (187, 363), (208, 442), (208, 443), (208, 448), (209, 134), (209, 439),
    (209, 441), (273, 291), (273, 357), (273, 460), (277, 444), (277, 445),
    (277, 446), (277, 449), (278, 273), (282, 116), (284, 327), (287, 288),
    (287, 311), (287, 468), (288, 288), (288, 350), (290, 351), (290, 356),
    (290, 459), (294, 381), (298, 294), (299, 471), (310, 274), (311, 463),
    (312, 462), (316, 450), (322, 438), (330, 48), (333, 278), (348, 119),
    (351, 454), (353, 475), (353, 478), (367, 428), (375, 429), (376, 111),
    (377, 422), (378, 430), (379, 431), (380, 256), (399, 433), (400, 416),
    (401, 419), (402, 480), (403, 308), (405, 481), (406, 498), (407, 110),
    (408, 101), (417, 84), (418, 486), (420, 100), (424, 109), (425, 499),
    (432, 482), (435, 469), (436, 479), (447, 452), (453, 476), (455, 440),
    (456, 457), (461, 451), (464, 483), (465, 278), (466, 517), (467, 518),
    (472, 484), (474, 490), (485, 188), (492, 362), (497, 116), (501, 509),
    (505, 273), (510, 116), (522, 143), (524, 458), (525, 185), (526, 363),
    (32, 80), (32, 84), (32, 98), (32, 102), (32, 106), (32, 111),
    (32, 113), (32, 266), (32, 275), (32, 302), (32, 320), (32, 381),
    (32, 386), (32, 387), (34, 62), (78, 111), (90, 101), (93, 58),
    (93, 91), (98, 108), (98, 378), (99, 107), (99, 117), (103, 105),
    (105, 256), (108, 121), (109, 259), (110, 116), (111, 119), (111, 120),
    (111, 560), (114, 115), (114, 566), (117, 281), (117, 564), (118, 301),
    (122, 121), (267, 116), (282, 108), (282, 325), (321, 569), (326, 110),
    (375, 323), (376, 575), (377, 102), (379, 565), (383, 115), (384, 380),
    (384, 568), (387, 282), (538, 587), (539, 386), (540, 570), (541, 567),
    (542, 572), (543, 573), (544, 571), (546, 116), (547, 115), (548, 100),
    (549, 563), (550, 283), (551, 574), (554, 562), (557, 107), (558, 559),
    (561, 102), (577, 101), (578, 116), (586, 583), (590, 110), (594, 107),
    (49, 49), (50, 53), (49, 305), (49, 328), (49, 329), (49, 388),
    (50, 327), (50, 392), (51, 48), (51, 54), (52, 50), (52, 56),
    (53, 52), (54, 48), (54, 54), (55, 50), (55, 56), (56, 52),
    (57, 48), (57, 54), (327, 50), (327, 56), (328, 52), (388, 52),
    (389, 54), (390, 50), (390, 56), (391, 50), (391, 56), (392, 50),
    (392, 56), (393, 52), (394, 54), (395, 54), (396, 48), (396, 54),
    (397, 50), (397, 56), (398, 52), (611, 50), (32, 53), (32, 55),
    (32, 390), (32, 391), (32, 393), (32, 398), (32, 49), (32, 50),
    (32, 52), (32, 327), (32, 392), (32, 397), (49, 327), (50, 54),
    (50, 394), (51, 56), (54, 50), (55, 52), (56, 54), (57, 56),
    (328, 54), (388, 54), (389, 50), (390, 52), (391, 52), (393, 48),
    (394, 50), (395, 56), (396, 50), (398, 48), (32, 56), (32, 328),
    (32, 388), (49, 389), (49, 394), (50, 56), (50, 328), (50, 388),
    (51, 52), (52, 48), (52, 54), (53, 50), (53, 56), (54, 52),
    (55, 48), (55, 54), (56, 50), (56, 56), (57, 52), (327, 54),
    (328, 50), (328, 56), (388, 50), (388, 56), (389, 52), (390, 48),
    (390, 54), (391, 48), (391, 54), (392, 48), (392, 54), (393, 50),
    (393, 56), (394, 52), (395, 52), (396, 52), (397, 54), (398, 50),
    (398, 56), (32, 51), (32, 54), (32, 57), (32, 389), (32, 394),
    (32, 395), (32, 396), (32, 611), (611, 52), (49, 393), (49, 395),
    (50, 49), (50, 55), (50, 390), (50, 391), (50, 393), (50, 610),
    (51, 49), (51, 51), (51, 55), (51, 57), (52, 51), (52, 53),
    (52, 57), (53, 49), (53, 53), (53, 55), (54, 49), (54, 51),
    (54, 55), (54, 57), (55, 51), (55, 53), (55, 57), (56, 49),
    (56, 53), (56, 55), (57, 49), (57, 51), (57, 55), (57, 57),
    (327, 51), (327, 53), (327, 57), (328, 49), (328, 53), (328, 55),
    (388, 49), (388, 53), (388, 55), (389, 49), (389, 51), (389, 55),
    (389, 57), (390, 51), (390, 53), (390, 57), (391, 51), (391, 53),
    (391, 57), (392, 51), (392, 53), (392, 57), (393, 49), (393, 53),
    (393, 55), (394, 49), (394, 51), (394, 55), (394, 57), (395, 49),
    (395, 51), (395, 55), (395, 57), (396, 49), (396, 51), (396, 55),
    (396, 57), (397, 51), (397, 53), (397, 57), (398, 49), (398, 53),
    (398, 55), (610, 49), (611, 51), (611, 53), (32, 610), (49, 392),
    (50, 284), (50, 389), (50, 396), (51, 50), (52, 52), (53, 54),
    (54, 56), (57, 50), (327, 52), (388, 48), (389, 56), (392, 52),
    (393, 54), (394, 56), (395, 50), (396, 56), (398, 54), (650, 51),
    (650, 57), (651, 49), (651, 55), (652, 49), (652, 55), (653, 49),
    (653, 55), (654, 51), (654, 57), (655, 51), (655, 57), (656, 390),
    (656, 391), (657, 57), (657, 395), (658, 49), (658, 55), (659, 49),
    (659, 55), (660, 49), (660, 55), (661, 49), (661, 55), (680, 51),
    (680, 57), (681, 51), (681, 57), (682, 51), (682, 57), (719, 53),
    (720, 53), (721, 53), (722, 53), (723, 53), (724, 53), (725, 53),
    (726, 49),
]


def seed_corpus() -> str:
    """The deterministic training text for MERGES (256 synthetic docs)."""
    from .. import corpus

    return '\n'.join(corpus.doc_text(i) for i in range(256))


def train_merges(seed_text: str, n_merges: int = 256) -> List[Tuple[int, int]]:
    """Classic BPE training: weight adjacent symbol pairs by word
    frequency, merge the most frequent (smallest pair breaks ties),
    stop below frequency 2."""
    pretok = re.compile(PRETOK_PATTERN)
    words: Dict[Tuple[int, ...], int] = {}
    for m in pretok.finditer(seed_text):
        t = tuple(m.group(0).encode('utf-8'))
        words[t] = words.get(t, 0) + 1
    merges: List[Tuple[int, int]] = []
    cur = {k: list(k) for k in words}
    for _ in range(n_merges):
        counts: Dict[Tuple[int, int], int] = {}
        for k, syms in cur.items():
            f = words[k]
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        best = max(counts.values())
        if best < 2:
            break
        pair = min(p for p, c in counts.items() if c == best)
        merges.append(pair)
        new_id = 256 + len(merges) - 1
        for k, syms in cur.items():
            out: List[int] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            cur[k] = out
    return merges


_RANK: Dict[Tuple[int, int], int] = {p: i for i, p in enumerate(MERGES)}
_PRETOK = re.compile(PRETOK_PATTERN)


def _encode_word(word: str, cache: Dict[str, List[int]]) -> List[int]:
    ids = cache.get(word)
    if ids is not None:
        return ids
    syms = list(word.encode('utf-8'))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = _RANK.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [256 + best_rank]
    cache[word] = syms
    return syms


def encode(text: str, cache: Dict[str, List[int]] | None = None) -> List[int]:
    """Token ids for one document (engine kernel)."""
    if cache is None:
        cache = {}
    out: List[int] = []
    for m in _PRETOK.finditer(text or ''):
        out.extend(_encode_word(m.group(0), cache))
    return out


def tokens_sha(ids: Sequence[int]) -> str:
    return hashlib.sha256(','.join(map(str, ids)).encode()).hexdigest()


_BPE_SCHEMA = StructType([
    StructField('n_bpe', IntegerType()),
    StructField('tokens_sha', StringType()),
])


@pandas_udf(_BPE_SCHEMA)
def _bpe_udf(text: pd.Series) -> pd.DataFrame:
    cache: Dict[str, List[int]] = {}   # shared across the Arrow batch
    ns, shas = [], []
    for t in text:
        ids = encode(t, cache)
        ns.append(len(ids))
        shas.append(tokens_sha(ids))
    return pd.DataFrame({'n_bpe': pd.Series(ns, dtype='int32'), 'tokens_sha': shas})


def bpe_token_stats(df: DataFrame, id_col: str = 'doc_id', text_col: str = 'text') -> DataFrame:
    """(doc_id, n_bpe_tokens, tokens_sha) — one Arrow pass, no shuffle.

    The sha over the comma-joined id sequence makes the driver gate a
    hash gate on the actual token ids, not just the count."""
    from .util import ensure_parallelism

    res = F.col('_bpe')
    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias('doc_id'), _bpe_udf(F.col(text_col)).alias('_bpe'))
        .select(
            'doc_id',
            res['n_bpe'].alias('n_bpe_tokens'),
            res['tokens_sha'].alias('tokens_sha'),
        )
    )
