#!/usr/bin/env python
"""Generate the sequential-oracle reference tables (oracleref/*.parquet).

The driver's correctness gate compares every ``queries()`` entry
against DuckDB SQL.  A dozen of our operators are not expressible
in DuckDB (pandas-UDF pipelines, sketch kernels) — for those the
oracle SQL SELECTs from a parquet written by THIS script, which
computes the expected output **sequentially, with no Spark** (plain
Python/numpy over the raw parquet) using the INDEPENDENT second kernel
implementation in tools/oracle_kernels.py (r3: no sketch/similarity
imports from the package under test — two implementations check each
other; equivalence pinned by tests/test_kernel_equivalence.py).  The
distributed pipeline is therefore checked against an independent
single-threaded execution — the same differential-oracle discipline as
tests/test_pipeline_spark.py, made visible to the driver's hard gate.

Each output row carries ``skey``: a fingerprint of the input table
(sum(n_chars) over documents / count+sum(label) over embeddings) so
ONE oracle SQL string works at every scale factor the driver runs.

Determinism: everything here is a pure function of the testdata
parquet + the shared kernels.  Re-run after changing any kernel:

    python tools/gen_oracleref.py
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from markdown_articles_tool_spark import corpus  # noqa: E402
from markdown_articles_tool_spark.core.linkflow import DedupVariant, TransformConfig  # noqa: E402

# ALL computation kernels come from the INDEPENDENT second
# implementations (tools/oracle_kernels.py for sketches/similarity,
# tools/oracle_extract.py for E1-E4 extraction + the transform fold) —
# deliberately NOT from markdown_articles_tool_spark, so the driver's
# DuckDB gate checks two implementations against each other, not one
# against itself.  tests/test_kernel_equivalence.py pins the pairing.
# The only package imports left are the INPUT model (corpus synthesis,
# ModelAssetStore) and the TransformConfig dataclass (configuration,
# duck-typed by the independent oracle) — no extraction/fold code.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_extract import (  # noqa: E402
    IndependentOracle,
    link_status,
    md_image_links,
    shard_of,
    xxhash64_spark,
)
from oracle_kernels import (  # noqa: E402
    cosine as cosine_seq,
    resolve_href_seq,
    warc_redirects_seq,
    ivf_assign,
    kmeans_centroids as kmeans_centroids_from_matrix,
    minhash_signature,
    pack_band_keys as _pack_band_keys,
    round9 as spark_round9,
    simhash64,
    sniff_magic as _sniff,
)

SF_DIRS = ['/root/testdata/sf0.001', '/root/testdata/sf0.01', '/root/testdata/sf0.1']
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'oracleref')


def _corpus_n(sf_dir: str) -> int:
    # mirrors __spark_entry__._corpus_n
    if 'sf0.1' in sf_dir:
        return 3000
    if 'sf0.01' in sf_dir:
        return 600
    return 120


def _read(sf_dir: str, name: str) -> pa.Table:
    return pq.read_table(f'{sf_dir}/{name}.parquet')


def doc_skey(sf_dir: str) -> int:
    t = _read(sf_dir, 'documents')
    import pyarrow.compute as pc

    return int(pc.sum(t['n_chars']).as_py())


def emb_skey(sf_dir: str) -> int:
    t = _read(sf_dir, 'embeddings')
    import pyarrow.compute as pc

    return int(pc.sum(t['label']).as_py()) + t.num_rows


# ----------------------------------------------------------- corpus queries


def gen_corpus(sf_dir: str, skey: int, out: dict) -> None:
    n = _corpus_n(sf_dir)
    docs = corpus.docs_list(n)
    cfg = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH)

    # extract_links_corpus: raw extraction pass (E1-E3), document order
    for url, text in docs:
        for ord_, (link, w, h) in enumerate(md_image_links(text)):
            out['extract_links_corpus'].append((skey, url, ord_, link, w, h))

    from oracle_kernels import sample_frames_seq

    res = IndependentOracle(cfg, corpus.ModelAssetStore()).run(docs)
    for url, text_out in res.texts.items():
        sha = hashlib.sha256(text_out.encode('utf-8')).hexdigest()
        out['transform_corpus'].append((skey, url, sha))
    for path, content in res.images.items():
        out['corpus_images'].append((skey, path, hashlib.sha256(content).hexdigest()))
        magic, mtype = _sniff(content)
        out['media_metadata'].append(
            (skey, path, len(content), magic, mtype, hashlib.sha256(content).hexdigest()[:16])
        )
        for k, off, ln, sha16 in sample_frames_seq(content):
            out['media_frames'].append((skey, path, k, off, ln, sha16))
        from oracle_kernels import media_features_seq

        for bucket, ratio, ent in media_features_seq(content):
            out['media_features'].append((skey, path, bucket, ratio, ent))


def gen_lineage(sf_dir: str, skey: int, out: dict, n_shards: int = 4) -> None:
    """Sequential twin of the shard lineage a resumed
    checkpoint.run_with_resume writes (surfaced by lineage_df): shard
    assignment via the XXH64-at-seed-42 reimplementation (Spark's
    xxhash64 pmod), per-link statuses via oracle_extract.link_status.
    Single-pass configs only (the driver query's cfg is ('md',))."""
    n = _corpus_n(sf_dir)
    docs = corpus.docs_list(n)
    cfg = TransformConfig(skip_all_errors=True, deduplication=DedupVariant.CONTENT_HASH)
    assert len(cfg.input_formats) == 1
    assets = corpus.ModelAssetStore()
    n_docs = [0] * n_shards
    n_links = [0] * n_shards
    counts: list = [defaultdict(int) for _ in range(n_shards)]
    for url, text in docs:
        k = shard_of(url, n_shards)
        n_docs[k] += 1
        for src, _w, _h in md_image_links(text):
            n_links[k] += 1
            counts[k][link_status(cfg, url, src, assets)] += 1
    for k in range(n_shards):
        if not counts[k]:
            out['lineage'].append((skey, 0, k, n_docs[k], 0, '(none)', 0))
            continue
        for status, c in sorted(counts[k].items()):
            out['lineage'].append((skey, 0, k, n_docs[k], n_links[k], status, c))


def gen_line_dedup(sf_dir: str, skey: int, out: dict) -> None:
    """Corpus-wide exact line dedup (CCNet shape) over the synthetic
    pages corpus — sequential twin in oracle_kernels.line_dedup_seq."""
    from oracle_kernels import line_dedup_seq

    for url, n_lines, n_kept, text_dedup in line_dedup_seq(
        corpus.docs_list(_corpus_n(sf_dir))
    ):
        out['line_dedup'].append(
            (skey, url, n_lines, n_kept,
             hashlib.sha256(text_dedup.encode('utf-8')).hexdigest())
        )


def gen_host_stats(sf_dir: str, skey: int, out: dict) -> None:
    """Sequential host aggregation over the synthetic pages corpus
    (plain dict fold over the input model; warc_ts = 1_600_000_000+i
    by construction, corpus.doc_row)."""
    import re as _re

    n = _corpus_n(sf_dir)
    langs = ('en', 'ru', 'de')
    agg: dict = {}
    for i in range(n):
        url = corpus.doc_url(i)
        host = _re.match(r'^[a-zA-Z]+://([^/]+)', url).group(1)
        a = agg.setdefault(host, [0, 0, 0, None, None])
        a[0] += 1
        a[1] += len(corpus.doc_text(i))
        a[2] += 1 if langs[i % 3] == 'en' else 0
        ts = 1_600_000_000 + i
        a[3] = ts if a[3] is None else min(a[3], ts)
        a[4] = ts if a[4] is None else max(a[4], ts)
    for host in sorted(agg):
        c, chars, en, lo, hi = agg[host]
        out['host_stats'].append((skey, host, c, chars, en, lo, hi))


def gen_html_tables(sf_dir: str, skey: int, out: dict) -> None:
    """Structured table records — twin in oracle_kernels.html_tables_seq."""
    from oracle_kernels import html_tables_seq

    n = _corpus_n(sf_dir)
    for i in range(n):
        url = corpus.doc_url(i)
        for t, r, c, cell in html_tables_seq(corpus.doc_html(i)):
            out['html_tables'].append((skey, url, t, r, c, cell))


def gen_page_graph(sf_dir: str, skey: int, out: dict, iterations: int = 10) -> None:
    """Page metadata, outlink records, and the host-pagerank fixpoint —
    twins in oracle_kernels.html_meta_seq / outlinks_seq / pagerank_seq
    (flat event folds + RFC string-munching resolver + pure-int power
    iteration vs the engine's parser subclass / segment stack /
    DataFrame algebra)."""
    import re as _re

    from oracle_kernels import html_meta_seq, outlinks_seq, pagerank_seq

    host_re = _re.compile(r'^[a-zA-Z]+://([^/]+)')
    n = _corpus_n(sf_dir)
    edges: dict = defaultdict(int)
    for i in range(n):
        url = corpus.doc_url(i)
        html = corpus.doc_html(i)
        out['page_meta'].append((skey, url, *html_meta_seq(html)))
        m = host_re.match(url)
        src_host = m.group(1) if m else ''
        for ord_, href, abs_url, anchor in outlinks_seq(url, html):
            out['page_outlinks'].append((skey, url, ord_, href, abs_url, anchor))
            md = host_re.match(abs_url)
            dst_host = md.group(1) if md else ''
            if src_host and dst_host and src_host != dst_host:
                edges[(src_host, dst_host)] += 1
    ranks = pagerank_seq(
        [(s, d, w) for (s, d), w in edges.items()], iterations=iterations
    )
    for host in sorted(ranks):
        out['host_pagerank'].append((skey, host, ranks[host]))


def gen_main_content(sf_dir: str, skey: int, out: dict) -> None:
    """Sequential twin of operators/maincontent.py over the pages
    table — computed with the INDEPENDENT kernel (oracle_kernels
    main_content_* — born de-shared from the engine's
    core/maincontent.py; equivalence pinned by
    tests/test_kernel_equivalence.py)."""
    import hashlib as _hl

    from oracle_kernels import main_content_blocks, main_content_spans, main_content_text

    n = _corpus_n(sf_dir)
    for i in range(n):
        url = corpus.doc_url(i)
        blocks = main_content_blocks(corpus.doc_html(i))
        text = main_content_text(blocks)
        out['main_content'].append(
            (skey, url, _hl.sha256(text.encode('utf-8')).hexdigest(),
             len(blocks), sum(1 for b in blocks if b[5]))
        )
        for row in main_content_spans(blocks):
            out['content_spans'].append((skey, url, *row))


def gen_warc(sf_dir: str, skey: int, out: dict) -> None:
    """WARC source records — twin in oracle_kernels.warc_responses_seq
    (gzip.GzipFile member read + readline record walk + email.parser
    WARC headers + http.client.HTTPResponse over a fake socket, vs the
    engine's zlib loop / byte-scan / manual folds in core/warc.py).
    The archive bytes come from the shared INPUT model
    (corpus.warc_file_bytes); text is hashed like the driver query."""
    from oracle_kernels import warc_responses_seq

    import json as _json

    from oracle_kernels import (
        html_meta_seq,
        main_content_blocks,
        main_content_text,
        outlinks_seq,
        surt_key_seq,
        warc_cdx_seq,
        warc_revisits_seq,
    )

    def wat_json(url, wdate, status, mime, text):
        # the twin-side WAT envelope: html_meta_seq/outlinks_seq (the
        # independent extraction twins) under the same canonical
        # serialization the engine uses
        env = {'warc_header': {'target_uri': url, 'date': wdate},
               'payload': {'status': status, 'mime': mime}}
        if status == 200 and mime == 'text/html':
            html = text.encode('utf-8')
            title, desc, canonical, og, noindex, nofollow = html_meta_seq(html)
            env['payload']['html'] = {
                'title': title, 'meta_description': desc, 'canonical': canonical,
                'og_title': og, 'robots_noindex': noindex,
                'robots_nofollow': nofollow,
                'links': [{'href': h, 'abs_url': a, 'anchor': anc}
                          for _o, h, a, anc in outlinks_seq(url, html)],
            }
        return _json.dumps({'envelope': env}, sort_keys=True,
                           separators=(',', ':'), ensure_ascii=False)

    n = _corpus_n(sf_dir)
    n_files = (n + corpus.DOCS_PER_WARC - 1) // corpus.DOCS_PER_WARC
    for f in range(n_files):
        fname = corpus.warc_file_name(f)
        for row in warc_cdx_seq(corpus.warc_file_bytes(f, n)):
            # (ord, warc_type, url, offset, length, addressable,
            # warc_date) + the urllib-machinery SURT twin on the url
            out['warc_cdx'].append(
                (skey, fname, *row[:3], surt_key_seq(row[2]), *row[3:]))
        for row in warc_redirects_seq(corpus.warc_file_bytes(f, n)):
            rec_ord, url, wdate, status, loc = row
            if loc:
                abs_t = resolve_href_seq(url, loc)
                loc_abs = abs_t if abs_t else ''
            else:
                loc_abs = ''
            out['warc_redirects'].append(
                (skey, fname, rec_ord, url, wdate, status, loc, loc_abs))
        for row in warc_revisits_seq(corpus.warc_file_bytes(f, n)):
            # (rec_ord, url, warc_date, profile, refers_to_uri,
            # refers_to_date, http_status)
            out['warc_revisits'].append((skey, fname, *row))
        for rec_ord, url, wdate, status, mime, charset, n_bytes, text in (
                warc_responses_seq(corpus.warc_file_bytes(f, n))):
            out['warc_responses'].append(
                (skey, fname, rec_ord, url, wdate, status, mime, charset,
                 n_bytes, hashlib.sha256(text.encode('utf-8')).hexdigest())
            )
            wat_name = fname.rsplit('.warc', 1)[0] + '.warc.wat.gz'
            j = wat_json(url, wdate, status, mime, text)
            html_block = _json.loads(j)['envelope']['payload'].get('html') or {}
            out['wat_records'].append(
                (skey, wat_name, rec_ord, url, html_block.get('title', ''),
                 len(html_block.get('links', [])),
                 hashlib.sha256(j.encode('utf-8')).hexdigest())
            )
            # composed source→extraction twin (warc_main_content): the
            # fetch-policy gate, then the independent main-content
            # kernel over the charset-normalized page bytes
            if status == 200 and mime == 'text/html':
                blocks = main_content_blocks(text.encode('utf-8'))
                mtext = main_content_text(blocks)
                out['warc_main_content'].append(
                    (skey, url, hashlib.sha256(mtext.encode('utf-8')).hexdigest(),
                     len(blocks), sum(1 for b in blocks if b[5]))
                )
                # end-to-end release-run twin (warc_clean): the chained
                # hygiene twins over the SAME main text; the quality
                # verdict over the clean text is DuckDB SQL at oracle
                # time (token/repetition CTEs retargeted, like
                # clean_corpus)
                from oracle_kernels import mojibake_fix_seq, pii_redact_seq

                fixed, _n, _r = mojibake_fix_seq(mtext)
                red, ne, nip, ncc, nph = pii_redact_seq(fixed)
                out['warc_clean'].append(
                    (skey, url, red, ne + nip + ncc + nph,
                     hashlib.sha256(red.encode('utf-8')).hexdigest()))


def gen_robots(sf_dir: str, skey: int, out: dict) -> None:
    """Robots rule records + the crawl gate over the outlink records —
    twins in oracle_kernels.robots_rules_seq / robots_allowed_seq
    (regex line splitter + no-regex segment-walk matcher, vs the
    engine's partition folds + compiled-pattern matcher)."""
    import re as _re

    from oracle_kernels import (
        outlinks_seq,
        pagerank_seq,
        robots_allowed_seq,
        robots_dst_host_seq,
        robots_rules_seq,
        robots_url_path_seq,
    )

    from oracle_kernels import sitemap_entries_seq

    import math as _math

    from oracle_kernels import crawl_delay_seq

    parsed = {}
    for host in corpus.ROBOTS_HOSTS:
        recs = robots_rules_seq(corpus.robots_txt_for(host))
        parsed[host] = recs
        for rec in recs:
            out['robots_rules'].append((skey, host, *rec))
        for rec in sitemap_entries_seq(corpus.sitemap_xml_for(host)):
            out['sitemap_entries'].append((skey, host, *rec))
        # per-host politeness budget twin (frontier_budget's params:
        # agent graftbot, 60 s cycle, 5 s default delay, cap 8):
        # clamp(floor(60/delay), 1, 8); delay 0 → the cap
        delay = crawl_delay_seq(recs, 'graftbot')
        if delay is None:
            delay = 5.0
        budget = 8 if delay == 0 else max(1, min(8, int(_math.floor(60.0 / delay))))
        out['host_budget'].append((skey, host, budget))
    n = _corpus_n(sf_dir)
    # frontier composition state: crawled set, per-target refs, host
    # edges for the priority ranks (verbatim-case hosts, like the
    # engine's host_edges)
    host_re = _re.compile(r'^[a-zA-Z]+://([^/]+)')
    crawled = {corpus.doc_url(i) for i in range(n)}
    allowed_links: list = []
    refs: dict = defaultdict(int)
    dhost: dict = {}
    edges: dict = defaultdict(int)
    for i in range(n):
        url = corpus.doc_url(i)
        m = host_re.match(url)
        src_host = m.group(1) if m else ''
        for ord_, href, abs_url, anchor in outlinks_seq(url, corpus.doc_html(i)):
            host = robots_dst_host_seq(abs_url)
            recs = parsed.get(host)
            allowed = True if recs is None else robots_allowed_seq(
                recs, 'graftbot', robots_url_path_seq(abs_url))
            out['crawl_allowed'].append((skey, url, ord_, abs_url, host, allowed))
            md = host_re.match(abs_url)
            dst_raw = md.group(1) if md else ''
            if src_host and dst_raw and src_host != dst_raw:
                edges[(src_host, dst_raw)] += 1
            if allowed and abs_url not in crawled:
                refs[abs_url] += 1
                dhost[abs_url] = host
            if allowed:
                allowed_links.append((abs_url, host))
    ranks = pagerank_seq([(s, d, w) for (s, d), w in edges.items()], iterations=10)
    low_ranks: dict = {}
    for h, r in ranks.items():
        low_ranks[h.lower()] = max(low_ranks.get(h.lower(), 0), r)
    for abs_url in sorted(refs):
        out['crawl_frontier'].append(
            (skey, abs_url, dhost[abs_url], refs[abs_url],
             low_ranks.get(dhost[abs_url], 0))
        )
    # bloom-frontier twin (crawl_frontier_bloom's params in the driver
    # query: m=2048, k=3): already-seen = the XXH64 Bloom over the
    # crawled URL set — deterministic FP drops replayed exactly
    m_bits, kh = 2048, 3
    m64 = (1 << 64) - 1

    def _bpos(s: str):
        u = xxhash64_spark(s.encode('utf-8')) & m64
        h1, h2 = u >> 32, u & 0xFFFFFFFF
        return [(h1 + i * h2) % m_bits for i in range(kh)]

    bbits = {p for cu in crawled for p in _bpos(cu)}
    refs_b: dict = defaultdict(int)
    dhost_b: dict = {}
    for abs_url, host in allowed_links:
        if not all(p in bbits for p in _bpos(abs_url)):
            refs_b[abs_url] += 1
            dhost_b[abs_url] = host
    for abs_url in sorted(refs_b):
        out['frontier_bloom'].append(
            (skey, abs_url, dhost_b[abs_url], refs_b[abs_url],
             low_ranks.get(dhost_b[abs_url], 0))
        )


def gen_pdf(sf_dir: str, skey: int, out: dict) -> None:
    """Sequential twin of operators/pdfextract.py over the synthetic
    (url, pdf) table — computed with the INDEPENDENT kernel
    (oracle_kernels.pdf_blocks; manual scanners vs the engine's
    regexes; equivalence pinned by tests/test_kernel_equivalence.py)."""
    import hashlib as _hl

    from oracle_kernels import pdf_blocks, pdf_spans, pdf_text

    n = _corpus_n(sf_dir)
    for i in range(n):
        url = corpus.doc_url(i)
        blocks = pdf_blocks(corpus.doc_pdf(i))
        text = pdf_text(blocks)
        out['pdf_text'].append(
            (skey, url, _hl.sha256(text.encode('utf-8')).hexdigest(),
             len({b[0] for b in blocks}), len(blocks))
        )
        for si, bi, nc in pdf_spans(blocks):
            out['pdf_spans'].append((skey, url, si, bi, nc))


# ----------------------------------------------------------- text sketches


def gen_minhash(sf_dir: str, skey: int, out: dict, k=64, bands=16, shingle=5, max_bucket=512) -> None:
    t = _read(sf_dir, 'documents')
    ids = t['doc_id'].to_pylist()
    texts = t['text'].to_pylist()
    rows_per_band = k // bands
    buckets = defaultdict(list)
    for doc_id, text in zip(ids, texts):
        sig = minhash_signature(text, k, shingle)
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band:(b + 1) * rows_per_band]))
            buckets[key].append(doc_id)
    counts = defaultdict(int)
    for members in buckets.values():
        if len(members) > max_bucket:  # r5: mirrors the engine bucket cap
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                counts[(members[i], members[j])] += 1
    for (a, b), c in sorted(counts.items()):
        out['minhash_candidates'].append((skey, a, b, c))


def gen_winnow(sf_dir: str, skey: int, out: dict, k=25, w=16, max_bucket=50) -> None:
    """Sequential winnowing-pairs twin: per-doc fingerprint sets
    (oracle_kernels.winnow_fingerprint_set), inverted index, fps in
    more than ``max_bucket`` docs dropped, shared-fp counts per pair."""
    from oracle_kernels import winnow_fingerprint_set

    t = _read(sf_dir, 'documents')
    ids = t['doc_id'].to_pylist()
    texts = t['text'].to_pylist()
    index = defaultdict(list)
    for doc_id, text in zip(ids, texts):
        for fp in winnow_fingerprint_set(text, k, w):
            index[fp].append(doc_id)
    counts = defaultdict(int)
    for members in index.values():
        if len(members) > max_bucket:
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                counts[(members[i], members[j])] += 1
    for (a, b), c in sorted(counts.items()):
        out['winnow_pairs'].append((skey, a, b, c))


def gen_neardup_clusters(
    sf_dir: str, skey: int, out: dict, threshold=0.8, k=64, bands=16, shingle=5, n=3
) -> None:
    """Sequential twin of training.cluster.neardup_clusters: MinHash
    candidates → exact n-gram Jaccard ≥ threshold (rounded like
    F.round(_, 6)) → union-find → min-id representative per node."""
    from oracle_kernels import jaccard as ngram_jaccard_seq
    from oracle_kernels import round_half_up as spark_round
    from oracle_kernels import word_ngram_set as word_ngrams_seq

    t = _read(sf_dir, 'documents')
    ids = t['doc_id'].to_pylist()
    texts = dict(zip(ids, t['text'].to_pylist()))
    rows_per_band = k // bands
    buckets = defaultdict(list)
    for doc_id in ids:
        sig = minhash_signature(texts[doc_id], k, shingle)
        for b in range(bands):
            buckets[(b, tuple(sig[b * rows_per_band:(b + 1) * rows_per_band]))].append(doc_id)
    cand = set()
    for members in buckets.values():
        if len(members) > 512:  # r5: mirrors the engine bucket cap
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    grams = {d: word_ngrams_seq(texts[d], n) for d in ids}
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(cand):
        if spark_round(ngram_jaccard_seq(grams[a], grams[b]), 6) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    for d in sorted(ids):
        out['neardup_clusters'].append((skey, d, find(d)))


def gen_bpe(sf_dir: str, skey: int, out: dict) -> None:
    """Sequential BPE twin (oracle_kernels.bpe_encode, published GPT-2
    word loop) — the merge table and pre-tokenizer regex are DATA
    constants imported from the package (like the minhash params), the
    merge algorithm is independently implemented."""
    from markdown_articles_tool_spark.training.bpe import MERGES, PRETOK_PATTERN
    from oracle_kernels import bpe_encode, bpe_tokens_sha

    t = _read(sf_dir, 'documents')
    for doc_id, text in zip(t['doc_id'].to_pylist(), t['text'].to_pylist()):
        ids = bpe_encode(text, MERGES, PRETOK_PATTERN)
        out['bpe_tokens'].append((skey, doc_id, len(ids), bpe_tokens_sha(ids)))


def gen_lm(sf_dir: str, skey: int, out: dict) -> None:
    """CCNet-style perplexity filter twin: train the stupid-backoff
    trigram LM on the lang='en' slice with the sequential trainer
    (index loops + defaultdicts), score every document with the plain
    per-position scorer — vs the engine's Spark groupBy trainer +
    memoized batch scorer."""
    from oracle_kernels import lm_counts_seq, lm_ppl_seq

    t = _read(sf_dir, 'documents')
    ids = t['doc_id'].to_pylist()
    texts = t['text'].to_pylist()
    langs = t['lang'].to_pylist()
    model = lm_counts_seq(
        [x for x, lg in zip(texts, langs) if lg == 'en'], min_count=2
    )
    for d, x in zip(ids, texts):
        n, ppl = lm_ppl_seq(x, model)
        out['lm_perplexity'].append((skey, d, n, ppl))


def gen_pii(sf_dir: str, skey: int, out: dict) -> None:
    """PII scrub twin: shared input construction (corpus.pii_plant,
    like warc_file_bytes for the WARC tier), then the index-walk
    detectors + forward-parity Luhn — vs the engine's coarse-regex
    runs + reversed-enumerate Luhn."""
    import hashlib

    from oracle_kernels import pii_redact_seq

    t = _read(sf_dir, 'documents')
    for d, x in zip(t['doc_id'].to_pylist(), t['text'].to_pylist()):
        red, ne, nip, ncc, nph = pii_redact_seq(corpus.pii_plant(int(d), x))
        out['pii_redact'].append(
            (skey, d, ne, nip, ncc, nph,
             hashlib.sha256(red.encode('utf-8')).hexdigest()))


def gen_mojibake(sf_dir: str, skey: int, out: dict) -> None:
    """Mojibake repair twin: shared input construction
    (corpus.mojibake_plant), then the index-walk fixer with the
    from-scratch strict UTF-8 decoder — vs the engine's regex scan +
    codec round-trip."""
    import hashlib

    from oracle_kernels import mojibake_fix_seq

    t = _read(sf_dir, 'documents')
    for d, x in zip(t['doc_id'].to_pylist(), t['text'].to_pylist()):
        fixed, n, r = mojibake_fix_seq(corpus.mojibake_plant(int(d), x))
        out['mojibake_fix'].append(
            (skey, d, n, r, hashlib.sha256(fixed.encode('utf-8')).hexdigest()))


def gen_clean(sf_dir: str, skey: int, out: dict) -> None:
    """Composed hygiene twin: the chained sequential twins
    (mojibake_fix_seq → pii_redact_seq) produce the clean text; the
    quality verdict over it is computed by DuckDB SQL at oracle time
    (the token/repetition CTEs retargeted in __spark_entry__)."""
    import hashlib

    from oracle_kernels import mojibake_fix_seq, pii_redact_seq

    t = _read(sf_dir, 'documents')
    for d, x in zip(t['doc_id'].to_pylist(), t['text'].to_pylist()):
        planted = corpus.pii_plant(int(d), corpus.mojibake_plant(int(d), x))
        fixed, _n, _r = mojibake_fix_seq(planted)
        red, ne, nip, ncc, nph = pii_redact_seq(fixed)
        out['clean_corpus'].append(
            (skey, d, red, ne + nip + ncc + nph,
             hashlib.sha256(red.encode('utf-8')).hexdigest()))


def gen_simhash(sf_dir: str, skey: int, out: dict, max_hamming=3) -> None:
    t = _read(sf_dir, 'documents')
    ids = t['doc_id'].to_pylist()
    texts = t['text'].to_pylist()
    sh = {d: simhash64(x) for d, x in zip(ids, texts)}
    buckets = defaultdict(list)
    for d in ids:
        u = sh[d] & 0xFFFFFFFFFFFFFFFF
        for b in range(4):
            buckets[(b, (u >> (b * 16)) & 0xFFFF)].append(d)
    pairs = set()
    for members in buckets.values():
        if len(members) > 1024:  # r5: mirrors the engine bucket cap
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    for a, b in sorted(pairs):
        ham = bin((sh[a] ^ sh[b]) & 0xFFFFFFFFFFFFFFFF).count('1')
        if ham <= max_hamming:
            out['simhash_neardup'].append((skey, a, b, ham))


# ------------------------------------------------------------- embeddings


def _load_emb(sf_dir: str):
    t = _read(sf_dir, 'embeddings')
    ids = t['vec_id'].to_pylist()
    embs = t['embedding'].to_pylist()  # list[list[float32-as-python-float]]
    return ids, embs


def gen_ann_lsh(sf_dir: str, skey: int, out: dict, k=5, n_planes=32, band_bits=8) -> None:
    import numpy as np

    ids, embs = _load_emb(sf_dir)
    mat = np.stack([np.asarray(v, dtype='float64') for v in embs])
    keys = _pack_band_keys(mat, n_planes, band_bits)
    buckets = defaultdict(set)
    by_id = dict(zip(ids, embs))
    for vid, row in zip(ids, keys):
        for band, bk in enumerate(row):
            buckets[(band, int(bk))].add(vid)
    for qid in sorted(i for i in ids if i % 50 == 0):
        cands = set()
        for band, bk in enumerate(keys[ids.index(qid)]):
            members = buckets[(band, int(bk))]
            if len(members) > 512:  # r5: mirrors the engine bucket cap
                continue
            cands |= members
        cands.discard(qid)
        scored = sorted(
            ((spark_round9(cosine_seq(by_id[qid], by_id[c])), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_sim, nid) in enumerate(scored[:k], start=1):
            out['ann_lsh_topk'].append((skey, qid, nid, rank))


def gen_int8(sf_dir: str, skey: int, out: dict, k=5, n_planes=32, band_bits=8) -> None:
    """INT8 quantization + compressed LSH top-k twins: the scalar
    pure-python quantizer and integer dot (vs the engine's numpy batch
    kernel + JVM Column integer fold); bucketing mirrors gen_ann_lsh
    (signatures on the ORIGINAL floats, 512 bucket cap)."""
    import hashlib

    import numpy as np

    from oracle_kernels import int8_dot_seq, int8_quant_seq

    ids, embs = _load_emb(sf_dir)
    qt = {vid: int8_quant_seq([float(t) for t in v]) for vid, v in zip(ids, embs)}
    for vid in sorted(ids):
        s, _q, b = qt[vid]
        out['int8_quant'].append((skey, vid, s, hashlib.sha256(b).hexdigest()))
    mat = np.stack([np.asarray(v, dtype='float64') for v in embs])
    keys = _pack_band_keys(mat, n_planes, band_bits)
    buckets = defaultdict(set)
    for vid, row in zip(ids, keys):
        for band, bk in enumerate(row):
            buckets[(band, int(bk))].add(vid)
    for qid in sorted(i for i in ids if i % 50 == 0):
        cands = set()
        for band, bk in enumerate(keys[ids.index(qid)]):
            members = buckets[(band, int(bk))]
            if len(members) > 512:  # mirrors the engine bucket cap
                continue
            cands |= members
        cands.discard(qid)
        scored = sorted(
            ((int8_dot_seq(qt[qid][1], qt[c][1]), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (dot, nid) in enumerate(scored[:k], start=1):
            out['ann_int8_topk'].append((skey, qid, nid, rank, dot))


def gen_ann_ivf(sf_dir: str, skey: int, out: dict, k=5, n_cells=16, nprobe=4, sample=2048) -> None:
    import numpy as np

    ids, embs = _load_emb(sf_dir)
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    samp = order[:sample]
    mat_all = np.stack([np.asarray(v, dtype='float64') for v in embs])
    cent = kmeans_centroids_from_matrix(mat_all[samp], n_cells)
    assign1 = ivf_assign(mat_all, cent, nprobe=1)
    assignp = ivf_assign(mat_all, cent, nprobe=nprobe)
    lists = defaultdict(list)
    for i, vid in enumerate(ids):
        lists[int(assign1[i][0])].append(vid)
    by_id = dict(zip(ids, embs))
    idx_of = {vid: i for i, vid in enumerate(ids)}
    for qid in sorted(i for i in ids if i % 50 == 0):
        cands = set()
        for cell in assignp[idx_of[qid]]:
            cands.update(lists[int(cell)])
        cands.discard(qid)
        scored = sorted(
            ((spark_round9(cosine_seq(by_id[qid], by_id[c])), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_sim, nid) in enumerate(scored[:k], start=1):
            out['ann_ivf_topk'].append((skey, qid, nid, rank))


def gen_embedding_neardup(sf_dir: str, skey: int, out: dict, threshold=0.45, n_planes=64, band_bits=8) -> None:
    import numpy as np

    ids, embs = _load_emb(sf_dir)
    mat = np.stack([np.asarray(v, dtype='float64') for v in embs])
    keys = _pack_band_keys(mat, n_planes, band_bits)
    buckets = defaultdict(list)
    for vid, row in zip(ids, keys):
        for band, bk in enumerate(row):
            buckets[(band, int(bk))].append(vid)
    pairs = set()
    for members in buckets.values():
        if len(members) > 512:  # r5: mirrors the engine bucket cap
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    by_id = dict(zip(ids, embs))
    for a, b in sorted(pairs):
        if spark_round9(cosine_seq(by_id[a], by_id[b])) >= threshold:
            out['embedding_neardup'].append((skey, a, b))


def gen_span_dedup(sf_dir: str, skey: int, out: dict, k: int = 25) -> None:
    """Twin of training/dedup.dedup_spans: sequential dict-based owner
    assignment over window_hash_list (the independent positional-hash
    twin), removal via a per-char coverage BITMAP (vs the engine's
    interval merge — same spec, different machinery)."""
    t = _read(sf_dir, 'documents')
    docs = sorted(zip(t['doc_id'].to_pylist(), t['text'].to_pylist()))
    from oracle_kernels import window_hash_list

    norm = {d: ' '.join((txt or '').lower().split()) for d, txt in docs}
    hs = {d: window_hash_list(norm[d], k) for d, _ in docs}
    owner: dict = {}
    for d, _ in docs:
        for p, h in enumerate(hs[d]):
            if h not in owner or (d, p) < owner[h]:
                owner[h] = (d, p)
    for d, _ in docs:
        nm = norm[d]
        cover = bytearray(len(nm))
        n_dup = 0
        for p, h in enumerate(hs[d]):
            if owner[h] != (d, p):
                n_dup += 1
                for i in range(p, min(p + k, len(nm))):
                    cover[i] = 1
        clean = ''.join(ch for ch, c in zip(nm, cover) if not c)
        n_win = len(hs[d])
        out['span_dedup'].append(
            (skey, d, n_win, n_dup, sum(cover),
             hashlib.sha256(clean.encode('utf-8')).hexdigest()))


def gen_bloom(sf_dir: str, skey: int, out: dict,
              m_bits: int = 2048, k_hashes: int = 3) -> None:
    """Twin of training/bloomdedup.bloom_dedup over the documents
    table: historical = doc_id % 3 != 0, new batch = the rest; digest
    = sha256(text) hex; positions from the pinned xxhash64 twin via
    Kirsch-Mitzenmacher double hashing — exact integer replay of the
    frozen spec, INCLUDING the deterministic false positives (m is
    deliberately small at test scale so FPs occur and get checked)."""
    t = _read(sf_dir, 'documents')
    m64 = (1 << 64) - 1

    def positions(digest: str):
        u = xxhash64_spark(digest.encode('utf-8')) & m64
        h1, h2 = u >> 32, u & 0xFFFFFFFF
        return [(h1 + i * h2) % m_bits for i in range(k_hashes)]

    bits = set()
    new_rows = []
    for doc_id, text in zip(t['doc_id'].to_pylist(), t['text'].to_pylist()):
        digest = hashlib.sha256(text.encode('utf-8')).hexdigest()
        if doc_id % 3 != 0:
            bits.update(positions(digest))
        else:
            new_rows.append((doc_id, digest))
    for doc_id, digest in new_rows:
        novel = not all(p in bits for p in positions(digest))
        out['bloom_dedup'].append((skey, doc_id, novel))


# ------------------------------------------------------------------ main

SCHEMAS = {
    'extract_links_corpus': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('ord', pa.int32()),
         ('link', pa.string()), ('w', pa.int32()), ('h', pa.int32())]
    ),
    'transform_corpus': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('text_sha', pa.string())]
    ),
    'corpus_images': pa.schema(
        [('skey', pa.int64()), ('real_path', pa.string()), ('content_sha', pa.string())]
    ),
    'media_metadata': pa.schema(
        [('skey', pa.int64()), ('path', pa.string()), ('size_bytes', pa.int64()),
         ('magic', pa.string()), ('media_type', pa.string()), ('fake_checksum', pa.string())]
    ),
    'media_features': pa.schema(
        [('skey', pa.int64()), ('path', pa.string()), ('bucket', pa.int32()),
         ('ratio', pa.float64()), ('entropy', pa.float64())]
    ),
    'media_frames': pa.schema(
        [('skey', pa.int64()), ('path', pa.string()), ('frame_idx', pa.int32()),
         ('frame_offset', pa.int64()), ('frame_len', pa.int32()),
         ('frame_sha16', pa.string())]
    ),
    'host_stats': pa.schema(
        [('skey', pa.int64()), ('host', pa.string()), ('n_pages', pa.int64()),
         ('text_chars', pa.int64()), ('n_en', pa.int64()),
         ('first_epoch', pa.int64()), ('last_epoch', pa.int64())]
    ),
    'main_content': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('main_sha', pa.string()),
         ('n_blocks', pa.int32()), ('n_kept', pa.int32())]
    ),
    'content_spans': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('ord', pa.int32()),
         ('tag', pa.string()), ('n_chars', pa.int32()), ('link_density', pa.float64()),
         ('kept', pa.bool_()), ('start', pa.int64()), ('end', pa.int64())]
    ),
    'pdf_text': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('text_sha', pa.string()),
         ('n_streams', pa.int32()), ('n_blocks', pa.int32())]
    ),
    'pdf_spans': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('stream_idx', pa.int32()),
         ('block_idx', pa.int32()), ('n_chars', pa.int32())]
    ),
    'minhash_candidates': pa.schema(
        [('skey', pa.int64()), ('a_id', pa.int64()), ('b_id', pa.int64()),
         ('n_bands_matched', pa.int64())]
    ),
    'winnow_pairs': pa.schema(
        [('skey', pa.int64()), ('a_id', pa.int64()), ('b_id', pa.int64()),
         ('n_shared', pa.int64())]
    ),
    'neardup_clusters': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()), ('cluster_rep', pa.int64())]
    ),
    'bpe_tokens': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()), ('n_bpe_tokens', pa.int32()),
         ('tokens_sha', pa.string())]
    ),
    'simhash_neardup': pa.schema(
        [('skey', pa.int64()), ('a_id', pa.int64()), ('b_id', pa.int64()),
         ('hamming', pa.int32())]
    ),
    'ann_lsh_topk': pa.schema(
        [('skey', pa.int64()), ('query_id', pa.int64()), ('neighbor_id', pa.int64()),
         ('rank', pa.int32())]
    ),
    'ann_ivf_topk': pa.schema(
        [('skey', pa.int64()), ('query_id', pa.int64()), ('neighbor_id', pa.int64()),
         ('rank', pa.int32())]
    ),
    'embedding_neardup': pa.schema(
        [('skey', pa.int64()), ('a_id', pa.int64()), ('b_id', pa.int64())]
    ),
    'span_dedup': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()), ('n_windows', pa.int32()),
         ('n_dup_windows', pa.int32()), ('n_removed_chars', pa.int32()),
         ('clean_sha', pa.string())]
    ),
    'bloom_dedup': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()), ('novel', pa.bool_())]
    ),
    'lineage': pa.schema(
        [('skey', pa.int64()), ('pass_idx', pa.int32()), ('shard', pa.int32()),
         ('n_docs', pa.int64()), ('n_links', pa.int64()),
         ('status', pa.string()), ('n_status', pa.int64())]
    ),
    'html_tables': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('table_idx', pa.int32()),
         ('row_idx', pa.int32()), ('col_idx', pa.int32()), ('cell', pa.string())]
    ),
    'line_dedup': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('n_lines', pa.int64()),
         ('n_kept', pa.int64()), ('dedup_sha', pa.string())]
    ),
    'page_meta': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('title', pa.string()),
         ('meta_description', pa.string()), ('canonical', pa.string()),
         ('og_title', pa.string()), ('robots_noindex', pa.bool_()),
         ('robots_nofollow', pa.bool_())]
    ),
    'page_outlinks': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('ord', pa.int32()),
         ('href', pa.string()), ('abs_url', pa.string()), ('anchor', pa.string())]
    ),
    'host_pagerank': pa.schema(
        [('skey', pa.int64()), ('host', pa.string()), ('rank_units', pa.int64())]
    ),
    'warc_responses': pa.schema(
        [('skey', pa.int64()), ('file_name', pa.string()), ('rec_ord', pa.int32()),
         ('url', pa.string()), ('warc_date', pa.string()), ('http_status', pa.int32()),
         ('mime', pa.string()), ('charset', pa.string()), ('n_bytes', pa.int64()),
         ('text_sha', pa.string())]
    ),
    'warc_main_content': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('main_sha', pa.string()),
         ('n_blocks', pa.int32()), ('n_kept', pa.int32())]
    ),
    'warc_cdx': pa.schema(
        [('skey', pa.int64()), ('file_name', pa.string()), ('ord', pa.int32()),
         ('warc_type', pa.string()), ('url', pa.string()), ('surt', pa.string()),
         ('offset', pa.int64()), ('length', pa.int64()), ('addressable', pa.bool_()),
         ('warc_date', pa.string())]
    ),
    'warc_clean': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('clean_text', pa.string()),
         ('n_pii', pa.int32()), ('clean_sha', pa.string())]
    ),
    'warc_redirects': pa.schema(
        [('skey', pa.int64()), ('file_name', pa.string()), ('rec_ord', pa.int32()),
         ('url', pa.string()), ('warc_date', pa.string()),
         ('http_status', pa.int32()), ('location', pa.string()),
         ('loc_abs', pa.string())]
    ),
    'warc_revisits': pa.schema(
        [('skey', pa.int64()), ('file_name', pa.string()), ('rec_ord', pa.int32()),
         ('url', pa.string()), ('warc_date', pa.string()), ('profile', pa.string()),
         ('refers_to_uri', pa.string()), ('refers_to_date', pa.string()),
         ('http_status', pa.int32())]
    ),
    'robots_rules': pa.schema(
        [('skey', pa.int64()), ('host', pa.string()), ('group_agent', pa.string()),
         ('ord', pa.int32()), ('verb', pa.string()), ('value', pa.string())]
    ),
    'crawl_allowed': pa.schema(
        [('skey', pa.int64()), ('url', pa.string()), ('ord', pa.int32()),
         ('abs_url', pa.string()), ('dst_host', pa.string()),
         ('allowed', pa.bool_())]
    ),
    'frontier_bloom': pa.schema(
        [('skey', pa.int64()), ('abs_url', pa.string()), ('dst_host', pa.string()),
         ('n_refs', pa.int64()), ('rank_units', pa.int64())]
    ),
    'crawl_frontier': pa.schema(
        [('skey', pa.int64()), ('abs_url', pa.string()), ('dst_host', pa.string()),
         ('n_refs', pa.int64()), ('rank_units', pa.int64())]
    ),
    'wat_records': pa.schema(
        [('skey', pa.int64()), ('file_name', pa.string()), ('rec_ord', pa.int32()),
         ('url', pa.string()), ('title', pa.string()), ('n_links', pa.int32()),
         ('payload_sha', pa.string())]
    ),
    'lm_perplexity': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()),
         ('n_scored', pa.int32()), ('ppl', pa.float64())]
    ),
    'pii_redact': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()),
         ('n_emails', pa.int32()), ('n_ips', pa.int32()),
         ('n_ccs', pa.int32()), ('n_phones', pa.int32()),
         ('redacted_sha', pa.string())]
    ),
    'mojibake_fix': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()),
         ('n_runs_fixed', pa.int32()), ('n_rounds', pa.int32()),
         ('fixed_sha', pa.string())]
    ),
    'clean_corpus': pa.schema(
        [('skey', pa.int64()), ('doc_id', pa.int64()),
         ('clean_text', pa.string()), ('n_pii', pa.int32()),
         ('clean_sha', pa.string())]
    ),
    'host_budget': pa.schema(
        [('skey', pa.int64()), ('host', pa.string()), ('budget', pa.int32())]
    ),
    'int8_quant': pa.schema(
        [('skey', pa.int64()), ('vec_id', pa.int64()),
         ('scale', pa.float64()), ('q_sha', pa.string())]
    ),
    'ann_int8_topk': pa.schema(
        [('skey', pa.int64()), ('query_id', pa.int64()),
         ('neighbor_id', pa.int64()), ('rank', pa.int32()),
         ('dot', pa.int64())]
    ),
    'sitemap_entries': pa.schema(
        [('skey', pa.int64()), ('host', pa.string()), ('ord', pa.int32()),
         ('kind', pa.string()), ('loc', pa.string()), ('lastmod', pa.string()),
         ('changefreq', pa.string()), ('priority', pa.string())]
    ),
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    out: dict = defaultdict(list)
    for sf_dir in SF_DIRS:
        dk, ek = doc_skey(sf_dir), emb_skey(sf_dir)
        print(f'{sf_dir}: doc_skey={dk} emb_skey={ek}', flush=True)
        gen_corpus(sf_dir, dk, out)
        gen_lineage(sf_dir, dk, out)
        gen_line_dedup(sf_dir, dk, out)
        gen_host_stats(sf_dir, dk, out)
        gen_main_content(sf_dir, dk, out)
        gen_page_graph(sf_dir, dk, out)
        gen_html_tables(sf_dir, dk, out)
        gen_warc(sf_dir, dk, out)
        gen_robots(sf_dir, dk, out)
        gen_pdf(sf_dir, dk, out)
        gen_minhash(sf_dir, dk, out)
        gen_winnow(sf_dir, dk, out)
        gen_neardup_clusters(sf_dir, dk, out)
        gen_simhash(sf_dir, dk, out)
        gen_bpe(sf_dir, dk, out)
        gen_lm(sf_dir, dk, out)
        gen_pii(sf_dir, dk, out)
        gen_mojibake(sf_dir, dk, out)
        gen_clean(sf_dir, dk, out)
        gen_ann_lsh(sf_dir, ek, out)
        gen_int8(sf_dir, ek, out)
        gen_ann_ivf(sf_dir, ek, out)
        gen_embedding_neardup(sf_dir, ek, out)
        gen_bloom(sf_dir, dk, out)
        gen_span_dedup(sf_dir, dk, out)
    for name, schema in SCHEMAS.items():
        cols = list(zip(*out[name])) if out[name] else [[] for _ in schema.names]
        table = pa.table({f: list(c) for f, c in zip(schema.names, cols)}, schema=schema)
        path = os.path.join(OUT_DIR, f'{name}.parquet')
        pq.write_table(table, path)
        print(f'{path}: {table.num_rows} rows')


if __name__ == '__main__':
    main()
