"""Sequential oracle: reference-semantics document transform.

A from-scratch, dependency-free reimplementation of the reference's
per-article pipeline (ArticleProcessor.process →
ArticleTransformer.run → ImageDownloader.download_images →
replace_strings; see /root/reference/markdown_toolset/
article_processor.py:66-149, image_downloader.py:96-184,
string_tools.py:42-51) used ONLY for differential testing: the Spark
pipeline must produce byte-identical ``text_out`` per url and the same
images inventory.  Fetches are modeled via in-memory asset stores (the
sandbox has no network; see FIXTURES.md §2).

Documents are processed in sorted-url order — the canonical total
order the distributed pipeline uses for cluster-wide first-wins
semantics (the reference processes one article per run, so cross-
document ordering is ours to define; SURVEY.md §2.5 A2/A7).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from pathlib import PurePosixPath
from typing import Dict, List, Optional, Tuple

from .core import docfold
from .core.docfold import LinkRecord
from .core.linkflow import (
    DedupVariant,
    TransformConfig,
    hashed_image_name,
    local_filename,
    mime_gate,
    name_hash_filename,
    remote_filename,
    resolve_download_url,
)
from .core.mdparse import extract_html_image_links, extract_image_links
from .core.pathalgebra import get_document_img_path, get_real_path, image_local_url
from .core.wwwtools import fetch_key, get_base_url, is_url


@dataclass
class Asset:
    """Modeled HTTP response (FIXTURES.md §2)."""

    content: bytes
    content_type: str = 'image/png'
    status: int = 200
    final_url: Optional[str] = None  # post-redirect URL; None → request URL
    content_disposition: Optional[str] = None  # raw header (F7 fallback branch)


@dataclass
class OracleResult:
    texts: Dict[str, str] = field(default_factory=dict)  # url -> text_out
    images: Dict[str, bytes] = field(default_factory=dict)  # real_path -> stored bytes
    # url -> list of (pass_name, ord, src, status, dst or None)
    audit: Dict[str, List[Tuple[str, int, str, str, Optional[str]]]] = field(default_factory=dict)


def _model_resize(content: bytes, w: Optional[int], h: Optional[int]) -> bytes:
    """Deterministic stand-in for the PIL re-encode on write
    (image_downloader.py:212-227): PIL is not available in this
    environment, so resized bytes are a tagged deterministic function
    of (content, w, h).  The Spark pipeline uses the same model."""
    return b'RESIZED:%dx%d:' % (w if w is not None else -1, h if h is not None else -1) + content


class ReferenceOracle:
    """Run the whole-corpus transform sequentially with global state."""

    def __init__(
        self,
        cfg: TransformConfig,
        remote_assets: Dict[str, Asset],
        local_assets: Optional[Dict[str, bytes]] = None,
    ) -> None:
        self.cfg = cfg
        self.remote_assets = remote_assets
        self.local_assets = local_assets or {}
        # global content-hash dedup state (content_hash_dedup.py:17)
        self._hash_to_filename: Dict[bytes, str] = {}

    def run(self, docs: List[Tuple[str, str]]) -> OracleResult:
        """docs: list of (url, text); processed in sorted-url order."""
        res = OracleResult()
        for url, text in sorted(docs, key=lambda d: d[0]):
            cur = text
            for fmt in self.cfg.input_formats:
                cur = self._run_pass(url, cur, fmt, res)
            res.texts[url] = cur
        return res

    # -- one transformer pass over one document ------------------------
    def _run_pass(self, url: str, text: str, fmt: str, res: OracleResult) -> str:
        cfg = self.cfg
        base_url = get_base_url(url) if cfg.derive_base_url_from_doc_url else cfg.paths.article_base_url
        base_url = base_url or ''
        links = extract_image_links(text) if fmt == 'md' else extract_html_image_links(text)

        records: List[LinkRecord] = []
        mapped_srcs = set()
        for ord_, (src, w, h) in enumerate(links):
            rec = self._process_link(url, base_url, ord_, src, w, h, mapped_srcs, res)
            records.append(rec)
            if rec.status == docfold.OK:
                mapped_srcs.add(rec.src)
            res.audit.setdefault(url, []).append(
                (fmt, ord_, src, rec.status, rec.dedup_path or rec.doc_path)
            )
        return docfold.fold_and_rewrite(text, records, cfg.paths)

    def _process_link(
        self,
        url: str,
        base_url: str,
        ord_: int,
        src: str,
        w: Optional[int],
        h: Optional[int],
        mapped_srcs: set,
        res: OracleResult,
    ) -> LinkRecord:
        cfg = self.cfg
        if cfg.strict_duplicate_assert and src in mapped_srcs:
            raise AssertionError(f'BUG: already downloaded image "{src}"...')

        drop, download_url = resolve_download_url(cfg, src, base_url)
        if drop:
            return LinkRecord(ord_, src, drop)
        if not mime_gate(cfg, download_url):
            return LinkRecord(ord_, src, docfold.MIME_DROP)

        try:
            if is_url(download_url):
                asset = self.remote_assets.get(fetch_key(download_url))
                if asset is None or asset.status >= 400:
                    raise OSError(f'fetch failed: {download_url}')
                content = asset.content
                filename = remote_filename(
                    asset.final_url or fetch_key(download_url),
                    asset.content_type,
                    asset.content_disposition,
                )
            else:
                if download_url not in self.local_assets:
                    raise FileNotFoundError(download_url)
                content = self.local_assets[download_url]
                filename = local_filename(download_url)

            if filename is None:
                return LinkRecord(ord_, src, docfold.NO_FILENAME)
            if cfg.replace_image_names:
                filename = hashed_image_name(filename, content)
        except Exception:
            if cfg.skip_all_errors:
                return LinkRecord(ord_, src, docfold.ERROR)
            raise

        need_rescaling = w is not None or h is not None

        # deduplication (bypassed for rescaled links, image_downloader.py:163-169)
        if not need_rescaling:
            if cfg.deduplication == DedupVariant.CONTENT_HASH:
                digest = hashlib.sha256(content).digest()
                existed = self._hash_to_filename.get(digest)
                if existed is not None:
                    prefix = cfg.paths.img_public_path if cfg.paths.img_public_path else cfg.paths.img_dir_name
                    dedup_path = str(PurePosixPath(prefix) / existed)
                    return LinkRecord(ord_, src, docfold.OK, dedup_path=dedup_path)
                self._hash_to_filename[digest] = filename
            elif cfg.deduplication == DedupVariant.NAMES_HASHING:
                filename = name_hash_filename(filename, content)

        local_url = image_local_url(src)
        real_path = get_real_path(cfg.paths, local_url, filename, base_url)

        # _fix_name_collision (image_downloader.py:314-331): only with
        # replace_image_names and an already-written file at real_path
        if cfg.replace_image_names and real_path in res.images:
            # byte-compare is against the RAW fetched content, not the
            # resized form (image_downloader.py:317-319)
            if res.images[real_path] == content:
                # reference bug kept: returns image_url as image_local_url
                local_url = src
            else:
                n = 0
                while real_path in res.images:
                    filename_n = f'{n}{filename}'
                    real_path = get_real_path(cfg.paths, local_url, filename_n, base_url)
                    n += 1
                filename = filename_n
                local_url = image_local_url(src)
                real_path = get_real_path(cfg.paths, local_url, filename, base_url)

        doc_path, doc_path_posix = get_document_img_path(cfg.paths, local_url, filename)

        # image write with exists-skip (image_downloader.py:284-301)
        if real_path not in res.images:
            res.images[real_path] = self._stored_bytes(content, w, h, need_rescaling)

        return LinkRecord(
            ord_,
            src,
            docfold.OK,
            doc_path=doc_path,
            doc_path_posix=doc_path_posix,
            filename=filename,
        )

    @staticmethod
    def _stored_bytes(content: bytes, w, h, need_rescaling: bool) -> bytes:
        return _model_resize(content, w, h) if need_rescaling else content
