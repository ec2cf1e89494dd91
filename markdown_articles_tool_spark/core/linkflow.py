"""Per-link resolution: skip → resolve → MIME gate → filename (pure Python).

Shared by the sequential oracle and the Spark pipeline's vectorized
UDFs.  Semantics follow the per-link section of the reference's
``ImageDownloader.download_images`` loop
(/root/reference/markdown_toolset/image_downloader.py:96-184).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from pathlib import PurePosixPath
from typing import FrozenSet, Optional, Tuple

from .pathalgebra import PathConfig, resolve_local_download_path
from .wwwtools import filename_from_url, guess_mime_type, is_url


class DedupVariant:
    """Mirrors DeduplicationVariant (deduplicators/__init__.py:7-11)."""

    DISABLED = 0
    NAMES_HASHING = 1
    CONTENT_HASH = 2


@dataclass(frozen=True)
class TransformConfig:
    """Run-scoped flags, mirroring ArticleProcessor's knobs
    (article_processor.py:26-64) minus anything filesystem-bound."""

    paths: PathConfig = field(default_factory=PathConfig)
    skip_list: FrozenSet[str] = frozenset()
    skip_all_errors: bool = False
    download_incorrect_mime_types: bool = False
    deduplication: int = DedupVariant.DISABLED
    replace_image_names: bool = False
    # input formats: ('md',), ('html',), ('md', 'html'), ('html', 'md')
    input_formats: Tuple[str, ...] = ('md',)
    # derive article_base_url per row from the page url (remote-article
    # semantics, article_downloader.py:40-57 + www_tools.py:119-126)
    derive_base_url_from_doc_url: bool = True
    # raise (like the reference's assert, image_downloader.py:116) when
    # one document repeats an image URL that already mapped successfully
    strict_duplicate_assert: bool = False
    # co-locate each host's URLs into a bounded number of fetch
    # partitions (fetch_distinct(salt_by_host=True)) so a live
    # fetcher's per_host_interval bounds the CLUSTER-WIDE rate against
    # any one host to ~salt_buckets/interval, not partitions/interval
    salt_fetch_by_host: bool = False


def resolve_download_url(
    cfg: TransformConfig, link: str, base_url: str
) -> Tuple[Optional[str], Optional[str]]:
    """skip-list + relative-link resolution
    (image_downloader.py:194-210).

    Returns ``(status_if_dropped, download_url)``; ``download_url`` is
    None when skipped.
    """
    if link in cfg.skip_list:
        return 'skipped', None
    if not is_url(link):
        if base_url:
            return None, f'{base_url}/{link}'
        return None, resolve_local_download_path(cfg.paths.article_file_path, link)
    return None, link


def mime_gate(cfg: TransformConfig, download_url: str) -> bool:
    """True if the link survives the MIME gate
    (image_downloader.py:124-131)."""
    if cfg.download_incorrect_mime_types:
        return True
    return guess_mime_type(download_url) is not None


def remote_filename(
    final_url: str,
    content_type: Optional[str],
    content_disposition: Optional[str] = None,
) -> Optional[str]:
    """Filename for a remote fetch (www_tools.py:80-116)."""
    return filename_from_url(final_url, content_type, content_disposition)


def local_filename(download_path: str) -> str:
    """``Path.name`` for local reads (image_downloader.py:277-282)."""
    return PurePosixPath(download_path).name


def hashed_image_name(image_filename: str, content: bytes) -> str:
    """``replace_image_names`` rename (image_downloader.py:333-341):
    ``{sha256_hex}.{ext}`` — a missing extension renders literal
    ``None`` via the reference's f-string."""
    parts = image_filename.rsplit('.', 1)
    ext = parts[1] if len(parts) == 2 else None
    return f'{hashlib.sha256(content).hexdigest()}.{ext}'


def name_hash_filename(image_filename: str, content: bytes) -> str:
    """NAMES_HASHING dedup rename (deduplicators/name_hash_dedup.py:13-17):
    ``{sha256_hex}{Path(filename).suffix}`` (suffix keeps the dot, or is
    empty when there is none)."""
    return f'{hashlib.sha256(content).hexdigest()}{PurePosixPath(image_filename).suffix}'


def fixed_collision_filename(link: str, image_filename: str) -> str:
    """``_fix_paths`` rename (image_downloader.py:303-312)."""
    return f'{hashlib.sha256(link.encode()).hexdigest()}_{image_filename}'
