"""Image path algebra (pure Python, UDF-safe).

Reimplements the *semantics* of the reference's ``OutPathMaker``
(/root/reference/markdown_toolset/out_path_maker.py:56-111) and the
path-derivation helpers of ``ImageDownloader``
(image_downloader.py:229-236, 303-341) over ``PurePosixPath`` so the
same code runs in the sequential oracle and inside pandas UDFs on
executors (no filesystem access, POSIX semantics everywhere).

Observable quirks preserved:

* ``get_document_img_path`` returns a *path object* in the reference;
  the mapping stores ``'/'.join(path.parts)`` for normal entries
  (image_downloader.py:244) — which renders an absolute path with a
  leading double slash — but ``str(path)`` for content-dedup entries
  (deduplicators/content_hash_dedup.py:38).  We carry both renderings.
* Joining an absolute second component replaces the prefix
  (``Path('images') / '/abs'`` → ``/abs``), which matters for
  ``save_hierarchy`` with absolute image paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import PurePosixPath
from typing import Optional, Tuple

from .wwwtools import is_url, remove_protocol_prefix


@dataclass(frozen=True)
class PathConfig:
    """Run-scoped path parameters (ArticleProcessor template variables
    already substituted, article_processor.py:74-86)."""

    article_file_path: str = '/work/article.md'
    article_base_url: str = ''
    img_dir_name: str = 'images'
    img_public_path: Optional[str] = None
    save_hierarchy: bool = False

    def images_dir(self) -> PurePosixPath:
        d = PurePosixPath(self.img_dir_name)
        if d.is_absolute():
            return d
        return PurePosixPath(self.article_file_path).parent / d


def _make_relative(p: PurePosixPath) -> PurePosixPath:
    return PurePosixPath('/'.join(p.parts[1:])) if p.is_absolute() else p


def _is_relative_to(p: PurePosixPath, other) -> bool:
    try:
        p.relative_to(other)
        return True
    except ValueError:
        return False


def get_real_path(
    cfg: PathConfig, image_url: str, image_filename: str, base_url: Optional[str] = None
) -> str:
    """Filesystem path the image is written to (out_path_maker.py:56-96).

    ``image_url`` here is the *directory* of the link with the protocol
    stripped (``image_local_url``, image_downloader.py:229-236).
    ``base_url`` overrides the config's article base URL for per-row
    derivation (ArticleDownloader derives it per article,
    article_downloader.py:37-68).  Returns a posix string for the
    images sink table.
    """
    images_dir = cfg.images_dir()
    if not cfg.save_hierarchy:
        return str(images_dir / image_filename)

    if base_url is None:
        base_url = cfg.article_base_url
    base_wo_prefix = remove_protocol_prefix(base_url)

    if is_url(base_url):
        if is_url(image_url):
            iu = remove_protocol_prefix(image_url)
            if iu.startswith(base_wo_prefix):
                iu = str(_make_relative(PurePosixPath(iu[len(base_wo_prefix):])))
            result = PurePosixPath(iu)
        else:
            bu = '/'.join(PurePosixPath(base_wo_prefix).parts[1:])
            iu_p = PurePosixPath(image_url)
            if iu_p.is_absolute():
                result = iu_p.relative_to(bu) if _is_relative_to(iu_p, bu) else _make_relative(iu_p)
            else:
                result = iu_p
    else:
        iup = PurePosixPath(remove_protocol_prefix(image_url))
        if iup.is_absolute():
            if _is_relative_to(iup, base_url):
                iup = iup.relative_to(base_url)
            else:
                iup = _make_relative(iup)
        result = iup

    return str(images_dir / str(result) / image_filename)


def get_document_img_path(cfg: PathConfig, image_url: str, image_filename: str) -> Tuple[str, str]:
    """Path written into the document (out_path_maker.py:98-104).

    Returns ``(join_parts_form, posix_form)`` — the two renderings the
    reference uses (see module docstring).
    """
    prefix = PurePosixPath(cfg.img_public_path if cfg.img_public_path is not None else cfg.img_dir_name)
    if cfg.save_hierarchy:
        prefix = prefix / image_url
    p = prefix / image_filename
    return '/'.join(p.parts), str(p)


def image_local_url(link: str) -> str:
    """Directory of the link with protocol stripped
    (image_downloader.py:229-236)."""
    return PurePosixPath(remove_protocol_prefix(link)).parent.as_posix()


def resolve_local_download_path(article_file_path: str, link: str) -> str:
    """Local-article branch of ``_get_image_download_url``
    (image_downloader.py:194-210): ``article_dir / link``."""
    return str(PurePosixPath(article_file_path).parent / link)
