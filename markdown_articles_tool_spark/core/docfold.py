"""Per-document mapping fold + ordered rewrite (pure Python, UDF-safe).

The last mile of the pipeline: given the per-link results (already
computed relationally — fetch, dedup, paths), build the insertion-
ordered replacement mapping exactly like the reference's per-article
loop, then rewrite the document text.

Semantics reproduced:

* first-wins mapping via ``setdefault``
  (/root/reference/markdown_toolset/image_downloader.py:244,
  deduplicators/content_hash_dedup.py:38);
* path-collision repair ``_fix_paths`` (image_downloader.py:303-312)
  including its ``Path == str`` comparison quirk: the collision check
  only ever matches mapping entries stored as *path objects* — i.e.
  content-dedup entries — because normal entries are stored as strings
  and ``Path(...) == 'str'`` is ``False``;
* non-OK links (skip-list, MIME gate, empty filename, fetch errors
  under ``skip_all_errors``) produce no mapping entry, so their text is
  untouched (image_downloader.py:118-161);
* line-by-line cascading substring replace in insertion order
  (string_tools.py:42-51) — lines split on ``'\\n'`` only, matching
  ``StringIO`` iteration, NOT ``str.splitlines``.

``LinkRecord`` fields are plain strings/ints so the same structure maps
1:1 onto the Spark struct column consumed by the rewrite pandas UDF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

# link statuses (non-OK → no mapping entry, no image write)
OK = 'ok'
SKIPPED = 'skipped'            # skip-list hit (image_downloader.py:262-269)
MIME_DROP = 'mime_drop'        # MIME gate (image_downloader.py:124-131)
NO_FILENAME = 'no_filename'    # empty derived filename (image_downloader.py:143-147)
ERROR = 'error'                # fetch/derivation error (image_downloader.py:152-161)


@dataclass
class LinkRecord:
    ord: int                       # extraction order within the pass
    src: str                       # original image URL as it appears in the text
    status: str
    # content-dedup: document path of the first-seen identical image
    # ((public_path or img_dir) / first_filename, content_hash_dedup.py:27-38)
    dedup_path: Optional[str] = None
    # normal path candidates (both renderings, see pathalgebra)
    doc_path: Optional[str] = None          # '/'.join(parts)
    doc_path_posix: Optional[str] = None    # str(Path)
    # final filename — only needed to lazily derive the collision-repair
    # path (sha256(src)_filename), which almost never fires
    filename: Optional[str] = None


def fold_mapping(records: Sequence[LinkRecord], path_cfg=None) -> List[Tuple[str, str]]:
    """Insertion-ordered ``src -> dst`` replacement pairs for one doc.

    ``path_cfg`` (a pathalgebra.PathConfig) is needed only to derive the
    ``_fix_paths`` repair path on a collision — computed lazily because
    collisions only ever fire against content-dedup entries (the
    reference's Path == str quirk) and are rare.
    """
    # (src, dst_render, is_path_entry, dst_posix)
    mapping: List[Tuple[str, str, bool, str]] = []
    seen = set()

    def setdefault(src: str, dst: str, is_path: bool, posix: str) -> None:
        if src not in seen:
            seen.add(src)
            mapping.append((src, dst, is_path, posix))

    for r in sorted(records, key=lambda r: r.ord):
        if r.status != OK:
            continue
        if r.dedup_path is not None:
            # dedup entries are stored as path objects → str(Path) render
            setdefault(r.src, r.dedup_path, True, r.dedup_path)
            continue
        dst, posix = r.doc_path, r.doc_path_posix
        for url, _d, is_path, p in mapping:
            # Path == str is always False → only path-entries can collide
            if is_path and p == r.doc_path_posix and url != r.src:
                dst, posix = _fixed_doc_path(path_cfg, r.src, r.filename)
                break
        setdefault(r.src, dst, False, posix)

    return [(src, dst) for src, dst, _ip, _p in mapping]


def _fixed_doc_path(path_cfg, src: str, filename: str) -> Tuple[str, str]:
    """sha256(url)_-prefixed repair path (image_downloader.py:303-312);
    note the reference passes the full original URL as the hierarchy
    component here."""
    from .linkflow import fixed_collision_filename
    from .pathalgebra import PathConfig, get_document_img_path

    cfg = path_cfg if path_cfg is not None else PathConfig()
    return get_document_img_path(cfg, src, fixed_collision_filename(src, filename))


def rewrite_text(text: str, mapping: Sequence[Tuple[str, str]]) -> str:
    """Ordered cascading per-line replace (string_tools.py:42-51)."""
    if not mapping:
        return text
    pieces = text.split('\n')
    out = []
    for piece in pieces:
        for src, dst in mapping:
            piece = piece.replace(src, dst)
        out.append(piece)
    return '\n'.join(out)


def fold_and_rewrite(text: str, records: Sequence[LinkRecord], path_cfg=None) -> str:
    return rewrite_text(text, fold_mapping(records, path_cfg))
