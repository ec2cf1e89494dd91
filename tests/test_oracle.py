"""End-to-end oracle tests porting the reference's integration
fixtures (tests/test_important_links.py:41-50, tests/data/duplicates.md,
tests/data/image_mime_incorrect.md)."""

import hashlib

from markdown_articles_tool_spark.core.linkflow import DedupVariant, TransformConfig
from markdown_articles_tool_spark.core.pathalgebra import PathConfig
from markdown_articles_tool_spark.oracle import Asset, ReferenceOracle

from test_core_mdparse import IMPORTANT_LINKS_MD

DOC_URL = 'https://example.org/articles/doc1.md'


def _cfg(**kw):
    paths = kw.pop('paths', PathConfig())
    return TransformConfig(paths=paths, **kw)


class TestImportantLinksE2E:
    def test_untouched_when_all_links_dead_or_mimeless(self):
        # skip_all_incorrect=True, download_incorrect_mime=False, no
        # reachable assets → byte-identical output
        # (tests/test_important_links.py:41-50)
        cfg = _cfg(skip_all_errors=True)
        oracle = ReferenceOracle(cfg, remote_assets={})
        res = oracle.run([(DOC_URL, IMPORTANT_LINKS_MD)])
        assert res.texts[DOC_URL] == IMPORTANT_LINKS_MD
        assert res.images == {}

    def test_rewrite_with_assets(self):
        base = 'https://example.org/articles'
        png = b'\x89PNG-fake-1'
        assets = {
            f'{base}/./pic/pic1_50.png': Asset(png),
            f'{base}/./pic/pic1s.png': Asset(png),
            "https://iiincorrect_link_url_which_doesn't_exists.png/image.jpg": Asset(b'jpgbytes', 'image/jpeg'),
        }
        cfg = _cfg(skip_all_errors=True)
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, IMPORTANT_LINKS_MD)])
        out = res.texts[DOC_URL]
        # resolved relative links rewritten to images/<name>; the
        # filename slugifies the WHOLE url path incl. directories
        # (www_tools.py:92-116, cf. tests/test_www_tools.py:30-34)
        assert '![](images/articlespicpic1_50.png =100x20)' in out
        assert '![](images/articlespicpic1s.png =250x)' in out
        assert '![](images/articlespicpic1s.png =x250)' in out
        assert "![](images/image.jpg)" in out
        # MIME-less links untouched
        assert '![](https://www.google.com/)' in out
        assert '![Valid URL](https://avatars.githubusercontent.com/u/32387838?s=80&v=4 =300x)' in out
        # rescaled images stored via the modeled resize; non-rescaled raw
        assert res.images['/work/images/articlespicpic1_50.png'].startswith(b'RESIZED:100x20:')
        # second pic1s write ( =x250) skipped: path exists (first wins)
        assert res.images['/work/images/articlespicpic1s.png'].startswith(b'RESIZED:250x-1:')
        assert res.images['/work/images/image.jpg'] == b'jpgbytes'


class TestContentDedup:
    def test_duplicates_collapse(self):
        # tests/data/duplicates.md: two URLs, identical bytes
        md = '![](img/lenna1.jpg)\n![](img/lenna2.jpg)\n'
        base = 'https://example.org/articles'
        bytes_same = b'lenna-bytes'
        assets = {
            f'{base}/img/lenna1.jpg': Asset(bytes_same, 'image/jpeg'),
            f'{base}/img/lenna2.jpg': Asset(bytes_same, 'image/jpeg'),
        }
        cfg = _cfg(deduplication=DedupVariant.CONTENT_HASH)
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        out = res.texts[DOC_URL]
        assert out == '![](images/articlesimglenna1.jpg)\n![](images/articlesimglenna1.jpg)\n'
        assert list(res.images) == ['/work/images/articlesimglenna1.jpg']

    def test_dedup_is_global_across_docs(self):
        md1 = '![](img/a.jpg)\n'
        md2 = '![](img/b.jpg)\n'
        b1 = b'same-bytes'
        assets = {
            'https://example.org/d1/img/a.jpg': Asset(b1, 'image/jpeg'),
            'https://example.org/d2/img/b.jpg': Asset(b1, 'image/jpeg'),
        }
        cfg = _cfg(deduplication=DedupVariant.CONTENT_HASH)
        res = ReferenceOracle(cfg, assets).run([
            ('https://example.org/d2/doc2.md', md2),
            ('https://example.org/d1/doc1.md', md1),
        ])
        # sorted-url canonical order → doc1 processed first, owns the blob
        assert res.texts['https://example.org/d1/doc1.md'] == '![](images/d1imga.jpg)\n'
        assert res.texts['https://example.org/d2/doc2.md'] == '![](images/d1imga.jpg)\n'
        assert list(res.images) == ['/work/images/d1imga.jpg']

    def test_rescaled_links_bypass_dedup(self):
        md = '![](img/a.jpg)\n![](img/b.jpg =10x)\n'
        b1 = b'same-bytes'
        assets = {
            'https://example.org/articles/img/a.jpg': Asset(b1, 'image/jpeg'),
            'https://example.org/articles/img/b.jpg': Asset(b1, 'image/jpeg'),
        }
        cfg = _cfg(deduplication=DedupVariant.CONTENT_HASH)
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        assert res.texts[DOC_URL] == '![](images/articlesimga.jpg)\n![](images/articlesimgb.jpg =10x)\n'
        assert set(res.images) == {'/work/images/articlesimga.jpg', '/work/images/articlesimgb.jpg'}


class TestNameHashDedup:
    def test_same_content_same_name(self):
        md = '![](img/x1.jpg)\n![](img/x2.jpg)\n'
        b1 = b'payload'
        assets = {
            'https://example.org/articles/img/x1.jpg': Asset(b1, 'image/jpeg'),
            'https://example.org/articles/img/x2.jpg': Asset(b1, 'image/jpeg'),
        }
        cfg = _cfg(deduplication=DedupVariant.NAMES_HASHING)
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        hexd = hashlib.sha256(b1).hexdigest()
        assert res.texts[DOC_URL] == f'![](images/{hexd}.jpg)\n![](images/{hexd}.jpg)\n'
        assert list(res.images) == [f'/work/images/{hexd}.jpg']


class TestReplaceImageNames:
    def test_hashed_rename(self):
        md = '![](img/pic.png)\n'
        b1 = b'content-1'
        assets = {'https://example.org/articles/img/pic.png': Asset(b1)}
        cfg = _cfg(replace_image_names=True)
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        hexd = hashlib.sha256(b1).hexdigest()
        assert res.texts[DOC_URL] == f'![](images/{hexd}.png)\n'
        assert list(res.images) == [f'/work/images/{hexd}.png']


class TestSkipList:
    def test_skip_list_untouched(self):
        md = '![](https://h/a.png)\n![](https://h/b.png)\n'
        assets = {'https://h/a.png': Asset(b'a'), 'https://h/b.png': Asset(b'b')}
        cfg = _cfg(skip_list=frozenset({'https://h/a.png'}))
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        assert res.texts[DOC_URL] == '![](https://h/a.png)\n![](images/b.png)\n'


class TestMimeIncorrect:
    URLS = [
        'https://cubox.pro/c/filters:no_upscale()?valid=false&imageUrl=x1.jpg%3Fsource%3D1',
        'https://cubox.pro/c/filters:no_upscale()?valid=false&imageUrl=x2.jpg%3Fsource%3D1',
    ]

    def test_gate_drops_without_flag(self):
        md = ''.join(f'![]({u})\n' for u in self.URLS)
        cfg = _cfg()
        res = ReferenceOracle(cfg, {}).run([(DOC_URL, md)])
        assert res.texts[DOC_URL] == md

    def test_download_incorrect_mime(self):
        md = ''.join(f'![]({u})\n' for u in self.URLS)
        assets = {u: Asset(b'x%d' % i, 'image/jpeg') for i, u in enumerate(self.URLS)}
        cfg = _cfg(download_incorrect_mime_types=True)
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        # filename: slugified path + ext from content-type (www_tools.py:108-114)
        assert res.texts[DOC_URL] == '![](images/cfiltersno_upscale.jpg)\n![](images/cfiltersno_upscale.jpg)\n'


class TestFirstWinsWithinDoc:
    def test_same_url_twice_setdefault(self):
        md = '![](https://h/a.png)\ntext ![](https://h/a.png)\n'
        assets = {'https://h/a.png': Asset(b'a')}
        cfg = _cfg()
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        assert res.texts[DOC_URL] == '![](images/a.png)\ntext ![](images/a.png)\n'

    def test_strict_duplicate_assert(self):
        import pytest

        md = '![](https://h/a.png)\n![](https://h/a.png)\n'
        assets = {'https://h/a.png': Asset(b'a')}
        cfg = _cfg(strict_duplicate_assert=True)
        with pytest.raises(AssertionError):
            ReferenceOracle(cfg, assets).run([(DOC_URL, md)])


class TestMdHtmlChain:
    def test_sequential_passes(self):
        md = '![](img/a.png)\n\n<img src="img/b.png">\n'
        assets = {
            'https://example.org/articles/img/a.png': Asset(b'a'),
            'https://example.org/articles/img/b.png': Asset(b'b'),
        }
        # html pass re-fetches the rewritten local srcs and fails →
        # needs skip_all_errors, like the reference would
        cfg = _cfg(input_formats=('md', 'html'), skip_all_errors=True)
        res = ReferenceOracle(cfg, assets).run([(DOC_URL, md)])
        # md pass rewrites both (block-level <img> is extracted by the md
        # pass via md_in_html); the html pass then sees rewritten srcs
        assert res.texts[DOC_URL] == '![](images/articlesimga.png)\n\n<img src="images/articlesimgb.png">\n'
