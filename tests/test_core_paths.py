"""Ports of the OutPathMaker matrix
(/root/reference/tests/test_out_path_maker.py:51-125) against the pure
path-algebra core."""

import dataclasses

from markdown_articles_tool_spark.core.pathalgebra import (
    PathConfig,
    get_document_img_path,
    get_real_path,
    image_local_url,
    resolve_local_download_path,
)

FN = 'image.png'
REL = 'url/to/image'


def _cfg(base_url, img_dir='images', hier=False, public=None):
    return PathConfig(
        article_file_path='/home/artiom/my_article.md',
        article_base_url=base_url,
        img_dir_name=img_dir,
        img_public_path=public,
        save_hierarchy=hier,
    )


class TestRealPath:
    def test_local_without_hier(self):
        cfg = _cfg('/home/artiom')
        assert get_real_path(cfg, REL, FN) == f'/home/artiom/images/{FN}'

    def test_url_without_hier(self):
        cfg = _cfg('https://artiomsoft.ru')
        assert get_real_path(cfg, REL, FN) == f'/home/artiom/images/{FN}'

    def test_local_paths_with_hier(self):
        cfg = _cfg('/home/artiom', hier=True)
        for p in (REL, f'/{REL}'):
            assert get_real_path(cfg, p, FN) == f'/home/artiom/images/{REL}/{FN}'
        assert get_real_path(cfg, f'/home/artiom/{REL}', FN) == f'/home/artiom/images/{REL}/{FN}'

    def test_url_paths_with_hier(self):
        cfg = _cfg('https://artiomsoft.ru', hier=True)
        for p in (REL, f'/{REL}'):
            assert get_real_path(cfg, p, FN) == f'/home/artiom/images/{REL}/{FN}'
        assert get_real_path(cfg, f'https://artiomsoft.ru/{REL}', FN) == f'/home/artiom/images/{REL}/{FN}'

    def test_local_urls_with_hier(self):
        cfg = _cfg('/home/artiom', hier=True)
        for scheme in ('http://', 'https://', 'HTTPS://'):
            url = f'{scheme}notagoogle.com/{REL}'
            assert get_real_path(cfg, url, FN) == f'/home/artiom/images/notagoogle.com/{REL}/{FN}'

    def test_url_urls_with_hier(self):
        cfg = _cfg('https://artiomsoft.ru', hier=True)
        for scheme in ('http://', 'https://', 'HTTPS://'):
            url = f'{scheme}notagoogle.com/{REL}'
            assert get_real_path(cfg, url, FN) == f'/home/artiom/images/notagoogle.com/{REL}/{FN}'
        # image URL starting with the site URL (include_site_url=False case)
        for scheme in ('http://', 'https://', 'HTTPS://'):
            url = f'{scheme}artiomsoft.com/{REL}'
            assert get_real_path(cfg, url, FN) == f'/home/artiom/images/artiomsoft.com/{REL}/{FN}'

    def test_local_without_hier_abs_img_dir(self):
        cfg = _cfg('/home/artiom', img_dir='/home/artiom/images')
        assert get_real_path(cfg, REL, FN) == f'/home/artiom/images/{FN}'

    def test_url_urls_with_hier_abs_img_dir(self):
        cfg = _cfg('https://artiomsoft.ru', img_dir='/home/artiom/images', hier=True)
        for scheme in ('http://', 'https://', 'HTTPS://'):
            url = f'{scheme}notagoogle.com/{REL}'
            assert get_real_path(cfg, url, FN) == f'/home/artiom/images/notagoogle.com/{REL}/{FN}'
            url = f'{scheme}artiomsoft.com/{REL}'
            assert get_real_path(cfg, url, FN) == f'/home/artiom/images/artiomsoft.com/{REL}/{FN}'

    def test_base_prefixed_url_relativized(self):
        # remote article, image under the article's base URL → relative
        cfg = _cfg('https://artiomsoft.ru', hier=True)
        assert get_real_path(cfg, f'https://artiomsoft.ru/{REL}', FN) == f'/home/artiom/images/{REL}/{FN}'


class TestDocumentImgPath:
    def test_plain(self):
        cfg = _cfg('')
        assert get_document_img_path(cfg, REL, FN) == (f'images/{FN}', f'images/{FN}')

    def test_public_path(self):
        cfg = _cfg('', public='/static/img')
        join_form, posix_form = get_document_img_path(cfg, REL, FN)
        # '/'.join(Path.parts) double-slash quirk (image_downloader.py:244)
        assert join_form == f'//static/img/{FN}'
        assert posix_form == f'/static/img/{FN}'

    def test_hierarchy(self):
        cfg = _cfg('', hier=True)
        assert get_document_img_path(cfg, REL, FN)[1] == f'images/{REL}/{FN}'

    def test_hierarchy_absolute_image_url_replaces_prefix(self):
        cfg = _cfg('', hier=True)
        assert get_document_img_path(cfg, f'/{REL}', FN)[1] == f'/{REL}/{FN}'
        assert get_document_img_path(cfg, f'/{REL}', FN)[0] == f'//{REL}/{FN}'


class TestHelpers:
    def test_image_local_url(self):
        assert image_local_url('https://h/a/b/i.png') == 'h/a/b'
        assert image_local_url('./pic/p.png') == 'pic'
        assert image_local_url('p.png') == '.'

    def test_resolve_local(self):
        assert resolve_local_download_path('/w/article.md', './pic/x.png') == '/w/pic/x.png'
        assert resolve_local_download_path('/w/article.md', 'img/y.jpg') == '/w/img/y.jpg'


class TestConfigIsFrozen:
    def test_replace(self):
        cfg = _cfg('')
        cfg2 = dataclasses.replace(cfg, save_hierarchy=True)
        assert cfg2.save_hierarchy and not cfg.save_hierarchy
