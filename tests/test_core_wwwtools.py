"""Ports of the reference's www_tools/string_tools assertions
(/root/reference/tests/test_www_tools.py:6-41) against our pure core."""

from markdown_articles_tool_spark.core.wwwtools import (
    filename_from_url,
    get_base_url,
    guess_mime_type,
    is_url,
    remove_protocol_prefix,
    slugify,
    split_file_ext,
)


class TestProtocolPrefix:
    def test_prefix_remover(self):
        assert remove_protocol_prefix('http://test.url') == 'test.url'
        assert remove_protocol_prefix('https://test.url') == 'test.url'
        assert remove_protocol_prefix('HTTPS://test.url') == 'test.url'
        assert remove_protocol_prefix('Ftp://test.url') == 'test.url'
        assert remove_protocol_prefix('FtpS://test.url') == 'test.url'
        assert remove_protocol_prefix('file://test.url') == 'test.url'
        assert remove_protocol_prefix('FtpS://http://test.url') == 'http://test.url'
        assert remove_protocol_prefix('ftps://ftps://test.url') == 'ftps://test.url'

    def test_prefix_remover_non_urls(self):
        assert remove_protocol_prefix('/home/artiom') == '/home/artiom'
        assert remove_protocol_prefix('./pic/x.png') == './pic/x.png'
        assert remove_protocol_prefix('//host/x') == 'host/x'

    def test_url_checker(self):
        assert is_url('http://test') is True
        assert is_url('ftp://test') is True
        assert is_url('Https://test') is True
        assert is_url('FTPS://test') is True
        assert is_url('file://test') is False
        # quirk: plain prefix test (www_tools.py:21-30)
        assert is_url('httpgarbage') is True


class TestFilenames:
    def test_split_file_ext(self):
        assert split_file_ext('a.b.c') == ('a.b', 'c')
        assert split_file_ext('noext') == ('noext', None)
        assert split_file_ext('.hidden') == ('', 'hidden')
        assert split_file_ext('trailing.') == ('trailing', '')

    def test_slugify(self):
        assert slugify('CardImg/26p!!') == 'cardimg26p'
        assert slugify('  A  B  ') == 'a-b'
        assert slugify('Привет х') == ''  # cyrillic drops to nothing entirely

    def test_get_filename_from_url(self):
        # from tests/test_www_tools.py:30-34 (content-type image/jpg has
        # no frozen-map entry → ext comes from the URL path here)
        url = (
            'https://image.cubox.pro/cardImg/'
            '26p25dhia8yismewd0i3zptqzluz1ydufavhzlog6yjr6b6yle.jpg'
            '?imageMogr2/quality/90/ignore-error/1'
        )
        assert filename_from_url(url, 'image/jpg') == (
            'cardimg26p25dhia8yismewd0i3zptqzluz1ydufavhzlog6yjr6b6yle.jpg'
        )

    def test_filename_ext_from_content_type(self):
        assert filename_from_url('https://h/u/32387838?s=80', 'image/png') == 'u32387838.png'
        # unknown content-type renders literal None (www_tools.py:108-111)
        assert filename_from_url('https://h/u/1?x=2', 'application/x-unknown-xyz') == 'u1None'

    def test_filename_slash_stem_quirk(self):
        # stem '/' is not '' → survives; slugify('/') == '' → bare ext
        assert filename_from_url('https://host/', 'image/png') == '.png'
        assert filename_from_url('https://host/.png', 'image/png') == '.png'

    def test_filename_content_disposition_branch(self):
        # reference www_tools.py:91-103: taken only when url.find('/')==0
        assert filename_from_url('/x', 'image/png', 'attachment; filename=Photo File.PNG') == (
            'photo-file.png'
        )
        # regex is findall('filename=(.+)') — greedy, first match
        assert filename_from_url('/x', 'image/png', 'filename=a.b.c.gif') == 'abc.gif'
        # no header / no filename= → None
        assert filename_from_url('/x', 'image/png', None) is None
        assert filename_from_url('/x', 'image/png', 'attachment') is None
        # a URL with no '/' at all stays on the path branch (find -> -1,
        # truthy in the reference's `if req.url.find('/')`)
        assert filename_from_url('name.png', 'image/png', 'filename=other.gif') == 'name.png'
        # missing ext on the disposition name → content-type extension
        assert filename_from_url('/x', 'image/png', 'filename=rawname') == 'rawname.png'

    def test_get_base_url(self):
        assert get_base_url('https://a/b/c.md') == 'https://a/b'
        assert get_base_url('https://a') == 'https:/'  # rsplit quirk


class TestMimeGate:
    def test_guess(self):
        assert guess_mime_type('https://h/a.png') == 'image/png'
        assert guess_mime_type('https://h/a.jpg') == 'image/jpeg'
        assert guess_mime_type('https://h/a.PNG') == 'image/png'
        # query-string URL without extension (tests/data/image_mime_incorrect.md)
        assert guess_mime_type('https://h/u/32387838?s=80&v=4') is None
        assert guess_mime_type('https://www.google.com/') is None
        assert guess_mime_type('./pic/pic1_50.png') == 'image/png'
        # .jpe removed per markdown_tool.py:20
        assert guess_mime_type('https://h/a.jpe') is None

    def test_matches_stdlib_on_plain_cases(self):
        import mimetypes

        db = mimetypes.MimeTypes()
        for u in [
            'https://h/x.png', 'https://h/x.gif?y=1', 'https://h/x.tar.gz', 'data:image/png;base64,xxx',
            'https://h/x.svgz', 'pic/x.jpeg', 'x.txt', 'https://h/x',
            'https://h/dir.d/x', 'a.b.c.png',
        ]:
            assert guess_mime_type(u) == db.guess_type(u)[0], u
