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


class TestSurtKey:
    """SURT (the CDX(J) sort key) vs the urllib-machinery twin in
    tools/oracle_kernels.surt_key_seq — spec in the engine docstring."""

    def test_goldens(self):
        from markdown_articles_tool_spark.core.wwwtools import surt_key

        cases = [
            # equivalent spellings collapse to one key
            ('https://WWW.Example.COM:443/A/B?b=2&a=1#frag', 'com,example)/a/b?a=1&b=2'),
            ('http://example.com:80/a/b?a=1&b=2', 'com,example)/a/b?a=1&b=2'),
            # non-default / leading-zero ports, junk port
            ('http://example.com:8080/x', 'com,example:8080)/x'),
            ('http://example.com:08080/x', 'com,example:8080)/x'),
            ('http://example.com:abc/x', 'com,example)/x'),
            # userinfo dropped, trailing host dot stripped
            ('http://user:pw@site.example./private?token=abc',
             'example,site)/private?token=abc'),
            # IPv4 stays in order; 300 is not an octet so it reverses
            ('http://192.168.7.13:8080/cgi', '192.168.7.13:8080)/cgi'),
            ('http://10.0.0.300/', '300,0,0,10)/'),
            # wwwN strip; bare www.com keeps its sole label
            ('https://www2.news.example/a', 'example,news)/a'),
            ('https://www.com/', 'com)/'),
            ('https://wwwx.e.f/', 'f,e,wwwx)/'),
            # fragment before '?': no query
            ('https://h.e/p#frag?not=query', 'e,h)/p'),
            # empty path / empty query segments
            ('HTTP://EXAMPLE.COM', 'com,example)/'),
            ('http://e.x/p?z=1&&y=', 'x,e)/p?y=&z=1'),
            # identity fallback for non-hierarchical refs
            ('urn:uuid:1234', 'urn:uuid:1234'),
            ('mailto:A@B', 'mailto:a@b'),
            ('', ''),
            (None, ''),
        ]
        for u, want in cases:
            assert surt_key(u) == want, u

    def test_matches_urllib_twin_on_adversarial_soup(self):
        import os
        import random
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))
        from oracle_kernels import surt_key_seq
        from markdown_articles_tool_spark.core.wwwtools import surt_key

        rng = random.Random(11)
        hosts = ['Site3.Example', 'WWW.Example.COM', 'www2.News.example',
                 '192.168.7.13', '10.0.0.300', 'example.com.', 'www.com',
                 'a.b.c.d.e', 'localhost', 'xn--bcher-kva.example', '..',
                 'www.', '256.1.1.1', '01.2.3.4', 'wwwx.e.f']
        schemes = ['http', 'https', 'ftp', 'HTTP', 'HtTpS', 'h+t.p-s']
        ports = ['', ':80', ':443', ':0080', ':8080', ':0', ':65536', ':', ':abc', ':08']
        users = ['', 'user@', 'a:b@', '@', 'a@b@']
        paths = ['', '/', '/A/B', '/path//x', '/%7Euser', '/p#frag', '/p?q#r?s']
        queries = ['', '?', '?b=2&a=1', '?z=1&&y=', '?a=1#f', '?B=2&a', '?#']
        for _ in range(3000):
            u = (f'{rng.choice(schemes)}://{rng.choice(users)}{rng.choice(hosts)}'
                 f'{rng.choice(ports)}{rng.choice(paths)}{rng.choice(queries)}')
            assert surt_key(u) == surt_key_seq(u), repr(u)
        for u in ['urn:uuid:4', '', None, 'mailto:a@b', '//rel/x', 'not a url',
                  'http://', 'http:///path', 'https://#', 'https://?x=1']:
            assert surt_key(u) == surt_key_seq(u), repr(u)
