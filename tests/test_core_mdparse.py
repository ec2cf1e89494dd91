"""Extractor parity with the reference fixtures
(/root/reference/tests/test_markdown_transformer.py:13-40 and
tests/data/*.md, inlined here — see FIXTURES.md)."""

from markdown_articles_tool_spark.core.mdparse import (
    extract_html_image_links,
    extract_image_links,
    extract_md_img_srcs,
    parse_size_suffix,
)

IMPORTANT_LINKS_MD = """Important link to remember: ![](https://www.google.com/)
![](https://github.com/artiomn/markdown_articles_tool)
![](https://iiincorrect_link_url_which_doesn't_exists.png/image.jpg)

My avatar scaled to 300 pixels width: ![](https://avatars.githubusercontent.com/u/32387838 =300x)
![Valid URL](https://avatars.githubusercontent.com/u/32387838?s=80&v=4 =300x)
![Resizing](https://avatars.githubusercontent.com/u/32387838?s=80 =1000x0010)

# Resize

![](./pic/pic1_50.png =100x20)

# You can skip the HEIGHT

![](./pic/pic1s.png =250x)

# And Width

![](./pic/pic1s.png =x250)
"""


class TestMdExtraction:
    def test_important_links_golden(self):
        # exact 9-element golden list, test_markdown_transformer.py:14-24
        assert extract_image_links(IMPORTANT_LINKS_MD) == [
            ('https://www.google.com/', None, None),
            ('https://github.com/artiomn/markdown_articles_tool', None, None),
            ("https://iiincorrect_link_url_which_doesn't_exists.png/image.jpg", None, None),
            ('https://avatars.githubusercontent.com/u/32387838', 300, None),
            ('https://avatars.githubusercontent.com/u/32387838?s=80&v=4', 300, None),
            ('https://avatars.githubusercontent.com/u/32387838?s=80', 1000, 10),
            ('./pic/pic1_50.png', 100, 20),
            ('./pic/pic1s.png', 250, None),
            ('./pic/pic1s.png', None, 250),
        ]

    def test_balanced_parens_in_url(self):
        # tests/data/image_mime_incorrect.md pattern
        md = '![](https://cubox.pro/c/filters:no_upscale()?valid=false&u=x)'
        assert extract_md_img_srcs(md) == ['https://cubox.pro/c/filters:no_upscale()?valid=false&u=x']

    def test_fenced_code_suppression(self):
        md = 'a\n\n```\n![x](in_fence.png)\n```\n\n![y](real.png)\n'
        assert extract_md_img_srcs(md) == ['real.png']

    def test_tilde_fence(self):
        md = '~~~\n![x](no.png)\n~~~\n![y](yes.png)\n'
        assert extract_md_img_srcs(md) == ['yes.png']

    def test_indented_code_suppression(self):
        md = 'para\n\n    ![x](no.png)\n\n![y](yes.png)\n'
        assert extract_md_img_srcs(md) == ['yes.png']

    def test_inline_code_span_suppression(self):
        md = 'a `![x](no.png)` b ![y](yes.png)'
        assert extract_md_img_srcs(md) == ['yes.png']

    def test_non_image_links_ignored(self):
        md = '[text](https://h/page) and ![img](https://h/i.png)'
        assert extract_md_img_srcs(md) == ['https://h/i.png']

    def test_reference_style(self):
        md = '![a][r1] ![r2][] ![r3]\n\n[r1]: https://h/1.png\n[r2]: https://h/2.png\n[r3]: https://h/3.png\n'
        assert extract_md_img_srcs(md) == ['https://h/1.png', 'https://h/2.png', 'https://h/3.png']

    def test_unresolved_reference_not_extracted(self):
        assert extract_md_img_srcs('![a][nope]') == []

    def test_reference_ids_case_insensitive(self):
        md = '![a][RefX]\n\n[refx]: https://h/x.png\n'
        assert extract_md_img_srcs(md) == ['https://h/x.png']

    def test_html_img_block(self):
        md = 'para\n\n<img src="a.png" alt="x">\n<img alt="y" src="b.png"/>\n\nmore'
        assert extract_md_img_srcs(md) == ['a.png', 'b.png']

    def test_inline_raw_html_not_extracted(self):
        # python-markdown stashes inline raw HTML → never in the tree
        md = 'text <img src="no.png"> text'
        assert extract_md_img_srcs(md) == []

    def test_img_without_src_skipped(self):
        md = '<img alt="x">\n<img src="yes.png">'
        assert extract_md_img_srcs(md) == ['yes.png']

    def test_escaped_bang_is_literal(self):
        assert extract_md_img_srcs(r'\![a](no.png)') == []

    def test_title_stripped(self):
        assert extract_md_img_srcs('![a](x.png "title")') == ['x.png']
        assert extract_md_img_srcs("![a](<x y.png>)") == ['x y.png']

    def test_empty_src(self):
        assert extract_md_img_srcs('![a]()') == ['']


class TestSizeSuffix:
    def test_cases(self):
        assert parse_size_suffix('u =300x') == ('u', 300, None)
        assert parse_size_suffix('u =x250') == ('u', None, 250)
        assert parse_size_suffix('u =1000x0010') == ('u', 1000, 10)
        assert parse_size_suffix('u') == ('u', None, None)
        # regex failure keeps the whole src with no size (transformer.py:69-72)
        assert parse_size_suffix('a b') == ('a b', None, None)
        assert parse_size_suffix('') == ('', None, None)


class TestHtmlExtraction:
    def test_order_and_first_src_attr(self):
        html = '<p><img src="1.png"><img alt="a" src="2.png" src="3.png"></p>'
        assert extract_html_image_links(html) == [('1.png', None, None), ('2.png', None, None)]

    def test_entity_unescape(self):
        assert extract_html_image_links('<img src="a&amp;b.png">') == [('a&b.png', None, None)]
