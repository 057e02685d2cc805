"""Pinned HTML extraction algorithm v1 (functions/extraction.py).

The reference's analog is the per-type content-filter dispatch
(analyzer.c:32-97, pc_archive.c:1041-1047); ours must satisfy the
BASELINE.json per-row invariant: byte-identical extracted text per url.
"""

from pcompress_spark.functions.extraction import extract_text_v1


def test_edge_cases():
    cases = [
        (b"", ""),
        (None, ""),
        (b"plain text no tags", "plain text no tags"),
        # entity decode happens AFTER tag stripping (HTML semantics:
        # &lt;p&gt; is literal text, not markup)
        (b"<p>a&amp;b</p><p>x &lt; y</p>", "a&b x < y"),
        (b"&lt;p&gt;not a tag&lt;/p&gt;", "<p>not a tag</p>"),
        # inline tags strip with no separator; block tags separate words
        (b"he<b>ll</b>o <div>world</div>", "hello world"),
        (b"a<span class='x'>b</span>c", "abc"),
        (b"<ul><li>one</li><li>two</li></ul>", "one two"),
        # script/style/head/nav/footer content never leaks
        (b"<script>var a = '<p>not text</p>';</script>real", "real"),
        (b"<style>p { color: red }</style>real", "real"),
        (b"<head><title>t</title></head>body", "body"),
        (b"<nav>menu</nav>main<footer>(c)</footer>", "main"),
        # case-insensitive tags, attributes, self-closing
        (b"<ARTICLE><P CLASS='x'>Upper</P></ARTICLE>", "Upper"),
        (b"a<br/>b<hr />c", "a b c"),
        # comments, doctype, numeric/hex references, utf-8
        (b"<!DOCTYPE html><!-- hidden -->shown", "shown"),
        (b"a\xc3\xa9<span>b</span> &#233; &#xe9;", "aéb é é"),
        # whitespace runs (incl. nbsp) collapse to single ASCII spaces
        (b"x&nbsp;y\n\t z", "x y z"),
    ]
    for raw, want in cases:
        got = extract_text_v1(raw)
        assert got == want, (raw, got, want)


def test_nested_and_adversarial_markup():
    html = (
        b'<div class="a"><div data-x="1"><p>deep <em>in</em>line</p></div>'
        b"<blockquote>\n  quoted words\n</blockquote></div>"
    )
    assert extract_text_v1(html) == "deep inline quoted words"


def test_deterministic_rerun():
    raw = b"<p>same &#105;nput</p>" * 50
    assert extract_text_v1(raw) == extract_text_v1(raw)


def test_datagen_corpus_invariant_sample():
    """Every planted doc class satisfies extract(html) == text exactly."""
    from pcompress_spark.datagen import gen_doc

    # one doc from each class band of the first block + a zh doc
    for i in [0, 3, 560, 710, 860, 925, 980, 47]:
        d = gen_doc(i)
        assert extract_text_v1(d["html"]) == d["text"], f"doc {i}"
