"""Extractor fuzz hardening (reference analog: test/fuzz/fuzz_*.c,
docs/TESTING.md): malformed / adversarial / binary non-corpus input must
never crash, must be deterministic across calls, and the documented
v1-family edge behaviors are pinned so a silent algorithm drift (which
would invalidate stored text columns) fails loudly."""

import random

import pytest

from pcompress_spark.functions.extraction import extract_text_v1

_TAG_NAMES = ["div", "p", "a", "script", "b", "svg", "nav", "x1", "table"]
_FRAGMENTS = [
    "<", ">", "</", "/>", "<!", "<!--", "-->", "<![CDATA[", "]]>",
    "&amp;", "&#x41;", "&#65;", "&#", "&notareal;", "&", ";",
    '"', "'", "=", " ", "\t", "\n", "\r", "\x00", "�",
    "word", "mot", "λέξη", "字", "🙂",
]


def _random_junk_html(rng: random.Random, n_parts: int) -> str:
    parts = []
    for _ in range(n_parts):
        r = rng.random()
        if r < 0.3:
            name = rng.choice(_TAG_NAMES)
            attrs = "".join(
                rng.choice(_FRAGMENTS) for _ in range(rng.randrange(4))
            )
            parts.append(
                rng.choice([f"<{name}{attrs}>", f"</{name}{attrs}>", f"<{name}"])
            )
        elif r < 0.6:
            parts.append(rng.choice(_FRAGMENTS))
        else:
            parts.append(
                "".join(
                    chr(rng.randrange(1, 0x300)) for _ in range(rng.randrange(8))
                )
            )
    return "".join(parts)


def test_fuzz_no_crash_and_deterministic():
    rng = random.Random(20260817)
    for i in range(500):
        doc = _random_junk_html(rng, rng.randrange(1, 40))
        a = extract_text_v1(doc)
        b = extract_text_v1(doc)
        assert a == b, f"non-deterministic on case {i}"
        assert isinstance(a, str)
        # pinned output form: single-space separated, stripped
        assert a == " ".join(a.split())


def test_fuzz_binary_junk_bytes():
    rng = random.Random(7)
    for _ in range(100):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 512)))
        out = extract_text_v1(blob)
        assert isinstance(out, str)
        assert out == extract_text_v1(blob)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        # v1.1 fix: a quoted `>` inside an attribute no longer truncates
        ('pre <a href="x>y">link</a> post', "pre link post"),
        ("pre <a href='x>y'>link</a> post", "pre link post"),
        # single-quoted value containing a double quote
        ("<p title='say \"hi\">'>word</p>", "word"),
        # unmatched quote before `>`: tag is left unstripped (pinned)
        ('a <a href=">b', 'a <a href=">b'),
        # unclosed tag at end of input: left as text
        ("hello <div", "hello <div"),
        # CDATA treated as text (documented v1 limitation, pinned)
        ("a <![CDATA[ x > y ]]> b", "a <![CDATA[ x > y ]]> b"),
        # truncated entity passes through unescape unchanged
        ("x &# y", "x &# y"),
        # unknown entity: html.unescape takes the longest known prefix
        # (&not -> ¬) — HTML5 spec behavior, pinned
        ("x &notareal; y", "x ¬areal; y"),
        # nested/unclosed drop-element: dropped only when closed
        ("a <script>evil(1<2)</script> b", "a b"),
        ("a <script>evil never closed", "a evil never closed"),
        # comments spanning tags
        ("a <!-- <div>x</div> --> b", "a b"),
        # unterminated comment stays (no closing marker to anchor a drop)
        ("a <!-- b", "a <!-- b"),
        # NUL and control chars are just characters / whitespace-folded
        ("a\x00b", "a\x00b"),
        ("a \t\r\n b", "a b"),
    ],
)
def test_pinned_edge_behaviors(raw, expected):
    assert extract_text_v1(raw) == expected


def test_attribute_gt_does_not_split_midword():
    # the v1 hole would have produced 'y">hello' fragments mid-token
    out = extract_text_v1('he<b class="a>b">ll</b>o')
    assert out == "hello"
