"""Pinned HTML → main-content text extraction (algorithm v1).

This is the honest analog of the reference's per-type content filters and
byte-class analyzer dispatch (/root/reference/filters/analyzer/
analyzer.c:32-97, pc_archive.c:1041-1047, pcompress.c:207-402): raw fetched
bytes in, normalized text out, with a hard per-row invariant — byte-identical
output per url (BASELINE.json `input_hint`).

The algorithm is PINNED — any change to it is a format change that
invalidates stored `text` columns, exactly like changing the reference's
rolling-hash constants would invalidate its archives. Spec:

 1. decode utf-8 with U+FFFD replacement;
 2. drop HTML comments (`<!-- … -->`), `<!DOCTYPE …>`-style declarations,
    and `<? … ?>` processing instructions;
 3. drop these elements WITH their content (non-content / boilerplate):
    script, style, noscript, template, svg, head, nav, header, footer,
    aside (main-content heuristic: chrome never reaches the corpus);
 4. strip remaining tags: INLINE tags (a, b, i, em, span, …) are removed
    with no separator (`he<b>ll</b>o` → `hello`); all other tags become a
    single space (block boundaries separate words);
 5. decode character references (named + decimal + hex) via the stdlib
    `html.unescape` (fixed HTML5 entity table — not locale-dependent);
 6. normalize whitespace: every run of unicode whitespace → one ASCII
    space, leading/trailing stripped.

v1.1 (strip-tag rule hardened, output-identical on any page without a
quoted `>` inside a tag — i.e. on every stored corpus): the strip-tag
regex skips quoted attribute values, so `<a href="x>y">` no longer
terminates at the `x>` (the likeliest real-web divergence of v1). The
quote branches are first-char-disjoint from the bare-char branch — no
regex backtracking blowup on adversarial input; a tag with an UNMATCHED
quote before `>` is left unstripped (deterministic, pinned by test).

Deliberate v1 limitations still present (documented, deterministic):
CDATA sections are treated as text; comment/declaration/drop-element
scans still use the simple `[^>]*` tag tail. Rare in real pages and
absent from the corpus generator's adversarial cases.

Everything is compiled-regex + str.split — C-speed per doc, no per-char
Python, no third-party dependency.
"""

from __future__ import annotations

import html as _html
import re

# elements whose entire content is boilerplate/non-text
_DROP_ELEMENTS = (
    "script",
    "style",
    "noscript",
    "template",
    "svg",
    "head",
    "nav",
    "header",
    "footer",
    "aside",
)

# phrasing-content tags removed with NO separator (mid-word markup safe)
_INLINE_TAGS = frozenset(
    (
        "a abbr b bdi bdo cite code data dfn em i ins kbd mark q s samp "
        "small span strong sub sup time u var wbr del"
    ).split()
)

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_DECL_RE = re.compile(r"<![a-zA-Z][^>]*>|<\?[^>]*>")
_DROP_RE = re.compile(
    r"<(?:" + "|".join(_DROP_ELEMENTS) + r")\b[^>]*>.*?</(?:"
    + "|".join(_DROP_ELEMENTS)
    + r")\s*>",
    re.DOTALL | re.IGNORECASE,
)
# tag tail: quoted attribute values may contain `>`; the three branches
# are disjoint on their first character (", ', anything-else-but->"') so
# matching is linear — no catastrophic backtracking on junk input
_TAG_RE = re.compile(
    r"</?([a-zA-Z][a-zA-Z0-9]*)(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>"
)


def _tag_repl(m: re.Match) -> str:
    return "" if m.group(1).lower() in _INLINE_TAGS else " "


def extract_text_v1(raw: bytes | str | None) -> str:
    """bytes/str html -> extracted main-content text (pinned algorithm)."""
    if raw is None:
        return ""
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, bytes) else raw
    s = _COMMENT_RE.sub(" ", s)
    s = _DECL_RE.sub(" ", s)
    s = _DROP_RE.sub(" ", s)
    s = _TAG_RE.sub(_tag_repl, s)
    s = _html.unescape(s)
    return " ".join(s.split())
