"""HTML tokenizer/extractor unit + fuzz tests (llm/html.py).

Each handcrafted case is a classic failure mode of regex tag-stripping;
the fuzz sweep proves the render→extract loop is the identity on corpus-
shaped text.
"""

from __future__ import annotations

import random

import pytest

from emr_with_custom_metrics_spark.llm.html import (
    decode_entities,
    extract_page,
    render_page,
)


def test_entities_decode_all_forms():
    assert decode_entities("a &amp; b") == "a & b"
    assert decode_entities("&lt;p&gt;") == "<p>"
    assert decode_entities("&#108;&#x6C;l") == "lll"
    assert decode_entities("&#x4A;oe") == "Joe"
    # A bare ampersand that is not a reference stays literal.
    assert decode_entities("fish & chips") == "fish & chips"
    assert decode_entities("x&;y") == "x&;y"
    assert decode_entities("x&notareference y") == "x&notareference y"
    # Unknown name with semicolon: '&' literal, rest preserved.
    assert decode_entities("&bogus;") == "&bogus;"


def test_script_rawtext_with_angle_brackets():
    page = (
        "<html><head><title>t</title>"
        '<script>if (1 < 2 && 3 > 2) { var s = "<p>no</p>"; }</script>'
        "</head><body><main>real text</main></body></html>"
    )
    got = extract_page(page)
    assert got["main_text"] == "real text"
    assert got["title"] == "t"
    assert got["n_links"] == 0


def test_script_fake_close_inside_string_ends_element():
    # HTML5 script data state: the element ends at the FIRST '</script'
    # even inside a JS string — the renderer must split it ('</scr'+'ipt>')
    # and the tokenizer must honor the real close. A page whose script
    # contains a literal '</script>' in a string genuinely ends there per
    # spec; content after it is body text. Verify spec behavior.
    page = (
        "<html><body><main>a</main>"
        '<script>var s = "</script>tail<main>b</main></body></html>'
    )
    got = extract_page(page)
    # main zone saw only 'a' plus the later 'b' (tail is outside <main>)
    assert got["main_text"] == "a b"


def test_style_rawtext_child_selector():
    page = (
        "<html><head><style>p > .t { color: red }</style></head>"
        "<body><main>x y</main></body></html>"
    )
    assert extract_page(page)["main_text"] == "x y"


def test_comment_containing_fake_elements():
    page = (
        "<html><body><!-- <main>decoy</main> <p>also decoy</p> -->"
        "<main>keep</main></body></html>"
    )
    assert extract_page(page)["main_text"] == "keep"


def test_quoted_gt_in_attribute():
    page = '<html><body><main><div data-x="a>b">in</div></main></body></html>'
    assert extract_page(page)["main_text"] == "in"


def test_inline_tags_do_not_split_words():
    page = "<html><body><main>al<b>pha</b> be<i>ta</i></main></body></html>"
    assert extract_page(page)["main_text"] == "alpha beta"


def test_block_tags_are_word_boundaries():
    page = "<html><body><main><p>one</p><p>two</p></main></body></html>"
    assert extract_page(page)["main_text"] == "one two"


def test_anchor_census_outside_main():
    page = (
        "<html><body><nav><a href='/1'>link1</a> <a href='/2'>link2</a></nav>"
        "<main>text</main></body></html>"
    )
    got = extract_page(page)
    assert got["n_links"] == 2
    assert got["anchor_chars"] == 10
    assert got["main_text"] == "text"


def test_truncated_structures_raise():
    with pytest.raises(ValueError):
        extract_page("<html><body><main>x<!-- no close")
    with pytest.raises(ValueError):
        extract_page("<html><body><main>x<script>never closed")
    with pytest.raises(ValueError):
        extract_page('<html><body><div data-x="unterminated')
    with pytest.raises(ValueError):
        extract_page("<html><body><main>x<p unterminated")


def test_render_extract_identity_fuzz():
    rng = random.Random(0xC0FFEE)
    vocab = "the a key sort merge window batch stream data join filter".split()
    for trial in range(60):
        n = rng.randint(1, 120)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        got = extract_page(render_page(trial, text))
        assert got["main_text"] == text, f"trial {trial}"
        assert got["title"] == " ".join(text.split(" ")[:3])
        assert got["n_links"] == n % 5 + 2
        assert got["anchor_chars"] == 5 * (n % 5 + 2)


def test_render_page_is_adversarial():
    """The rendered page must actually contain every trap the module
    claims to exercise — otherwise the oracle proves less than stated."""
    page = render_page(7, " ".join(["tok"] * 30))
    assert "</scr" in page and "1 < 2" in page  # RAWTEXT trap
    assert "p > .t" in page  # style trap
    assert "<!--" in page and "decoy" in page  # comment trap
    assert 'data-x="a>b"' in page  # quoted '>' trap
    assert "&#" in page and "&#x" in page  # dec + hex references
    assert "<b>" in page and 'title="x>y"' in page  # inline splits
