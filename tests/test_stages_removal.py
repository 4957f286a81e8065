"""Tier-1 parity tests for the removal/rewrite stages.

Every case is a verbatim port of a reference unit test; the reference test
name is kept.  Cites: /root/reference/src/stage/{remove_disallowed_nodes.rs,
remove_hidden_nodes.rs,remove_unlikely_candidates.rs,remove_empty_containers.rs,
rewrite_font_tags.rs,rewrite_line_breaks.rs}.

1:1 case map: every ``#[test]`` fn in the six files above appears here under
its identical reference name — remove_disallowed_nodes.rs 3/3
(DISALLOWED_CASES), remove_hidden_nodes.rs 11/11 (HIDDEN_CASES),
remove_unlikely_candidates.rs 11/11 (UNLIKELY_CASES),
remove_empty_containers.rs 9/9 (8 in EMPTY_CASES + removes_empty_headings),
rewrite_font_tags.rs 4/4 (FONT_CASES), rewrite_line_breaks.rs 11/11
(BR_CASES).
"""

import pytest

from conftest import run_stage_test
from readability_spark.stages import (
    remove_disallowed_nodes,
    remove_empty_containers,
    remove_hidden_nodes,
    remove_unlikely_candidates,
    rewrite_font_tags,
    rewrite_line_breaks,
)

# ---------------------- remove_disallowed_nodes.rs:22-49

DISALLOWED_CASES = [
    (
        "removes_script_tags",
        "<html><body><script>alert('hi');</script><p>Content</p></body></html>",
        "<html><head></head><body><p>Content</p></body></html>",
    ),
    (
        "removes_style_tags",
        "<html><head><style>body { color: red; }</style></head><body><p>Content</p></body></html>",
        "<html><head></head><body><p>Content</p></body></html>",
    ),
    (
        "removes_noscript_tags",
        "<html><body><noscript>Enable JS</noscript><p>Content</p></body></html>",
        "<html><head></head><body><p>Content</p></body></html>",
    ),
]


@pytest.mark.parametrize("name,document,expected", DISALLOWED_CASES, ids=[c[0] for c in DISALLOWED_CASES])
def test_remove_disallowed_nodes(name, document, expected):
    run_stage_test(remove_disallowed_nodes, document, expected_html=expected)


# ---------------------- remove_hidden_nodes.rs:82-205

HIDDEN_CASES = [
    (
        "removes_display_none",
        '<html><body><div style="display:none">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "removes_display_none_with_space",
        '<html><body><div style="display: none">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "removes_visibility_hidden",
        '<html><body><div style="visibility:hidden">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "removes_visibility_hidden_with_space",
        '<html><body><div style="visibility: hidden">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "removes_hidden_attribute",
        "<html><body><div hidden>foo</div><p>bar</p></body></html>",
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "removes_aria_hidden_true",
        '<html><body><div aria-hidden="true">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "keeps_aria_hidden_false",
        '<html><body><div aria-hidden="false">foo</div><p>bar</p></body></html>',
        '<html><head></head><body><div aria-hidden="false">foo</div><p>bar</p></body></html>',
    ),
    (
        "keeps_fallback_image_despite_aria_hidden",
        '<html><body><img aria-hidden="true" class="fallback-image" src="x.png"/><p>bar</p></body></html>',
        '<html><head></head><body><img aria-hidden="true" class="fallback-image" src="x.png"><p>bar</p></body></html>',
    ),
    (
        "removes_aria_modal_dialog",
        '<html><body><div aria-modal="true" role="dialog">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "keeps_aria_modal_without_dialog_role",
        '<html><body><div aria-modal="true" role="alertdialog">foo</div><p>bar</p></body></html>',
        '<html><head></head><body><div aria-modal="true" role="alertdialog">foo</div><p>bar</p></body></html>',
    ),
    (
        "removes_children_with_parent",
        "<html><body><div hidden><p>nested</p></div><p>bar</p></body></html>",
        "<html><head></head><body><p>bar</p></body></html>",
    ),
]


@pytest.mark.parametrize("name,document,expected", HIDDEN_CASES, ids=[c[0] for c in HIDDEN_CASES])
def test_remove_hidden_nodes(name, document, expected):
    run_stage_test(remove_hidden_nodes, document, expected_html=expected)


# ---------------------- remove_unlikely_candidates.rs:84-213

UNLIKELY_CASES = [
    (
        "removes_comment_class",
        '<html><body><div class="comment">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "removes_sidebar_id",
        '<html><body><div id="sidebar">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "keeps_article_class",
        '<html><body><div class="comment article">foo</div><p>bar</p></body></html>',
        '<html><head></head><body><div class="comment article">foo</div><p>bar</p></body></html>',
    ),
    (
        "keeps_body",
        '<html><body class="comment"><p>bar</p></body></html>',
        '<html><head></head><body class="comment"><p>bar</p></body></html>',
    ),
    (
        "keeps_anchor",
        '<html><body><a class="comment" href="#">foo</a></body></html>',
        '<html><head></head><body><a class="comment" href="#">foo</a></body></html>',
    ),
    (
        "keeps_inside_table",
        '<html><body><table><tr><td class="comment">foo</td></tr></table></body></html>',
        '<html><head></head><body><table><tbody><tr><td class="comment">foo</td></tr></tbody></table></body></html>',
    ),
    (
        "keeps_inside_code",
        '<html><body><code><span class="comment">foo</span></code></body></html>',
        '<html><head></head><body><code><span class="comment">foo</span></code></body></html>',
    ),
    (
        "removes_unlikely_role",
        '<html><body><nav role="navigation">foo</nav><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "removes_menu_role",
        '<html><body><div role="menu">foo</div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
    (
        "keeps_unmatched_role",
        '<html><body><div role="main">foo</div><p>bar</p></body></html>',
        '<html><head></head><body><div role="main">foo</div><p>bar</p></body></html>',
    ),
    (
        "removes_children_with_parent",
        '<html><body><div class="sidebar"><p>nested</p></div><p>bar</p></body></html>',
        "<html><head></head><body><p>bar</p></body></html>",
    ),
]


@pytest.mark.parametrize("name,document,expected", UNLIKELY_CASES, ids=[c[0] for c in UNLIKELY_CASES])
def test_remove_unlikely_candidates(name, document, expected):
    run_stage_test(remove_unlikely_candidates, document, expected_html=expected)


# ---------------------- remove_empty_containers.rs:66-161

EMPTY_CASES = [
    (
        "removes_empty_div",
        "<html><body><div></div><p>foo</p></body></html>",
        "<html><head></head><body><p>foo</p></body></html>",
    ),
    (
        "removes_empty_section",
        "<html><body><section></section><p>foo</p></body></html>",
        "<html><head></head><body><p>foo</p></body></html>",
    ),
    (
        "removes_empty_header",
        "<html><body><header></header><p>foo</p></body></html>",
        "<html><head></head><body><p>foo</p></body></html>",
    ),
    (
        "keeps_div_with_text",
        "<html><body><div>foo</div></body></html>",
        "<html><head></head><body><div>foo</div></body></html>",
    ),
    (
        "keeps_div_with_non_br_hr_child",
        '<html><body><div><img src="foo.jpg"></div></body></html>',
        '<html><head></head><body><div><img src="foo.jpg"></div></body></html>',
    ),
    (
        "removes_div_with_only_br",
        "<html><body><div><br></div><p>foo</p></body></html>",
        "<html><head></head><body><p>foo</p></body></html>",
    ),
    (
        "removes_div_with_only_hr",
        "<html><body><div><hr></div><p>foo</p></body></html>",
        "<html><head></head><body><p>foo</p></body></html>",
    ),
    (
        "keeps_non_target_empty_tag",
        "<html><body><span></span><p>foo</p></body></html>",
        "<html><head></head><body><span></span><p>foo</p></body></html>",
    ),
]


@pytest.mark.parametrize("name,document,expected", EMPTY_CASES, ids=[c[0] for c in EMPTY_CASES])
def test_remove_empty_containers(name, document, expected):
    run_stage_test(remove_empty_containers, document, expected_html=expected)


def test_removes_empty_headings():
    for tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        run_stage_test(
            remove_empty_containers,
            f"<html><body><{tag}></{tag}><p>foo</p></body></html>",
            expected_html="<html><head></head><body><p>foo</p></body></html>",
        )


# ---------------------- rewrite_font_tags.rs:22-68

FONT_CASES = [
    (
        "converts_font_to_span",
        "<html><body><font>Hello</font></body></html>",
        "<html><head></head><body><span>Hello</span></body></html>",
    ),
    (
        "preserves_font_tag_content",
        "<html><body><font>Hello <b>world</b></font></body></html>",
        "<html><head></head><body><span>Hello <b>world</b></span></body></html>",
    ),
    (
        "converts_multiple_font_tags",
        "<html><body><font>One</font><p>Middle</p><font>Two</font></body></html>",
        "<html><head></head><body><span>One</span><p>Middle</p><span>Two</span></body></html>",
    ),
    (
        "handles_nested_font_tags",
        "<html><body><font>Outer <font>Inner</font></font></body></html>",
        "<html><head></head><body><span>Outer <span>Inner</span></span></body></html>",
    ),
]


@pytest.mark.parametrize("name,document,expected", FONT_CASES, ids=[c[0] for c in FONT_CASES])
def test_rewrite_font_tags(name, document, expected):
    run_stage_test(rewrite_font_tags, document, expected_html=expected)


# ---------------------- rewrite_line_breaks.rs:113-238

BR_CASES = [
    (
        "replaces_double_br_with_p",
        "<html><body><div>foo<br><br>bar</div></body></html>",
        "<html><head></head><body><div>foo<p>bar</p></div></body></html>",
    ),
    (
        "single_br_unchanged",
        "<html><body><div>foo<br>bar</div></body></html>",
        "<html><head></head><body><div>foo<br>bar</div></body></html>",
    ),
    (
        "triple_br_becomes_single_p",
        "<html><body><div>foo<br><br><br>bar</div></body></html>",
        "<html><head></head><body><div>foo<p>bar</p></div></body></html>",
    ),
    (
        "whitespace_between_brs_ignored_for_chain_detection",
        "<html><body><div>foo<br> <br>bar</div></body></html>",
        "<html><head></head><body><div>foo<p> bar</p></div></body></html>",
    ),
    (
        "stops_at_next_br_chain",
        "<html><body><div>a<br><br>b<br><br>c</div></body></html>",
        "<html><head></head><body><div>a<p>b</p><p>c</p></div></body></html>",
    ),
    (
        "collects_phrasing_content",
        "<html><body><div>foo<br><br>bar <b>baz</b></div></body></html>",
        "<html><head></head><body><div>foo<p>bar <b>baz</b></p></div></body></html>",
    ),
    (
        "stops_at_block_element",
        "<html><body><div>foo<br><br>bar<div>block</div></div></body></html>",
        "<html><head></head><body><div>foo<p>bar</p><div>block</div></div></body></html>",
    ),
    (
        "trims_trailing_whitespace_nodes",
        "<html><body><div>foo<br><br>bar<br></div></body></html>",
        "<html><head></head><body><div>foo<p>bar</p></div></body></html>",
    ),
    (
        "parent_p_becomes_div",
        "<html><body><p>foo<br><br>bar</p></body></html>",
        "<html><head></head><body><div>foo<p>bar</p></div></body></html>",
    ),
    (
        "handles_br_at_end",
        "<html><body><div>foo<br><br></div></body></html>",
        "<html><head></head><body><div>foo<p></p></div></body></html>",
    ),
    (
        "anchor_with_phrasing_children_is_phrasing",
        '<html><body><div>foo<br><br><a href="#"><b>link</b></a></div></body></html>',
        '<html><head></head><body><div>foo<p><a href="#"><b>link</b></a></p></div></body></html>',
    ),
]


@pytest.mark.parametrize("name,document,expected", BR_CASES, ids=[c[0] for c in BR_CASES])
def test_rewrite_line_breaks(name, document, expected):
    run_stage_test(rewrite_line_breaks, document, expected_html=expected)
