"""HTML article extraction — the reference's flagship per-record parser
rebuilt as a stateless Ray Data batch operator.

Semantics follow ``/root/reference/utils/article_extractor.py:247-350``:
drop script/style/noscript, title via a 10-selector cascade (og/twitter
meta tags yield their ``content`` attribute), content via a 15-selector
cascade with unwanted-element removal and a >200-char acceptance gate,
whole-document paragraph-join fallback (paragraphs >50 chars), author via
a 12-selector cascade, ``summary = content[:200] + '...'``, and the
text sanitizer of ``:166-203`` (NUL/control strip, whitespace collapse).

No BeautifulSoup in this environment (and none needed): a small
stdlib-``html.parser`` DOM plus a selector matcher covering exactly the
selector grammar the cascades use (tag, .class, #id, tag.class,
[attr="v"], [attr*="v"], comma lists). The cascades are data
(module-level tuples) — the reference's de-facto plugin point for new
site layouts (SURVEY.md §2.10).

Scale shape: parsing is inherently per-record Python, so the operator is
a pure ``map_batches`` function — no state, no shuffle; HTML bytes enter,
structured text leaves, and the streaming executor provides all the
parallelism. Parse failures are rows with ``extraction_error``, never
lost tasks (error-as-record, reference ``:361-410``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

# ------------------------------------------------------------------ mini-DOM

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "text_parts")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.text_parts: None = None  # placeholder to keep slots stable

    # -- traversal -----------------------------------------------------------

    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter()

    def walk(self):
        """Depth-first (node, ancestor-stack) pairs, document order. The
        yielded stack is shared and only valid during that iteration."""
        stack = [self]

        def rec(n):
            for c in n.children:
                if isinstance(c, Node):
                    yield c, stack
                    stack.append(c)
                    yield from rec(c)
                    stack.pop()

        yield from rec(self)

    def detach_matching(self, seqs) -> None:
        """Remove descendant elements matching any selector (decompose)."""

        def rec(n, stack):
            n.children = [
                c
                for c in n.children
                if not (
                    isinstance(c, Node)
                    and any(_match_seq(s, c, stack) for s in seqs)
                )
            ]
            for c in n.children:
                if isinstance(c, Node):
                    stack.append(c)
                    rec(c, stack)
                    stack.pop()

        rec(self, [self])

    def get_text(self, sep: str = "", strip: bool = False) -> str:
        parts: list[str] = []
        for n in self.iter():
            for c in n.children:
                if isinstance(c, str):
                    t = c.strip() if strip else c
                    if t:
                        parts.append(t)
        return sep.join(parts)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, {k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag):
        # tolerant close: pop to the nearest open element of this tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# ------------------------------------------------------------- selectors

_SEL_RE = re.compile(
    r"""(?P<tag>[a-zA-Z][\w-]*)?
        (?P<parts>(?:\.[\w-]+|\#[\w-]+|\[[^\]]+\])*)$""",
    re.X,
)
_ATTR_RE = re.compile(r'\[(?P<attr>[\w-]+)(?:(?P<op>\*?=)"?(?P<val>[^"\]]*)"?)?\]')


def _compile_simple(sel: str):
    """Compile one simple selector into a Node -> bool matcher."""
    m = _SEL_RE.match(sel.strip())
    if not m:
        raise ValueError(f"unsupported selector: {sel!r}")
    tag = m.group("tag").lower() if m.group("tag") else None
    classes, node_id, attr_tests = [], None, []
    for part in re.findall(r"\.[\w-]+|\#[\w-]+|\[[^\]]+\]", m.group("parts") or ""):
        if part.startswith("."):
            classes.append(part[1:])
        elif part.startswith("#"):
            node_id = part[1:]
        else:
            am = _ATTR_RE.match(part)
            attr_tests.append((am.group("attr"), am.group("op"), am.group("val")))

    def match(n: Node) -> bool:
        if tag is not None and n.tag != tag:
            return False
        if node_id is not None and n.attrs.get("id") != node_id:
            return False
        if classes:
            have = n.attrs.get("class", "").split()
            if any(c not in have for c in classes):
                return False
        for attr, op, val in attr_tests:
            got = n.attrs.get(attr)
            if got is None:
                return False
            if op == "=" and got != val:
                return False
            if op == "*=" and val not in got:
                return False
        return True

    return match


def compile_selector(sel: str):
    """Comma list of (possibly descendant-combinator) selectors -> list
    of matcher sequences (OR across the list; each sequence is
    ancestor-constrained, last element is the target)."""
    out = []
    for part in sel.split(","):
        part = part.strip()
        if part:
            out.append([_compile_simple(s) for s in part.split()])
    return out


def _match_seq(seq, node: Node, ancestors) -> bool:
    if not seq[-1](node):
        return False
    ai = len(ancestors) - 1
    for m in reversed(seq[:-1]):
        while ai >= 0 and not m(ancestors[ai]):
            ai -= 1
        if ai < 0:
            return False
        ai -= 1
    return True


def select_one(root: Node, seqs) -> Node | None:
    for n, stack in root.walk():
        if any(_match_seq(s, n, stack) for s in seqs):
            return n
    return None


def select_all(root: Node, seqs) -> list[Node]:
    return [
        n for n, stack in root.walk() if any(_match_seq(s, n, stack) for s in seqs)
    ]


# ----------------------------------------------------- cascades (as data)

TITLE_SELECTORS = (
    "h1",
    "title",
    '[property="og:title"]',
    '[name="twitter:title"]',
    ".headline",
    ".title",
    "#title",
    ".article-title",
    ".post-title",
    ".entry-title",
)
_META_TITLE = {'[property="og:title"]', '[name="twitter:title"]'}

CONTENT_SELECTORS = (
    "article",
    ".article-content",
    ".post-content",
    ".entry-content",
    ".content",
    ".story-body",
    ".article-body",
    ".post-body",
    "main",
    '[role="main"]',
    ".article-text",
    ".story-content",
    ".article-main",
    ".article__content",
    ".post__content",
)

UNWANTED_IN_CONTENT = (
    "script, style, nav, header, footer, .ad, .advertisement, .sidebar, "
    ".comments, .social-share, .related-articles, .newsletter-signup"
)

UNWANTED_FALLBACK = (
    "nav, header, footer, .nav, .header, .footer, .menu, .sidebar, .ad, "
    ".advertisement, .comments, .social-share"
)

AUTHOR_SELECTORS = (
    ".author",
    ".byline",
    '[rel="author"]',
    '[class*="author"]',
    '[class*="byline"]',
    ".writer",
    ".reporter",
    ".journalist",
    ".contributor",
    ".article-author",
    ".post-author",
    ".entry-author",
)

_DROP_ALWAYS = compile_selector("script, style, noscript")
_TITLE_M = [(s, compile_selector(s)) for s in TITLE_SELECTORS]
_CONTENT_M = [compile_selector(s) for s in CONTENT_SELECTORS]
_UNWANTED_CONTENT_M = compile_selector(UNWANTED_IN_CONTENT)
_UNWANTED_FALLBACK_M = compile_selector(UNWANTED_FALLBACK)
_AUTHOR_M = [compile_selector(s) for s in AUTHOR_SELECTORS]
_P_M = compile_selector("p")

_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_WS_RE = re.compile(r"\s+")

MIN_CONTENT_CHARS = 200  # reference article_extractor.py:306
MIN_PARAGRAPH_CHARS = 50  # reference article_extractor.py:317
SUMMARY_CHARS = 200  # reference article_extractor.py:349


def clean_text(text: str) -> str:
    """Reference ``_clean_text`` (:166-203): NUL + control-char strip,
    whitespace collapse, lossy UTF-8 recovery."""
    if not text:
        return ""
    text = text.replace("\x00", "")
    text = _CTRL_RE.sub("", text)
    text = _WS_RE.sub(" ", text)
    return text.encode("utf-8", errors="ignore").decode("utf-8").strip()


def extract_article(html: str | bytes) -> dict:
    """bytes/str HTML -> {title, content, summary, author, error}."""
    try:
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        root = parse_html(html)
        root.detach_matching(_DROP_ALWAYS)

        title = ""
        for sel, matchers in _TITLE_M:
            el = select_one(root, matchers)
            if el is not None:
                if sel in _META_TITLE:
                    title = el.attrs.get("content", "").strip()
                else:
                    title = el.get_text().strip()
                if title:
                    break
        title = clean_text(title)

        content = ""
        for matchers in _CONTENT_M:
            el = select_one(root, matchers)
            if el is not None:
                el.detach_matching(_UNWANTED_CONTENT_M)
                content = el.get_text(sep=" ", strip=True)
                if len(content) > MIN_CONTENT_CHARS:
                    break
        if not content or len(content) < MIN_CONTENT_CHARS:
            root.detach_matching(_UNWANTED_FALLBACK_M)
            paras = [
                p.get_text().strip()
                for p in select_all(root, _P_M)
            ]
            content = " ".join(p for p in paras if len(p) > MIN_PARAGRAPH_CHARS)
        content = clean_text(content)

        author = ""
        for matchers in _AUTHOR_M:
            el = select_one(root, matchers)
            if el is not None:
                author = el.get_text().strip()
                if author:
                    break
        author = clean_text(author)

        summary = (
            content[:SUMMARY_CHARS] + "..." if len(content) > SUMMARY_CHARS else content
        )
        return {
            "title": title,
            "content": content,
            "summary": summary,
            "author": author,
            "error": None,
        }
    except Exception as e:  # error-as-record, never a lost row
        return {"title": "", "content": "", "summary": "", "author": "",
                "error": f"Parse error: {e}"}


def extract_html_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Stateless map_batches operator: html binary/string column ->
    structured article columns. Other input columns pass through."""
    col = batch.column(html_col)
    out = {"title": [], "content": [], "summary": [], "author": [], "error": []}
    for v in col.to_pylist():
        rec = (
            extract_article(v)
            if v is not None
            else {"title": "", "content": "", "summary": "", "author": "",
                  "error": "Empty document"}
        )
        for k in out:
            out[k].append(rec[k])
    res = batch.drop_columns([html_col])
    for k in ("title", "content", "summary", "author"):
        res = res.append_column(k, pa.array(out[k], pa.string()))
    return res.append_column("extraction_error", pa.array(out["error"], pa.string()))
