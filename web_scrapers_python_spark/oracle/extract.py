"""Deterministic HTML extraction — the parity-path extractor.

The reference extracts text through a live browser
(``page.text_content(selector)``) with trafilatura/newspaper metadata
(generic_news.py:69-166). Neither a browser nor those libraries exist
in this sandbox (SURVEY §6), so byte-parity is defined on the
reference's fully-specified **CSS-selector fallback path**
(generic_news.py:119-166) plus cleaning (generic_news.py:168-213),
replayed here over static HTML with a minimal stdlib DOM:

- ``text_content(el)`` = concatenation of all descendant text nodes,
  entities unescaped, whitespace preserved — matching the DOM
  ``Node.textContent`` semantics ``page.text_content`` returns.
- selector support is exactly what the reference uses: bare tag names
  (``h1``, ``title``, ``article``, ``main``, ``body``) and single
  class selectors (``.article-title``, ``.post-content``, …).
- metadata (author/description/published/image) comes from standard
  ``<meta>`` tags — the public signal trafilatura.extract_metadata
  reads (generic_news.py:78-92's stand-in; same cleaning applies).

Pure stdlib; used by tests as the golden AND imported by the Arrow
pandas-UDF parsers so the distributed path is byte-identical by
construction *and* verified against independently generated fixtures.
"""

from __future__ import annotations

from html.parser import HTMLParser

from . import reference as ref

VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
             "link", "meta", "param", "source", "track", "wbr"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node or str (text)
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # close nearest open ancestor with this tag (lenient, like browsers)
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.children.append(data)


def parse_html(html: str | bytes) -> _Node:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _TreeBuilder()
    b.feed(html)
    return b.root


def _iter_nodes(node: _Node):
    for ch in node.children:
        if isinstance(ch, _Node):
            yield ch
            yield from _iter_nodes(ch)


def first_match(root: _Node, selector: str) -> _Node | None:
    """First document-order element matching a bare-tag or .class selector."""
    selector = selector.strip()
    if selector.startswith("."):
        cls = selector[1:]
        for n in _iter_nodes(root):
            if cls in (n.attrs.get("class") or "").split():
                return n
    else:
        for n in _iter_nodes(root):
            if n.tag == selector:
                return n
    return None


def text_content(node: _Node | None) -> str | None:
    """DOM textContent: all descendant text, no normalization."""
    if node is None:
        return None
    parts: list[str] = []

    def walk(n: _Node):
        for ch in n.children:
            if isinstance(ch, str):
                parts.append(ch)
            else:
                walk(ch)

    walk(node)
    return "".join(parts)


def select_text(root: _Node, selector: str) -> str | None:
    return text_content(first_match(root, selector))


# --------------------------------------------------------------------------
# generic-news extraction
# --------------------------------------------------------------------------

TITLE_SELECTORS = ["h1", "title", ".article-title", ".post-title"]  # generic_news.py:125
CONTENT_SELECTORS = ["article", ".article-content", ".post-content",
                     "main", ".content", "body"]  # generic_news.py:136-143


def extract_basic_content(root: _Node) -> dict:
    """generic_news.py:119-166 — selector-fallback title/content.

    Title: first selector whose stripped text is non-empty.
    Content: first selector whose stripped text is >100 chars; then
    strip + cap 10000 (the cap re-applies in cleaning).
    Final title fallback: the page title (<title> text)."""
    data: dict = {}
    for sel in TITLE_SELECTORS:
        t = select_text(root, sel)
        if t and t.strip():
            data["title"] = t.strip()
            break
    for sel in CONTENT_SELECTORS:
        c = select_text(root, sel)
        if c and len(c.strip()) > 100:
            data["content"] = c.strip()[:10000]
            break
    if not data.get("title"):
        pt = select_text(root, "title")  # page.title() ≡ <title> text
        if pt:
            data["title"] = pt
    return data


def extract_metadata(root: _Node) -> dict:
    """Stand-in for trafilatura.extract_metadata (generic_news.py:78-92):
    author/description/date/image from standard meta tags."""
    meta: dict = {}
    for n in _iter_nodes(root):
        if n.tag != "meta":
            continue
        key = n.attrs.get("name") or n.attrs.get("property") or ""
        val = n.attrs.get("content")
        if not val:
            continue
        if key == "author" and "author" not in meta:
            meta["author"] = val
        elif key == "description" and "description" not in meta:
            meta["description"] = val
        elif key in ("article:published_time", "date") and "date" not in meta:
            meta["date"] = val
        elif key == "og:image" and "image" not in meta:
            meta["image"] = val
    return meta


def clean_article_data(data: dict, url: str) -> dict:
    """generic_news.py:168-213 — normalize + validate field-wise."""
    cleaned: dict = {"url": url, "source": ref.extract_domain(url)}
    if data.get("title"):
        cleaned["title"] = ref.clean_title(data["title"])
    if data.get("content"):
        cleaned["content"] = ref.clean_content(data["content"])
    a = ref.clean_author(data.get("author"))
    if a is not None:
        cleaned["author"] = a
    d = ref.clean_description(data.get("description"))
    if d is not None:
        cleaned["description"] = d
    if data.get("published_at"):
        pd = ref.parse_date(data["published_at"])
        if pd:
            cleaned["published_at"] = pd
    i = ref.clean_image(data.get("image"))
    if i is not None:
        cleaned["image"] = i
    return cleaned


def parse_generic_news(html: str | bytes, url: str) -> dict | None:
    """Full generic-news parse pipeline (generic_news.py:41-67 minus the
    browser): extract → clean → validate (required title + url; None on
    failure, never raise — base_parser.py:47-63, news.py:15,18)."""
    try:
        root = parse_html(html)
        data = extract_metadata(root)
        data.update(extract_basic_content(root))
        data["published_at"] = data.pop("date", None)
        cleaned = clean_article_data(data, url)
        if not cleaned.get("title") or not ref.url_scheme_ok(url):
            return None  # Pydantic required-field failure → None
        return cleaned
    except Exception:
        return None


# --------------------------------------------------------------------------
# weibo extraction
# --------------------------------------------------------------------------

WEIBO_CONTENT_SELECTORS = ["article", ".Detail_container__content",
                           ".card-comment", "body"]  # weibo.py:48-50
WEIBO_AUTHOR_SELECTORS = [".name", ".user-name", ".author"]  # weibo.py:64-66
# (the reference's first author selector `a:has(img[alt])` needs :has();
# synthetic pages always carry one of the class selectors)


def _weibo_text(root: _Node, selectors: list[str]) -> str | None:
    """weibo.py:86-97 — first selector with non-empty stripped text."""
    for sel in selectors:
        t = select_text(root, sel)
        if t and t.strip():
            return t.strip()
    return None


def _weibo_metric(root: _Node, marker: str) -> int | None:
    """weibo.py:53-61 — span containing the marker glyph (赞/转发/评论),
    number parsed per weibo.py:99-125."""
    for n in _iter_nodes(root):
        if n.tag == "span":
            t = text_content(n)
            if t and marker in t and t.strip():
                return ref.extract_number(t.strip())
    return None


def parse_weibo(html: str | bytes, url: str, req_id: str | None = None) -> dict | None:
    """weibo.py:38-84 — content/likes/reposts/comments/author; content
    capped 10000, '' when missing; id = request id or url; None on error."""
    try:
        root = parse_html(html)
        content = _weibo_text(root, WEIBO_CONTENT_SELECTORS)
        return {
            "id": req_id or url,
            "author": _weibo_text(root, WEIBO_AUTHOR_SELECTORS),
            "content": content[:10000] if content else "",
            "likes": _weibo_metric(root, "赞"),
            "reposts": _weibo_metric(root, "转发"),
            "comments": _weibo_metric(root, "评论"),
            "url": url,
        }
    except Exception:
        return None


# --------------------------------------------------------------------------
# link discovery (routes.py:44-57 / crawlee enqueue_links)
# --------------------------------------------------------------------------

def extract_links(html: str | bytes, selector: str | None = "a") -> list[str]:
    """enqueue_links(selector=...) — href of each matching <a>, in
    document order (routes.py:44-57). Only absolute http(s) links are
    enqueueable against a pages table."""
    if not selector:
        return []
    root = parse_html(html)
    out: list[str] = []
    sel = selector.strip()
    cls = sel[1:] if sel.startswith(".") else None
    for n in _iter_nodes(root):
        if n.tag != "a":
            continue
        if cls is not None and cls not in (n.attrs.get("class") or "").split():
            continue
        href = n.attrs.get("href")
        if href and ref.url_scheme_ok(href):
            out.append(href)
    return out
