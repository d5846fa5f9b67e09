"""Schema-driven structured extraction (G10, SURVEY §2.7): JsonCss /
JsonXPath strategies as one Arrow stage.

Reference: ``JsonElementExtractionStrategy`` and its Css/XPath subclasses
(crawl4ai/extraction_strategy.py:762-1229) — a schema of
{baseSelector, baseFields, fields[]} where each field is
text / attribute / html / regex / nested / list / nested_list / computed,
with optional selector, transform (lowercase|uppercase|strip), default,
and computed ``expression`` eval'd over the partial item (:993-1001).

The reference selects with BeautifulSoup.select (CSS) or lxml.xpath —
neither library exists in this sandbox, so the element tree is the stdlib
``html.parser`` (same recovery behavior as operators/scrape.py) and the
selector engines implement the documented SUBSETS:

  CSS   — tag, .class, #id, [attr], [attr=value], compound combinations
          (``div.item#x[href]``), descendant (space), child (``>``), and
          comma groups: the grammar the reference's own generate_schema
          prompt produces.
  XPath — ``//tag``, ``/tag``, ``*``, attribute predicates
          ``[@attr='v']``, positional predicates ``[n]`` (1-based,
          evaluated per parent context like lxml: ``//li[1]`` is each
          list's first item, not the document's first li), and trailing
          ``/@attr`` / ``/text()`` value steps: the subset its
          _basic_css_to_xpath emits (:1228-1238) plus common hand-written
          forms.

Execution shape: schemas are driver-side dicts broadcast into a
``mapInPandas`` pass; each batch parses ~10³ pages per task with zero
per-row Python crossings; output rows are (url, item_idx, item_json) —
JSON strings because the schema shape is dynamic; downstream code applies
``F.from_json`` with a chosen struct type.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


def _esc_text(s: str) -> str:
    """lxml-style text escaping: & < > (quotes stay literal in text)."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    """lxml-style attribute escaping: & < > " (single quote stays)."""
    return _esc_text(s).replace('"', "&quot;")


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "texts")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[Node] = []
        self.texts: list[tuple[int, str]] = []  # (child-slot, raw text)

    # ------------------------------------------------------------- output
    def get_text(self, strip: bool = True) -> str:
        """BeautifulSoup get_text(strip=True) twin: stripped descendant
        strings, empties dropped, joined by ''."""
        parts: list[str] = []

        def walk(n: Node) -> None:
            slots: dict[int, list[str]] = {}
            for slot, t in n.texts:
                slots.setdefault(slot, []).append(t)
            for i in range(len(n.children) + 1):
                for t in slots.get(i, []):
                    t2 = t.strip() if strip else t
                    if t2:
                        parts.append(t2)
                if i < len(n.children):
                    walk(n.children[i])

        walk(self)
        return "".join(parts)

    def to_html(self) -> str:
        """Normalized serialization (the reference returns the raw
        BeautifulSoup str(); byte-exact source spans are not recoverable
        from the stdlib parser, so this re-serializes the subtree).
        The parser decodes entities (convert_charrefs=True), so values
        are RE-ESCAPED here the way lxml's tostring does — & < > (+ the
        double quote in attributes); without it, markup like
        data-x="a&quot;b" would round-trip to the invalid data-x="a"b"."""
        attrs = "".join(
            f' {k}="{_esc_attr(v)}"' for k, v in self.attrs.items()
        )
        slots: dict[int, list[str]] = {}
        for slot, t in self.texts:
            slots.setdefault(slot, []).append(t)
        inner: list[str] = []
        for i in range(len(self.children) + 1):
            inner.extend(_esc_text(t) for t in slots.get(i, []))
            if i < len(self.children):
                inner.append(self.children[i].to_html())
        if self.tag in VOID_TAGS:
            return f"<{self.tag}{attrs}>"
        return f"<{self.tag}{attrs}>{''.join(inner)}</{self.tag}>"

    def descendants(self) -> Iterator["Node"]:
        for c in self.children:
            yield c
            yield from c.descendants()

    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self._open: list[Node] = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, self._open[-1])
        self._open[-1].children.append(node)
        if tag not in VOID_TAGS:
            self._open.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, self._open[-1])
        self._open[-1].children.append(node)

    def handle_endtag(self, tag):
        # close the nearest matching open element (implicit-close recovery)
        for i in range(len(self._open) - 1, 0, -1):
            if self._open[i].tag == tag:
                del self._open[i:]
                return

    def handle_data(self, data):
        cur = self._open[-1]
        cur.texts.append((len(cur.children), data))


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass
    return b.root


def truncate_str(value: str, threshold: int) -> str:
    """Reference ``truncate`` twin (utils.py:2759-2762): cap at threshold
    chars and append a literal '...' marker."""
    if len(value) > threshold:
        return value[:threshold] + "..."
    return value


def optimize_html(html: str, threshold: int = 200) -> str:
    """Reference ``optimize_html`` twin (utils.py:2764-2781): walk the
    tree truncating every attribute value and every text segment to
    ``threshold`` chars (+'...'), then re-serialize — the compressor the
    schema-generation path feeds to the LLM (crawlers/google_search).

    Mapping note: lxml truncates the merged ``.text``/``.tail`` strings;
    the stdlib parser delivers text in segments (entities split data), so
    this twin truncates per segment — identical output whenever segments
    aren't split mid-run (always true for entity-free markup).  Entities
    themselves re-escape on serialization (Node.to_html matches lxml
    tostring for & < > "), so entity-bearing markup stays VALID; only the
    truncation boundary can differ from the reference there."""
    root = parse_html(html)
    for node in (root, *root.descendants()):
        node.attrs = {k: truncate_str(v, threshold) for k, v in node.attrs.items()}
        node.texts = [(s, truncate_str(t, threshold)) for s, t in node.texts]
    if root.tag != "[document]":
        return root.to_html()
    # document root: interleave top-level text slots and children, unwrapped
    slots: dict[int, list[str]] = {}
    for slot, t in root.texts:
        slots.setdefault(slot, []).append(t)
    inner: list[str] = []
    for i in range(len(root.children) + 1):
        inner.extend(slots.get(i, []))
        if i < len(root.children):
            inner.append(root.children[i].to_html())
    return "".join(inner)


def optimize_html_stage(pages: DataFrame, threshold: int = 200,
                        html_col: str = "html",
                        out_col: str = "optimized") -> DataFrame:
    """Arrow-batched column wrapper around ``optimize_html`` (pure
    per-row transform — no shuffle, no per-row Python in the plan)."""
    @pandas_udf("string")
    def opt(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda h: optimize_html(h, threshold))

    return pages.withColumn(out_col, opt(F.col(html_col)))


# ------------------------------------------------------------------- CSS

_COMPOUND = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)"
)
_PIECE = re.compile(r"([.#])([\w-]+)|\[([^\]=~|^$*]+)(?:=(?:\"([^\"]*)\"|'([^']*)'|([^\]]*)))?\]")


def _parse_compound(s: str):
    m = _COMPOUND.fullmatch(s)
    if not m:
        raise ValueError(f"unsupported CSS compound: {s!r}")
    tag = m.group("tag")
    classes, ident, attrs = [], None, []
    for pm in _PIECE.finditer(m.group("rest") or ""):
        if pm.group(1) == ".":
            classes.append(pm.group(2))
        elif pm.group(1) == "#":
            ident = pm.group(2)
        else:
            name = pm.group(3).strip()
            val = pm.group(4) if pm.group(4) is not None else (
                pm.group(5) if pm.group(5) is not None else pm.group(6)
            )
            attrs.append((name, val))
    return tag, classes, ident, attrs


def _match_compound(n: Node, comp) -> bool:
    tag, classes, ident, attrs = comp
    if tag and tag != "*" and n.tag != tag:
        return False
    if ident is not None and n.attrs.get("id") != ident:
        return False
    if classes and not set(classes) <= n.classes():
        return False
    for name, val in attrs:
        if name not in n.attrs:
            return False
        if val is not None and n.attrs.get(name) != val:
            return False
    return True


def css_select(scope: Node, selector: str) -> list[Node]:
    """Subset .select(): comma groups of descendant/child chains of
    compound selectors; results in document order, deduplicated."""
    out: list[Node] = []
    seen: set[int] = set()
    for group in selector.split(","):
        toks = group.replace(">", " > ").split()
        if not toks:
            continue
        steps = []  # (combinator, compound) — combinator '' | '>'
        comb = ""
        for t in toks:
            if t == ">":
                comb = ">"
                continue
            steps.append((comb, _parse_compound(t)))
            comb = ""

        def matches_at(n: Node, i: int) -> bool:
            comb, comp = steps[i]
            if not _match_compound(n, comp):
                return False
            if i == 0:
                return True
            prev_comb = steps[i][0]
            anc = n.parent
            if prev_comb == ">":
                return anc is not None and anc.tag != "[document]" and matches_at(anc, i - 1) if anc else False
            while anc is not None and anc.tag != "[document]":
                if matches_at(anc, i - 1):
                    return True
                anc = anc.parent
            return False

        for n in scope.descendants():
            if matches_at(n, len(steps) - 1) and id(n) not in seen:
                seen.add(id(n))
                out.append(n)
    return out


# ----------------------------------------------------------------- XPath

_XSTEP = re.compile(r"^(?P<tag>[\w*-]+)(?P<preds>(?:\[[^\]]*\])*)$")


def xpath_select(scope: Node, expr: str):
    """Subset .xpath(): absolute/descendant steps with attribute/index
    predicates; trailing /@attr or /text() yields strings."""
    expr = expr.strip()
    value_step = None
    m = re.search(r"/(@[\w-]+|text\(\))$", expr)
    if m:
        value_step = m.group(1)
        expr = expr[: m.start()]
    # tokenize into (axis, step): '//' = descendant-or-self, '/' = child
    toks = re.findall(r"(//|/)([^/]+)", expr if expr.startswith("/") else "//" + expr)
    nodes = [scope]
    for axis, step in toks:
        sm = _XSTEP.match(step)
        if not sm:
            raise ValueError(f"unsupported XPath step: {step!r}")
        tag = sm.group("tag")
        preds = re.findall(r"\[([^\]]*)\]", sm.group("preds") or "")
        # Positional predicates are per-context in XPath (`//li[1]` =
        # descendant-or-self::node()/child::li[1] — each parent's first li,
        # as lxml evaluates it), so candidates are grouped by the node that
        # defines position: the parent for `//`, the context node for `/`.
        groups: list[list[Node]] = []
        if axis == "//":
            by_parent: dict[int, list[Node]] = {}
            order: list[int] = []
            taken: set[int] = set()
            for n in nodes:
                for c in n.descendants():
                    if (tag == "*" or c.tag == tag) and id(c) not in taken:
                        taken.add(id(c))
                        key = id(c.parent)
                        if key not in by_parent:
                            by_parent[key] = []
                            order.append(key)
                        by_parent[key].append(c)
            groups = [by_parent[k] for k in order]
        else:
            for n in nodes:
                groups.append(
                    [c for c in n.children if tag == "*" or c.tag == tag]
                )
        # apply predicates in order, within each position context
        for p in preds:
            p = p.strip()
            if p.isdigit():
                i = int(p) - 1
                groups = [[g[i]] for g in groups if 0 <= i < len(g)]
                continue
            am = re.match(r"^@([\w-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")$", p)
            if am:
                name = am.group(1)
                val = am.group(2) if am.group(2) is not None else am.group(3)
                groups = [
                    [c for c in g if c.attrs.get(name) == val] for g in groups
                ]
                continue
            am = re.match(r"^@([\w-]+)$", p)
            if am:
                groups = [
                    [c for c in g if am.group(1) in c.attrs] for g in groups
                ]
                continue
            raise ValueError(f"unsupported XPath predicate: {p!r}")
        nodes = [c for g in groups for c in g]
    if value_step is None:
        return nodes
    if value_step == "text()":
        return [t.strip() for n in nodes for _slot, t in n.texts if t.strip()]
    attr = value_step[1:]
    return [n.attrs[attr] for n in nodes if attr in n.attrs]


# ------------------------------------------------------------- strategies

class JsonCssExtractor:
    """extraction_strategy.py:1145-1189 over the stdlib tree."""

    def __init__(self, schema: dict[str, Any], verbose: bool = False):
        self.schema = schema
        self.verbose = verbose

    # hooks (reference abstract methods)
    def _parse_html(self, html: str) -> Node:
        return parse_html(html)

    def _get_base_elements(self, parsed, selector: str):
        return css_select(parsed, selector)

    def _get_elements(self, element: Node, selector: str):
        return css_select(element, selector)

    def _get_element_text(self, element: Node) -> str:
        return element.get_text(strip=True)

    def _get_element_html(self, element: Node) -> str:
        return element.to_html()

    def _get_element_attribute(self, element: Node, attribute: str):
        return element.attrs.get(attribute)

    # extraction flow (:808-850, :866-1001) — structure preserved
    def extract(self, html: str) -> list[dict[str, Any]]:
        parsed = self._parse_html(html)
        results = []
        for element in self._get_base_elements(parsed, self.schema["baseSelector"]):
            item: dict[str, Any] = {}
            for field in self.schema.get("baseFields", []):
                value = self._extract_single_field(element, field)
                if value is not None:
                    item[field["name"]] = value
            item.update(self._extract_item(element, self.schema["fields"]))
            if item:
                results.append(item)
        return results

    def _extract_field(self, element, field):
        try:
            if field["type"] == "nested":
                els = self._get_elements(element, field["selector"])
                return self._extract_item(els[0], field["fields"]) if els else {}
            if field["type"] == "list":
                els = self._get_elements(element, field["selector"])
                return [self._extract_list_item(el, field["fields"]) for el in els]
            if field["type"] == "nested_list":
                els = self._get_elements(element, field["selector"])
                return [self._extract_item(el, field["fields"]) for el in els]
            return self._extract_single_field(element, field)
        except Exception:
            return field.get("default")

    def _extract_single_field(self, element, field):
        if "selector" in field:
            selected = self._get_elements(element, field["selector"])
            if not selected:
                return field.get("default")
            selected = selected[0]
        else:
            selected = element
        value = None
        if field["type"] == "text":
            value = self._get_element_text(selected)
        elif field["type"] == "attribute":
            value = self._get_element_attribute(selected, field["attribute"])
        elif field["type"] == "html":
            value = self._get_element_html(selected)
        elif field["type"] == "regex":
            text = self._get_element_text(selected)
            m = re.search(field["pattern"], text)
            value = m.group(1) if m else None
        if "transform" in field:
            value = self._apply_transform(value, field["transform"])
        return value if value is not None else field.get("default")

    def _extract_list_item(self, element, fields):
        item = {}
        for field in fields:
            value = self._extract_single_field(element, field)
            if value is not None:
                item[field["name"]] = value
        return item

    def _extract_item(self, element, fields):
        item: dict[str, Any] = {}
        for field in fields:
            if field["type"] == "computed":
                value = self._compute_field(item, field)
            else:
                value = self._extract_field(element, field)
            if value is not None:
                item[field["name"]] = value
        return item

    @staticmethod
    def _apply_transform(value, transform):
        if transform == "lowercase":
            return value.lower()
        if transform == "uppercase":
            return value.upper()
        if transform == "strip":
            return value.strip()
        return value

    def _compute_field(self, item, field):
        # :993-1001 — expression eval'd with the partial item as locals
        # (same trust model as the reference: the schema is caller code)
        try:
            if "expression" in field:
                return eval(field["expression"], {}, dict(item))  # noqa: S307
            if "function" in field:
                return field["function"](item)
        except Exception:
            return field.get("default")


class JsonXPathExtractor(JsonCssExtractor):
    """extraction_strategy.py:1191-1254 over the stdlib tree; selectors go
    through the same _css_to_xpath fallback rule (a selector without '/'
    is treated as CSS-ish and converted, :1228-1238)."""

    def _get_base_elements(self, parsed, selector: str):
        return xpath_select(parsed, self._css_to_xpath(selector))

    def _get_elements(self, element, selector: str):
        out = xpath_select(element, self._css_to_xpath(selector))
        return [n for n in out if isinstance(n, Node)]

    @staticmethod
    def _css_to_xpath(selector: str) -> str:
        if "/" in selector:
            return selector
        if " > " in selector:
            return "//" + "/".join(selector.split(" > "))
        if " " in selector:
            return "//" + "//".join(selector.split(" "))
        return "//" + selector


EXTRACT_SCHEMA = "url string, item_idx int, item_json string"


def extract_stage(pages: DataFrame, schema: dict[str, Any],
                  kind: str = "css", html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """Run a JsonCss/JsonXPath schema over (url, html) rows in Arrow
    batches → (url, item_idx, item_json)."""
    spark = pages.sparkSession
    bc = spark.sparkContext.broadcast((schema, kind))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sch, k = bc.value
        ex = JsonCssExtractor(sch) if k == "css" else JsonXPathExtractor(sch)
        for b in batches:
            rows = []
            for r in b.itertuples():
                items = ex.extract(getattr(r, html_col) or "")
                for i, item in enumerate(items):
                    rows.append(
                        {"url": getattr(r, url_col), "item_idx": i,
                         "item_json": json.dumps(item, sort_keys=True)}
                    )
            yield pd.DataFrame(rows, columns=["url", "item_idx", "item_json"])

    return pages.select(url_col, html_col).mapInPandas(run, EXTRACT_SCHEMA)
