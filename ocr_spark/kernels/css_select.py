"""CSS selector engine over the html_extract DOM.

The reference's HTML path is built on BeautifulSoup
(/root/reference/utils/text/parsers/html_parser.py:119-159), whose
``select()`` is the query surface its users reach for when the built-in
p/ul/ol/h1-h5 extraction isn't enough. This kernel gives the rebuild the
same capability over our own ``_Node`` tree (kernels/html_extract.py) —
pure Python, no dependency, evaluated inside the Arrow stage.

Supported grammar (the practical CSS level-3 core):
- compound selectors: ``tag`` / ``*`` / ``#id`` / ``.class`` (stackable)
- attribute tests: ``[attr]``, ``[attr=v]``, ``[attr^=v]``, ``[attr$=v]``,
  ``[attr*=v]``, ``[attr~=v]`` (quoted or bare values)
- combinators: descendant (whitespace), child ``>``, adjacent sibling
  ``+``, general sibling ``~``
- selector groups: ``a, b``
- structural pseudo-classes: ``:first-child``, ``:last-child``,
  ``:nth-of-type(k)`` (1-based literal k), ``:first-of-type``,
  ``:last-of-type``

Matching is right-to-left (the standard engine shape): walk the tree once
in document order, test each element against a chain's rightmost compound,
then verify the chain's remaining compounds against ancestors/siblings.
Results are in document order, deduplicated across groups.
"""

from __future__ import annotations

import re

from .html_extract import _Node, _iter_nodes

__all__ = ["parse_selector", "css_select", "SelectorError"]


class SelectorError(ValueError):
    pass


_GROUP_SPLIT_RE = re.compile(r",(?![^\[]*\])")  # commas outside [...]
_COMBINATOR_RE = re.compile(r"\s*([>+~])\s*|\s+")
_SIMPLE_RE = re.compile(
    r"""(?P<tag>[a-zA-Z][-\w]*|\*)
      | \#(?P<id>[-\w]+)
      | \.(?P<cls>[-\w]+)
      | \[(?P<attr>[^\]]+)\]
      | :(?P<pseudo>[a-z-]+)(?:\((?P<arg>[^)]*)\))?
    """,
    re.VERBOSE,
)
_ATTR_TEST_RE = re.compile(
    r"""^\s*(?P<name>[-\w:]+)\s*
        (?:(?P<op>[~^$*]?=)\s*(?P<val>"[^"]*"|'[^']*'|[^\s\]]+)\s*)?$""",
    re.VERBOSE,
)
_PSEUDOS = frozenset(
    ("first-child", "last-child", "nth-of-type", "first-of-type", "last-of-type")
)


def _parse_compound(text: str):
    """One compound selector -> dict(tag, id, classes, attrs, pseudos)."""
    simple = {"tag": None, "id": None, "classes": [], "attrs": [], "pseudos": []}
    pos = 0
    seen_any = False
    while pos < len(text):
        seen_any = True
        m = _SIMPLE_RE.match(text, pos)
        if m is None:
            raise SelectorError(f"cannot parse selector at {text[pos:]!r}")
        pos = m.end()
        if m.group("tag"):
            if simple["tag"] is not None or simple["id"] or simple["classes"]:
                raise SelectorError(f"type selector must lead the compound: {text!r}")
            simple["tag"] = None if m.group("tag") == "*" else m.group("tag").lower()
        elif m.group("id"):
            simple["id"] = m.group("id")
        elif m.group("cls"):
            simple["classes"].append(m.group("cls"))
        elif m.group("attr") is not None:
            am = _ATTR_TEST_RE.match(m.group("attr"))
            if am is None:
                raise SelectorError(f"bad attribute test [{m.group('attr')}]")
            val = am.group("val")
            if val is not None and len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                val = val[1:-1]
            simple["attrs"].append((am.group("name").lower(), am.group("op"), val))
        else:
            name = m.group("pseudo")
            if name not in _PSEUDOS:
                raise SelectorError(f"unsupported pseudo-class :{name}")
            arg = None
            if name == "nth-of-type":
                raw = (m.group("arg") or "").strip()
                if not raw.isdigit() or int(raw) < 1:
                    raise SelectorError(f":nth-of-type needs a positive literal, got {raw!r}")
                arg = int(raw)
            simple["pseudos"].append((name, arg))
    if not seen_any:
        raise SelectorError(f"empty compound selector in {text!r}")
    return simple


def parse_selector(selector: str):
    """Selector string -> list of chains; chain = [(combinator, compound)]
    with the first combinator always ``''`` and the rest in ``' >+~'``."""
    groups = []
    for part in _GROUP_SPLIT_RE.split(selector):
        part = part.strip()
        if not part:
            raise SelectorError(f"empty selector group in {selector!r}")
        chain = []
        pos = 0
        comb = ""
        while pos < len(part):
            # read one compound: scan to the next combinator OUTSIDE any
            # [...] (attribute values may contain spaces/>'s when quoted)
            end = len(part)
            depth = 0
            i = pos
            while i < len(part):
                c = part[i]
                if c == "[":
                    depth += 1
                elif c == "]":
                    depth -= 1
                elif depth == 0 and (c in ">+~" or c.isspace()):
                    end = i
                    break
                i += 1
            compound = part[pos:end]
            chain.append((comb, _parse_compound(compound)))
            if end == len(part):
                break
            m = _COMBINATOR_RE.match(part, end)
            if m is None:
                raise SelectorError(f"cannot parse combinator at {part[end:]!r}")
            comb = m.group(1) or " "
            pos = m.end()
            if pos >= len(part):
                raise SelectorError(f"dangling combinator in {part!r}")
        groups.append(chain)
    return groups


def _element_siblings(node):
    parent = node.parent
    if parent is None:
        return [node]
    return [c for c in parent.children if isinstance(c, _Node)]


def _matches_compound(node, s) -> bool:
    if s["tag"] is not None and node.name != s["tag"]:
        return False
    if node.name == "[document]":
        return False
    attrs = node.attrs
    if s["id"] is not None and attrs.get("id") != s["id"]:
        return False
    if s["classes"]:
        have = set((attrs.get("class") or "").split())
        if not all(c in have for c in s["classes"]):
            return False
    for name, op, val in s["attrs"]:
        if name not in attrs:
            return False
        actual = attrs.get(name) or ""
        if op is None:
            continue
        if op == "=" and actual != val:
            return False
        if op == "^=" and not (val and actual.startswith(val)):
            return False
        if op == "$=" and not (val and actual.endswith(val)):
            return False
        if op == "*=" and not (val and val in actual):
            return False
        if op == "~=" and val not in actual.split():
            return False
    for name, arg in s["pseudos"]:
        sibs = _element_siblings(node)
        if name == "first-child" and (not sibs or sibs[0] is not node):
            return False
        if name == "last-child" and (not sibs or sibs[-1] is not node):
            return False
        if name in ("nth-of-type", "first-of-type", "last-of-type"):
            typed = [c for c in sibs if c.name == node.name]
            idx = next(i for i, c in enumerate(typed) if c is node)
            if name == "nth-of-type" and idx + 1 != arg:
                return False
            if name == "first-of-type" and idx != 0:
                return False
            if name == "last-of-type" and idx != len(typed) - 1:
                return False
    return True


def _matches_chain(node, chain, idx) -> bool:
    if not _matches_compound(node, chain[idx][1]):
        return False
    if idx == 0:
        return True
    comb = chain[idx][0]
    if comb == ">":
        p = node.parent
        return p is not None and _matches_chain(p, chain, idx - 1)
    if comb == " ":
        p = node.parent
        while p is not None:
            if _matches_chain(p, chain, idx - 1):
                return True
            p = p.parent
        return False
    # sibling combinators
    sibs = _element_siblings(node)
    i = next(k for k, c in enumerate(sibs) if c is node)
    if comb == "+":
        return i > 0 and _matches_chain(sibs[i - 1], chain, idx - 1)
    if comb == "~":
        return any(_matches_chain(sibs[k], chain, idx - 1) for k in range(i))
    raise SelectorError(f"unknown combinator {comb!r}")


def css_select(root, selector):
    """All elements under ``root`` matching ``selector`` (string or
    pre-parsed groups), in document order, deduplicated across groups."""
    groups = parse_selector(selector) if isinstance(selector, str) else selector
    out = []
    for node in _iter_nodes(root):
        for chain in groups:
            if _matches_chain(node, chain, len(chain) - 1):
                out.append(node)
                break
    return out
