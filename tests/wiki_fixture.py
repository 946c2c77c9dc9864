"""Synthetic MediaWiki-export fixture + an INDEPENDENT simulation of the
reference's semantics (/root/reference/src/mr/CountReference.java:246-305)
used as the golden for the Spark pipeline.

The simulator deliberately re-implements the mapper/reducer rules from
scratch (Python re module ≈ Java regex for this pattern: non-greedy
``.*?`` and ``.`` not crossing newlines), so pipeline and golden can only
agree if both encode the quirk surface correctly:

* ``[[target|label]]`` → text before the first pipe
* namespace SUBSTRING blacklist (File: Categoria: Category: Aiuto: s:
  Image: Immagine:) applied after the pipe split
* strip every ``[ ] ,`` then trim; drop empties
* nested ``[[File:a|x [[b]]…]]``: outer non-greedy match swallows the
  inner link
* links broken across newlines never match
* repeated links from one page count once; count = DISTINCT sources
"""

from __future__ import annotations

import re
from xml.sax.saxutils import escape

# (title, wikitext) — crafted to hit every quirk in FIXTURES.md §F1
PAGES: list[tuple[str, str]] = [
    (
        "Alpha",
        "Link to [[Beta]] and again [[Beta]] and [[Beta|labelled]].\n"
        "A piped [[Gamma|the gamma page]] plus anchor [[Delta#Section|x]].",
    ),
    (
        "Beta",
        "Nested media [[File:pic.jpg|thumb [[Gamma]] caption]] swallows gamma.\n"
        "Broken [[Al\npha]] does not match. Plain [[Alpha]] does.\n"
        "Category link [[Categoria:Storia]] dropped; [[Category:History]] too.",
    ),
    (
        "Gamma",
        "Interwiki [[s:Source text]] dropped (substring!), and so is\n"
        "[[Links: and such]] because of the aggressive s: rule.\n"
        "Comma target [[Rome, Italy]] becomes Rome Italy. [[Aiuto:Help]] dropped.",
    ),
    (
        "Delta",
        "Self link [[Delta]] counts. Image [[Image:x.png]] and\n"
        "[[Immagine:y.png]] dropped. Empty [[,]] dropped after strip.\n"
        "Entity target [[A&B]] round-trips through XML entity escaping.\n"
        "Repeat [[Beta]] [[Beta|b1]] [[ Beta ]] collapses to one Beta ref.",
    ),
    (
        "Epsilon zeta",
        "Multi word [[Alpha]] [[Gamma|g]] [[Delta#x]] [[Eta Theta]]\n"
        "[[File:nested [[Alpha]] swallowed]] and stray brackets [[a[b]]].",
    ),
]

_LINK = re.compile(r"\[\[(.*?)\]\]")  # '.' does not cross newlines (no DOTALL)
_BLACKLIST = ("File:", "Categoria:", "Category:", "Aiuto:", "s:", "Image:", "Immagine:")


def simulate() -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Exact reference semantics → (distinct pairs, counts per target)."""
    pairs: set[tuple[str, str]] = set()
    for title, text in PAGES:
        # PAGES stores decoded wikitext; to_xml() entity-escapes it and the
        # XML parser (StAX in the reference) decodes it back, so both sides
        # see these exact strings
        for m in _LINK.finditer(text):
            raw = m.group(0)  # brackets kept, like matcher.group(0)
            link = raw.split("|", 1)[0] if "|" in raw else raw
            if any(ns in link for ns in _BLACKLIST):
                continue
            target = re.sub(r"[\[\],]", "", link).strip()
            if not target:
                continue
            pairs.add((target, title.strip()))
    counts: dict[str, int] = {}
    for target, _src in pairs:
        counts[target] = counts.get(target, 0) + 1
    return sorted(pairs), counts


def to_xml() -> str:
    """Serialize PAGES as a MediaWiki-export-0.10-shaped document."""
    blocks = []
    for i, (title, text) in enumerate(PAGES):
        blocks.append(
            "  <page>\n"
            f"    <title>{escape(title)}</title>\n"
            "    <ns>0</ns>\n"
            f"    <id>{i + 1}</id>\n"
            "    <revision>\n"
            f"      <id>{1000 + i}</id>\n"
            f"      <text bytes=\"{len(text)}\">{escape(text)}</text>\n"
            "    </revision>\n"
            "  </page>"
        )
    body = "\n".join(blocks)
    return (
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/" '
        'version="0.10" xml:lang="it">\n' + body + "\n</mediawiki>\n"
    )
