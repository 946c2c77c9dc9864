"""Wiki-link extraction & normalization as pure column expressions.

Faithful re-expression of the reference mapper's per-record logic
(``/root/reference/src/mr/CountReference.java:246-266``) as JVM-side,
whole-stage-codegen-friendly expressions — no Python in the hot path.
Quirk parity notes (SURVEY.md §2 O3–O6):

* O3 regex ``\\[\\[(.*?)\\]\\]`` is non-greedy and ``.`` does NOT cross
  newlines (Java default; Spark's regexp functions are Java-regex, so the
  semantics match for free). Nested ``[[File:a|x [[b]]…]]`` swallows the
  inner link, links broken across lines don't match.
* O4 pipe split keeps text before the FIRST ``|``
  (``CountReference.java:251-253``); the leading ``[[`` survives until O6.
* O5 namespace filter is a SUBSTRING (not prefix!) test for
  ``File: Categoria: Category: Aiuto: s: Image: Immagine:``
  (``CountReference.java:254-256``) — ``s:`` is deliberately aggressive.
* O6 strips ALL ``[ ] ,`` characters then trims; empty → dropped
  (``CountReference.java:260-261``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: O3 — the exact link pattern (CountReference.java:208-209); group(0)
#: keeps the brackets, matching the reference's ``matcher.group(0)`` (:249).
LINK_PATTERN = r"\[\[(.*?)\]\]"

#: O5 — substring blacklist (CountReference.java:254-256), verbatim.
NAMESPACE_BLACKLIST = ("File:", "Categoria:", "Category:", "Aiuto:", "s:", "Image:", "Immagine:")


def extract_raw_links(text: Column) -> Column:
    """O3: every ``[[…]]`` occurrence (brackets kept), as an array column.

    ``explode`` the result for the flatMap semantics of
    ``CountReference.java:247-249``.
    """
    return F.regexp_extract_all(text, F.lit(LINK_PATTERN), 0)


def pipe_target(raw_link: Column) -> Column:
    """O4: ``[[target|label]]`` → ``[[target`` (text before first pipe).

    The reference's extra guard on a leading ``|`` is dead code because
    group(0) always starts with ``[[`` (CountReference.java:251-253).
    """
    return F.substring_index(raw_link, "|", 1)


def namespace_keep(raw_link: Column) -> Column:
    """O5: True iff the link survives the substring blacklist."""
    cond = F.lit(True)
    for ns in NAMESPACE_BLACKLIST:
        cond = cond & ~raw_link.contains(ns)
    return cond


def normalize_target(raw_link: Column) -> Column:
    """O6: strip every ``[``/``]``/``,`` then trim (CountReference.java:260-261).

    Comma-stripping is what keeps the final CSV single-delimiter safe.
    """
    return F.trim(F.regexp_replace(raw_link, r"[\[\],]", ""))
