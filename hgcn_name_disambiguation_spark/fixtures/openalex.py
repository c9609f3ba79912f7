"""Deterministic synthetic OpenAlex snapshot fixture (NDJSON).

The reference's ingestion CLI (``openAlex_to_HGCN.py``) fetches author
search pages and per-author works from the live OpenAlex REST API. No
network exists in tests, and OpenAlex itself distributes the same
records as NDJSON snapshot dumps — so the connector under test
(`operators/openalex.py`) reads NDJSON files, and this module writes a
small deterministic snapshot with every branch the reference's code
exercises:

- matching + non-matching author display names (first/last rule,
  ``openAlex_to_HGCN.py:47-91``): middle initials (match), reversed
  order / wrong first / wrong last / single-token (no match),
- more matching authors than ``max_results`` (the O3 cap),
- more works for some authors than ``max_works`` (the O3 cap),
- works shared by two matched authors (the ``unique_works``
  first-author-wins dedup, ``openAlex_to_HGCN.py:232-246``),
- null titles (→ "Untitled publication", ``:170-174``), missing
  ``primary_location.source`` (→ "Unknown" venue, ``:156-158``),
  missing ``publication_year`` (→ 0, ``:165``).

Content is a pure function of the constants below — no clock, no RNG —
so Spark and the DuckDB oracle can both regenerate/read it at any time
and get identical bytes.
"""

from __future__ import annotations

import json
import os

FIXTURE_DIR = "/tmp/spark_graft_openalex_v2"
QUERY_NAME = "wei wang"

# (suffix, display_name, works_count). Ordering of the *snapshot file*
# is scrambled on purpose; the connector must impose its own
# deterministic order (works_count DESC, id ASC).
_AUTHORS = [
    ("A11", "Wei Wang", 14),
    ("A12", "Wei X. Wang", 9),
    ("A13", "Wei Wang", 9),
    ("A14", "Wei Hua Wang", 7),
    ("A15", "Wei Wang", 5),
    ("A16", "Wei Q Wang", 4),
    ("A17", "Wei Wang", 3),          # beyond max_results=6 cut
    ("A18", "Wei Wang", 2),          # beyond max_results=6 cut
    ("B21", "Wei Wu", 20),           # last-name mismatch
    ("B22", "Li Wang", 18),          # first-name mismatch
    ("B23", "Wang Wei", 16),         # reversed -> mismatch
    ("B24", "Wei", 12),              # single-token candidate -> no last
]

_VENUES = [
    "Conference on Data Engineering",
    "Journal of Machine Learning",
    "Symposium on Networks & Systems",
    None,  # missing primary_location.source -> "Unknown"
]

_COAUTHORS = ["Jun Li", "Mei Chen", "Rahul Gupta", "Sara Kim", "Tao Zhao"]


def _work(widx: int, author_ids: list[str], year_mod: int) -> dict:
    """One deterministic works record; widx drives every varying field."""
    venue = _VENUES[widx % len(_VENUES)]
    rec = {
        "id": f"https://openalex.org/W{1000 + widx}",
        # every 7th title is null -> "Untitled publication" default
        "title": (
            None
            if widx % 7 == 3
            else f"Study {widx} of scalable {'graph' if widx % 2 else 'stream'} methods & applications"
        ),
        "authorships": [
            {
                "author": {
                    "id": f"https://openalex.org/{aid}",
                    "display_name": next(
                        n for (s, n, _c) in _AUTHORS if s == aid
                    )
                    if any(s == aid for (s, _n, _c) in _AUTHORS)
                    else aid,
                }
            }
            for aid in author_ids
        ]
        + [
            {
                "author": {
                    "id": f"https://openalex.org/C{widx % len(_COAUTHORS)}",
                    "display_name": _COAUTHORS[widx % len(_COAUTHORS)],
                }
            }
        ],
    }
    # every 11th work has no publication_year -> 0 default; widx 47
    # additionally, so a year-0 work belongs to an UNDER-cap author
    # (A16) and survives the year-desc works cap into the output
    if widx % 11 != 5 and widx != 47:
        rec["publication_year"] = 1995 + (widx * 3 + year_mod) % 30
    if venue is not None:
        rec["primary_location"] = {"source": {"display_name": venue}}
    return rec


def _build() -> tuple[list[dict], list[dict]]:
    authors = [
        {
            "id": f"https://openalex.org/{suffix}",
            "display_name": name,
            "works_count": wc,
        }
        for (suffix, name, wc) in _AUTHORS
    ]
    works: list[dict] = []
    widx = 0
    for (suffix, _name, wc) in _AUTHORS:
        for _k in range(wc):
            ids = [suffix]
            # every 5th work is co-authored with the NEXT matching
            # author -> exercises unique_works dedup + label
            # first-wins; A11's co-author is A12, etc.
            if widx % 5 == 0 and suffix.startswith("A"):
                nxt = f"A{11 + (int(suffix[1:]) - 10) % 8}"
                ids.append(nxt)
            works.append(_work(widx, ids, year_mod=len(suffix)))
            widx += 1
    # scramble file order deterministically so nothing downstream can
    # lean on snapshot order
    works.sort(key=lambda w: (hash_str(w["id"]), w["id"]))
    authors.sort(key=lambda a: (hash_str(a["id"]), a["id"]))
    return authors, works


def hash_str(s: str) -> int:
    """Stable 32-bit FNV-1a (Python's hash() is salted per process)."""
    h = 2166136261
    for ch in s.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


def ensure_openalex_fixture(dir_path: str = FIXTURE_DIR) -> str:
    """Write authors.jsonl + works.jsonl if absent; return the dir."""
    authors_p = os.path.join(dir_path, "authors.jsonl")
    works_p = os.path.join(dir_path, "works.jsonl")
    if os.path.exists(authors_p) and os.path.exists(works_p):
        return dir_path
    os.makedirs(dir_path, exist_ok=True)
    authors, works = _build()
    with open(authors_p + ".tmp", "w", encoding="utf-8") as f:
        for a in authors:
            f.write(json.dumps(a, sort_keys=True) + "\n")
    with open(works_p + ".tmp", "w", encoding="utf-8") as f:
        for w in works:
            f.write(json.dumps(w, sort_keys=True) + "\n")
    os.replace(authors_p + ".tmp", authors_p)
    os.replace(works_p + ".tmp", works_p)
    return dir_path
