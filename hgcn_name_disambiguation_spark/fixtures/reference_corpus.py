"""Loader for the reference's REAL labeled corpora.

The reference ships two labeled evaluation corpora (SURVEY §5):
- ``raw-data/``       110 AMiner-benchmark name blocks (~7.5k pubs),
  per-publication integer ground-truth ``<label>``,
- ``raw-data-temp/``  4 OpenAlex-built blocks (labels = OpenAlex
  author-ID index, ``openAlex_to_HGCN.py:262-264``) — the exact eval
  set behind the reference's published AM_nok.csv numbers.

This loader maps those files onto the engine's input table shape
(repo, path, commit, lang='xml', content) with ``content`` = the
VERBATIM ``<publication>...</publication>`` element bytes from the
reference file — so ``sha2(content, 256)`` in the parsed frame is
checkable against the original reference bytes (north-rule per-row
invariant), and the block name rides in ``path`` (the reference's
one-file-per-name layout, ``name_disambiguation.py:776-791``).

Driver-side file reading is fine here and only here: the corpus is
110 small XML files (3.5 MB total) — a fixture, not a data path. The
production path is the Iceberg repo table.
"""

from __future__ import annotations

import hashlib
import os
import re
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from .generator import REPO_FILES_SCHEMA

REFERENCE_ROOT = "/root/reference"
_PUB_RE = re.compile(r"<publication>.*?</publication>", re.S)


def iter_reference_rows(
    root: str = REFERENCE_ROOT,
    subdirs: tuple[str, ...] = ("raw-data", "raw-data-temp"),
    names: Iterable[str] | None = None,
) -> list[tuple[str, str, str, str, str]]:
    """Yield (repo, path, commit, lang, content) rows; content is the
    verbatim <publication> element. Deterministic order."""
    wanted = set(names) if names is not None else None
    rows: list[tuple[str, str, str, str, str]] = []
    for sub in subdirs:
        d = os.path.join(root, sub)
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".xml"):
                continue
            block = fname[:-4]
            if wanted is not None and block not in wanted:
                continue
            with open(os.path.join(d, fname), encoding="utf-8") as f:
                text = f.read()
            for i, pub in enumerate(_PUB_RE.findall(text)):
                commit = hashlib.sha1(
                    f"{sub}/{fname}#{i}".encode()
                ).hexdigest()
                rows.append((sub, f"{sub}/{fname}", commit, "xml", pub))
    return rows


def load_reference_repo_files(
    spark: SparkSession,
    root: str = REFERENCE_ROOT,
    subdirs: tuple[str, ...] = ("raw-data", "raw-data-temp"),
    names: Iterable[str] | None = None,
) -> DataFrame:
    """Reference labeled corpus as a repo_files DataFrame (lang='xml')."""
    return spark.createDataFrame(
        iter_reference_rows(root, subdirs, names), REPO_FILES_SCHEMA
    )


def reference_available(root: str = REFERENCE_ROOT) -> bool:
    return os.path.isdir(os.path.join(root, "raw-data"))
