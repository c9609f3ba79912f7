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


# ---------------------------------------------------------------------------
# The reference's ARCHIVED AMiner predictions
# (experimental-results/{name}_output.txt = its predicted clustering,
# one line per cluster "cid: member-idx ..."; {name}_ans.txt = the
# paper-idx -> truth-label map). Parsing these lets the engine report
# its F1 side by side with what the reference itself achieved on the
# same blocks — the only reference-measured AMiner numbers that exist.
# ---------------------------------------------------------------------------

_IDX_RE = re.compile(r"\d+")


def reference_archived_results(
    root: str = REFERENCE_ROOT,
) -> dict[str, tuple[float, float, float]]:
    """Per-block (precision, recall, f1) the REFERENCE achieved on its
    own archived AMiner runs. Pairwise metrics computed closed-form
    from cluster sizes (G10 semantics). Blocks missing either artifact
    are skipped."""
    d = os.path.join(root, "experimental-results")
    out: dict[str, tuple[float, float, float]] = {}
    if not os.path.isdir(d):
        return out
    for fname in sorted(os.listdir(d)):
        if not fname.endswith("_output.txt"):
            continue
        name = fname[: -len("_output.txt")]
        ans_path = os.path.join(d, f"{name}_ans.txt")
        if not os.path.exists(ans_path):
            continue
        pred: dict[int, int] = {}
        with open(os.path.join(d, fname), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or ":" not in line:
                    continue
                cid, rest = line.split(":", 1)
                for tok in _IDX_RE.findall(rest):
                    pred[int(tok)] = int(cid)
        truth: dict[int, int] = {}
        with open(ans_path, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    truth[int(parts[0])] = int(parts[1])
        idxs = sorted(set(truth) & set(pred))
        if len(idxs) < 2 or len(idxs) < 0.9 * len(truth):
            continue
        from collections import Counter

        def _pairs(counts: Counter) -> float:
            return sum(n * (n - 1) / 2.0 for n in counts.values())

        tp = _pairs(Counter((truth[i], pred[i]) for i in idxs))
        tp_fp = _pairs(Counter(pred[i] for i in idxs))
        tp_fn = _pairs(Counter(truth[i] for i in idxs))
        p = tp / tp_fp if tp_fp else 1.0
        r = tp / tp_fn if tp_fn else 1.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        out[name] = (p, r, f1)
    return out
