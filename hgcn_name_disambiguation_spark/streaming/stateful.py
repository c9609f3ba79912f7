"""Custom stateful streaming operator (applyInPandasWithState).

The reference is batch-only; this is the engine's forward-looking
stream-side guard for the problem its batch adaptive layer solves
after the fact: MEGA-BLOCKS. A name block's candidate-pair work grows
as C(n, 2), so a block that quietly accumulates pubs across
micro-batches is a latent skew bomb for the next full re-resolution
(the reference hits exactly this on `john smith`, n=1474 -> 1.1M
pairs). `block_pressure_monitor` keeps one tiny state row per block —
running pub count plus a per-author-signature cardinality sketch — and
emits, on every batch that touches the block, the updated pair budget
and a flag once the block crosses the ambiguity-gate threshold
(config.amb_gate_min_n), i.e. the point where the batch layer would
start gating weak evidence.

Why applyInPandasWithState and not a windowed agg: the quantity is a
RUNNING total over the whole stream (no window expiry), the state must
survive across micro-batches, and the update is a custom merge
(count + bounded signature-set union) — the canonical shape for
arbitrary stateful processing. State is O(1) per block (the signature
set is capped; beyond the cap only the count grows), so state-store
size is bounded by the number of blocks, never by pubs.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import DEFAULT_CONFIG, PipelineConfig

_OUTPUT_SCHEMA = StructType(
    [
        StructField("block_key", StringType()),
        StructField("n_pubs", LongType()),
        StructField("pair_budget", LongType()),
        StructField("n_signatures", LongType()),
        StructField("gate_pressure", BooleanType()),
    ]
)

# state: running count + capped distinct focal-signature list (the
# cheap stream-side stand-in for the batch layer's ambiguity evidence)
_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sigs", StringType()),  # '\x1f'-joined, capped
    ]
)

_SIG_CAP = 64
_SIG_SEP = "\x1f"


def _update_block(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    min_n: int,
) -> Iterator[pd.DataFrame]:
    n_new = 0
    sigs_new: set[str] = set()
    for pdf in pdfs:
        n_new += len(pdf)
        if "author_sig" in pdf.columns:
            sigs_new.update(
                s for s in pdf["author_sig"].dropna().astype(str) if s
            )
    if state.exists:
        n_old, sig_blob = state.get
        sigs = set(sig_blob.split(_SIG_SEP)) if sig_blob else set()
    else:
        n_old, sigs = 0, set()
    n = n_old + n_new
    if len(sigs) < _SIG_CAP:
        sigs |= set(list(sigs_new)[: _SIG_CAP - len(sigs)])
    state.update((n, _SIG_SEP.join(sorted(sigs))))
    yield pd.DataFrame(
        {
            "block_key": [key[0]],
            "n_pubs": [n],
            "pair_budget": [n * (n - 1) // 2],
            "n_signatures": [len(sigs)],
            "gate_pressure": [n >= min_n],
        }
    )


def block_pressure_monitor(
    pubs_stream: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Streaming per-block pair-budget tracker.

    Input: a STREAMING DataFrame with at least ``block_key`` and
    optionally ``author_sig`` (any per-pub signature string; absent ->
    signature cardinality stays 0). Output (update mode): one row per
    touched block per micro-batch with the running totals.
    """
    min_n = config.amb_gate_min_n

    def fn(key, pdfs, state):
        return _update_block(key, pdfs, state, min_n)

    return pubs_stream.groupBy("block_key").applyInPandasWithState(
        fn,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
