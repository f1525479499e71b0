"""Streaming space-saving top-k heavy hitters per key — Metwally et al.
(2005), the bounded-state frequent-elements summary (the structure behind
Spark/Algebird's own heavy-hitter utilities; the keyed-state sibling of the
relational count-min in q_cms_heavy_hitters).

State per key is m (term, count, err) counters — bounded forever. Update:
a seen term increments its counter; an unseen term REPLACES the current
minimum counter, inheriting its count as the error bound (count ← min+1,
err ← min). Guarantees: est ≥ true ≥ est − err for every tracked term, and
any term with true frequency > n/m is guaranteed tracked.

Determinism: the classic structure is arrival-order dependent once
counters evict, and a shuffled stream has no pinned arrival order — so the
kernel SORTS each micro-batch by the explicit (ord) column before folding
(ord must be unique per key — e.g. an event id — for full determinism),
and evictions break count ties toward the lexicographically smallest
tracked term. Given the same (ord, term) rows in ANY partition order the
final state is identical (pytest-pinned against a pure-Python reference,
plus exact == groupBy-count equality when m ≥ distinct terms, where
space-saving degenerates to exact counting regardless of order).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "grp long, term string, cnt long, err long, batch_seq long"
_STATE_SCHEMA = "terms array<string>, cnts array<long>, errs array<long>, seq long"


def spacesaving_fold(
    counters: dict[str, tuple[int, int]], terms, m: int
) -> dict[str, tuple[int, int]]:
    """Fold ``terms`` (in order) into {term: (count, err)} with capacity m.
    Eviction picks the (count, term) lexicographic minimum — the shared
    deterministic tie rule."""
    for t in terms:
        if t in counters:
            c, e = counters[t]
            counters[t] = (c + 1, e)
        elif len(counters) < m:
            counters[t] = (1, 0)
        else:
            victim = min(counters, key=lambda k: (counters[k][0], k))
            vc, _ = counters.pop(victim)
            counters[t] = (vc + 1, vc)
    return counters


def topk_stream(rows: DataFrame, m: int = 8) -> DataFrame:
    """Input: streaming (grp long, ord long, term string). Output: the full
    counter table per updated key per micro-batch (≤ m rows), tagged with a
    batch sequence number."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values("ord", kind="stable")
        if state.exists:
            terms, cnts, errs, seq = state.get
            counters = {t: (int(c), int(e)) for t, c, e in zip(terms, cnts, errs)}
        else:
            counters, seq = {}, 0
        counters = spacesaving_fold(counters, pdf["term"].tolist(), m)
        seq += 1
        items = sorted(counters.items())
        state.update(
            (
                [t for t, _ in items],
                [c for _, (c, _) in items],
                [e for _, (_, e) in items],
                seq,
            )
        )
        out = sorted(counters.items(), key=lambda kv: (-kv[1][0], kv[0]))
        yield pd.DataFrame(
            {
                "grp": np.full(len(out), key[0], dtype=np.int64),
                "term": [t for t, _ in out],
                "cnt": np.array([c for _, (c, _) in out], dtype=np.int64),
                "err": np.array([e for _, (_, e) in out], dtype=np.int64),
                "batch_seq": np.full(len(out), seq, dtype=np.int64),
            }
        )

    return rows.groupBy("grp").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
