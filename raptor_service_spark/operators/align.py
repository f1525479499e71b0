"""Sequence alignment (Needleman-Wunsch global + Smith-Waterman local) as
WHOLE-STAGE CODEGEN — the third member of the unrolled-DP family next to
DTW/Fréchet (`operators/dtw.py`) and the Viterbi trellis.

For FIXED-length operands (callers pad to L with side-distinct sentinels so
pad positions can never match) the L×L affine-free DP unrolls anti-diagonal
by anti-diagonal into flat integer Projects — exact arithmetic, so Spark
and the DuckDB oracle agree bit for bit with no rounding protocol at all:

    m(i,j)  = MATCH if a_i == b_j else MISMATCH
    nw(i,j) = max(nw(i-1,j-1) + m, nw(i-1,j) + GAP, nw(i,j-1) + GAP)
              (first row/col = i*GAP / j*GAP)
    sw(i,j) = max(0, sw(i-1,j-1) + m, sw(i-1,j) + GAP, sw(i,j-1) + GAP)
    SW      = max over all cells (local alignment score)

Scale shape: the DP is a per-row projection — no join, no shuffle beyond
the caller's pair table; all-pairs alignment is inherently quadratic, so
callers bound or block the pair set first (the dtw_pairs posture).
"""

from __future__ import annotations

from typing import Callable

MATCH, MISMATCH, GAP = 2, -1, -1


def align_levels(
    L: int,
    a_char: Callable[[int], str],
    b_char: Callable[[int], str],
) -> list[list[tuple[str, str]]]:
    """Per anti-diagonal k = i + j: (column, expression) pairs for both
    recurrences (nw_i_j, sw_i_j), 0-indexed logical positions; character
    accessors are engine-specific 1-indexed substring fragments."""
    levels = []
    for k in range(2 * L - 1):
        cells = []
        for i in range(max(0, k - L + 1), min(k, L - 1) + 1):
            j = k - i
            m = f"(CASE WHEN {a_char(i)} = {b_char(j)} THEN {MATCH} ELSE {MISMATCH} END)"
            if i == 0 and j == 0:
                # max(m, 2·GAP) = m whenever MISMATCH > 2·GAP (our scores)
                nw = m
                sw = f"GREATEST(0, {m})"
            elif i == 0:
                nw = f"GREATEST(nw_0_{j - 1} + {GAP}, {j * GAP} + {m})"
                sw = f"GREATEST(0, sw_0_{j - 1} + {GAP}, {m})"
            elif j == 0:
                nw = f"GREATEST(nw_{i - 1}_0 + {GAP}, {i * GAP} + {m})"
                sw = f"GREATEST(0, sw_{i - 1}_0 + {GAP}, {m})"
            else:
                nw = (
                    f"GREATEST(nw_{i - 1}_{j - 1} + {m}, "
                    f"nw_{i - 1}_{j} + {GAP}, nw_{i}_{j - 1} + {GAP})"
                )
                sw = (
                    f"GREATEST(0, sw_{i - 1}_{j - 1} + {m}, "
                    f"sw_{i - 1}_{j} + {GAP}, sw_{i}_{j - 1} + {GAP})"
                )
            cells.append((f"nw_{i}_{j}", nw))
            cells.append((f"sw_{i}_{j}", sw))
        levels.append(cells)
    return levels


def sw_max_expr(L: int) -> str:
    """GREATEST over every sw cell — the local-alignment score."""
    return "GREATEST(" + ", ".join(
        f"sw_{i}_{j}" for i in range(L) for j in range(L)
    ) + ")"
