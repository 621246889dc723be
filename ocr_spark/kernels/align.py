"""Gale-Church sentence alignment (Gale & Church 1993, "A Program for
Aligning Sentences in Bilingual Corpora") — the classic length-based DP
that turns bitext document pairs (operators/urls.bitext_candidates) into
sentence-level training pairs.

Faithful to the published algorithm:

- per-bead cost = -100 * log(prior(bead)) + length-match cost, where the
  match cost is the two-sided normal tail of
  delta = (l2 - l1*c) / sqrt((l1 + l2) * s2)
  with the paper's parameters c = 1 (expected char-length ratio) and
  s2 = 6.8 (delta variance); the bead priors are the paper's measured
  frequencies (1-1: .89, 1-0/0-1: .0099, 2-1/1-2: .089/2 each, 2-2: .011)
  quantized to the canonical integer penalties 0 / 450 / 230 / 440.
- DP over sentence indices, beads limited to the paper's six types;
  deterministic tie-break prefers the bead listed FIRST in BEADS (1-1
  before insertions/deletions before merges) so equal-cost alignments
  reproduce bit-identically everywhere.

Pure stdlib floats (math.erfc) on per-pair data: the DP runs inside one
Arrow batch per document pair and never crosses a shuffle, so executor
count / partitioning cannot change a single bead.
"""

from __future__ import annotations

import math

#: bead type -> integer prior penalty (the paper's -100*log2 odds, the
#: constants every Gale-Church implementation ships)
BEADS: tuple[tuple[int, int, int], ...] = (
    (1, 1, 0),
    (1, 0, 450),
    (0, 1, 450),
    (2, 1, 230),
    (1, 2, 230),
    (2, 2, 440),
)

_C = 1.0  # expected length ratio
_S2 = 6.8  # variance of delta


def _match_cost(l1: int, l2: int) -> float:
    """-100 * log(P(delta)) two-sided normal tail; 0-length pair -> 0."""
    if l1 == 0 and l2 == 0:
        return 0.0
    z = (l2 - l1 * _C) / math.sqrt((l1 + l2) * _S2)
    # two-sided tail probability, floored away from 0 for log safety
    p = max(math.erfc(abs(z) / math.sqrt(2.0)), 1e-300)
    return -100.0 * math.log(p)


def gale_church_align(
    src_lens: list[int], tgt_lens: list[int]
) -> list[tuple[int, int, int, int, int]]:
    """Align by sentence LENGTHS -> beads
    (a_start, a_end, b_start, b_end, cost_centi), end-exclusive, in
    document order. cost_centi is the bead's own cost (prior + match)
    floor-quantized to integer centi-units."""
    n, m = len(src_lens), len(tgt_lens)
    INF = float("inf")
    # prefix sums for O(1) group lengths
    ps = [0]
    for v in src_lens:
        ps.append(ps[-1] + v)
    pt = [0]
    for v in tgt_lens:
        pt.append(pt[-1] + v)

    cost = [[INF] * (m + 1) for _ in range(n + 1)]
    back: list[list[tuple[int, int] | None]] = [[None] * (m + 1) for _ in range(n + 1)]
    cost[0][0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            base = cost[i][j]
            if base == INF:
                continue
            for da, db, pen in BEADS:
                ii, jj = i + da, j + db
                if ii > n or jj > m:
                    continue
                l1 = ps[ii] - ps[i]
                l2 = pt[jj] - pt[j]
                c = base + pen + _match_cost(l1, l2)
                # strict < : the FIRST bead type reaching a cell wins ties
                if c < cost[ii][jj]:
                    cost[ii][jj] = c
                    back[ii][jj] = (da, db)

    if cost[n][m] == INF:  # both sides empty is the only reachable case
        return []
    beads = []
    i, j = n, m
    while i > 0 or j > 0:
        da, db = back[i][j]  # type: ignore[misc]
        l1 = ps[i] - ps[i - da]
        l2 = pt[j] - pt[j - db]
        pen = next(p for a, b, p in BEADS if (a, b) == (da, db))
        c = pen + _match_cost(l1, l2)
        beads.append((i - da, i, j - db, j, math.floor(c * 100)))
        i, j = i - da, j - db
    beads.reverse()
    return beads
