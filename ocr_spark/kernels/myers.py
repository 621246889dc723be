"""Myers O(ND) line diff (Myers 1986, "An O(ND) Difference Algorithm and
Its Variations") — the algorithm behind `diff`/git.

Why here: a crawl corpus holds many snapshots per url (monthly Common-
Crawl waves); change ANALYSIS needs the minimal edit script between
consecutive captures, not just a drift score (operators/crawl_history
.snapshot_drift gives the magnitude; this gives the edits). The reference
has no diff — this extends the crawl-history family the same way
url_changes/refresh_schedule do.

Determinism contract: the greedy forward search takes the canonical
"prefer delete on ties" walk (when x can be extended by a deletion or an
insertion equally, the deletion wins — k ordering below), and the
backtrace replays it exactly, so the edit script is a pure function of
(a, b): same minimal length as any LCS solution, one canonical choice
among equals.
"""

from __future__ import annotations

__all__ = ["myers_diff", "apply_diff"]


def myers_diff(a: list[str], b: list[str]):
    """Minimal edit script a -> b as ops ``('-', a_idx, None, line)`` /
    ``('+', None, b_idx, line)``; equal lines are not emitted."""
    n, m = len(a), len(b)
    if n == 0:
        return [("+", None, j, b[j]) for j in range(m)]
    if m == 0:
        return [("-", i, None, a[i]) for i in range(n)]
    max_d = n + m
    # v[k] = furthest x on diagonal k (x - y == k - offset)
    offset = max_d
    v = [0] * (2 * max_d + 1)
    trace = []
    found = None
    for d in range(max_d + 1):
        trace.append(v[:])
        for k in range(-d, d + 1, 2):
            if k == -d or (k != d and v[offset + k - 1] < v[offset + k + 1]):
                x = v[offset + k + 1]  # insertion (move down in edit graph)
            else:
                x = v[offset + k - 1] + 1  # deletion (move right)
            y = x - k
            while x < n and y < m and a[x] == b[y]:
                x += 1
                y += 1
            v[offset + k] = x
            if x >= n and y >= m:
                found = d
                break
        if found is not None:
            break
    # backtrace
    ops = []
    x, y = n, m
    for d in range(found, 0, -1):
        prev = trace[d]
        k = x - y
        if k == -d or (k != d and prev[offset + k - 1] < prev[offset + k + 1]):
            pk = k + 1  # came from an insertion
        else:
            pk = k - 1  # came from a deletion
        px = prev[offset + pk]
        py = px - pk
        # snake back to the edit point
        while x > px and y > py and (x - y) == k:
            x -= 1
            y -= 1
        if pk == k + 1:
            y -= 1
            ops.append(("+", None, y, b[y]))
        else:
            x -= 1
            ops.append(("-", x, None, a[x]))
        x, y = px, py
    ops.reverse()
    return ops


def apply_diff(a: list[str], ops) -> list[str]:
    """Replay an edit script (patch): the inverse check used by tests."""
    out = []
    ai = 0
    dels = {i for op, i, _, _ in ops if op == "-"}
    ins = sorted(((j, line) for op, _, j, line in ops if op == "+"))
    # rebuild b: kept a-lines in order, with insertions at their b indices
    kept = [a[i] for i in range(len(a)) if i not in dels]
    ki = 0
    ii = 0
    total = len(kept) + len(ins)
    for pos in range(total):
        if ii < len(ins) and ins[ii][0] == pos:
            out.append(ins[ii][1])
            ii += 1
        else:
            out.append(kept[ki])
            ki += 1
    assert ii == len(ins) and ki == len(kept), "inconsistent edit script"
    return out
