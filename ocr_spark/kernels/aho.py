"""Aho-Corasick multi-pattern matching (Aho & Corasick 1975, CACM) — the
blocklist primitive: one pass over the text finds ALL occurrences of
every pattern (including overlapping ones), so a thousand-entry
blocklist costs the same scan as a one-entry one.  This is the kernel
behind corpus keyword gates (UT1-style blocklists in Dolma/RefinedWeb
pipelines) where per-pattern rescans would be O(patterns × text).

Construction is the textbook goto/fail/output automaton over byte-sized
alphabets (dict transitions — patterns are lowercase ASCII here).
Matching emits (end_position, pattern_index) pairs in scan order;
positions are 0-based end-inclusive, converted to 1-based START
positions by the operator so the SQL oracle's substring scan lands on
identical numbers.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    def __init__(self, patterns: list[str]):
        if any(not p for p in patterns):
            raise ValueError("empty pattern")
        self.patterns = list(patterns)
        # node 0 is the root; goto is a list of dicts char -> node
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[int]] = [[]]
        for idx, p in enumerate(patterns):
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(idx)
        # BFS failure links; output links merge (suffix patterns fire too)
        q = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                if self.fail[child] == child:
                    self.fail[child] = 0
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def find_all(self, text: str) -> list[tuple[int, int]]:
        """All matches as (start_pos_0based, pattern_index), in order of
        match END then pattern index — every occurrence, overlaps
        included."""
        node = 0
        hits: list[tuple[int, int]] = []
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for idx in self.out[node]:
                hits.append((i - len(self.patterns[idx]) + 1, idx))
        return hits
