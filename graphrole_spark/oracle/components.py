"""Connected components over tiny feature graphs (driver-side).

The reference prunes features by building a graph whose nodes are
feature names and whose edges connect near-duplicate features, then
collapsing each connected component (reference: graphrole/graph/graph.py:18-57).
That graph has tens of nodes, so this stays plain Python on the driver —
using a distributed CC algorithm here would be absurd overhead.

Implementation is union-find (different mechanics from the reference's
DFS, identical components). Component emission order matches the
reference: components appear in first-touch order of the edge list, and
each component is a set.
"""

from __future__ import annotations

from typing import Dict, Hashable, Iterable, List, Set, Tuple


def connected_components(
    edges: Iterable[Tuple[Hashable, Hashable]]
) -> List[Set[Hashable]]:
    parent: Dict[Hashable, Hashable] = {}
    order: List[Hashable] = []  # first-touch order, for deterministic output

    def find(x: Hashable) -> Hashable:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
                order.append(n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    groups: Dict[Hashable, Set[Hashable]] = {}
    emit: List[Hashable] = []
    for n in order:
        r = find(n)
        if r not in groups:
            groups[r] = set()
            emit.append(r)
        groups[r].add(n)
    return [groups[r] for r in emit]
