"""Ring-orientation kernel.

Observable behavior matches the reference implementation
(``/root/reference/picogeojson/orientation.py:1-16``): the orientation test
finds the lowest-then-leftmost vertex of the *open* ring using a scan that is
seeded from the open ring's final vertex and that visits every vertex except
that seed, updating only on a strict ``(y, x)`` lexicographic improvement;
the ring is counter-clockwise iff the previous neighbour of that pivot lies
strictly left of the directed edge ``pivot -> next``.

The seed/negative-index conventions are load-bearing: when the seed itself is
the minimum the pivot index stays ``-1`` and Python negative indexing selects
``open[-2], open[-1], open[0]`` as the (prev, pivot, next) triple, exactly as
the reference does.
"""

from __future__ import annotations


def point_left_of_edge(p, a, b) -> bool:
    """Strict left-of test for point ``p`` against directed edge ``a -> b``.

    Same cross-product sign convention as the reference ``_isleft``
    (``/root/reference/picogeojson/orientation.py:1-2``).
    """
    return ((b[0] - a[0]) * (p[1] - a[1]) - (p[0] - a[0]) * (b[1] - a[1])) > 0


def ring_is_ccw(ring) -> bool:
    """True iff the closed ring winds counter-clockwise.

    ``ring`` is a sequence of positions whose first and last entries are
    expected to coincide (a closed ring); the closing vertex is dropped
    before the pivot scan.
    """
    open_ring = ring[:-1]
    pivot = -1
    best_x = open_ring[-1][0]
    best_y = open_ring[-1][1]
    for i, pt in enumerate(open_ring[:-1]):
        if pt[1] < best_y or (pt[1] == best_y and pt[0] < best_x):
            pivot = i
            best_y = pt[1]
            best_x = pt[0]
    return point_left_of_edge(
        open_ring[pivot - 1], open_ring[pivot], open_ring[pivot + 1]
    )


def orient_rings(rings):
    """RFC-7946 winding enforcement for a polygon's ring list, in place.

    Ring 0 (exterior) is forced counter-clockwise and every hole is forced
    clockwise, by reversal, mirroring the reference polygon converter
    (``/root/reference/picogeojson/types.py:30-36``).
    """
    for i, ring in enumerate(rings):
        if bool(i) is ring_is_ccw(ring):
            rings[i] = ring[::-1]
    return rings
