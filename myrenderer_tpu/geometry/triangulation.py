"""Seidel-style polygon triangulation (host side).

Re-implements the capability of the reference's
``Polygon/Triangulation.zig`` (589 LoC Zig): Seidel's randomized
trapezoidal-decomposition triangulator [Seidel 1991, "A simple and fast
incremental randomized algorithm for computing trapezoidal decompositions
and for triangulating polygons"] in three phases
(``Triangulation.zig:457-472``):

1. **Trapezoidation** — incremental insertion of points and segments into
   a query structure whose nodes are points / segments / trapezoids; found
   trapezoids are *transmuted in place* into point/segment nodes so parent
   links stay valid (``Triangulation.zig:169-196, 339-360``).
2. **Monotone mountains** — every trapezoid interior to the polygon is
   attributed to the mountain keyed by one (or both) of its bounding
   segments (``Triangulation.zig:500-540``).
3. **Ear clipping** of each mountain, emitting triangles whose vertices
   are ordered clockwise by original polygon index
   (``Triangulation.zig:398-425, 553-587``).

Contract (``Triangulation.zig:442-445``): vertices are listed clockwise
(in y-down screen coordinates), segments are implicit between consecutive
points with a closing edge from the last back to the first, and the
polygon must not self-intersect. A simple polygon with ``n`` vertices
yields exactly ``n - 2`` triangles.

This runs once at scene-build time on the host — it is pointer-chasing,
data-dependent control flow, the wrong shape for a TPU (SURVEY.md §7.6).
The output is a packed vertex array consumed by the device pipeline.
Insertion order is deterministic (seeded; see ``unirand.py``), unlike the
reference's crypto-seeded order.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

from .unirand import unirand_seed

Point = Tuple[float, float]

_POINT = 0
_SEGMENT = 1
_TRAPEZOID = 2


class _Node:
    """One query-structure node. Field meaning depends on ``type``
    (mirrors the table at ``Triangulation.zig:22-28``)::

               |    point    |   segment      |  trapezoid
        -------+-------------+----------------+---------------
        crumb  | breadcrumb  | interior child | (unused)
        child1 | upper child | left child     | left segment
        child2 | lower child | right child    | right segment
        point1 | point id    | upper point    | upper point
        point2 | (unused)    | lower point    | lower point
    """

    __slots__ = ("type", "crumb", "child1", "child2", "point1", "point2")

    def __init__(self, typ: int):
        self.type = typ
        self.crumb: Optional[int] = None
        self.child1: Optional[int] = None
        self.child2: Optional[int] = None
        self.point1: Optional[int] = None
        self.point2: Optional[int] = None


class TriangulationError(ValueError):
    pass


class Triangulation:
    """Reusable triangulator (holds scratch across ``create_polygon``
    calls). When the native (C++) core is built (``make -C native``) and
    ``use_native`` is not False, dispatch goes there — identical output,
    same algorithm, compiled (see ``native/triangulation.cpp``)."""

    def __init__(self, seed: int = 0, use_native: Optional[bool] = None,
                 debug: bool = False):
        self.seed = seed
        self.use_native = use_native
        # parity with the reference's only tracing facility: per-insertion
        # debug prints (Triangulation.zig:142,226,346; SURVEY.md §5.1),
        # off by default.
        self.debug = debug
        self.nodes: List[_Node] = []
        self.points: Sequence[Point] = ()
        self.root = 0

    def _dbg(self, msg: str) -> None:
        if self.debug:
            print(f"[triangulation] {msg}")

    # -- geometric predicates (must match Triangulation.zig:117-136) ------

    def _is_left_of(self, point_id: int, seg_p1: int, seg_p2: int) -> bool:
        px, py = self.points[point_id]
        ax, ay = self.points[seg_p1]
        bx, by = self.points[seg_p2]
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax) > 0.0

    def _point_is_above(self, lhs: int, rhs: int) -> bool:
        ly, ry = self.points[lhs][1], self.points[rhs][1]
        if ly < ry:  # smaller y is "above" (y-down screen space)
            return True
        if ly == ry:  # tie-break on x
            return self.points[lhs][0] < self.points[rhs][0]
        return False

    # -- node management ---------------------------------------------------

    def _add_node(self, typ: int) -> int:
        self.nodes.append(_Node(typ))
        return len(self.nodes) - 1

    def _clone_node(self, node_id: int) -> int:
        src = self.nodes[node_id]
        dst = _Node(src.type)
        dst.crumb, dst.child1, dst.child2 = src.crumb, src.child1, src.child2
        dst.point1, dst.point2 = src.point1, src.point2
        self.nodes.append(dst)
        return len(self.nodes) - 1

    # -- phase 1: trapezoidation -------------------------------------------

    def _add_point(self, point_id: int) -> None:
        """Locate the trapezoid containing the point and split it
        vertically (semantics of ``Triangulation.zig:139-196``)."""
        if self.debug:
            self._dbg(f"adding point {point_id} {self.points[point_id]}")
        nodes = self.nodes
        base = self.root
        while True:
            node = nodes[base]
            if node.type == _TRAPEZOID:
                break
            if node.type == _POINT:
                if node.point1 == point_id:
                    return  # already inserted
                base = node.child1 if self._point_is_above(point_id, node.point1) else node.child2
            else:  # segment
                base = node.child1 if self._is_left_of(point_id, node.point1, node.point2) else node.child2

        # Split: clone into lower/upper trapezoids; transmute the found
        # trapezoid into a point node in place so parent links stay valid.
        lower = self._clone_node(base)
        upper = self._clone_node(base)
        node = nodes[base]
        node.type = _POINT
        node.point1 = point_id
        node.point2 = None
        node.crumb = None
        node.child1 = upper
        node.child2 = lower
        nodes[upper].point2 = point_id
        nodes[lower].point1 = point_id

    def _segment_side(self, node: _Node, upper: int, lower: int) -> bool:
        """At a segment node during descent, decide if the query segment
        lies to the left (semantics of ``Triangulation.zig:260-295``)."""
        op1, op2 = node.point1, node.point2
        if upper in (op1, op2):
            return self._is_left_of(lower, op1, op2)
        if lower in (op1, op2):
            return self._is_left_of(upper, op1, op2)
        top_is_above = self._point_is_above(upper, op1)
        bottom_is_below = self._point_is_above(op2, lower)
        if top_is_above and bottom_is_below:
            # Query segment vertically contains the node's segment: test a
            # node endpoint against the query segment instead (inverted).
            return not self._is_left_of(op1, upper, lower)
        if top_is_above:
            return self._is_left_of(lower, op1, op2)
        return self._is_left_of(upper, op1, op2)

    def _add_segment(self, point1: int, point2: int) -> None:
        """Thread the directed edge ``point1 -> point2`` through every
        trapezoid it crosses (semantics of ``Triangulation.zig:215-396``)."""
        nodes = self.nodes
        if self.debug:
            self._dbg(f"adding segment ({point1}, {point2})")
        if self._point_is_above(point1, point2):
            upper, lower = point1, point2
        else:
            upper, lower = point2, point1

        # Pass 1: multi-trapezoid locate with breadcrumb backtracking.
        stack: List[int] = []
        base = self.root
        breadcrumb: Optional[int] = None
        while True:
            while True:
                node = nodes[base]
                if node.type == _TRAPEZOID:
                    break
                if node.type == _POINT:
                    pc = node.point1
                    if pc == upper:
                        base = node.child2  # segment hangs below its upper point
                    elif pc == lower:
                        base = node.child1  # segment rises above its lower point
                    elif self._point_is_above(pc, upper):
                        base = node.child2  # segment wholly below this point
                    elif self._point_is_above(lower, pc):
                        base = node.child1  # segment wholly above this point
                    else:
                        # Segment spans this point vertically: search both
                        # children, remembering where to come back.
                        node.crumb = breadcrumb
                        breadcrumb = base
                        base = node.child1
                else:  # segment node
                    base = node.child1 if self._segment_side(node, upper, lower) else node.child2
            stack.append(base)
            if breadcrumb is not None:
                crumb_node = nodes[breadcrumb]
                next_crumb = crumb_node.crumb
                crumb_node.crumb = None
                base = crumb_node.child2
                breadcrumb = next_crumb
            else:
                break

        # Pass 2: top-down sorted split/merge with running left/right
        # trapezoids (Triangulation.zig:316-396).
        left_trap = self._add_node(_TRAPEZOID)
        nodes[left_trap].point1 = upper
        right_trap = self._add_node(_TRAPEZOID)
        nodes[right_trap].point1 = upper

        while stack:
            # Pick the crossed trapezoid whose lower point is highest.
            best_i, best_id, low_point = 0, stack[0], lower
            for i, nid in enumerate(stack):
                p2 = nodes[nid].point2
                if self._point_is_above(p2, low_point):
                    low_point, best_i, best_id = p2, i, nid

            # Transmute the trapezoid into a segment node in place.
            base_node = nodes[best_id]
            base_node.type = _SEGMENT
            nodes[left_trap].child1 = base_node.child1
            base_node.child1 = left_trap
            # crumb marks the child on the polygon-interior side: for a CW
            # polygon the interior is left of downward edges
            # (Triangulation.zig:351-355, consumed by the inside test :517).
            base_node.crumb = left_trap if point1 == upper else right_trap
            nodes[right_trap].child2 = base_node.child2
            base_node.child2 = right_trap
            base_node.point1 = upper
            base_node.point2 = lower

            if low_point == lower:
                nodes[left_trap].child2 = best_id
                nodes[left_trap].point2 = low_point
                nodes[right_trap].child1 = best_id
                nodes[right_trap].point2 = low_point
                break
            if self._is_left_of(low_point, upper, lower):
                nodes[left_trap].child2 = best_id
                nodes[left_trap].point2 = low_point
                left_trap = self._add_node(_TRAPEZOID)
                nodes[left_trap].point1 = low_point
            else:
                nodes[right_trap].child1 = best_id
                nodes[right_trap].point2 = low_point
                right_trap = self._add_node(_TRAPEZOID)
                nodes[right_trap].point1 = low_point

            # swap-remove, as the reference does
            stack[best_i] = stack[-1]
            stack.pop()

    # -- phase 3 helper: CW emit -------------------------------------------

    def _emit_triangle(self, point: int, axis1: int, axis2: int,
                       emit: Callable[[Point], None]) -> None:
        """Emit triangle {point, axis1, axis2} as the cyclic rotation,
        starting at ``point``, of ascending polygon index. For any triangle
        of a valid triangulation of a simple CW polygon, boundary
        (= index) order is clockwise, so this emits CW — the same
        normalization the reference performs case-by-case at
        ``Triangulation.zig:405-421``."""
        emit(self.points[point])
        if (axis1 > point) == (axis2 > point):
            first, second = sorted((axis1, axis2))
        elif axis2 > point:
            first, second = axis2, axis1
        else:
            first, second = axis1, axis2
        emit(self.points[first])
        emit(self.points[second])

    # -- public API ----------------------------------------------------------

    def create_polygon(self, points: Sequence[Point],
                       emit: Callable[[Point], None]) -> None:
        """Triangulate ``points`` (CW, implicitly closed, non-self-
        intersecting) and emit each triangle as three CW-ordered vertex
        callbacks (contract of ``Triangulation.zig:442-472``)."""
        import numpy as _np

        n = len(points)
        if n < 3:
            raise TriangulationError("polygon needs at least 3 vertices")
        self.nodes = []
        # f32 coordinates, like the reference's @Vector(2, f32) points
        # (Triangulation.zig:16) — also keeps the native core's view of
        # the input identical to this one's.
        pts32 = _np.asarray(points, _np.float32)
        self.points = [(float(x), float(y)) for x, y in pts32]

        # Winding check (cheap, catches the most common contract
        # violation up front): CW in y-down screen space == positive
        # shoelace sum.
        area2 = 0.0
        for i in range(n):
            x1, y1 = self.points[i]
            x2, y2 = self.points[(i + 1) % n]
            area2 += x1 * y2 - x2 * y1
        if area2 <= 0.0:
            raise TriangulationError(
                "polygon must be wound clockwise (y-down screen space) "
                "and have nonzero area; got shoelace sum %g" % area2)

        # Native fast path: same algorithm, same edge order, compiled.
        use_native = self.use_native
        if use_native is None or use_native:
            from . import native as _native
            if _native.available():
                order = list(unirand_seed(n, self.seed))
                verts = _native.triangulate_native(pts32, order)
                for vx, vy in verts:
                    emit((float(vx), float(vy)))
                return
            if use_native:
                raise TriangulationError(
                    "native triangulator requested but not built "
                    "(run: make -C native)")

        # Phase 1: trapezoidation, edges inserted in seeded random order.
        # Contract violations (self-intersection, wrong winding, repeated
        # or collinear points) corrupt the query structure's invariants;
        # surface them as TriangulationError instead of raw internal
        # errors (the reference would crash or loop forever).
        try:
            self.root = self._add_node(_TRAPEZOID)
            for edge in unirand_seed(n, self.seed):
                p1, p2 = edge, (edge + 1) % n
                self._add_point(p1)
                self._add_point(p2)
                self._add_segment(p1, p2)
        except (TypeError, IndexError, KeyError) as exc:
            raise TriangulationError(
                "invalid input: expected a simple polygon with vertices "
                "listed clockwise (y-down), no repeated points, no "
                "self-intersections") from exc

        # Phase 2: monotone mountains keyed by bounding segment
        # (Triangulation.zig:500-540).
        mountains: List[Tuple[Tuple[int, int], List[int]]] = []

        def mountain_add(key_node: int, p1: int, p2: int) -> None:
            key = (self.nodes[key_node].point1, self.nodes[key_node].point2)
            for k, lst in mountains:
                if k == key:
                    lst.extend((p1, p2))
                    return
            mountains.append((key, [p1, p2]))

        for node in self.nodes:
            if node.type != _TRAPEZOID:
                continue
            if node.child1 is None or node.child2 is None:
                continue  # unbounded: outside the polygon
            if node.point1 is None or node.point2 is None:
                continue  # vertically unbounded: outside
            left_seg = self.nodes[node.child1]
            # Interior test: the left segment's interior-side child is its
            # right child exactly when this trapezoid (which lies to the
            # right of its left segment) is inside the polygon.
            if left_seg.crumb != left_seg.child2:
                continue
            p1, p2, c1, c2 = node.point1, node.point2, node.child1, node.child2
            right_seg = self.nodes[c2]
            if p1 == right_seg.point1 and p2 == right_seg.point2:
                mountain_add(c1, p1, p2)   # spans the right segment: key left
            elif p1 == left_seg.point1 and p2 == left_seg.point2:
                mountain_add(c2, p1, p2)   # spans the left segment: key right
            else:
                mountain_add(c1, p1, p2)
                mountain_add(c2, p1, p2)

        # Phase 3: ear-clip each mountain (Triangulation.zig:553-587).
        #
        # Deliberate fix over the reference (rebuild intent, not bugs —
        # SURVEY.md §2.5): the reference's clip window wraps around the
        # sorted list, so it also clips at the *base endpoints* with an
        # unwrapped-atan2 angle test (:398-403) whose validity depends on
        # which side of the base the chain lies; on left-based mountains it
        # admits non-ear clips, producing overlapping / wrong-winding
        # triangles (verified on concave 19-gons). Seidel's theorem is that
        # every *convex interior chain vertex* of a monotone mountain is an
        # ear, so we clip exactly those, with convexity measured against
        # the mountain's own orientation.
        P = self.points
        for _key, lst in mountains:
            lst.sort(key=lambda pid: (P[pid][1], P[pid][0]))
            chain = [lst[0]]
            for pid in lst[1:]:
                if pid != chain[-1]:
                    chain.append(pid)
            # Mountain orientation via the shoelace sum over the cycle
            # (chain top->bottom, base edge closing bottom->top).
            area2 = 0.0
            for i in range(len(chain)):
                x1, y1 = P[chain[i]]
                x2, y2 = P[chain[(i + 1) % len(chain)]]
                area2 += x1 * y2 - x2 * y1
            orient = 1.0 if area2 > 0.0 else -1.0
            while len(chain) > 2:
                clipped = False
                for j in range(1, len(chain) - 1):
                    ax, ay = P[chain[j - 1]]
                    px, py = P[chain[j]]
                    bx, by = P[chain[j + 1]]
                    cross = (px - ax) * (by - py) - (py - ay) * (bx - px)
                    if cross * orient > 0.0:  # convex interior vertex: ear
                        self._emit_triangle(chain[j], chain[j - 1],
                                            chain[j + 1], emit)
                        del chain[j]
                        clipped = True
                        break
                if not clipped:
                    break  # remaining chain is collinear (zero area)


def triangulate(points: Sequence[Point], seed: int = 0) -> List[Point]:
    """Convenience wrapper: returns a flat list of 3*(n-2) CW vertices."""
    out: List[Point] = []
    Triangulation(seed).create_polygon(points, out.append)
    return out
