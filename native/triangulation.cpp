// Native Seidel triangulator core.
//
// C++ implementation of the algorithm in
// myrenderer_tpu/geometry/triangulation.py (Seidel's randomized
// trapezoidal decomposition -> monotone mountains -> ear clipping; the
// re-design of the reference's Polygon/Triangulation.zig, 589 LoC Zig).
// This is the framework's host-side native runtime piece: polygon
// triangulation is pointer-chasing, data-dependent control flow — the
// wrong shape for the TPU and the slowest part of scene building, so it
// runs as native code, exactly like the reference keeps it in compiled
// Zig.
//
// Contract: identical output (same triangles, same emit order) as the
// Python implementation for the same edge insertion order. The
// insertion order is produced by the caller (unirand permutation) so
// the two implementations share one source of randomness.
//
// C ABI (ctypes, no pybind11 in this image):
//   int myr_triangulate(const float* points, int n,
//                       const int* edge_order,
//                       float* out_verts, int out_capacity);
// Returns the number of floats written (3*(n-2) vertices * 2), or a
// negative error code: -1 bad input, -2 output capacity, -3 invalid
// polygon (ear clipping stalled).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

enum NodeType : uint8_t { POINT = 0, SEGMENT = 1, TRAPEZOID = 2 };
constexpr int32_t NIL = -1;

struct Node {
  NodeType type = TRAPEZOID;
  int32_t crumb = NIL;
  int32_t child1 = NIL;
  int32_t child2 = NIL;
  int32_t point1 = NIL;
  int32_t point2 = NIL;
};

struct Tri {
  const float* pts;  // [n][2]
  int n;
  std::vector<Node> nodes;
  int32_t root = 0;

  double px(int32_t id) const { return pts[2 * id]; }
  double py(int32_t id) const { return pts[2 * id + 1]; }

  // predicates: must match triangulation.py (f32 inputs promoted to
  // double in both implementations — Python floats are doubles)
  bool is_left_of(int32_t p, int32_t s1, int32_t s2) const {
    const double ax = px(s1), ay = py(s1), bx = px(s2), by = py(s2);
    return (bx - ax) * (py(p) - ay) - (by - ay) * (px(p) - ax) > 0.0;
  }
  bool point_is_above(int32_t lhs, int32_t rhs) const {
    if (py(lhs) < py(rhs)) return true;
    if (py(lhs) == py(rhs)) return px(lhs) < px(rhs);
    return false;
  }

  int32_t add_node(NodeType t) {
    nodes.push_back(Node{t, NIL, NIL, NIL, NIL, NIL});
    return static_cast<int32_t>(nodes.size()) - 1;
  }
  int32_t clone_node(int32_t id) {
    nodes.push_back(nodes[id]);
    return static_cast<int32_t>(nodes.size()) - 1;
  }

  void add_point(int32_t point_id) {
    int32_t base = root;
    for (;;) {
      Node& nd = nodes[base];
      if (nd.type == TRAPEZOID) break;
      if (nd.type == POINT) {
        if (nd.point1 == point_id) return;  // already inserted
        base = point_is_above(point_id, nd.point1) ? nd.child1 : nd.child2;
      } else {
        base = is_left_of(point_id, nd.point1, nd.point2) ? nd.child1
                                                          : nd.child2;
      }
    }
    const int32_t lower = clone_node(base);
    const int32_t upper = clone_node(base);
    Node& nd = nodes[base];  // transmute in place
    nd.type = POINT;
    nd.point1 = point_id;
    nd.point2 = NIL;
    nd.crumb = NIL;
    nd.child1 = upper;
    nd.child2 = lower;
    nodes[upper].point2 = point_id;
    nodes[lower].point1 = point_id;
  }

  bool segment_side(const Node& nd, int32_t upper, int32_t lower) const {
    const int32_t op1 = nd.point1, op2 = nd.point2;
    if (upper == op1 || upper == op2) return is_left_of(lower, op1, op2);
    if (lower == op1 || lower == op2) return is_left_of(upper, op1, op2);
    const bool top_is_above = point_is_above(upper, op1);
    const bool bottom_is_below = point_is_above(op2, lower);
    if (top_is_above && bottom_is_below)
      return !is_left_of(op1, upper, lower);
    if (top_is_above) return is_left_of(lower, op1, op2);
    return is_left_of(upper, op1, op2);
  }

  void add_segment(int32_t point1, int32_t point2) {
    int32_t upper, lower;
    if (point_is_above(point1, point2)) {
      upper = point1;
      lower = point2;
    } else {
      upper = point2;
      lower = point1;
    }

    // pass 1: locate all crossed trapezoids (breadcrumb backtracking)
    std::vector<int32_t> stack;
    int32_t base = root;
    int32_t breadcrumb = NIL;
    for (;;) {
      for (;;) {
        Node& nd = nodes[base];
        if (nd.type == TRAPEZOID) break;
        if (nd.type == POINT) {
          const int32_t pc = nd.point1;
          if (pc == upper) {
            base = nd.child2;
          } else if (pc == lower) {
            base = nd.child1;
          } else if (point_is_above(pc, upper)) {
            base = nd.child2;
          } else if (point_is_above(lower, pc)) {
            base = nd.child1;
          } else {
            nd.crumb = breadcrumb;
            breadcrumb = base;
            base = nd.child1;
          }
        } else {
          base = segment_side(nd, upper, lower) ? nd.child1 : nd.child2;
        }
      }
      stack.push_back(base);
      if (breadcrumb != NIL) {
        Node& crumb = nodes[breadcrumb];
        const int32_t next = crumb.crumb;
        crumb.crumb = NIL;
        base = crumb.child2;
        breadcrumb = next;
      } else {
        break;
      }
    }

    // pass 2: top-down split/merge with running left/right trapezoids
    int32_t left_trap = add_node(TRAPEZOID);
    nodes[left_trap].point1 = upper;
    int32_t right_trap = add_node(TRAPEZOID);
    nodes[right_trap].point1 = upper;

    while (!stack.empty()) {
      size_t best_i = 0;
      int32_t best_id = stack[0];
      int32_t low_point = lower;
      for (size_t i = 0; i < stack.size(); ++i) {
        const int32_t p2 = nodes[stack[i]].point2;
        if (point_is_above(p2, low_point)) {
          low_point = p2;
          best_i = i;
          best_id = stack[i];
        }
      }

      Node& bn = nodes[best_id];  // transmute into segment
      bn.type = SEGMENT;
      nodes[left_trap].child1 = bn.child1;
      bn.child1 = left_trap;
      bn.crumb = (point1 == upper) ? left_trap : right_trap;
      nodes[right_trap].child2 = bn.child2;
      bn.child2 = right_trap;
      bn.point1 = upper;
      bn.point2 = lower;

      if (low_point == lower) {
        nodes[left_trap].child2 = best_id;
        nodes[left_trap].point2 = low_point;
        nodes[right_trap].child1 = best_id;
        nodes[right_trap].point2 = low_point;
        break;
      }
      if (is_left_of(low_point, upper, lower)) {
        nodes[left_trap].child2 = best_id;
        nodes[left_trap].point2 = low_point;
        left_trap = add_node(TRAPEZOID);
        nodes[left_trap].point1 = low_point;
      } else {
        nodes[right_trap].child1 = best_id;
        nodes[right_trap].point2 = low_point;
        right_trap = add_node(TRAPEZOID);
        nodes[right_trap].point1 = low_point;
      }
      stack[best_i] = stack.back();  // swap-remove
      stack.pop_back();
    }
  }
};

}  // namespace

extern "C" int myr_triangulate(const float* points, int n,
                               const int* edge_order, float* out_verts,
                               int out_capacity) {
  if (n < 3 || !points || !edge_order || !out_verts) return -1;

  // winding check (CW in y-down == positive shoelace), as in python
  double area2 = 0.0;
  for (int i = 0; i < n; ++i) {
    const int j = (i + 1) % n;
    area2 += static_cast<double>(points[2 * i]) * points[2 * j + 1] -
             static_cast<double>(points[2 * j]) * points[2 * i + 1];
  }
  if (area2 <= 0.0) return -1;

  Tri tri;
  tri.pts = points;
  tri.n = n;
  tri.nodes.reserve(8 * n);
  tri.root = tri.add_node(TRAPEZOID);

  for (int e = 0; e < n; ++e) {
    const int32_t p1 = edge_order[e];
    const int32_t p2 = (p1 + 1) % n;
    if (p1 < 0 || p1 >= n) return -1;
    tri.add_point(p1);
    tri.add_point(p2);
    tri.add_segment(p1, p2);
  }

  // phase 2: monotone mountains keyed by (upper, lower) segment points
  struct Mountain {
    int32_t k1, k2;
    std::vector<int32_t> list;
  };
  std::vector<Mountain> mountains;
  auto mountain_add = [&](int32_t key_node, int32_t p1, int32_t p2) {
    const int32_t k1 = tri.nodes[key_node].point1;
    const int32_t k2 = tri.nodes[key_node].point2;
    for (auto& m : mountains) {
      if (m.k1 == k1 && m.k2 == k2) {
        m.list.push_back(p1);
        m.list.push_back(p2);
        return;
      }
    }
    mountains.push_back({k1, k2, {p1, p2}});
  };

  const size_t node_count = tri.nodes.size();
  for (size_t i = 0; i < node_count; ++i) {
    const Node& nd = tri.nodes[i];
    if (nd.type != TRAPEZOID) continue;
    if (nd.child1 == NIL || nd.child2 == NIL) continue;
    if (nd.point1 == NIL || nd.point2 == NIL) continue;
    const Node& left_seg = tri.nodes[nd.child1];
    if (left_seg.crumb != left_seg.child2) continue;  // outside
    const Node& right_seg = tri.nodes[nd.child2];
    if (nd.point1 == right_seg.point1 && nd.point2 == right_seg.point2) {
      mountain_add(nd.child1, nd.point1, nd.point2);
    } else if (nd.point1 == left_seg.point1 &&
               nd.point2 == left_seg.point2) {
      mountain_add(nd.child2, nd.point1, nd.point2);
    } else {
      mountain_add(nd.child1, nd.point1, nd.point2);
      mountain_add(nd.child2, nd.point1, nd.point2);
    }
  }

  // phase 3: ear-clip each mountain (convex interior chain vertices
  // only; every such vertex is an ear — Seidel's theorem)
  int written = 0;
  const int cap = out_capacity;
  auto emit3 = [&](int32_t p, int32_t a1, int32_t a2) -> bool {
    // CW emit: cyclic rotation, starting at p, of ascending index
    int32_t first, second;
    if ((a1 > p) == (a2 > p)) {
      first = a1 < a2 ? a1 : a2;
      second = a1 < a2 ? a2 : a1;
    } else if (a2 > p) {
      first = a2;
      second = a1;
    } else {
      first = a1;
      second = a2;
    }
    if (written + 6 > cap) return false;
    const int32_t order[3] = {p, first, second};
    for (int k = 0; k < 3; ++k) {
      out_verts[written++] = points[2 * order[k]];
      out_verts[written++] = points[2 * order[k] + 1];
    }
    return true;
  };

  for (auto& m : mountains) {
    auto& lst = m.list;
    // stable sort by (y, x) ascending — same order as python
    std::stable_sort(lst.begin(), lst.end(), [&](int32_t a, int32_t b) {
      if (tri.py(a) != tri.py(b)) return tri.py(a) < tri.py(b);
      return tri.px(a) < tri.px(b);
    });
    std::vector<int32_t> chain;
    for (int32_t pid : lst)
      if (chain.empty() || pid != chain.back()) chain.push_back(pid);

    double marea2 = 0.0;
    for (size_t i = 0; i < chain.size(); ++i) {
      const size_t j = (i + 1) % chain.size();
      marea2 += tri.px(chain[i]) * tri.py(chain[j]) -
                tri.px(chain[j]) * tri.py(chain[i]);
    }
    const double orient = marea2 > 0.0 ? 1.0 : -1.0;

    while (chain.size() > 2) {
      bool clipped = false;
      for (size_t j = 1; j + 1 < chain.size(); ++j) {
        const double ax = tri.px(chain[j - 1]), ay = tri.py(chain[j - 1]);
        const double qx = tri.px(chain[j]), qy = tri.py(chain[j]);
        const double bx = tri.px(chain[j + 1]), by = tri.py(chain[j + 1]);
        const double cross = (qx - ax) * (by - qy) - (qy - ay) * (bx - qx);
        if (cross * orient > 0.0) {
          if (!emit3(chain[j], chain[j - 1], chain[j + 1])) return -2;
          chain.erase(chain.begin() + j);
          clipped = true;
          break;
        }
      }
      if (!clipped) break;  // collinear remainder
    }
  }
  return written;
}
