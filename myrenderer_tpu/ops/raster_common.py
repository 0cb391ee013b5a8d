"""Shared rasterization math (device side, jnp).

This module is the single source of truth for every per-triangle /
per-pixel decision: the slow full-frame oracle (``raster_ref.py``) and the
tiled Pallas kernel (``raster_pallas.py``) both consume the coefficients
produced here and apply the same rules in the same order, which is what
makes their outputs bit-identical (BASELINE.md "bit-stable depth").

It re-implements, explicitly, the fixed-function stages the reference got
from GPU hardware via ``mach.gpu`` (``Renderer/Pipeline.zig:137-161``):
triangle assembly, cw-front/back-face culling, viewport transform,
coverage with a top-left fill rule, perspective-correct attribute
interpolation, and a depth32 less-test.

Method: clipless 2D-homogeneous rasterization (Olano & Greer 1997).
Instead of clipping polygons to the frustum, edge functions are built
directly from clip-space coordinates lifted to pixel space:

    u_i = (0.5*x_i + 0.5*w_i) * W          (x: NDC -> pixel, y flipped)
    v_i = (0.5*w_i - 0.5*y_i) * H
    P_i = (u_i, v_i, w_i)

    e_k(p) = det[P_i, P_j, p],   p = (px, py, 1)   (k,i,j cyclic)

e_k is linear in (px, py): e_k = a_k*px + b_k*py + c_k. These weights are
proportional to beta_k / w_k (screen barycentric over vertex w), giving:

    coverage:  all e_k on the det's sign side (+ top-left rule on zeros)
    facing:    det = e_0(P_0) > 0  <=>  clockwise in y-down pixel space
    depth:     z_ndc(p)  = sum_k e_k z_k / sum_k e_k w_k   (z = clip z)
    varyings:  attr(p)   = sum_k e_k attr_k / sum_k e_k    (persp-correct)

Pixel centers sample at (px + 0.5, py + 0.5).

Current contract (v1): triangles with any vertex at w <= W_EPS are
dropped (no near-plane straddling support yet); in-frustum geometry —
which includes every BASELINE.json config — renders identically to a
clipping rasterizer, because x/y overflow is handled by the frame bounds
and z in [0,1] is enforced per pixel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Minimum clip-space w for a triangle to be rasterized.
W_EPS = 1e-6

# Target w of vertices emitted by the near/eye-plane clipper: safely
# above W_EPS so clipped triangles always pass triangle_setup's w_ok
# despite f32 roundoff in the lerp. The sliver between the two planes
# (< 1e-5 view-space units from the eye) is invisible.
W_CLIP = 8e-6

# Per-triangle cull codes for merged passes mixing raster states
# (triangle_setup accepts i32[T] of these instead of a static string).
CULL_BACK, CULL_FRONT, CULL_NONE = 0, 1, 2
CULL_CODES = {"back": CULL_BACK, "front": CULL_FRONT, "none": CULL_NONE}

# Number of packed f32 lanes per triangle in the coefficient record.
# Layout (see pack_coeffs): a0,b0,c0, a1,b1,c1, a2,b2,c2, zna,znb,znc,
# wna,wnb,wnc, valid. Color numerators ride separately (resolve pass).
COEFF_LANES = 16


class PlanarTris(NamedTuple):
    """Planar (structure-of-arrays) triangle batch: ``clip`` is a
    3-tuple (corner) of 4-tuples (clip channel) of flat f32[T] vectors;
    ``vary`` a 3-tuple of C-tuples of f32[T].

    FLAT vectors, not a stacked [3, 4, T] array, on purpose: consumers
    (triangle_setup, viewport_bbox) only ever read whole planes, and on
    TPU a [3, 4, T] array is (4, 128)-tiled so both building it from
    per-plane vectors and slicing planes back out lower to strided
    relayout copies (~12 ms/frame of while-loop dynamic-update-slice +
    copy pairs at the 1M-triangle stretch when this held a stacked
    array). Tuples of [T] vectors cost nothing to build or consume.

    The planar end-to-end vertex interface: batch vertex functions that
    naturally compute per-corner channels (e.g. the terrain's regular
    grid) emit this instead of interleaved [V, 4] streams, and
    triangle_setup consumes it directly — skipping the [V, 4] ->
    [T, 3, 4] -> [3, 4, T] relayouts that pad horribly in TPU tiled
    layouts (each was ~1 ms/frame at the 1M-triangle stretch config).

    ``ids`` (optional i32[T]): the triangles' SUBMISSION indices when
    the producer emits them in a permuted array order. Depth resolution
    is order-free (min depth, lowest-ID tie-break), so a producer whose
    natural layout is not submission order (e.g. the terrain emitting
    [all first-half-quad tris ++ all second-half-quad tris] so its
    planar channels are pure concats instead of 2-way interleave
    relayouts) just says which submission rank each array slot holds;
    the pack stage puts ``ids`` in the coefficient id lane, keeping
    depth-tie semantics and winner indices exactly as if the batch had
    been emitted in submission order. None = array order IS submission
    order.
    """

    clip: tuple         # ((f32[T],) * 4,) * 3  — [corner][channel]
    vary: tuple         # ((f32[T],) * C,) * 3
    ids: jax.Array | None = None   # i32[T] submission ranks (permuted
                                   # producers), else None

    @property
    def count(self) -> int:
        return self.clip[0][0].shape[0]

    @property
    def channels(self) -> int:
        return len(self.vary[0])

    @staticmethod
    def from_interleaved(tri_clip: jax.Array,
                         tri_vary: jax.Array) -> "PlanarTris":
        """[T, 3, 4]/[T, 3, C] -> planar.

        Transpose-then-slice, NOT 12 strided [:, k, ch] extracts, so the
        emitted HLO prefix is identical to triangle_setup's interleaved
        branch (same transpose + plane slices) — XLA then makes the same
        fusion/FMA decisions downstream and the planar lane stays
        bit-identical to the vmapped lane (pinned by
        test_planar_batch_vertex_interface; strided extracts produced
        1-ulp color drift from different fusion shapes)."""
        cpl = jnp.transpose(tri_clip, (1, 2, 0))         # [3, 4, T]
        vpl = jnp.transpose(tri_vary, (1, 2, 0))         # [3, C, T]
        return PlanarTris(
            tuple(tuple(cpl[k, ch] for ch in range(4)) for k in range(3)),
            tuple(tuple(vpl[k, ch] for ch in range(vpl.shape[1]))
                  for k in range(3)))

    def interleaved(self) -> tuple[jax.Array, jax.Array]:
        """Planar -> ([T, 3, 4], [T, 3, C])."""
        return (jnp.stack([jnp.stack(self.clip[k], axis=-1)
                           for k in range(3)], axis=1),
                jnp.stack([jnp.stack(self.vary[k], axis=-1)
                           for k in range(3)], axis=1))

    def concat(self, *others: "PlanarTris") -> "PlanarTris":
        """Concatenate along the triangle axis. ``ids`` does not survive
        (appendee blocks have no submission ranks of their own); callers
        that need permuted ids consume them BEFORE concatenating — the
        only in-repo user is the oracle path, which resolves in array
        order and ignores ids."""
        return PlanarTris(
            tuple(tuple(jnp.concatenate(
                [self.clip[k][ch]] + [o.clip[k][ch] for o in others])
                for ch in range(4)) for k in range(3)),
            tuple(tuple(jnp.concatenate(
                [self.vary[k][ch]] + [o.vary[k][ch] for o in others])
                for ch in range(len(self.vary[0]))) for k in range(3)))


class TriCoeffs(NamedTuple):
    """Per-triangle linear coefficients, all shaped [T, ...]."""

    edge_a: jax.Array   # [T, 3]
    edge_b: jax.Array   # [T, 3]
    edge_c: jax.Array   # [T, 3]
    z_abc: jax.Array    # [T, 3]  depth numerator:  sum_k e_k * z_k
    w_abc: jax.Array    # [T, 3]  depth denominator: sum_k e_k * w_k
    col_abc: jax.Array  # [T, 3, C] varying numerators: sum_k e_k * col_k
    en_abc: jax.Array   # [T, 3]  varying denominator: sum_k e_k
    valid: jax.Array    # [T] bool
    zhi: jax.Array      # [T] f32: 0 = invalid; else valid z window is
                        # [zhi - 1, zhi] (plain surfaces: [0, 1])


def triangle_setup(tri_clip: jax.Array, tri_vary: jax.Array,
                   valid: jax.Array, width: int, height: int,
                   cull_mode: str = "back",
                   z_bias: jax.Array | None = None) -> TriCoeffs:
    """Assemble per-triangle linear coefficients.

    tri_clip: f32[T, 3, 4] clip positions (tri_vary: f32[T, 3, C]
    varyings) OR a :class:`PlanarTris` (then ``tri_vary`` is ignored —
    the planar fast path, no relayouts). valid: bool[T]
    submission-level validity (padding / culled instances).

    Culling reproduces ``Pipeline.zig:145-149``: front face is clockwise
    in framebuffer space; ``cull_mode='back'`` keeps det > 0 only (which
    also drops zero-area degenerates, making zero padding free).

    ``z_bias`` (f32[T], optional) shifts each triangle's NDC depth by a
    constant (z_clip += bias * w). This is how multiple surfaces merge
    into ONE raster pass: surface s gets bias 2*(S-1-s), so any covered
    later-drawn surface beats all earlier ones at every pixel while
    within-surface depth ordering is unchanged (disjoint biased ranges,
    1.0 apart). The per-triangle valid window [bias, bias+1] rides in
    the ``valid`` plane (0 = invalid, else bias+1 = far clip).
    """
    f32 = jnp.float32
    # All math on flat [T] vectors: a [T, 3]-shaped op uses 3 of the
    # VPU's 128 lanes; flat vectors use all of them. Planar input IS
    # flat per-plane vectors (zero relayouts); interleaved input pays
    # one up-front transpose instead of 12 strided extracts (strided
    # loads from [T, 3, 4] were the dominant cost of this function).
    if isinstance(tri_clip, PlanarTris):
        cplk = [[p.astype(f32) for p in tri_clip.clip[k]]
                for k in range(3)]
        vplk = [[p.astype(f32) for p in tri_clip.vary[k]]
                for k in range(3)]
        C = len(tri_clip.vary[0])
    else:
        cpl = jnp.transpose(tri_clip.astype(f32), (1, 2, 0))  # [3, 4, T]
        vpl = jnp.transpose(tri_vary.astype(f32), (1, 2, 0))  # [3, C, T]
        C = vpl.shape[1]
        cplk = [[cpl[k, ch] for ch in range(4)] for k in range(3)]
        vplk = [[vpl[k, ch] for ch in range(C)] for k in range(3)]
    xs = [cplk[k][0] for k in range(3)]
    ys = [cplk[k][1] for k in range(3)]
    zs = [cplk[k][2] for k in range(3)]
    ws = [cplk[k][3] for k in range(3)]

    us = [(0.5 * x + 0.5 * w) * f32(width) for x, w in zip(xs, ws)]
    vs = [(0.5 * w - 0.5 * y) * f32(height) for y, w in zip(ys, ws)]

    # edge k spans vertices (k+1, k+2) mod 3
    aa, bb, cc = [], [], []
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        aa.append(vs[i] * ws[j] - vs[j] * ws[i])
        bb.append(us[j] * ws[i] - us[i] * ws[j])
        cc.append(us[i] * vs[j] - us[j] * vs[i])

    # det = e_0 evaluated at P_0 (homogeneous)
    det = aa[0] * us[0] + bb[0] * vs[0] + cc[0] * ws[0]

    if isinstance(cull_mode, str):
        if cull_mode == "back":
            facing_ok = det > 0
            sign = None
        elif cull_mode == "front":
            facing_ok = det < 0
            sign = -jnp.ones_like(det)
        elif cull_mode == "none":
            facing_ok = det != 0
            sign = jnp.sign(det)
        else:
            raise ValueError(f"unknown cull_mode {cull_mode!r}")
    else:
        # per-triangle cull codes (i32[T], see CULL_CODES): lets batches
        # with different raster state share ONE merged raster pass
        mode = jnp.asarray(cull_mode)
        facing_ok = jnp.where(mode == CULL_BACK, det > 0,
                              jnp.where(mode == CULL_FRONT, det < 0,
                                        det != 0))
        sign = jnp.where(mode == CULL_BACK, 1.0,
                         jnp.where(mode == CULL_FRONT, -1.0,
                                   jnp.sign(det)))

    # Orient edges so interior is always e > 0.
    if sign is not None:
        aa = [a * sign for a in aa]
        bb = [b * sign for b in bb]
        cc = [c * sign for c in cc]

    w_ok = (ws[0] > W_EPS) & (ws[1] > W_EPS) & (ws[2] > W_EPS)
    valid = valid & facing_ok & w_ok
    if z_bias is not None:
        bias = z_bias.astype(f32)
        zs = [z + bias * w for z, w in zip(zs, ws)]
        zhi = jnp.where(valid, bias + 1.0, 0.0)
    else:
        zhi = valid.astype(f32)   # window [0, 1]

    def plane(vals):
        return jnp.stack([
            aa[0] * vals[0] + aa[1] * vals[1] + aa[2] * vals[2],
            bb[0] * vals[0] + bb[1] * vals[1] + bb[2] * vals[2],
            cc[0] * vals[0] + cc[1] * vals[1] + cc[2] * vals[2],
        ], axis=1)                               # [T, 3]

    z_abc = plane(zs)
    w_abc = plane(ws)
    en_abc = jnp.stack([aa[0] + aa[1] + aa[2],
                        bb[0] + bb[1] + bb[2],
                        cc[0] + cc[1] + cc[2]], axis=1)
    cols = [[vplk[k][ch] for k in range(3)] for ch in range(C)]
    col_abc = jnp.stack([plane(cols[ch]) for ch in range(C)],
                        axis=-1)                 # [T, 3, C]

    a = jnp.stack(aa, axis=1)
    b = jnp.stack(bb, axis=1)
    c = jnp.stack(cc, axis=1)
    return TriCoeffs(edge_a=a, edge_b=b, edge_c=c, z_abc=z_abc,
                     w_abc=w_abc, col_abc=col_abc, en_abc=en_abc,
                     valid=valid, zhi=zhi)


def _clip_straddlers(tri_clip: jax.Array, tri_vary: jax.Array):
    """Clip triangles that straddle the eye plane (some w > W_EPS, some
    <= W_EPS) against w = W_CLIP, Sutherland–Hodgman style. Input
    [N, 3, 4]/[N, 3, C]; returns two candidate output triangles per
    input (tri1_clip, tri1_vary, tri2_clip, tri2_vary, valid1, valid2):
    one inside vertex yields one triangle, two yield a quad fan of two.
    Winding (and therefore facing) is preserved — the cyclic vertex
    order of the S-H walk is the input's.

    This reproduces, explicitly, the near-plane clipping the reference
    gets from fixed-function GPU hardware (``Renderer/Pipeline.zig:
    137-161``); triangles fully in front still skip this path entirely
    (the clipless 2DH method needs no clipping for w > 0, see module
    docstring)."""
    f32 = jnp.float32
    w = tri_clip[..., 3]
    inside = w > W_EPS                               # [N, 3]
    n_in = inside.sum(-1)                            # [N]

    # rotate vertex order so the pattern is canonical:
    #   n_in == 1 -> (in, out, out), rotation = inside vertex index
    #   n_in == 2 -> (out, in, in),  rotation = outside vertex index
    r = jnp.where(n_in == 1, jnp.argmax(inside, -1),
                  jnp.argmax(~inside, -1))           # [N]
    idx = (r[:, None] + jnp.arange(3)) % 3           # [N, 3]
    v = jnp.take_along_axis(tri_clip, idx[..., None], 1)   # [N, 3, 4]
    a = jnp.take_along_axis(tri_vary, idx[..., None], 1)   # [N, 3, C]

    def intersect(i, j):
        wi, wj = v[:, i, 3], v[:, j, 3]
        t = (f32(W_CLIP) - wi) / (wj - wi)
        t = jnp.clip(t, 0.0, 1.0)[:, None]
        return (v[:, i] + t * (v[:, j] - v[:, i]),
                a[:, i] + t[..., :1] * (a[:, j] - a[:, i]))

    i01c, i01v = intersect(0, 1)   # crossing on edge (rot0, rot1)
    i20c, i20v = intersect(2, 0)   # crossing on edge (rot2, rot0)

    one_in = (n_in == 1)[:, None, None]
    # n_in==1: [v0, I01, I20]; n_in==2: quad [I01, v1, v2, I20] fanned
    tri1_clip = jnp.where(one_in,
                          jnp.stack([v[:, 0], i01c, i20c], 1),
                          jnp.stack([i01c, v[:, 1], v[:, 2]], 1))
    tri1_vary = jnp.where(one_in,
                          jnp.stack([a[:, 0], i01v, i20v], 1),
                          jnp.stack([i01v, a[:, 1], a[:, 2]], 1))
    tri2_clip = jnp.stack([i01c, v[:, 2], i20c], 1)
    tri2_vary = jnp.stack([i01v, a[:, 2], i20v], 1)
    valid1 = (n_in == 1) | (n_in == 2)
    valid2 = n_in == 2
    return tri1_clip, tri1_vary, tri2_clip, tri2_vary, valid1, valid2


def select_straddlers(tri_clip: jax.Array, tri_vary: jax.Array,
                      valid: jax.Array, cap: int):
    """Eye-plane straddler extraction + Sutherland–Hodgman clip, WITHOUT
    touching the main arrays.

    Gathers up to ``cap`` straddling triangles (any vertex at
    w <= W_EPS while another is in front — exactly the set
    triangle_setup's w_ok drops) in submission order and clips each to
    <= 2 triangles. Returns (app_clip [2cap, 3, 4], app_vary
    [2cap, 3, C], app_valid bool[2cap], sel i32[cap] source indices,
    overflow bool[]) — the appendee block alone; callers append it
    after the (unmodified) main batch, so the main [T, 3, 4] arrays are
    never copied (a pair of ~1 ms whole-array relayouts per megatriangle
    batch in the previous concatenating formulation). ``overflow`` set
    when more than ``cap`` triangles straddle (Draw reacts like
    big-list overflow: bump and re-render)."""
    planar = isinstance(tri_clip, PlanarTris)
    if planar:
        T = tri_clip.count
        wk = [tri_clip.clip[k][3] for k in range(3)]     # 3 x [T]
        some_in = ((wk[0] > W_EPS) | (wk[1] > W_EPS)
                   | (wk[2] > W_EPS))
        some_out = ((wk[0] <= W_EPS) | (wk[1] <= W_EPS)
                    | (wk[2] <= W_EPS))
    else:
        T = tri_clip.shape[0]
        w = tri_clip[..., 3]
        some_in = (w > W_EPS).any(-1)
        some_out = (w <= W_EPS).any(-1)
    straddle = valid & some_in & some_out

    tri_idx = jnp.arange(T, dtype=jnp.int32)
    order = jnp.where(straddle, tri_idx, T)
    sel = jnp.sort(order)
    if T < cap:
        sel = jnp.concatenate([sel, jnp.full(cap - T, T, jnp.int32)])
    sel = sel[:cap]
    sel_live = sel < T
    sel = jnp.minimum(sel, max(T - 1, 0))
    overflow = straddle.sum(dtype=jnp.int32) > cap

    if planar:
        # straddler extraction is tiny (<= cap rows): gather each flat
        # plane at sel and assemble small interleaved [cap, 3, *]
        # blocks for the S-H clipper
        sel_clip = jnp.stack(
            [jnp.stack([tri_clip.clip[k][ch][sel] for ch in range(4)],
                       axis=-1) for k in range(3)], axis=1)
        sel_vary = jnp.stack(
            [jnp.stack([tri_clip.vary[k][ch][sel]
                        for ch in range(tri_clip.channels)],
                       axis=-1) for k in range(3)], axis=1)
    else:
        sel_clip = tri_clip[sel]
        sel_vary = tri_vary[sel]
    (t1c, t1v, t2c, t2v, v1, v2) = _clip_straddlers(sel_clip, sel_vary)
    app_clip = jnp.concatenate([t1c, t2c])
    app_vary = jnp.concatenate([t1v, t2v])
    app_valid = jnp.concatenate([v1 & sel_live, v2 & sel_live])
    return app_clip, app_vary, app_valid, sel, overflow


def clip_near_capacity(tri_clip: jax.Array, tri_vary: jax.Array,
                       valid: jax.Array, cap: int,
                       z_bias: jax.Array | None = None,
                       cull_codes: jax.Array | None = None):
    """Eye-plane clipping stage with a static capacity: the clipped
    appendees of :func:`select_straddlers` concatenated after the main
    batch. Returns (tri_clip [T+2cap, 3, 4], tri_vary, valid,
    z_bias | None, cull_codes | None, overflow bool[]) — clipped
    fragments inherit their source triangle's z_bias / cull code.
    Appending moves clipped fragments to the end of the submission
    order; only exact depth ties against later triangles can observe
    this. (The pallas frame program uses :func:`select_straddlers`
    directly and appends only packed rows; this concatenating wrapper
    serves the oracle path and the standalone sharding API.)
    """
    app_clip, app_vary, app_valid, sel, overflow = select_straddlers(
        tri_clip, tri_vary, valid, cap)
    if isinstance(tri_clip, PlanarTris):
        half = app_clip.shape[0] // 2
        out_clip = tri_clip.concat(
            PlanarTris.from_interleaved(app_clip[:half], app_vary[:half]),
            PlanarTris.from_interleaved(app_clip[half:], app_vary[half:]))
        out_vary = None
    else:
        out_clip = jnp.concatenate([tri_clip, app_clip])
        out_vary = jnp.concatenate([tri_vary, app_vary])
    out_valid = jnp.concatenate([valid, app_valid])
    if z_bias is not None:
        zb = z_bias[sel]
        z_bias = jnp.concatenate([z_bias, zb, zb])
    if cull_codes is not None:
        cc = cull_codes[sel]
        cull_codes = jnp.concatenate([cull_codes, cc, cc])
    return out_clip, out_vary, out_valid, z_bias, cull_codes, overflow


def pack_coeffs(tc: TriCoeffs) -> jax.Array:
    """Pack the pass-1 (visibility) coefficients into f32[T, COEFF_LANES]
    for streaming into the Pallas kernel."""
    return jnp.concatenate([
        jnp.stack([tc.edge_a[:, 0], tc.edge_b[:, 0], tc.edge_c[:, 0],
                   tc.edge_a[:, 1], tc.edge_b[:, 1], tc.edge_c[:, 1],
                   tc.edge_a[:, 2], tc.edge_b[:, 2], tc.edge_c[:, 2]],
                  axis=1),
        tc.z_abc, tc.w_abc,
        tc.zhi[:, None],
    ], axis=1)


# full-pack layout: [0:16] = pack_coeffs lanes, [16] = triangle id,
# [17:20] = varying denominator plane (sum e), [20:32] = varying
# numerator planes, (a, b, c) per channel, 4 channels.
FULL_LANES = 32


def pack_coeffs_full(tc: TriCoeffs, base: int = 0,
                     ids: jax.Array | None = None,
                     lanes: int = FULL_LANES) -> jax.Array:
    """f32[T, FULL_LANES]: visibility lanes + triangle id + varying
    interpolation planes, for single-pass rasterize+shade kernels.
    Varyings must be 4 channels (the FragPass color contract,
    ``Pipeline.zig:12-32``). ``base`` offsets the id lane — batches
    packed separately and concatenated into one raster pass carry their
    GLOBAL submission rank there (it is the kernel's depth-tie rank and
    winner index; exact up to 2^24 in f32). ``ids`` (i32[T], optional)
    overrides the per-batch rank with an explicit permutation — for
    producers that emit triangles out of submission order
    (:class:`PlanarTris` ``ids``); must be a permutation of [0, T) so
    appendee blocks at ``base + T`` never collide.

    ``lanes`` > FULL_LANES zero-pads the records to that lane width IN
    the pack itself. The raster path gathers its row stream from a
    128-lane table (wide-row gathers are ~5x faster, BASELINE.md), and
    a separate pad op costs a full table read+write — while an f32
    [T, 32] array is ALREADY (8, 128)-lane-tiled physically in HBM, so
    packing wide writes the same physical bytes and the pad is free."""
    T = tc.en_abc.shape[0]
    if tc.col_abc.shape[-1] != 4:
        raise ValueError("full pack requires exactly 4 varying channels")
    rank = (jnp.arange(T, dtype=jnp.float32) if ids is None
            else ids.astype(jnp.float32))
    ids = rank[:, None] + jnp.float32(base)
    col = tc.col_abc            # [T, 3, 4]
    col_flat = jnp.concatenate([col[:, :, ch] for ch in range(4)],
                               axis=1)                  # [T, 12]
    parts = [pack_coeffs(tc), ids, tc.en_abc, col_flat]
    if lanes > FULL_LANES:
        parts.append(jnp.zeros((T, lanes - FULL_LANES), jnp.float32))
    return jnp.concatenate(parts, axis=1)


def edge_is_top_left(a: jax.Array, b: jax.Array) -> jax.Array:
    """Top-left fill rule for interior-positive edges in y-down pixel
    space: a zero edge value is covered iff the edge is a 'left' edge
    (a > 0, i.e. the winding travels upward) or a 'top' edge (exactly
    horizontal, a == 0, traveling rightward: b > 0). Guarantees shared
    edges between adjacent triangles are covered exactly once."""
    return (a > 0) | ((a == 0) & (b > 0))


# Top-left fill-rule epsilon: the smallest NORMAL f32. A top-left edge
# passes coverage at e == 0 via e > -eps; a non-top-left edge stays
# strict (e > 0, where the -0.0 threshold compares equal to 0).
# ``e > -eps`` is exactly equivalent to the earlier ``(e + eps) > 0``
# spelling at EVERY f32 e: they can only differ where e + eps rounds,
# and for |e| <= eps (eps = the smallest normal) the sum is exact, so
# both sides flip at precisely e == -eps. Exactly the classical rule
# at every representable non-subnormal e (including -0.0); the only
# divergence from an exact-zero compare is subnormal negative e on a
# top-left edge — a value the TPU VPU flushes to -0.0 anyway, so this
# spelling is MORE consistent between the CPU oracle and hardware, and
# a threshold compare is 1 (rows, pixels) vector op per edge instead
# of the add-then-compare's 2. A doubly-covered shared-edge pixel
# (both triangles within eps) is resolved deterministically by the id
# depth tie-break.
_TL_EPS = 1.17549435e-38


def coverage_depth(tc_row_px, px, py, row_mask=None):
    """Evaluate one triangle's coverage mask and depth over a pixel grid.

    ``tc_row_px`` is a tuple of per-triangle scalars
    (a0,b0,c0,a1,b1,c1,a2,b2,c2, zna,znb,znc, wna,wnb,wnc, valid).
    ``px``/``py`` are pixel-center coordinate grids (any broadcastable
    shape). Returns (covered: bool, z: f32) with z in NDC depth.

    ``row_mask`` (optional, row-shaped bool): rows that can never cover
    (dead chunk slots in the Pallas kernel). It is folded into the edge
    THRESHOLD (+inf on dead rows) together with the ``zhi > 0``
    validity test, so the fold costs row-shaped ops only — the kernel's
    inner loop drops two (rows, pixels) mask ANDs. Pure boolean
    algebra: the returned ``cov`` is bit-identical to masking after.

    This is THE shared decision rule: both rasterizer backends call it.
    """
    (a0, b0, c0, a1, b1, c1, a2, b2, c2,
     zna, znb, znc, wna, wnb, wnc, zhi) = tc_row_px
    f32 = jnp.float32
    # per-row fill-rule thresholds (broadcast against the pixel grid);
    # lane 15 ('zhi') doubles as the validity flag (0 = padded/culled),
    # folded into edge 0's threshold as +inf (no e satisfies e > inf)
    row_ok = zhi > 0
    if row_mask is not None:
        row_ok = row_ok & row_mask
    th0 = jnp.where(row_ok,
                    edge_is_top_left(a0, b0).astype(f32) * f32(-_TL_EPS),
                    f32(jnp.inf))
    th1 = edge_is_top_left(a1, b1).astype(f32) * f32(-_TL_EPS)
    th2 = edge_is_top_left(a2, b2).astype(f32) * f32(-_TL_EPS)
    e0 = a0 * px + b0 * py + c0
    e1 = a1 * px + b1 * py + c1
    e2 = a2 * px + b2 * py + c2
    cov = (e0 > th0) & (e1 > th1) & (e2 > th2)
    zn = zna * px + znb * py + znc
    wn = wna * px + wnb * py + wnc
    z = zn / wn
    # the triangle's depth window: z in [zhi - 1, zhi]. For plain
    # surfaces the window is [0, 1]; for layer-biased merged surfaces
    # it enforces each layer's near/far clip.
    #
    # No explicit wn > 0 test (2 fewer (rows, pixels) ops in the
    # kernel's hottest loop): at edge-covered pixels wn = sum e_k w_k
    # is a sum of nonneg-times-positive terms — every valid triangle
    # has all w_k > W_EPS (triangle_setup w_ok; eye-plane straddlers
    # are clipped to w >= W_CLIP first), and coverage bounds each e_k
    # above -_TL_EPS (the smallest normal), so wn > -3e-38 * max_w.
    # The only reachable non-positive wn is a subnormal-scale corner
    # (all three |e_k| < _TL_EPS simultaneously), where z = zn / wn is
    # NaN or a wild ratio: NaN fails both window compares below, and
    # the wild-ratio-lands-in-window case needs every edge value
    # within 1e-38 of zero — not representable for real scene
    # coefficients. Both backends share this rule, so oracle/kernel
    # stay bit-identical by construction.
    cov = cov & (z >= zhi - 1.0) & (z <= zhi)
    return cov, z


def depth_test_update(cov, z, depth, winner, tri_index):
    """Depth 'less' compare (Pipeline.zig:150-154) against the running
    depth buffer; ties keep the earlier triangle (submission order), which
    both backends guarantee by iterating triangles in order."""
    win = cov & (z < depth)
    return (jnp.where(win, z, depth),
            jnp.where(win, jnp.int32(tri_index), winner))


def resolve_varyings(tc: TriCoeffs, winner: jax.Array,
                     px: jax.Array, py: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pass 2: for each pixel, interpolate the winning triangle's
    varyings (perspective-correct). Returns (varyings f32[H,W,C],
    covered bool[H,W])."""
    covered = winner >= 0
    t = jnp.maximum(winner, 0)
    col_abc = tc.col_abc[t]                      # [H, W, 3, C]
    en_abc = tc.en_abc[t]                        # [H, W, 3]
    en = (en_abc[..., 0] * px + en_abc[..., 1] * py + en_abc[..., 2])
    cn = (col_abc[..., 0, :] * px[..., None]
          + col_abc[..., 1, :] * py[..., None]
          + col_abc[..., 2, :])
    varp = cn / en[..., None]
    return varp, covered


def pixel_grids(height: int, width: int, y0: int = 0, x0: int = 0):
    """Pixel-center coordinate grids for a (height, width) region whose
    top-left pixel is (x0, y0)."""
    py = (jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
          + jnp.float32(y0) + 0.5)
    px = (jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
          + jnp.float32(x0) + 0.5)
    return px, py
