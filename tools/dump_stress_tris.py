#!/usr/bin/env python
"""Dump the stress scene's post-vertex-stage triangle batch to an .npz
so kernel benchmarks (tools/kbench.py --load) run on the REAL triangle
distribution (perspective terrain: a long tail of tiny distant
triangles plus large near ones), not synthetic uniforms.

Runs entirely on CPU (vertex stage is plain XLA).

Usage: python tools/dump_stress_tris.py [--out /tmp/stress_tris.npz]
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stress_tris.npz")
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--terrain", type=int, default=708)
    ap.add_argument("--instances", type=int, default=10000)
    ap.add_argument("--t", type=float, default=0.35,
                    help="camera orbit angle (elapsed_time)")
    args = ap.parse_args()

    from myrenderer_tpu.app.stress import StressApp
    from myrenderer_tpu.renderer import draw as drawmod
    from myrenderer_tpu.ops import vertex_stage as vstage

    w, h = (int(v) for v in args.size.split("x"))
    app = StressApp(width=w, height=h, terrain_size=args.terrain,
                    instances=args.instances, backend="oracle")
    # advance the camera to the benchmark angle
    import math
    from myrenderer_tpu import math3d
    r = 1.1 * app._bound
    cam = (r * math.cos(args.t), 0.9 * app._bound + 6.0,
           r * math.sin(args.t))
    app.terrain.set_xform(
        math3d.look_at(cam, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)))

    app.draw.begin()
    app.draw.clear((0.259, 0.141, 0.271, 1.0))
    app.draw.draw_surface(app.surface)
    plan = app.draw._get_plan(app.window)
    fargs = app.draw._gather_args(plan, app.window)
    world = vstage.compose_world_transforms(fargs["locals"], plan.levels,
                                            plan.parents)
    products = drawmod._batch_vertex_products(plan, fargs, world)
    from myrenderer_tpu.ops.raster_common import PlanarTris

    def interleave(tri_clip, tri_vary):
        """PlanarTris (tuples of flat [T] planes) -> [T, 3, 4] arrays
        (the npz format kbench --load consumes)."""
        clip = jnp.stack([jnp.stack(c, axis=-1) for c in tri_clip.clip],
                         axis=1)
        vary = jnp.stack([jnp.stack(c, axis=-1) for c in tri_clip.vary],
                         axis=1)
        return clip, vary

    clips, varys, valids = [], [], []
    for _s, _b, tri_clip, tri_vary, valid in products:
        if isinstance(tri_clip, PlanarTris):
            tri_clip, tri_vary = interleave(tri_clip, tri_vary)
        clips.append(tri_clip)
        varys.append(tri_vary)
        valids.append(jnp.broadcast_to(valid, tri_clip.shape[:1]))
    tri_clip = np.asarray(jnp.concatenate(clips), np.float32)
    tri_vary = np.asarray(jnp.concatenate(varys), np.float32)
    valid = np.asarray(jnp.concatenate(valids), bool)
    np.savez_compressed(args.out, tri_clip=tri_clip, tri_vary=tri_vary,
                        valid=valid, width=w, height=h)
    # quick distribution stats: pixel-space bbox areas of valid tris
    wc = np.maximum(tri_clip[..., 3], 1e-6)
    u = (0.5 * tri_clip[..., 0] / wc + 0.5) * w
    v = (0.5 - 0.5 * tri_clip[..., 1] / wc) * h
    infront = (tri_clip[..., 3] > 1e-6).all(-1) & valid
    bw = u.max(1) - u.min(1)
    bh = v.max(1) - v.min(1)
    area = (bw * bh)[infront]
    print(f"T={tri_clip.shape[0]} valid={valid.sum()} "
          f"in-front={infront.sum()}")
    print("bbox-area percentiles (px^2):",
          {p: float(np.percentile(area, p))
           for p in (10, 50, 90, 99, 99.9)})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
