"""Localize oracle-vs-pallas winner divergences at demo 128x128 (CPU).

For each differing pixel, print the winning triangle id per backend
(Renderer.debug_winner buffers) and the shaded colors. Used to diagnose
the round-3 direct-z-plane experiment: every divergence sat on the
terrain SILHOUETTE (grazing triangles), where the z plane's 1/det
coefficient blowup amplified cross-program 1-ulp FMA wobble into
depth-window failures — the pallas frame dropped coverage (winner -1)
the oracle kept. See BASELINE.md "batch 5" for the full verdict.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
     python tools/debug_parity.py
"""
import numpy as np

from myrenderer_tpu.app.demo import DemoApp


def main():
    apps = {}
    fbs = {}
    for backend in ("oracle", "pallas"):
        app = DemoApp(width=128, height=128, backend=backend)
        app.renderer.debug_winner = True
        fbs[backend] = np.asarray(app.run(2))
        apps[backend] = app
    diff = np.abs(fbs["oracle"] - fbs["pallas"]).max(-1)
    ys, xs = np.nonzero(diff > 5e-4)
    print(f"differing pixels: {len(ys)}")
    w_o = [np.asarray(w) for w in apps["oracle"].draw.last_winners]
    w_p = [np.asarray(w) for w in apps["pallas"].draw.last_winners]
    print("oracle winner buffers:", [w.shape for w in w_o])
    print("pallas winner buffers:", [w.shape for w in w_p])
    for y, x in list(zip(ys, xs))[:16]:
        o_ids = [int(w[y, x]) for w in w_o]
        p_ids = [int(w[y, x]) for w in w_p]
        print(f"px ({y},{x}): oracle={o_ids} pallas={p_ids} "
              f"rgba_o={fbs['oracle'][y, x]} rgba_p={fbs['pallas'][y, x]}")


if __name__ == "__main__":
    main()
