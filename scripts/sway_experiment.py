"""Measure the tall-tower residual sway (round-4 quality bar experiment).

20-box rotated tower, 5000 steps; report per-box |v| and the post-settle
max.  Bar: max |v| < 0.05 u/s (VERDICT r3 #5).

Usage: python scripts/sway_experiment.py [--iters N] [--steps N]
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--boxes", type=int, default=20)
    args = p.parse_args()

    from test_physics import build_world  # noqa: E402
    import jax.numpy as jnp  # noqa: E402
    from banggameengine_tpu.engine import engine_step  # noqa: E402
    from banggameengine_tpu.state import InputFrame  # noqa: E402

    bodies = []
    for i in range(args.boxes):
        bodies.append({
            "pos": (0, 0.5 + 1.005 * i, 0),
            "size": (0.5, 0.5, 0.5),
            "euler": (0, 0.35 * (i % 2), 0),
            "friction": 0.8,
        })
    state, static = build_world(bodies, capacity=args.boxes + 4)

    @jax.jit
    def run50(s, inp, st):
        def body(c, _):
            s2, _ = engine_step(c, inp, st, args.iters)
            return s2, None
        s, _ = jax.lax.scan(body, s, None, length=50)
        return s

    inp = InputFrame.zero()
    n50 = args.steps // 50
    traj_v = []
    for k in range(n50):
        state = run50(state, inp, static)
        if (k + 1) % 10 == 0:
            v = np.abs(np.asarray(state.lin_vel[:args.boxes])).max(axis=-1)
            traj_v.append((50 * (k + 1), v.max()))
    v = np.linalg.norm(np.asarray(state.lin_vel[:args.boxes]), axis=-1)
    w = np.linalg.norm(np.asarray(state.ang_vel[:args.boxes]), axis=-1)
    ys = np.sort(np.asarray(state.pos[:args.boxes, 1]))
    xz = np.abs(np.asarray(state.pos[:args.boxes, [0, 2]])).max()
    print("per-box |v|:", np.array2string(v, precision=3))
    print("per-box |w|:", np.array2string(w, precision=3))
    print("max|v| trajectory:", [(s, round(float(m), 3)) for s, m in traj_v])
    print(f"FINAL max|v|={v.max():.4f} max|w|={w.max():.4f} "
          f"xz_drift={xz:.3f} layered={np.allclose(ys, 0.5 + np.arange(args.boxes), atol=0.3)}")


if __name__ == "__main__":
    main()
