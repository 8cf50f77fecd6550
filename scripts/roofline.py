"""Roofline analysis of the headline configs (VERDICT r2 item 4).

For each headline program this prints XLA's compiled cost analysis (FLOPs,
HBM bytes accessed), the time each v5e bound implies, the measured time,
and the implied %-of-roofline.  v5e (lite, 1 chip) peaks used:

  HBM   819 GB/s          (the usual bound for this engine's programs)
  MXU   197 TFLOP/s bf16 / ~49 TFLOP/s f32
  VPU   ~ 4 TFLOP/s f32   (8x128 lanes x 4 ALUs x ~940 MHz)

Methodology note: ``cost_analysis()`` reports optimized-HLO totals;
"bytes accessed" counts each buffer use (it can exceed unique bytes when
ops re-read), which is exactly what the HBM bound wants.  Measured times
use the queued-dispatch methodology (``utils.profiling``).

Usage: python scripts/roofline.py [manyworld|stress|frame|demo] ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BPS = 819e9
MXU_F32 = 49e12
VPU_F32 = 4e12


def report(name, compiled, measured_s, per_call_divisor=1.0):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0) / per_call_divisor
    byts = ca.get("bytes accessed", 0.0) / per_call_divisor
    t = measured_s / per_call_divisor
    t_hbm = byts / HBM_BPS
    t_vpu = flops / VPU_F32
    print(f"\n== {name} ==")
    print(f"  flops/call          {flops/1e9:10.3f} GFLOP")
    print(f"  bytes accessed/call {byts/1e9:10.3f} GB")
    print(f"  arithmetic intensity {flops/max(byts,1):9.2f} FLOP/byte")
    print(f"  HBM-bound time      {t_hbm*1e3:10.3f} ms")
    print(f"  VPU-bound time      {t_vpu*1e3:10.3f} ms (f32 vector est.)")
    print(f"  measured            {t*1e3:10.3f} ms")
    print(f"  % of HBM roofline   {100*t_hbm/max(t,1e-12):9.1f} %")
    bound = "HBM" if t_hbm > t_vpu else "VPU"
    tb = max(t_hbm, t_vpu)
    print(f"  % of max(H,V) bound {100*tb/max(t,1e-12):9.1f} %  ({bound})")
    return {"flops": flops, "bytes": byts, "measured": t,
            "hbm_pct": 100 * t_hbm / max(t, 1e-12)}


def roofline_manyworld(num_worlds=1000, bodies=8, steps=50):
    import jax

    from banggameengine_tpu.parallel import (
        make_sharded_many_world_step, make_world_mesh,
        replicate_input, replicate_state,
    )
    from banggameengine_tpu.parallel.manyworld import shard_batched
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame
    from banggameengine_tpu.utils.profiling import measure_throughput_chained

    state, static = build_falling_boxes(
        bodies, with_character=True, with_trigger=True)
    mesh = make_world_mesh()
    bstate = shard_batched(replicate_state(state, num_worlds), mesh)
    binp = shard_batched(replicate_input(InputFrame.zero(), num_worlds), mesh)
    layout = os.environ.get("BANG_MW_LAYOUT", "flat")
    if layout == "flat":
        from banggameengine_tpu.parallel.manyworld import (
            make_flat_many_world_step,
        )

        step = make_flat_many_world_step(
            static, num_worlds, state.comp_mask, num_steps=steps,
            mesh=mesh if len(jax.devices()) > 1 else None)
    else:
        step = make_sharded_many_world_step(static, mesh, num_steps=steps)
    t, bstate = measure_throughput_chained(step, bstate, binp,
                                           calls=5, warmup=2)
    bound = step.bound_static
    bound = bound if isinstance(bound, tuple) else (bound,)
    compiled = step.jitted.lower(bstate, binp, *bound).compile()
    # divide by steps: per single lockstep step of all worlds
    return report(f"manyworld {num_worlds}x{bodies}+char+trig ({layout}, "
                  "per lockstep step)", compiled, t, per_call_divisor=steps)


def roofline_stress(num_bodies=10000, steps=50):
    import jax

    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame
    from banggameengine_tpu.utils.profiling import measure_throughput_chained

    state, static = build_falling_boxes(num_bodies)
    run = make_multi_step_fn(static, steps, broadphase="pallas",
                             max_neighbors=8)
    inp = InputFrame.zero()
    t, state = measure_throughput_chained(run, state, inp, calls=4, warmup=2)
    compiled = run.jitted.lower(state, inp, run.bound_static).compile()
    return report(f"stress {num_bodies} boxes (per step)", compiled, t,
                  per_call_divisor=steps)


def roofline_frame(width=1920, height=1080, shade_mode=None):
    import functools

    import jax
    import jax.numpy as jnp

    from banggameengine_tpu.render.camera import Camera
    from banggameengine_tpu.render.pipeline import render_frame
    from banggameengine_tpu.utils.profiling import measure_throughput

    sys.path.insert(0, "/root/repo")
    from bench import _load_built_demo

    built = _load_built_demo()
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(3.14159 / 2, -0.12)
    kw = dict(width=width, height=height, bin_capacity=2048)
    if shade_mode:
        kw["shade_mode"] = shade_mode
    fn = jax.jit(functools.partial(render_frame, **kw))
    rs = jax.device_put(built.render)
    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame

    settle = make_multi_step_fn(built.static, 480)
    settled = settle(jax.tree.map(jnp.array, built.initial_state),
                     InputFrame.zero())
    settled = settled[0] if isinstance(settled, tuple) else settled
    args = (rs, jax.device_put(settled.world),
            jax.device_put(jnp.asarray(cam.view_matrix())),
            jax.device_put(jnp.asarray(cam.proj_matrix(width / height))),
            jax.device_put(jnp.asarray(cam.position)))
    t = measure_throughput(fn, *args, calls=10, warmup=2)
    compiled = fn.lower(*args).compile()
    return report(f"shaded frame {width}x{height} "
                  f"({shade_mode or 'default'})", compiled, t)


def roofline_demo(steps=100):
    import jax

    from banggameengine_tpu.engine import make_multi_step_fn
    from banggameengine_tpu.state import InputFrame
    from banggameengine_tpu.utils.profiling import measure_throughput_chained

    from __graft_entry__ import _load_demo_scene

    state, static = _load_demo_scene()
    run = make_multi_step_fn(static, steps)
    inp = InputFrame.zero()
    t, state = measure_throughput_chained(run, state, inp, calls=5, warmup=2)
    compiled = run.jitted.lower(state, inp, run.bound_static).compile()
    return report("demo scene (per engine step)", compiled, t,
                  per_call_divisor=steps)


CONFIGS = {
    "manyworld": roofline_manyworld,
    "stress": roofline_stress,
    "frame": roofline_frame,
    "demo": roofline_demo,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["manyworld"]
    for n in names:
        CONFIGS[n]()
