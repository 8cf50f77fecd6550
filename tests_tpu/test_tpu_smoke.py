"""TPU smoke tests: real Mosaic kernels + tunnel dispatch, tiny shapes.

Covers what the CPU suite structurally cannot (tests/conftest.py forces the
virtual CPU mesh, so Pallas runs interpret-mode there): the Mosaic compile
path of the broadphase and raster kernels, and one fused interactive tick
on the chip.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="needs an accelerator backend (axon/tpu)",
)

ASSETS = os.environ.get("BANG_ASSETS_DIR", "/root/reference/assets")


@tpu
def test_pallas_broadphase_matches_interpret():
    """Compiled Mosaic broadphase == interpret-mode golden on 64 bodies."""
    from banggameengine_tpu.physics.broadphase_pallas import (
        neighbor_lists_pallas,
    )
    from banggameengine_tpu.scene.synthetic import build_falling_boxes

    state, static = build_falling_boxes(64, seed=7, spread=6.0)
    solid = state.alive
    is_dyn = solid
    args = (state.pos, state.quat, static.shape_type, static.shape_size,
            solid, is_dyn, static.layer, static.mask)
    nl_tpu = neighbor_lists_pallas(*args, max_neighbors=8, interpret=False)
    nl_gold = neighbor_lists_pallas(*args, max_neighbors=8, interpret=True)

    def pair_sets(nl):
        idx = np.asarray(nl.idx)
        val = np.asarray(nl.valid)
        out = []
        for i in range(idx.shape[0]):
            out.append(frozenset(int(j) for j, v in zip(idx[i], val[i]) if v))
        return out

    assert pair_sets(nl_tpu) == pair_sets(nl_gold)


@tpu
def test_pallas_raster_matches_xla_on_chip():
    """Mosaic-compiled tile raster == XLA raster (same visibility buffer)."""
    from banggameengine_tpu.render import raster as rz

    # two overlapping triangles covering a couple of tiles
    tris = np.asarray([
        [(-0.8, -0.8, 0.5, 1.0), (0.8, -0.8, 0.5, 1.0), (0.0, 0.8, 0.5, 1.0)],
        [(-0.5, -0.5, 0.3, 1.0), (0.5, -0.5, 0.3, 1.0), (0.0, 0.5, 0.3, 1.0)],
    ], np.float32)
    clip = jnp.asarray(tris.reshape(-1, 4))
    valid = jnp.ones(2, bool)
    vis_x, _ = rz.rasterize(clip, valid, 256, 64, backend="xla")
    vis_p, _ = rz.rasterize(clip, valid, 256, 64, backend="pallas")
    np.testing.assert_array_equal(np.asarray(vis_p.tri_id),
                                  np.asarray(vis_x.tri_id))
    np.testing.assert_allclose(np.asarray(vis_p.depth),
                               np.asarray(vis_x.depth), atol=1e-6)


@tpu
@pytest.mark.skipif(not os.path.isdir(ASSETS), reason="needs demo assets")
def test_frame_fn_dispatch_on_chip():
    """One fused interactive tick (step + small shaded frame) on the chip."""
    import math

    from banggameengine_tpu.physics.config import load_physics_config
    from banggameengine_tpu.render.camera import Camera
    from banggameengine_tpu.render.pipeline import make_frame_fn
    from banggameengine_tpu.scene import (
        ResourceManager, build_scene, parse_scene_json,
    )
    from banggameengine_tpu.state import InputFrame

    built = build_scene(
        parse_scene_json(os.path.join(ASSETS, "scenes/demo.json")),
        ResourceManager(assets_root=ASSETS),
        load_physics_config(os.path.join(ASSETS, "config/physics.json")),
    )
    cam = Camera()
    cam.position[:] = (0.0, 4.0, -10.5)
    cam.set_yaw_pitch(math.pi / 2, -0.12)
    view = jnp.asarray(cam.view_matrix())
    proj = jnp.asarray(cam.proj_matrix(160 / 90))
    ffn = make_frame_fn(built, 160, 90, bin_capacity=256)
    s = jax.tree.map(jnp.array, built.initial_state)
    s, img, ev = ffn(s, InputFrame.zero(), view, proj,
                     jnp.asarray(cam.position))
    img = np.asarray(img)
    assert img.shape == (90, 160, 4)
    assert tuple(img[0, 0, :3]) == (0x88, 0xAA, 0xFF)  # sky clear
    assert float(s.time) > 0.0


@tpu
def test_flat_manyworld_matches_vmapped_on_chip():
    """Flat block-diagonal many-world == vmapped path on the real chip
    (tiny: 4 worlds, 10 steps)."""
    from banggameengine_tpu.parallel.manyworld import (
        make_flat_many_world_step, make_sharded_many_world_step,
        make_world_mesh, replicate_input, replicate_state,
    )
    from banggameengine_tpu.scene.synthetic import build_falling_boxes
    from banggameengine_tpu.state import InputFrame

    state, static = build_falling_boxes(
        8, with_character=True, with_trigger=True)
    w = 4
    bs = replicate_state(state, w)
    bi = replicate_input(InputFrame.zero(), w)
    mesh = make_world_mesh(jax.devices()[:1])
    s_v = make_sharded_many_world_step(static, mesh, num_steps=10)
    s_f = make_flat_many_world_step(static, w, state.comp_mask,
                                    num_steps=10)
    o1 = s_v(jax.tree.map(jnp.array, bs), bi)
    o2 = s_f(jax.tree.map(jnp.array, bs), bi)
    np.testing.assert_allclose(np.asarray(o1.pos), np.asarray(o2.pos),
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(o1.trigger_overlap),
                                  np.asarray(o2.trigger_overlap))
