"""Pallas tile-raster kernel: bit-parity with the XLA raster path
(interpret mode on CPU; the TPU path is exercised by bench.py cull/frame)."""

import numpy as np
import jax.numpy as jnp
import pytest

from banggameengine_tpu import math3d
from banggameengine_tpu.render import raster as rz

RNG = np.random.default_rng(42)


def _random_scene(t, seed=0):
    rng = np.random.default_rng(seed)
    view = math3d.mtx_look_at(
        jnp.asarray([0.0, 1.5, -6.0]), jnp.asarray([0.0, 0.5, 0.0])
    )
    proj = math3d.mtx_proj(60.0, 320 / 180, 0.1, 100.0)
    verts = rng.uniform(-3, 3, (t * 3, 3)).astype(np.float32)
    vp = np.asarray(math3d.mat_mul(proj, view))
    v4 = np.concatenate([verts, np.ones((t * 3, 1), np.float32)], 1)
    return jnp.asarray((vp @ v4.T).T), jnp.ones(t, bool)


@pytest.mark.parametrize("seed,t", [(0, 50), (1, 200), (2, 7)])
def test_pallas_matches_xla(seed, t):
    clip, valid = _random_scene(t, seed)
    vis_x, ov_x = rz.rasterize(clip, valid, 320, 180, backend="xla")
    vis_p, ov_p = rz.rasterize(clip, valid, 320, 180,
                               backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(vis_x.tri_id),
                                  np.asarray(vis_p.tri_id))
    np.testing.assert_allclose(np.asarray(vis_x.depth),
                               np.asarray(vis_p.depth), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vis_x.bary),
                               np.asarray(vis_p.bary), atol=1e-5)
    assert int(ov_x) == int(ov_p)


def test_pallas_near_clip_scene():
    # triangles crossing the camera plane (ground-quad shape)
    view = math3d.mtx_look_at(jnp.asarray([0.0, 1.0, 0.0]),
                              jnp.asarray([0.0, 1.0, 1.0]))
    proj = math3d.mtx_proj(60.0, 16 / 9, 0.1, 100.0)
    verts = np.array(
        [[-50, 0, -50], [50, 0, -50], [0, 0, 50],
         [-5, 0.5, 2], [5, 0.5, 2], [0, 0.5, 8]], np.float32)
    vp = np.asarray(math3d.mat_mul(proj, view))
    v4 = np.concatenate([verts, np.ones((6, 1), np.float32)], 1)
    clip = jnp.asarray((vp @ v4.T).T)
    valid = jnp.ones(2, bool)
    vis_x, _ = rz.rasterize(clip, valid, 256, 128, backend="xla")
    vis_p, _ = rz.rasterize(clip, valid, 256, 128,
                            backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(vis_x.tri_id),
                                  np.asarray(vis_p.tri_id))
