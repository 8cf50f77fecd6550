"""Transform hierarchy propagation vs a recursive NumPy golden."""

import numpy as np
import jax
import jax.numpy as jnp

from banggameengine_tpu import math3d
from banggameengine_tpu.ecs import compute_levels, update_world_matrices

RNG = np.random.default_rng(7)


def np_local(scale, euler, pos):
    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    m = np.eye(4)
    m[:3, :3] = rz(euler[2]) @ ry(euler[1]) @ rx(euler[0]) @ np.diag(scale)
    m[:3, 3] = pos
    return m


def golden_worlds(parent, alive, scale, euler, pos):
    n = len(parent)
    local = [np_local(scale[i], euler[i], pos[i]) for i in range(n)]
    world = [None] * n

    def solve(i):
        if world[i] is not None:
            return world[i]
        p = parent[i]
        if p < 0 or not alive[p]:
            world[i] = local[i]
        else:
            world[i] = solve(p) @ local[i]
        return world[i]

    for i in range(n):
        if alive[i]:
            solve(i)
        else:
            world[i] = np.eye(4)
    return np.stack(world)


def make_random_hierarchy(n, p_child=0.7):
    parent = np.full(n, -1, np.int32)
    for i in range(1, n):
        if RNG.uniform() < p_child:
            parent[i] = RNG.integers(0, i)
    alive = np.ones(n, bool)
    scale = RNG.uniform(0.5, 2.0, (n, 3)).astype(np.float32)
    euler = RNG.uniform(-np.pi, np.pi, (n, 3)).astype(np.float32)
    pos = RNG.normal(size=(n, 3)).astype(np.float32) * 3
    return parent, alive, scale, euler, pos


def run_device(parent, alive, scale, euler, pos):
    levels = compute_levels(parent, alive)
    quat = math3d.quat_from_euler_xyz(jnp.asarray(euler))
    return np.asarray(
        update_world_matrices(
            jnp.asarray(pos), quat, jnp.asarray(scale),
            jnp.asarray(parent), jnp.asarray(levels), jnp.asarray(alive),
        )
    )


def test_flat_scene_world_equals_local():
    parent, alive, scale, euler, pos = make_random_hierarchy(8, p_child=0.0)
    w = run_device(parent, alive, scale, euler, pos)
    g = golden_worlds(parent, alive, scale, euler, pos)
    np.testing.assert_allclose(w, g, atol=1e-4)


def test_deep_chain():
    n = 16
    parent = np.arange(-1, n - 1, dtype=np.int32)  # 0<-1<-2...
    alive = np.ones(n, bool)
    scale = np.ones((n, 3), np.float32)
    euler = np.zeros((n, 3), np.float32)
    euler[:, 1] = 0.1  # small yaw per link
    pos = np.tile(np.array([1.0, 0, 0], np.float32), (n, 1))
    w = run_device(parent, alive, scale, euler, pos)
    g = golden_worlds(parent, alive, scale, euler, pos)
    np.testing.assert_allclose(w, g, atol=1e-4)


def test_random_hierarchies():
    for _ in range(5):
        parent, alive, scale, euler, pos = make_random_hierarchy(64)
        w = run_device(parent, alive, scale, euler, pos)
        g = golden_worlds(parent, alive, scale, euler, pos)
        np.testing.assert_allclose(w, g, atol=2e-4)


def test_dead_parent_treated_as_root():
    parent = np.array([-1, 0, 1], np.int32)
    alive = np.array([False, True, True])
    scale = np.ones((3, 3), np.float32)
    euler = np.zeros((3, 3), np.float32)
    pos = np.array([[5, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32)
    levels = compute_levels(parent, alive)
    # entity 1's parent (0) is dead -> level 0 root; entity 2 level 1
    assert 1 in levels[0]
    w = run_device(parent, alive, scale, euler, pos)
    np.testing.assert_allclose(w[1][:3, 3], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(w[2][:3, 3], [2, 0, 0], atol=1e-6)


def test_vmap_over_worlds():
    parent, alive, scale, euler, pos = make_random_hierarchy(32)
    levels = compute_levels(parent, alive)
    quat = math3d.quat_from_euler_xyz(jnp.asarray(euler))
    W = 4
    batched_pos = jnp.tile(jnp.asarray(pos)[None], (W, 1, 1))
    batched_pos = batched_pos + jnp.arange(W, dtype=jnp.float32)[:, None, None]
    fn = jax.vmap(
        lambda p: update_world_matrices(
            p, quat, jnp.asarray(scale), jnp.asarray(parent),
            jnp.asarray(levels), jnp.asarray(alive),
        )
    )
    out = np.asarray(fn(batched_pos))
    for wi in range(W):
        g = golden_worlds(parent, alive, scale, euler, np.asarray(batched_pos[wi]))
        np.testing.assert_allclose(out[wi], g, atol=2e-4)
