"""Runtime entity lifecycle (reference parity: Scene::CreateEntity /
DestroyEntity with id recycling Scene.cpp:21-83, SetParent Scene.cpp:354-393)
— spawn/despawn/reparent mid-run WITHOUT recompiling the traced-static step."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from banggameengine_tpu.ecs.lifecycle import free_slots, is_alive
from banggameengine_tpu.engine import make_hot_reloadable_step_fn
from banggameengine_tpu.physics.config import load_physics_config
from banggameengine_tpu.scene import ResourceManager, build_scene, parse_scene_json
from banggameengine_tpu.state import InputFrame

ASSETS = os.environ.get("BANG_ASSETS_DIR", "/root/reference/assets")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets not mounted"
)


@pytest.fixture
def demo():
    desc = parse_scene_json(os.path.join(ASSETS, "scenes/demo.json"))
    res = ResourceManager(assets_root=ASSETS)
    cfg = load_physics_config(os.path.join(ASSETS, "config/physics.json"))
    # capacity 16: room to spawn beyond the demo's 3 entities
    return build_scene(desc, res, cfg, capacity=16, max_trigger_slots=2)


def test_spawn_dynamic_box_no_recompile(demo):
    fn = make_hot_reloadable_step_fn()
    state = demo.initial_state
    for _ in range(10):
        state, _ = fn(state, InputFrame.zero(), demo.static)
    n_compiles = fn._cache_size()

    state, box = demo.spawn(
        state, name="crate", pos=(3.0, 5.0, 3.0),
        collider={"shape": "box", "size": (0.5, 0.5, 0.5)},
        rigid_body={"type": "dynamic", "mass": 2.0},
    )
    assert is_alive(state, box)
    assert demo.find_entity("crate") == box
    for _ in range(300):
        state, _ = fn(state, InputFrame.zero(), demo.static)
    # crate fell from y=5 and rests on the ground box (top y=0.99 + half 0.5)
    y = float(state.pos[box, 1])
    assert abs(y - 1.49) < 0.05, y
    assert fn._cache_size() == n_compiles, "spawn must not recompile"


def test_despawn_and_id_recycling(demo):
    fn = make_hot_reloadable_step_fn()
    state = demo.initial_state
    state, a = demo.spawn(state, pos=(2.0, 3.0, 0.0),
                          collider={"shape": "box", "size": (0.5, 0.5, 0.5)},
                          rigid_body={"type": "dynamic", "mass": 1.0})
    n_free = len(free_slots(state))
    state = demo.despawn(state, a)
    assert not is_alive(state, a)
    assert len(free_slots(state)) == n_free + 1
    # lowest-free-first recycling (Scene.cpp:21-41)
    state, b = demo.spawn(state, pos=(0.0, 3.0, 2.0),
                          collider={"shape": "box", "size": (0.5, 0.5, 0.5)},
                          rigid_body={"type": "dynamic", "mass": 1.0})
    assert b == a
    for _ in range(60):
        state, _ = fn(state, InputFrame.zero(), demo.static)
    assert float(state.pos[b, 1]) < 3.0  # recycled slot simulates


def test_despawned_body_stops_colliding(demo):
    fn = make_hot_reloadable_step_fn()
    state = demo.initial_state
    # a static shelf above the ground, and a box resting on it
    state, shelf = demo.spawn(
        state, pos=(0.0, 3.0, 5.0),
        collider={"shape": "box", "size": (2.0, 0.25, 2.0)},
        rigid_body={"type": "static"},
    )
    state, box = demo.spawn(
        state, pos=(0.0, 4.0, 5.0),
        collider={"shape": "box", "size": (0.5, 0.5, 0.5)},
        rigid_body={"type": "dynamic", "mass": 1.0},
    )
    for _ in range(240):
        state, _ = fn(state, InputFrame.zero(), demo.static)
    assert abs(float(state.pos[box, 1]) - 3.75) < 0.05  # resting on shelf
    state = demo.despawn(state, shelf)
    for _ in range(300):
        state, _ = fn(state, InputFrame.zero(), demo.static)
    # shelf gone -> box fell through to the ground box
    assert abs(float(state.pos[box, 1]) - 1.49) < 0.05


def test_spawned_trigger_fires(demo):
    fn = make_hot_reloadable_step_fn()
    state = demo.initial_state
    state, t = demo.spawn(
        state, name="zone", pos=(0.0, 2.0, 0.0),
        trigger={"shape": "box", "size": (1.0, 1.0, 1.0), "layer": 4},
    )
    state, box = demo.spawn(
        state, pos=(0.0, 6.0, 0.0),
        collider={"shape": "box", "size": (0.3, 0.3, 0.3)},
        rigid_body={"type": "dynamic", "mass": 1.0},
    )
    entered = False
    for _ in range(300):
        state, ev = fn(state, InputFrame.zero(), demo.static)
        slot = int(np.nonzero(np.asarray(demo.static.trig_entity) == t)[0][0])
        if bool(ev.trigger_enter[slot, box]):
            entered = True
            break
    assert entered, "falling box should enter the spawned trigger zone"


def test_reparent_no_recompile(demo):
    fn = make_hot_reloadable_step_fn()
    state = demo.initial_state
    state, a = demo.spawn(state, name="anchor", pos=(4.0, 2.0, 0.0))
    state, child = demo.spawn(state, name="gadget", pos=(1.0, 0.0, 0.0))
    state, _ = fn(state, InputFrame.zero(), demo.static)
    n_compiles = fn._cache_size()
    # as a root, world position == local position
    np.testing.assert_allclose(
        np.asarray(state.world[child][:3, 3]), [1.0, 0.0, 0.0], atol=1e-5)

    demo.reparent(state, child, "anchor")
    state, _ = fn(state, InputFrame.zero(), demo.static)
    # local kept, world re-derived under the parent
    np.testing.assert_allclose(
        np.asarray(state.world[child][:3, 3]), [5.0, 2.0, 0.0], atol=1e-5)
    assert fn._cache_size() == n_compiles, "reparent must not recompile"

    demo.reparent(state, child, None)
    state, _ = fn(state, InputFrame.zero(), demo.static)
    np.testing.assert_allclose(
        np.asarray(state.world[child][:3, 3]), [1.0, 0.0, 0.0], atol=1e-5)


def test_despawn_detaches_children(demo):
    state = demo.initial_state
    state, parent = demo.spawn(state, name="rig", pos=(2.0, 2.0, 2.0))
    state, child = demo.spawn(state, name="limb", pos=(1.0, 0.0, 0.0),
                              parent="rig")
    state = demo.despawn(state, parent)
    # child became a root (Scene.cpp:67-76)
    assert int(np.asarray(demo.static.parent)[child]) == -1
    assert is_alive(state, child)
    assert demo.find_entity("rig") == -1


def test_reparent_cycle_rejected(demo):
    state = demo.initial_state
    state, a = demo.spawn(state, name="a")
    state, b = demo.spawn(state, name="b", parent="a")
    demo.reparent(state, a, b)  # would create a cycle
    assert int(np.asarray(demo.static.parent)[a]) == -1


def test_capacity_exhaustion_raises(demo):
    state = demo.initial_state
    while len(free_slots(state)) > 0:
        state, _ = demo.spawn(state, pos=(0.0, 50.0, 0.0))
    with pytest.raises(RuntimeError, match="capacity"):
        demo.spawn(state, pos=(0.0, 60.0, 0.0))
