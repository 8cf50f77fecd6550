"""Scene/asset pipeline tests: OBJ loader, scene schema, demo.json build.

The demo scene fixture is the reference's own (read-only mount at
/root/reference/assets); tests that need it are skipped when absent so the
suite stays hermetic elsewhere.
"""

import os
import textwrap

import numpy as np
import pytest

from banggameengine_tpu.physics.config import PhysicsConfig, load_physics_config
from banggameengine_tpu.scene import ResourceManager, build_scene, parse_scene_json
from banggameengine_tpu.scene.obj_loader import load_obj, make_cube, make_ground_plane
from banggameengine_tpu import state as st

REF_ASSETS = "/root/reference/assets"
HAVE_REF = os.path.isdir(REF_ASSETS)
needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")


# ---------------------------------------------------------------------------
# OBJ loader
# ---------------------------------------------------------------------------

def test_obj_loader_simple(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        textwrap.dedent(
            """
            v 0 0 0
            v 1 0 0
            v 0 1 0
            vt 0 0
            vt 1 0
            vt 0 1
            f 1/1 2/2 3/3
            """
        )
    )
    mesh = load_obj(str(obj))
    assert mesh.num_vertices == 3
    assert mesh.num_triangles == 1
    # no normals in file -> face normal computed (+Z)
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 3, atol=1e-6)
    # v-flip default on
    np.testing.assert_allclose(mesh.uvs, [[0, 1], [1, 1], [0, 0]], atol=1e-6)


def test_obj_loader_quad_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    mesh = load_obj(str(obj))
    assert mesh.num_triangles == 2  # fan triangulation
    assert mesh.num_vertices == 6  # unshared corners


def test_obj_loader_submesh_partition(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 1 0 0\nnewmtl blue\nKd 0 0 1\n"
    )
    obj = tmp_path / "two.obj"
    obj.write_text(
        textwrap.dedent(
            """
            mtllib m.mtl
            v 0 0 0
            v 1 0 0
            v 0 1 0
            usemtl red
            f 1 2 3
            usemtl blue
            f 1 3 2
            usemtl red
            f 2 1 3
            """
        )
    )
    mesh = load_obj(str(obj))
    # contiguous ranges per material, first-seen order: red(2 tris), blue(1)
    assert len(mesh.submeshes) == 2
    assert mesh.submeshes[0].material_index == 0
    assert mesh.submeshes[0].index_count == 6
    assert mesh.submeshes[1].material_index == 1
    assert mesh.submeshes[1].index_count == 3
    assert mesh.materials[0].kd == (1.0, 0.0, 0.0)


def test_builtin_meshes():
    cube = make_cube()
    assert cube.num_triangles == 12
    plane = make_ground_plane()
    assert plane.num_triangles == 2
    assert float(plane.uvs.max()) == 50.0


@needs_ref
def test_reference_demo_obj():
    mesh = load_obj(os.path.join(REF_ASSETS, "models/demo.obj"))
    # SURVEY: 2,332 faces -> 6,996 unshared corners, 4 material groups
    assert mesh.num_triangles == 2332
    assert mesh.num_vertices == 6996
    assert len(mesh.submeshes) == 4
    names = [mesh.materials[s.material_index].name for s in mesh.submeshes]
    assert set(names) == {"head", "legs", "shoes", "torso"}


# ---------------------------------------------------------------------------
# Physics config
# ---------------------------------------------------------------------------

@needs_ref
def test_physics_config_parsing():
    cfg = load_physics_config(os.path.join(REF_ASSETS, "config/physics.json"))
    assert cfg.gravity == pytest.approx(-9.81)
    assert cfg.fixed_step == pytest.approx(1 / 120, rel=1e-4)
    assert cfg.capsule_radius == pytest.approx(0.65)
    assert cfg.capsule_height == pytest.approx(2.6)
    assert cfg.walk_speed == pytest.approx(3.6)
    assert cfg.jump_impulse == pytest.approx(8.5)


def test_physics_config_fallback(tmp_path):
    bad = tmp_path / "physics.json"
    bad.write_text("{ nope")
    prev = PhysicsConfig(gravity=-5.0)
    cfg = load_physics_config(str(bad), previous=prev)
    assert cfg.gravity == -5.0
    # fixedStep <= 0 sanitized to 1/120
    bad.write_text('{"fixedStep": -1}')
    cfg = load_physics_config(str(bad))
    assert cfg.fixed_step == pytest.approx(1 / 120, rel=1e-4)


# ---------------------------------------------------------------------------
# Scene schema + build
# ---------------------------------------------------------------------------

@needs_ref
def test_parse_demo_scene():
    desc = parse_scene_json(os.path.join(REF_ASSETS, "scenes/demo.json"))
    assert len(desc.entities) == 3
    cj = desc.find("cj")
    assert cj is not None and cj.name == "CJ"
    np.testing.assert_allclose(cj.transform.position, [0, 7, -5])
    np.testing.assert_allclose(cj.transform.scale, [0.05] * 3)
    assert cj.mesh_renderer.material_overrides == {
        0: "mat_head", 1: "mat_legs", 2: "mat_shoes", 3: "mat_torso"
    }
    ground = desc.find("ground")
    assert ground.collider.shape == "box"
    np.testing.assert_allclose(ground.collider.size, [50, 1, 50])
    assert ground.rigid_body.type == "static"
    assert ground.rigid_body.friction == 1.0
    cp = desc.find("checkpoint")
    assert cp.trigger is not None
    np.testing.assert_allclose(cp.trigger.size, [1.5] * 3)
    assert cp.trigger.layer == 4
    assert not cp.trigger.one_shot


def test_capsule_collider_parsing(tmp_path):
    scene = tmp_path / "s.json"
    scene.write_text(
        """
        {"entities": [{"id": "c", "collider":
            {"shape": "capsule", "radius": 0.5, "height": 2.0}}]}
        """
    )
    desc = parse_scene_json(str(scene))
    c = desc.find("c")
    # radius, half_height (SceneLoader.cpp:222-230)
    np.testing.assert_allclose(c.collider.size, [0.5, 1.0, 0.0])


def test_children_and_parent_refs(tmp_path):
    scene = tmp_path / "s.json"
    scene.write_text(
        """
        {"entities": [
            {"id": "root", "children": [{"id": "kid"}]},
            {"id": "other", "parent": "root"}
        ]}
        """
    )
    desc = parse_scene_json(str(scene))
    assert desc.find("kid").parent == "root"
    assert desc.find("other").parent == "root"


@needs_ref
def test_build_demo_scene():
    desc = parse_scene_json(os.path.join(REF_ASSETS, "scenes/demo.json"))
    res = ResourceManager(assets_root=REF_ASSETS)
    cfg = load_physics_config(os.path.join(REF_ASSETS, "config/physics.json"))
    built = build_scene(desc, res, cfg)

    # entity counts (Application.cpp:334-341 parity)
    assert built.counts["entities"] == 3
    assert built.counts["mesh_renderers"] == 2
    assert built.counts["triggers"] == 1
    assert built.counts["characters"] == 1  # auto-attached to "cj"

    cj = built.find_entity("cj")
    assert cj >= 0
    s = built.static
    # character capsule from config, kinematic, character layer
    assert int(s.body_type[cj]) == st.BODY_KINEMATIC
    assert int(s.shape_type[cj]) == st.SHAPE_CAPSULE
    np.testing.assert_allclose(
        np.asarray(s.shape_size[cj]), [0.65, 1.3, 0.0], atol=1e-6
    )
    assert int(s.layer[cj]) == st.LAYER_CHARACTER

    ground = built.find_entity("ground")
    assert int(s.body_type[ground]) == st.BODY_STATIC
    np.testing.assert_allclose(np.asarray(s.shape_size[ground]), [50, 1, 50])

    # trigger slot 0 -> checkpoint
    cp = built.find_entity("checkpoint")
    assert int(s.trig_entity[0]) == cp
    np.testing.assert_allclose(np.asarray(s.trig_size[0]), [1.5] * 3)

    # initial world matrices: cj at (0,7,-5)
    w = np.asarray(built.initial_state.world)
    np.testing.assert_allclose(w[cj][:3, 3], [0, 7, -5], atol=1e-6)

    # render soup: 2332 (cj) + 2 (plane) triangles, padded to multiple of 128
    r = built.render
    n_real_tris = int(np.asarray(r.tri_valid).sum())
    assert n_real_tris == 2334
    assert r.num_triangles % 128 == 0
    # 4 submesh overrides resolved: exactly the 4 scene materials + ground
    mats_used = set(np.asarray(r.tri_material)[np.asarray(r.tri_valid)].tolist())
    assert len(mats_used) == 5
    # textures decoded (5 scene textures + white + MTL dups cached)
    assert r.textures.shape[0] >= 5
    assert r.textures.shape[1] == 256  # padded to max size


@needs_ref
def test_resource_cache_hits():
    res = ResourceManager(assets_root=REF_ASSETS)
    a = res.load_texture("models/head.png")
    b = res.load_texture("models/head.png")
    assert a is b
    assert res.tex_stats.hits == 1 and res.tex_stats.misses == 1
    assert res.load_texture("missing.png") is res.get_checker_texture()
    stats = res.print_stats()
    assert "textures" in stats
