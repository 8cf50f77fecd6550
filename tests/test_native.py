"""Native C++ OBJ loader: bit-parity with the Python reference loader."""

import os
import textwrap

import numpy as np
import pytest

from banggameengine_tpu.native import build_native, load_obj_native
from banggameengine_tpu.scene.obj_loader import load_obj

REF_ASSETS = "/root/reference/assets"
HAVE_REF = os.path.isdir(REF_ASSETS)

pytestmark = pytest.mark.skipif(
    build_native() is None, reason="native toolchain unavailable"
)


def assert_mesh_parity(native, python):
    assert native.num_vertices == python.num_vertices
    np.testing.assert_allclose(native.positions, python.positions, atol=1e-6)
    np.testing.assert_allclose(native.normals, python.normals, atol=1e-5)
    np.testing.assert_allclose(native.uvs, python.uvs, atol=1e-6)
    assert len(native.submeshes) == len(python.submeshes)
    for a, b in zip(native.submeshes, python.submeshes):
        assert (a.start_index, a.index_count, a.material_index) == (
            b.start_index, b.index_count, b.material_index,
        )
    assert [m.name for m in native.materials] == [m.name for m in python.materials]
    for a, b in zip(native.materials, python.materials):
        np.testing.assert_allclose(a.kd, b.kd, atol=1e-6)


def test_native_simple_parity(tmp_path):
    (tmp_path / "m.mtl").write_text("newmtl red\nKd 0.9 0.1 0.2\nmap_Kd tex.png\n")
    obj = tmp_path / "t.obj"
    obj.write_text(
        textwrap.dedent(
            """
            mtllib m.mtl
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            vt 0 0
            vt 1 0
            vt 1 1
            vt 0 1
            usemtl red
            f 1/1 2/2 3/3 4/4
            f 1 3 2
            """
        )
    )
    nat = load_obj_native(str(obj))
    py = load_obj(str(obj))
    assert nat is not None
    assert_mesh_parity(nat, py)
    # MTL texture path joined with directory
    assert nat.materials[0].map_kd.endswith("tex.png")


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_native_demo_obj_parity():
    p = os.path.join(REF_ASSETS, "models/demo.obj")
    nat = load_obj_native(p)
    py = load_obj(p)
    assert nat is not None
    assert nat.num_triangles == 2332
    assert_mesh_parity(nat, py)


@pytest.mark.skipif(not HAVE_REF, reason="reference assets not mounted")
def test_native_is_used_by_resource_manager(monkeypatch):
    from banggameengine_tpu.scene import ResourceManager

    called = {}
    import banggameengine_tpu.native as native_mod

    orig = native_mod.load_obj_native

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(native_mod, "load_obj_native", spy)
    res = ResourceManager(assets_root=REF_ASSETS)
    mesh = res.load_mesh("models/plane.obj")
    assert mesh is not None and called.get("yes")


def test_missing_file_returns_none():
    assert load_obj_native("/nonexistent/x.obj") is None
