"""RenderSystem: explicit submit-style render path.

The reference ships ``src/ecs/RenderSystem.{h,cpp}`` (iterate MeshRenderers
-> ``Renderer::SubmitMeshLit``) even though its main path lets the renderer
self-iterate the scene (``Renderer.cpp:601-730``; SURVEY.md notes the system
is dead code on the main path).  We keep the same API surface for parity:
:func:`gather_submissions` produces the per-(entity, submesh) draw list the
submit path would issue, and :func:`render_submissions` renders exactly that
subset — useful for partial redraws and tooling even though
``render_frame`` remains the fused fast path.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class Submission:
    """One SubmitMeshLit-equivalent draw (entity, triangle range, material)."""

    entity: int
    tri_start: int
    tri_count: int
    material: int


def gather_submissions(render_scene) -> list[Submission]:
    """Host-side: enumerate the draw list from the baked render soup."""
    tri_entity = np.asarray(render_scene.v_entity)[::3]
    tri_material = np.asarray(render_scene.tri_material)
    tri_valid = np.asarray(render_scene.tri_valid)

    subs: list[Submission] = []
    start = 0
    n = len(tri_material)
    for i in range(1, n + 1):
        boundary = (
            i == n
            or tri_entity[i] != tri_entity[start]
            or tri_material[i] != tri_material[start]
            or tri_valid[i] != tri_valid[start]
        )
        if boundary:
            if tri_valid[start]:
                subs.append(
                    Submission(
                        entity=int(tri_entity[start]),
                        tri_start=start,
                        tri_count=i - start,
                        material=int(tri_material[start]),
                    )
                )
            start = i
    return subs


def render_submissions(
    render_scene, submissions, world_mats, view, proj, camera_pos,
    width: int, height: int, **kwargs,
):
    """Render only the given submissions (mask every other triangle)."""
    from banggameengine_tpu.render.pipeline import render_frame

    mask = np.zeros(render_scene.tri_material.shape[0], bool)
    for s in submissions:
        mask[s.tri_start: s.tri_start + s.tri_count] = True

    masked_scene = dataclasses.replace(
        render_scene, tri_valid=render_scene.tri_valid & jnp.asarray(mask)
    )
    return render_frame(
        masked_scene, world_mats, view, proj, camera_pos,
        width=width, height=height, **kwargs,
    )
