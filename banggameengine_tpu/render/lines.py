"""Debug-line rasterization over a rendered frame.

Replaces the reference's transient-vertex-buffer line pass
(``Renderer::DrawDebugLines``, ``Renderer.cpp:430-493``: ``PT_LINES`` state
with WRITE_RGB|WRITE_Z|DEPTH_TEST_LESS): 3D segments are projected, clipped
to the near plane, sampled at fixed parametric steps, and composited into the
framebuffer with a depth test against the scene's visibility depth.

Line volume is debug-scale (hundreds), so a scatter composite is fine here —
this is an overlay pass, not the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

SAMPLES_PER_LINE = 128


def draw_lines(
    frame: Array,        # u8[H,W,4]
    depth: Array,        # f32[H,W] scene NDC depth
    points: Array,       # f32[L,2,3] world-space segment endpoints
    colors: Array,       # f32[L,4]
    valid: Array,        # bool[L]
    view: Array, proj: Array,
    depth_bias: float = 1e-4,
) -> Array:
    """Composite colored 3D lines into ``frame`` (returns new u8[H,W,4])."""
    h, w = frame.shape[:2]
    vp = jnp.matmul(proj, view, preferred_element_type=jnp.float32)
    p4 = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    clip = jnp.einsum("ij,lkj->lki", vp, p4)             # [L,2,4]

    # near-plane clip per segment (z_clip >= 0)
    za, zb = clip[:, 0, 2], clip[:, 1, 2]
    both_out = (za < 0) & (zb < 0)
    t_cross = za / jnp.where(jnp.abs(za - zb) > 1e-12, za - zb, 1e-12)
    a_out = za < 0
    b_out = zb < 0
    pa = jnp.where(
        a_out[:, None],
        clip[:, 0] + (clip[:, 1] - clip[:, 0]) * t_cross[:, None],
        clip[:, 0],
    )
    pb = jnp.where(
        b_out[:, None],
        clip[:, 0] + (clip[:, 1] - clip[:, 0]) * t_cross[:, None],
        clip[:, 1],
    )
    ok = valid & ~both_out

    ts = jnp.linspace(0.0, 1.0, SAMPLES_PER_LINE)
    pts = pa[:, None, :] + (pb - pa)[:, None, :] * ts[None, :, None]  # [L,S,4]
    wclip = jnp.maximum(pts[..., 3], 1e-6)
    ndc = pts[..., :3] / wclip[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * w
    sy = (1.0 - (ndc[..., 1] * 0.5 + 0.5)) * h
    sz = ndc[..., 2]

    xi = jnp.floor(sx).astype(jnp.int32)
    yi = jnp.floor(sy).astype(jnp.int32)
    on = (
        ok[:, None]
        & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        & (sz >= 0.0) & (sz <= 1.0)
    )
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)

    # depth test LESS against the scene (small bias so coplanar wireframes win)
    scene_z = depth[yi, xi]
    passes = on & (sz <= scene_z + depth_bias)

    rgba = (jnp.clip(colors, 0, 1) * 255).astype(jnp.uint8)      # [L,4]
    rgba_s = jnp.broadcast_to(rgba[:, None, :], (colors.shape[0], SAMPLES_PER_LINE, 4))

    flat = frame.reshape(h * w, 4)
    lin = (yi * w + xi).reshape(-1)
    src = rgba_s.reshape(-1, 4)
    m = passes.reshape(-1)
    # masked scatter: route rejected samples to a dummy slot
    lin = jnp.where(m, lin, h * w)
    flat = jnp.concatenate([flat, jnp.zeros((1, 4), frame.dtype)], axis=0)
    flat = flat.at[lin].set(src, mode="drop")
    return flat[: h * w].reshape(h, w, 4)
