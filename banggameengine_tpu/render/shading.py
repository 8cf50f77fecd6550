"""Deferred Blinn-Phong shading of the visibility buffer.

Reproduces the reference's fragment shader **exactly**
(``assets/shaders/fs_basic.sc:19-36``):

    N = normalize(worldNormal); L = normalize(-lightDir)
    V = normalize(cameraPos - worldPos); H = normalize(L + V)
    base = tex.rgb * vertexColor.rgb * baseTint.rgb
    lit  = ambient + lightColor * max(dot(N, L), 0)
    spec = pow(max(dot(N, H), 0), shininess) * specIntensity
    rgb  = base * lit + specColor * spec

with the renderer's global shininess/specIntensity forced over the material
copy (``Renderer.cpp:657-659``) and light direction from yaw/pitch
(``Renderer.cpp:514-522``: dir = (cy*cp, sp, sy*cp)).  Defaults: ambient 0.5,
lightColor white, shininess 32, specIntensity 0.35 (``Renderer.h:120-122``).

Because shading is deferred, each of the H*W pixels is shaded exactly once —
the per-pixel material math and texture gathers never run on occluded
fragments.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array

CLEAR_COLOR = (0x88 / 255.0, 0xAA / 255.0, 0xFF / 255.0)  # Renderer.cpp:161


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LightParams:
    """Directional light + global material overrides (host-tweakable, the
    arrow-key light controls at ``Application.cpp:161-245``)."""

    yaw: Array      # f32[]
    pitch: Array    # f32[]
    color: Array    # f32[3]
    ambient: Array  # f32[]
    shininess: Array       # f32[] global override
    spec_intensity: Array  # f32[] global override

    @staticmethod
    def default() -> "LightParams":
        return LightParams(
            yaw=jnp.float32(0.0),
            pitch=jnp.float32(0.0),
            color=jnp.ones(3, jnp.float32),
            ambient=jnp.float32(0.5),
            shininess=jnp.float32(32.0),
            spec_intensity=jnp.float32(0.35),
        )

    def direction(self) -> Array:
        cy, sy = jnp.cos(self.yaw), jnp.sin(self.yaw)
        cp, sp = jnp.cos(self.pitch), jnp.sin(self.pitch)
        return jnp.stack([cy * cp, sp, sy * cp])


def sample_texture_bilinear_quad(textures_quad: Array, tex_size: Array,
                                 tex_id: Array, uv: Array) -> Array:
    """Bilinear sampling with ONE gather per pixel.

    ``textures_quad`` u8[T,S,S,16] packs each texel's wrap-correct 2x2
    neighborhood (built at scene load), so the four bilinear taps arrive in
    a single row-gather; only the weights are computed here.
    """
    wh = tex_size[tex_id].astype(jnp.float32)
    w, h = wh[..., 0], wh[..., 1]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    x0i = wrap(x0, w)
    y0i = wrap(y0, h)
    quad = textures_quad[tex_id, y0i, x0i].astype(jnp.float32) / 255.0
    c00, c01 = quad[..., 0:4], quad[..., 4:8]
    c10, c11 = quad[..., 8:12], quad[..., 12:16]
    top = c00 + (c01 - c00) * tx[..., None]
    bot = c10 + (c11 - c10) * tx[..., None]
    return top + (bot - top) * ty[..., None]


def sample_texture_bilinear(textures: Array, tex_size: Array, tex_id: Array,
                            uv: Array) -> Array:
    """Bilinear, wrap-repeat texture sampling.

    textures: u8[T, S, S, 4] (padded square atlas pages);
    tex_size: i32[T, 2] actual (w, h); tex_id: i32[...]; uv: f32[..., 2].
    Returns f32[..., 4] in [0, 1].
    """
    wh = tex_size[tex_id].astype(jnp.float32)          # [..., 2]
    w, h = wh[..., 0], wh[..., 1]
    # wrap repeat, texel centers at integer+0.5 (matching D3D point of view)
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    x0i, x1i = wrap(x0, w), wrap(x0 + 1, w)
    y0i, y1i = wrap(y0, h), wrap(y0 + 1, h)

    def fetch(yi, xi):
        return textures[tex_id, yi, xi].astype(jnp.float32) / 255.0

    c00 = fetch(y0i, x0i)
    c01 = fetch(y0i, x1i)
    c10 = fetch(y1i, x0i)
    c11 = fetch(y1i, x1i)
    top = c00 + (c01 - c00) * tx[..., None]
    bot = c10 + (c11 - c10) * tx[..., None]
    return top + (bot - top) * ty[..., None]


def shade_visibility(
    vis_tri_id: Array,    # i32[H,W]
    vis_bary: Array,      # f32[H,W,2]
    # per-vertex attributes (V = 3*T)
    world_pos: Array,     # f32[V,3]
    world_nrm: Array,     # f32[V,3]
    v_uv: Array,          # f32[V,2]
    inv_w: Array,         # f32[V]
    tri_material: Array,  # i32[T]
    # material tables
    mat_base_tint: Array, mat_uv_scale: Array, mat_spec_params: Array,
    mat_spec_color: Array, mat_tex: Array,
    textures: Array, tex_size: Array,
    camera_pos: Array,    # f32[3]
    light: LightParams,
    wireframe: bool = False,
    textures_quad: Array | None = None,
) -> Array:
    """Shade every pixel of the visibility buffer.  Returns u8[H,W,4].

    ``wireframe=True`` keeps only pixels near triangle edges (barycentric
    proximity), the F1 wireframe toggle (``Renderer.cpp:766-783``
    BGFX_DEBUG_WIREFRAME equivalent)."""
    h, w = vis_tri_id.shape
    tid = jnp.maximum(vis_tri_id, 0)
    i0 = tid * 3
    b1 = vis_bary[..., 0]
    b2 = vis_bary[..., 1]
    b0 = 1.0 - b1 - b2

    # pack ALL per-triangle attributes into one row (3 corners x 9) so the
    # per-pixel fetch is a SINGLE row-gather
    packed = jnp.concatenate(
        [world_pos, world_nrm, v_uv, inv_w[:, None]], axis=-1
    )                                                  # [V, 9]
    packed_tri = packed.reshape(-1, 27)                # [T, 27]
    a_all = packed_tri[tid]                            # [H,W,27]
    a0 = a_all[..., 0:9]
    a1 = a_all[..., 9:18]
    a2 = a_all[..., 18:27]

    iw0, iw1, iw2 = a0[..., 8], a1[..., 8], a2[..., 8]
    w0 = b0 * iw0
    w1 = b1 * iw1
    w2 = b2 * iw2
    persp_den = w0 + w1 + w2
    inv_den = 1.0 / jnp.where(jnp.abs(persp_den) > 1e-12, persp_den, 1e-12)
    interp_all = (
        a0 * w0[..., None] + a1 * w1[..., None] + a2 * w2[..., None]
    ) * inv_den[..., None]
    wp = interp_all[..., 0:3]
    nrm = interp_all[..., 3:6]
    uv = interp_all[..., 6:8]

    # material lookups via one-hot contraction (tiny table, no gathers)
    mid = tri_material[tid]                            # [H,W]
    m_count = mat_base_tint.shape[0]
    m_onehot = jax.nn.one_hot(mid, m_count, dtype=jnp.float32)
    mat_packed = jnp.concatenate(
        [mat_base_tint, mat_uv_scale, mat_spec_color,
         mat_tex[:, None].astype(jnp.float32)], axis=-1,
    )                                                  # [M, 10]
    mat_px = jnp.einsum("hwm,mk->hwk", m_onehot, mat_packed)
    px_tint = mat_px[..., 0:4]
    px_uv_scale = mat_px[..., 4:6]
    px_spec_color = mat_px[..., 6:9]
    px_tex_id = mat_px[..., 9].astype(jnp.int32)

    uv = uv * px_uv_scale
    if textures_quad is not None:
        tex = sample_texture_bilinear_quad(textures_quad, tex_size,
                                           px_tex_id, uv)
    else:
        tex = sample_texture_bilinear(textures, tex_size, px_tex_id, uv)

    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    light_dir = light.direction()
    l = -light_dir
    l = l / jnp.maximum(jnp.linalg.norm(l), 1e-9)
    v = camera_pos - wp
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    hvec = l + v
    hvec = hvec / jnp.maximum(jnp.linalg.norm(hvec, axis=-1, keepdims=True), 1e-9)

    diff = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    ndoth = jnp.maximum(jnp.sum(n * hvec, -1), 0.0)
    # global overrides replace per-material shininess/intensity
    # (Renderer.cpp:657-659); per-material spec color is kept
    s = jnp.power(ndoth, light.shininess) * light.spec_intensity

    base = tex[..., :3] * px_tint[..., :3]             # vertex color is white
    lit = light.ambient + light.color * diff[..., None]
    rgb = base * lit + px_spec_color * s[..., None]
    alpha = tex[..., 3] * px_tint[..., 3]

    background = vis_tri_id < 0
    clear = jnp.asarray(CLEAR_COLOR, jnp.float32)
    if wireframe:
        min_bary = jnp.minimum(jnp.minimum(b0, b1), b2)
        on_edge = min_bary < 0.05
        rgb = jnp.where(on_edge[..., None], rgb, clear)
    rgb = jnp.where(background[..., None], clear, rgb)
    alpha = jnp.where(background, 1.0, alpha)

    out = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    return (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
