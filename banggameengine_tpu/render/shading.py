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
    vis_b1: Array,        # f32[H,W] barycentric of vertex 1
    vis_b2: Array,        # f32[H,W] barycentric of vertex 2
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
    textures_quad_t: Array | None = None,
    vis_depth: Array | None = None,   # f32[H,W] NDC z (enables wp
    view: Array | None = None,        # reconstruction from depth — drops
    proj: Array | None = None,        # 9 interpolated channels)
) -> Array:
    """Shade every pixel of the visibility buffer.  Returns u8[H,W,4].

    The math runs in **component form**: every quantity is a flat f32[P]
    vector (P = H*W pixels).  The per-pixel fetch is exactly TWO
    channel-major ``take(..., axis=1)`` gathers — one [39, P] carrying all
    three corners' attributes AND the triangle's resolved material/texture
    parameters (1D gathers cost ~10 ns/element on TPU, so folding material
    id / uv scale / texture size into the per-triangle row eliminates
    three of them), and one [16, P] texel-quad for the bilinear taps.
    Channel-major matters: the gathers land channel-PLANAR, so every
    consumer reads a contiguous [P] row instead of slicing a lane-padded
    [P, C] array (which re-reads 128/C times the data per slice).  An
    optimization barrier pins each gather to run once — XLA otherwise
    fuses gathers into every consumer kernel, re-gathering per use.

    ``wireframe=True`` keeps only pixels near triangle edges (barycentric
    proximity), the F1 wireframe toggle (``Renderer.cpp:766-783``
    BGFX_DEBUG_WIREFRAME equivalent)."""
    h, w = vis_tri_id.shape
    p = h * w
    tid_hw = jnp.maximum(vis_tri_id, 0)
    tid = tid_hw.reshape(p)
    b1 = vis_b1.reshape(p)
    b2 = vis_b2.reshape(p)
    b0 = 1.0 - b1 - b2

    # wp reconstruction from the depth plane (exact for planar triangles:
    # NDC z is affine in screen space) drops 9 interpolated channels; uv
    # is pre-scaled to TEXEL units per corner (bakes the material uv scale
    # AND texture size into the T-sized table), dropping 2 more.
    reconstruct_wp = (vis_depth is not None and view is not None
                      and proj is not None)

    mat_twh = tex_size[mat_tex].astype(jnp.float32)    # [M, 2]
    t = tri_material.shape[0]
    uv_texel = (
        v_uv.reshape(t, 3, 2)
        * (mat_uv_scale * mat_twh)[tri_material][:, None, :]
    ).reshape(t * 3, 2)                                # [V, 2] texel units

    if reconstruct_wp:
        # per-triangle super-row, channel-major [28, T]:
        #   0..17  corner attrs (3 corners x [nrm.xyz, u_tex, v_tex, inv_w])
        #   18..21 material base tint rgba   22..24 material spec color
        #   25     texture id                26..27 texture (w, h)
        packed = jnp.concatenate(
            [world_nrm, uv_texel, inv_w[:, None]], axis=-1
        )                                              # [V, 6]
        packed_tri = packed.reshape(-1, 18)            # [T, 18]
        span, uvo = 6, 3
        m_tint, m_spec, m_tex0, m_tw = 18, 22, 25, 26
    else:
        # [37, T]: 0..26 corners x [wp.xyz, nrm.xyz, u_tex, v_tex, inv_w]
        packed = jnp.concatenate(
            [world_pos, world_nrm, uv_texel, inv_w[:, None]], axis=-1
        )                                              # [V, 9]
        packed_tri = packed.reshape(-1, 27)            # [T, 27]
        span, uvo = 9, 6
        m_tint, m_spec, m_tex0, m_tw = 27, 31, 34, 35
    mat_packed = jnp.concatenate(
        [mat_base_tint, mat_spec_color,
         mat_tex[:, None].astype(jnp.float32), mat_twh], axis=-1,
    )                                                  # [M, 10]
    tri_row_t = jnp.concatenate(
        [packed_tri, mat_packed[tri_material]], axis=-1).T  # [C, T]

    a = jax.lax.optimization_barrier(
        jnp.take(tri_row_t, tid, axis=1))              # [C, P] ONE gather

    iw0, iw1, iw2 = a[span - 1], a[2 * span - 1], a[3 * span - 1]
    w0 = b0 * iw0
    w1 = b1 * iw1
    w2 = b2 * iw2
    persp_den = w0 + w1 + w2
    inv_den = 1.0 / jnp.where(jnp.abs(persp_den) > 1e-12, persp_den, 1e-12)

    def interp(c):
        """Perspective-correct interpolation of per-corner channel c."""
        return (a[c] * w0 + a[c + span] * w1 + a[c + 2 * span] * w2) * inv_den

    if reconstruct_wp:
        # unproject (ndc_x, ndc_y, ndc_z, 1) through inv(proj @ view)
        m = jnp.linalg.inv(jnp.matmul(proj, view))
        px = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(p)
              + 0.5)
        py = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(p)
              + 0.5)
        ndc_x = px * (2.0 / w) - 1.0
        ndc_y = 1.0 - py * (2.0 / h)
        ndc_z = vis_depth.reshape(p)
        hx = m[0, 0] * ndc_x + m[0, 1] * ndc_y + m[0, 2] * ndc_z + m[0, 3]
        hy = m[1, 0] * ndc_x + m[1, 1] * ndc_y + m[1, 2] * ndc_z + m[1, 3]
        hz = m[2, 0] * ndc_x + m[2, 1] * ndc_y + m[2, 2] * ndc_z + m[2, 3]
        hw = m[3, 0] * ndc_x + m[3, 1] * ndc_y + m[3, 2] * ndc_z + m[3, 3]
        inv_hw = 1.0 / jnp.where(jnp.abs(hw) > 1e-12, hw, 1e-12)
        wpx, wpy, wpz = hx * inv_hw, hy * inv_hw, hz * inv_hw
        nx, ny, nz = interp(0), interp(1), interp(2)
    else:
        wpx, wpy, wpz = interp(0), interp(1), interp(2)
        nx, ny, nz = interp(3), interp(4), interp(5)
    u = interp(uvo)
    v = interp(uvo + 1)

    tint_r, tint_g, tint_b, tint_a = (a[m_tint], a[m_tint + 1],
                                      a[m_tint + 2], a[m_tint + 3])
    spec_r, spec_g, spec_b = a[m_spec], a[m_spec + 1], a[m_spec + 2]
    tex_id = a[m_tex0].astype(jnp.int32)
    tex_w, tex_h = a[m_tw], a[m_tw + 1]

    tex_r, tex_g, tex_b, tex_a = _sample_bilinear_planar(
        textures, textures_quad, textures_quad_t, tex_id, tex_w, tex_h, u, v)

    inv_nlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-18))
    nx, ny, nz = nx * inv_nlen, ny * inv_nlen, nz * inv_nlen

    light_dir = light.direction()
    ld = -light_dir
    ld = ld / jnp.maximum(jnp.linalg.norm(ld), 1e-9)
    lx, ly, lz = ld[0], ld[1], ld[2]

    vx = camera_pos[0] - wpx
    vy = camera_pos[1] - wpy
    vz = camera_pos[2] - wpz
    inv_vlen = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-18))
    vx, vy, vz = vx * inv_vlen, vy * inv_vlen, vz * inv_vlen

    hx, hy, hz = lx + vx, ly + vy, lz + vz
    inv_hlen = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-18))
    hx, hy, hz = hx * inv_hlen, hy * inv_hlen, hz * inv_hlen

    diff = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    ndoth = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    # global overrides replace per-material shininess/intensity
    # (Renderer.cpp:657-659); per-material spec color is kept
    s = jnp.power(ndoth, light.shininess) * light.spec_intensity

    lit_r = light.ambient + light.color[0] * diff
    lit_g = light.ambient + light.color[1] * diff
    lit_b = light.ambient + light.color[2] * diff
    rgb_r = tex_r * tint_r * lit_r + spec_r * s       # vertex color is white
    rgb_g = tex_g * tint_g * lit_g + spec_g * s
    rgb_b = tex_b * tint_b * lit_b + spec_b * s
    alpha = tex_a * tint_a

    background = vis_tri_id.reshape(p) < 0
    clear = CLEAR_COLOR
    if wireframe:
        min_bary = jnp.minimum(jnp.minimum(b0, b1), b2)
        on_edge = min_bary < 0.05
        rgb_r = jnp.where(on_edge, rgb_r, clear[0])
        rgb_g = jnp.where(on_edge, rgb_g, clear[1])
        rgb_b = jnp.where(on_edge, rgb_b, clear[2])
    rgb_r = jnp.where(background, clear[0], rgb_r)
    rgb_g = jnp.where(background, clear[1], rgb_g)
    rgb_b = jnp.where(background, clear[2], rgb_b)
    alpha = jnp.where(background, 1.0, alpha)

    def to_u8(x):
        return (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    # single interleave at the very end: [4, P] -> [H, W, 4]
    out = jnp.stack([to_u8(rgb_r), to_u8(rgb_g), to_u8(rgb_b), to_u8(alpha)])
    return out.T.reshape(h, w, 4)


def _sample_bilinear_planar(textures, textures_quad, textures_quad_t,
                            tex_id, tw, th, u, v):
    """Bilinear, wrap-repeat sampling in component form.

    tex_id i32[P], tw/th f32[P] (actual texture size, pre-resolved into the
    per-triangle row), u/v f32[P] in TEXEL units (uv scale and texture size
    are baked per corner at the T-sized table); returns four f32[P] channel
    rows.  With the channel-major quad pack ``textures_quad_t``
    (u8[16, T*S*S], each texel's wrap-correct 2x2 RGBA neighborhood, built
    at scene load) the four bilinear taps arrive in ONE channel-planar
    take; otherwise falls back to four row gathers.
    """
    fx = u - 0.5
    fy = v - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    if textures_quad_t is not None:
        s = textures.shape[1]
        x0i = wrap(x0, tw)
        y0i = wrap(y0, th)
        flat = (tex_id * s + y0i) * s + x0i
        q = jax.lax.optimization_barrier(
            jnp.take(textures_quad_t, flat, axis=1))          # [16, P] u8

        def channel(c):
            c00 = q[c].astype(jnp.float32)
            c01 = q[c + 4].astype(jnp.float32)
            c10 = q[c + 8].astype(jnp.float32)
            c11 = q[c + 12].astype(jnp.float32)
            top = c00 + (c01 - c00) * tx
            bot = c10 + (c11 - c10) * tx
            return (top + (bot - top) * ty) * (1.0 / 255.0)

        return channel(0), channel(1), channel(2), channel(3)

    if textures_quad is not None:
        t, s = textures_quad.shape[0], textures_quad.shape[1]
        x0i = wrap(x0, tw)
        y0i = wrap(y0, th)
        flat = (tex_id * s + y0i) * s + x0i
        quad = textures_quad.reshape(t * s * s, 16)[flat]     # [P, 16]
        q = quad.astype(jnp.float32) * (1.0 / 255.0)

        def channel(c):
            top = q[:, c] + (q[:, c + 4] - q[:, c]) * tx
            bot = q[:, c + 8] + (q[:, c + 12] - q[:, c + 8]) * tx
            return top + (bot - top) * ty

        return channel(0), channel(1), channel(2), channel(3)

    t, s = textures.shape[0], textures.shape[1]
    tex_flat = textures.reshape(t * s * s, 4)
    x0i, x1i = wrap(x0, tw), wrap(x0 + 1.0, tw)
    y0i, y1i = wrap(y0, th), wrap(y0 + 1.0, th)

    def fetch(yi, xi):
        return tex_flat[(tex_id * s + yi) * s + xi].astype(jnp.float32) \
            * (1.0 / 255.0)                                    # [P, 4]

    c00 = fetch(y0i, x0i)
    c01 = fetch(y0i, x1i)
    c10 = fetch(y1i, x0i)
    c11 = fetch(y1i, x1i)

    def channel(c):
        top = c00[:, c] + (c01[:, c] - c00[:, c]) * tx
        bot = c10[:, c] + (c11[:, c] - c10[:, c]) * tx
        return top + (bot - top) * ty

    return channel(0), channel(1), channel(2), channel(3)
