"""Cook-Torrance BRDF and direct lighting, vectorized over pixels.

Exact math ports of pathtraced_fragment_clustered.wgsl:
Trowbridge-Reitz GGX NDF (:537-545), Schlick-GGX geometry with the k-direct
roughness remap (:548-560), Fresnel-Schlick (:563-568), the combined
``surfaceBRDF`` (:570-592) and ``calculateLightingAt`` (:594-633) including
the position-derived rainbow albedo when materialColor == 0 (:598-603).

Divisions follow IEEE like WGSL (the reference's TODO at :586 about the
possibly-zero Cook-Torrance denominator included) — behaviour is replicated,
not sanitized.
"""

from __future__ import annotations

import jax.numpy as jnp

from .intersect import cube_face_normal

__all__ = [
    "trowbridge_reitz_ggx",
    "schlick_ggx",
    "fresnel_schlick",
    "surface_brdf",
    "calculate_lighting_at",
    "calculate_lighting_at_simple",
]

PI = jnp.float32(3.14159265359)  # :65


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def trowbridge_reitz_ggx(surface_normal, halfway, roughness):
    """NDF (pathtraced_fragment_clustered.wgsl:537-545).  Note the
    reference uses a² = roughness² (not the Disney roughness⁴)."""
    a2 = roughness * roughness
    noh = _dot(surface_normal, halfway)
    f = noh * noh * (a2 - 1.0) + 1.0
    return a2 / (PI * f * f)


def schlick_ggx(surface_normal, direction, roughness):
    """Geometry term with k_direct remap (:548-560)."""
    n = roughness + 1.0
    k_direct = (n * n) / 8.0
    nov = jnp.maximum(0.0, _dot(surface_normal, direction))
    return nov / (nov * (1.0 - k_direct) + k_direct)


def fresnel_schlick(halfway, view_dir, base_reflectivity):
    """(:563-568); note the un-clamped dot — replicated as-is."""
    p = (1.0 - _dot(halfway, view_dir)) ** 5
    return base_reflectivity + (1.0 - base_reflectivity) * p[..., None]


def surface_brdf(light_dir, view_dir, surface_normal, roughness, albedo, base_reflectivity):
    """Lambertian diffuse + Cook-Torrance specular (:570-592)."""
    halfway = _normalize(light_dir + view_dir)
    f_l = albedo / PI
    d = trowbridge_reitz_ggx(surface_normal, halfway, roughness)
    g = schlick_ggx(surface_normal, view_dir, roughness) * schlick_ggx(
        surface_normal, light_dir, roughness
    )
    f = fresnel_schlick(halfway, view_dir, base_reflectivity)
    denom = 4.0 * _dot(view_dir, surface_normal) * _dot(light_dir, surface_normal)
    f_ct = (d * g)[..., None] * f / denom[..., None]
    return f_l + f_ct


def calculate_lighting_at(
    sample_point,
    cell_origin,
    cell_coords,
    eye_pos,
    incident_light,
    incident_light_pos,
    *,
    grid_size: int,
    roughness,
    material_color,
    base_reflectivity,
):
    """Rendering-equation direct light at a cube surface point (:594-633).

    ``incident_light`` is an [..., 3] radiance (the light-magnitude vector
    for direct light, or reflected light for the indirect bounce).
    """
    surface_normal = cube_face_normal(sample_point, cell_origin)
    c = cell_coords.astype(jnp.float32) / jnp.float32(grid_size)
    rainbow = jnp.stack([c[..., 0], c[..., 1], 1.0 - c[..., 0]], axis=-1)
    use_material = jnp.any(material_color != 0.0)
    albedo = jnp.where(use_material, material_color, rainbow)
    view_dir = _normalize(eye_pos - sample_point)
    light_dir = _normalize(incident_light_pos - sample_point)
    brdf = surface_brdf(
        light_dir, view_dir, surface_normal, roughness, albedo, base_reflectivity
    )
    lr = brdf * incident_light * _dot(light_dir, surface_normal)[..., None]
    return jnp.maximum(0.0, lr)


def calculate_lighting_at_simple(
    sample_point,
    cell_origin,
    cell_coords,
    camera_pos,
    light_pos,
    light_magnitude,
    *,
    grid_size: int,
):
    """The non-clustered variant's ad-hoc lighting
    (pathtraced_fragment.wgsl:338-365 ``calculateLigtingAt``): reflected +
    diffuse with inverse-square light and camera distance falloffs; rainbow
    albedo always (pathtraced_fragment.wgsl:440-441)."""
    face_normal = cube_face_normal(sample_point, cell_origin)
    view_dir = _normalize(sample_point - camera_pos)
    dist_light = jnp.linalg.norm(light_pos - sample_point, axis=-1)
    dist_light_factor = jnp.maximum(1.0, dist_light**2)
    dist_cam = jnp.linalg.norm(camera_pos - sample_point, axis=-1)
    dist_cam_factor = jnp.maximum(1.0, dist_cam**2)
    incident = light_magnitude / dist_light_factor
    incident_dir = _normalize(sample_point - light_pos)
    # reflect(i, n) = i - 2*dot(n, i)*n
    reflected_dir = incident_dir - 2.0 * _dot(face_normal, incident_dir)[..., None] * face_normal
    reflected = incident * _dot(reflected_dir, -view_dir)
    c = cell_coords.astype(jnp.float32) / jnp.float32(grid_size)
    color = jnp.stack([c[..., 0], c[..., 1], 1.0 - c[..., 0]], axis=-1)
    total = (color * reflected[..., None] + incident[..., None] * color) / (
        dist_cam_factor[..., None]
    )
    return total
