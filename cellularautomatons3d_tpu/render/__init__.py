from .camera import CameraRig, pixel_uvs, get_ray, COT_HALF_FOV
from .intersect import (
    ray_cube_intersect,
    sd_box,
    cube_face_normal,
    cell_from_sample_point,
    get_cell_state,
    nrand,
    n1rand,
)
from .brdf import (
    trowbridge_reitz_ggx,
    schlick_ggx,
    fresnel_schlick,
    surface_brdf,
    calculate_lighting_at,
)
from .raymarch import ray_march_depth, ray_march_shadow, OCCLUSION_FACTOR
from .renderer import (
    RenderStatic,
    RenderParams,
    RenderHistory,
    render_frame,
    init_history,
)

__all__ = [
    "CameraRig",
    "pixel_uvs",
    "get_ray",
    "COT_HALF_FOV",
    "ray_cube_intersect",
    "sd_box",
    "cube_face_normal",
    "cell_from_sample_point",
    "get_cell_state",
    "nrand",
    "n1rand",
    "trowbridge_reitz_ggx",
    "schlick_ggx",
    "fresnel_schlick",
    "surface_brdf",
    "calculate_lighting_at",
    "ray_march_depth",
    "ray_march_shadow",
    "OCCLUSION_FACTOR",
    "RenderStatic",
    "RenderParams",
    "RenderHistory",
    "render_frame",
    "init_history",
]
