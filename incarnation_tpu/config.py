"""Runtime configuration.

Mirror of the reference's FConfig defaults (ref: inc/common.h:6-48), expressed
as a frozen dataclass so a config instance is hashable and can be passed to
jitted frame functions as a static argument. Fields whose value changes shader
specialization in the reference (compile-time #defines like FRUSTUM_CULLING /
VIEWMODE / MAX_LIGHTS_PER_CLUSTER, ref: SURVEY.md §5) become separate jit cache
entries here for the same reason.
"""

from __future__ import annotations

import dataclasses
import math


class ViewMode:
    """Debug visualization modes (ref: inc/demo.h:7-23)."""
    NORMAL = 0
    NAN_CHECK = 1
    LIGHTING_ONLY = 2
    ROUGHNESS = 3
    METALLIC = 4
    BASE_COLOR = 5
    EMISSIVE = 6
    REFLECTIONS = 7
    OBJECT_IDS = 8
    TRIANGLE_IDS = 9
    NORMALMAP = 10
    AMBIENT_OCCLUSION = 11
    BENT_NORMALS = 12
    LIGHT_CLUSTER_SLICES = 13


class EnvSkyMode:
    """Environment sky source (ref: inc/demo.h:25-29)."""
    ENVIRONMENT_MAP = 0
    DYNAMIC_SKY = 1


@dataclasses.dataclass(frozen=True)
class Config:
    # Content
    model_filename: str = "DamagedHelmet.gltf"
    hdri_filename: str = "lilienstein.hdr"
    use_content_cache: bool = True

    # Camera (ref: common.h:17-20)
    fov: float = 0.25 * math.pi
    exposure: float = 13.0          # EV100
    camera_speed: float = 5.0
    camera_near_plane: float = 1.0

    # Modes
    viewmode: int = ViewMode.NORMAL
    env_sky_mode: int = EnvSkyMode.DYNAMIC_SKY
    sky_brightness: float = 25000.0

    # Feature toggles (ref: common.h:24-38)
    enable_direct_lighting: bool = True
    enable_sky_lighting: bool = True
    enable_diffuse_ibl: bool = True
    enable_specular_ibl: bool = True
    path_trace: bool = False
    forward_lighting: bool = False
    frustum_culling: bool = True
    enable_taa: bool = True
    enable_hbao: bool = False
    use_bent_normals: bool = False
    use_meshlets: bool = True
    freeze_culling: bool = False
    show_light_bounds: bool = False
    show_object_bounds: bool = False

    # Clustered lighting (ref: common.h:34-38)
    light_cluster_dim_x: int = 16
    light_cluster_dim_y: int = 9
    light_cluster_dim_z: int = 24
    max_lights_per_cluster: int = 64
    cluster_depth_extent: float = 200.0

    # Path tracing (ref: common.h:39-42)
    max_sample_count: int = 256
    pathtracing_camera_aperture: float = 0.01
    pathtracing_camera_focal_length: float = 7.0

    # Sky / time-of-day (ref: common.h:43-47)
    turbidity: float = 2.0
    tod_enable: bool = True
    tod_decimal_hours: float = 11.0
    tod_julian_date: int = 200
    tod_latitude: float = 42.5
    envmap_resolution: int = 256

    # --- TPU-rebuild-specific knobs (no reference equivalent) ---
    # Software rasterizer tiling. A tile is TILE_H x TILE_W pixels; the fine
    # raster Pallas kernel runs one grid step per tile. 128-wide tiles match
    # the VPU lane count.
    raster_tile_h: int = 32
    raster_tile_w: int = 128
    # Total (tile, triangle) pair capacity for the binner (static shape;
    # overflow is counted in render stats). Binning replaces the reference's
    # GPU atomic-append of indirect draws (ref: culling/batch-culling.hlsl).
    pair_capacity: int = 1 << 20
    # Pair capacity for the SUN SHADOW depth pass. The ortho sun view bins
    # far fewer pairs than the camera (measured: 125k at 1024^2 on the
    # 289k-tri atrium vs ~155k camera pairs at 1080p), and both the
    # capacity-sized pair-row gather and the Pallas raster scale with
    # capacity, so it gets its own, tighter bound (1.3x headroom).
    # Overflow shows up in the shadow_bin_overflow stat.
    shadow_pair_capacity: int = 163840
    # Max screen tiles a single binned triangle may span before it is routed
    # to the per-frame "big triangle" list that every tile processes.
    bin_max_span: int = 16
    big_tri_capacity: int = 512
    # Texture atlas resolution cap (textures are resized to at most this).
    texture_max_dim: int = 2048
    # Stochastic texture filtering (engaged only while TAA history is
    # accumulating, so single-shot renders stay exact trilinear):
    # stochastic_mip dithers to a single mip level (half the texture
    # gathers); stochastic_bilinear additionally jitters the bilinear
    # footprint so the whole material stack is ONE texel gather per pixel.
    # The TAA accumulation converges both to the trilinear result.
    stochastic_mip: bool = True
    stochastic_bilinear: bool = True
    # Stochastic anisotropic filtering (reference: 16x aniso static
    # samplers, src/demo.cpp:445-493): the per-frame stochastic tap is
    # jittered along the footprint's major axis with the mip picked from
    # the minor axis — converges to the anisotropic integral under TAA at
    # zero extra gathers. <= 1 disables (isotropic stochastic mip).
    max_anisotropy: int = 16
    # Alpha-masked geometry: number of depth-peel layers rastered for
    # MASK/BLEND primitives (a failed alpha test exposes the next fragment
    # behind it — ref: visibility-pass.hlsl clip). 2 covers typical foliage
    # overlap; raise for dense vegetation.
    masked_depth_peels: int = 2
    # Sparse-layer fetch compaction (kernels/resolve.py _chunk_compact):
    # the peel alpha tests and the decal material resolve cover a sparse
    # pixel set, but a full-screen table gather is index-rate bound
    # (~12.7 ms per 2M px into the 11 MB alpha mirror on v5e). Compacting
    # at 128-px chunk granularity costs ~nothing (vector-rate row copies)
    # and cuts the gather to capacity*128 indices. Capacities are in
    # chunks (1080p has 16320); measured atrium coverage: peels 35/27/19%,
    # decals 1.8%. Overflowing chunks degrade gracefully (alpha 1.0 /
    # untextured) and are counted in the frame stats. 0 disables.
    peel_chunk_capacity: int = 6144
    decal_chunk_capacity: int = 1024
    # Analytic split-sum env-BRDF (a 16x16 Chebyshev tensor fitted to the
    # reference integration, mimicking the reference's inverted-row fetch
    # quirk) instead of the LUT gather: one of the three pixel-proportional
    # gathers in the deferred frame (~3.8 ms at 1080p) becomes pure VPU
    # math at <=0.5% absolute error in the specular scale (kernels/ibl.py
    # env_brdf_approx). On by default; the LUT path remains bit-parity
    # with the reference's sky-lighting.hlsl:124 behavior.
    analytic_env_brdf: bool = True
    # Sun shadows. The reference ALWAYS traces a per-pixel DXR shadow ray
    # toward the sun (ref: lighting/common.hlsli:91-116); a per-pixel BVH
    # walk is HBM-gather-bound on TPU, so the TPU-first default for real
    # frames is a rasterized orthographic shadow map with a stochastic PCF
    # tap (kernels/shadow.py). Modes:
    #   "auto" — "rt" when a scene BVH is supplied, else no shadows
    #            (round-2 compatibility for tests/tools)
    #   "map"  — rasterized sun shadow map (the bench/CLI frame)
    #   "rt"   — exact BVH shadow rays (parity/reference mode; slow)
    #   "off"  — sun always visible
    sun_shadow_mode: str = "auto"
    # 1024: the per-pixel visibility gather is index-rate bound with a
    # strong table-SIZE tier (tools/microbench.py): the 1024^2 packed-u16
    # map is 2 MB (fast tier, ~10 ms/2M px) where 2048^2 was 8 MB (~18 ms),
    # and the sun depth raster quarters (7.2 -> ~2 ms). The stochastic PCF
    # tap + TAA penumbra hides the coarser texels.
    shadow_map_resolution: int = 1024
    # Checkerboard half-rate full-screen gathers (kernels/checker.py): the
    # sun-shadow sample and the specular probe fetch are 2M-index gathers
    # that are index-rate bound regardless of table locality (~14.9 ms each
    # in the profiled honest frame), so half the indices is half the cost
    # (measured ratio 0.51 — tools/checkerboard_bench.py). The skipped
    # parity gets the mean of its two horizontal gathered neighbors and TAA
    # alternates parity per frame. Engaged only while TAA accumulates (like
    # the stochastic taps), so single-shot renders stay full-rate exact.
    checkerboard_gathers: bool = True
    # Stochastic single-texel TAA history fetch (1 gather instead of 4).
    # Off by default: the history feedback loop turns the fetch noise into
    # visible mottling (33.9 dB vs exact after 32 frames — tools/
    # stochastic_psnr.py; textures-only stochastic is 41.1 dB and stays on).
    stochastic_taa: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
