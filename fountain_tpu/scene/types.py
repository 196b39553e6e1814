"""Flat, SoA device-array scene representation.

The reference builds a heap of trait objects (`Arc<dyn Primitive>`,
`Box<dyn Material>`, src/primitive.rs:25-29, src/loaders/constructors.rs).
The TPU-native formulation compiles the whole scene to dense arrays indexed
by integer ids: shapes in SoA layout, materials/textures/lights as parameter
tables, dynamic dispatch replaced by type codes + masked evaluate-all /
``lax.switch`` (SURVEY.md §7 design stance).

Everything here is a NamedTuple → automatically a JAX pytree, so a Scene can
be passed through ``jit`` / ``grad`` / ``shard_map`` boundaries; material,
texture, and light parameter arrays are differentiable leaves.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Shape tables
# ---------------------------------------------------------------------------


class Spheres(NamedTuple):
    """Full PBRT sphere set (reference src/shapes/sphere.rs:16-27): per-sphere
    object↔world transforms, radius, z/phi clipping, material/light binding."""
    o2w: jnp.ndarray      # [S, 4, 4] object -> world
    w2o: jnp.ndarray      # [S, 4, 4] world -> object
    radius: jnp.ndarray   # [S]
    z_min: jnp.ndarray    # [S]
    z_max: jnp.ndarray    # [S]
    phi_max: jnp.ndarray  # [S] radians
    mat_id: jnp.ndarray   # [S] int32 index into Materials (-1 = null bsdf)
    light_id: jnp.ndarray  # [S] int32 index into Lights (-1 = not emissive)
    flip_normal: jnp.ndarray  # [S] bool: reverse_orientation ^ swaps_handedness

    @property
    def count(self) -> int:
        return self.radius.shape[0]


class Triangles(NamedTuple):
    """World-space triangle soup in SoA (reference src/shapes/triangle.rs:10-26
    transforms verts to world at build time, :42-58). Per-face material/light
    ids allow many meshes to live in one table."""
    positions: jnp.ndarray  # [V, 3] world space
    indices: jnp.ndarray    # [F, 3] int32
    normals: jnp.ndarray    # [V, 3] shading normals (zeros => use geometric)
    has_normals: jnp.ndarray  # [F] bool
    uv: jnp.ndarray         # [V, 2]
    mat_id: jnp.ndarray     # [F] int32
    light_id: jnp.ndarray   # [F] int32 (-1 = not emissive)
    flip_normal: jnp.ndarray  # [F] bool
    mesh_id: jnp.ndarray    # [F] int32: which source mesh each face is from

    @property
    def count(self) -> int:
        return self.indices.shape[0]


def empty_triangles() -> Triangles:
    f = jnp.zeros((0, 3), jnp.float32)
    return Triangles(
        positions=f, indices=jnp.zeros((0, 3), jnp.int32), normals=f,
        has_normals=jnp.zeros((0,), bool), uv=jnp.zeros((0, 2), jnp.float32),
        mat_id=jnp.zeros((0,), jnp.int32), light_id=jnp.zeros((0,), jnp.int32),
        flip_normal=jnp.zeros((0,), bool), mesh_id=jnp.zeros((0,), jnp.int32))


def empty_spheres() -> Spheres:
    z = jnp.zeros((0,), jnp.float32)
    m = jnp.zeros((0, 4, 4), jnp.float32)
    return Spheres(o2w=m, w2o=m, radius=z, z_min=z, z_max=z, phi_max=z,
                   mat_id=jnp.zeros((0,), jnp.int32),
                   light_id=jnp.zeros((0,), jnp.int32),
                   flip_normal=jnp.zeros((0,), bool))


# ---------------------------------------------------------------------------
# Material / texture tables
# ---------------------------------------------------------------------------

# Material type codes (reference src/material/: matte, mirror, glass, metal,
# plastic — src/loaders/pbrt.rs:323-345 dispatch).
MAT_NONE = -1
MAT_MATTE = 0
MAT_MIRROR = 1
MAT_GLASS = 2
MAT_METAL = 3
MAT_PLASTIC = 4


class Materials(NamedTuple):
    """Material parameter table; textures referenced by id.

    Field meaning by type (reference src/material/*.rs):
      matte:   kd_tex (reflectance), sigma_tex (Oren-Nayar degrees)
      mirror:  kr_tex
      glass:   kr_tex, kt_tex, eta scalar in float0, rough_u/rough_v
      metal:   eta3/k3 (conductor ior), rough_u/rough_v, remap_roughness
      plastic: kd_tex, ks_tex, rough_u, remap_roughness
    """
    mtype: jnp.ndarray    # [M] int32
    kd_tex: jnp.ndarray   # [M] int32 texture id
    ks_tex: jnp.ndarray   # [M] int32
    kr_tex: jnp.ndarray   # [M] int32
    kt_tex: jnp.ndarray   # [M] int32
    sigma_tex: jnp.ndarray  # [M] int32 (Oren-Nayar sigma texture)
    rough_u_tex: jnp.ndarray  # [M] int32
    rough_v_tex: jnp.ndarray  # [M] int32
    eta: jnp.ndarray      # [M] float (dielectric ior)
    eta3: jnp.ndarray     # [M, 3] conductor eta
    k3: jnp.ndarray       # [M, 3] conductor absorption
    remap_roughness: jnp.ndarray  # [M] bool

    @property
    def count(self) -> int:
        return self.mtype.shape[0]


# Texture type codes (reference src/texture/: constant, scale, checkerboard,
# uv, image).
TEX_CONSTANT = 0
TEX_CHECKER = 1
TEX_IMAGE = 2
TEX_UV = 3
TEX_SCALE = 4


class Textures(NamedTuple):
    """Flattened texture graph (reference `Arc<dyn Texture>` graphs →
    id-indexed table, SURVEY.md §7). ``value`` doubles as the constant value
    and per-type payload; sub-texture ids express checker/scale nesting
    (evaluated iteratively, bounded depth)."""
    ttype: jnp.ndarray    # [T] int32
    value: jnp.ndarray    # [T, 3] constant value / scale factor
    sub_a: jnp.ndarray    # [T] int32 sub-texture (checker tex1 / scale inner)
    sub_b: jnp.ndarray    # [T] int32 sub-texture (checker tex2)
    uv_scale: jnp.ndarray  # [T, 2] UVMapping scale (reference mapping.rs:13-55)
    uv_offset: jnp.ndarray  # [T, 2]
    image_id: jnp.ndarray  # [T] int32 index into the image atlas (-1 = none)
    # static marker (shape [1] iff any checker/scale texture exists, else
    # [0]): shapes are trace-time constants, so `has_nested.shape[0]` lets
    # the shading fast path skip the nested-texture fallback entirely for
    # scenes without texture graphs — no recompile-triggering python attrs
    has_nested: jnp.ndarray = None

    @property
    def count(self) -> int:
        return self.ttype.shape[0]

    @property
    def any_nested(self) -> bool:
        return self.has_nested is None or self.has_nested.shape[0] > 0


# ---------------------------------------------------------------------------
# Light table
# ---------------------------------------------------------------------------

LIGHT_POINT = 0
LIGHT_DISTANT = 1
LIGHT_INFINITE = 2
LIGHT_AREA_SPHERE = 3
LIGHT_AREA_TRI = 4


class Lights(NamedTuple):
    """Light parameter table (reference src/light/): point/distant/infinite/
    diffuse-area. Area lights bind back to a shape (sphere id, or a face
    range in the triangle table with an area-weighted CDF for sampling)."""
    ltype: jnp.ndarray    # [L] int32
    emit: jnp.ndarray     # [L, 3] radiance (area/infinite) or intensity (point)
    pos: jnp.ndarray      # [L, 3] point light position
    dir: jnp.ndarray      # [L, 3] distant light direction (world, towards scene)
    shape_id: jnp.ndarray  # [L] int32: sphere index for AREA_SPHERE
    tri_start: jnp.ndarray  # [L] int32: first face for AREA_TRI
    tri_count: jnp.ndarray  # [L] int32
    env_tex: jnp.ndarray  # [L] int32 texture id for infinite light radiance map
    area: jnp.ndarray     # [L] total surface area (area lights; else 0)
    # [L] int32 slot into the stacked per-light env distribution
    # (Scene.env_dist); -1 = uniform-sphere sampling. The reference builds
    # one Distribution2D per InfiniteAreaLight (infinite.rs:63-77).
    env_slot: jnp.ndarray = None

    @property
    def count(self) -> int:
        return self.ltype.shape[0]


def no_lights() -> Lights:
    z3 = jnp.zeros((0, 3), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    return Lights(ltype=zi, emit=z3, pos=z3, dir=z3, shape_id=zi,
                  tri_start=zi, tri_count=zi, env_tex=zi,
                  area=jnp.zeros((0,), jnp.float32), env_slot=zi)


# ---------------------------------------------------------------------------
# Scene
# ---------------------------------------------------------------------------


class Scene(NamedTuple):
    """The full flat scene (reference src/scene/mod.rs:14-18: BVH + lights).

    ``world_center``/``world_radius`` are the scene bounding sphere used by
    infinite/distant lights (reference src/light/infinite.rs:93-97).
    ``light_tri`` holds the packed per-face alias table for mesh-light
    face sampling (see its field comment).
    BVH arrays are attached by fountain_tpu.geometry.bvh once built.
    """
    spheres: Spheres
    triangles: Triangles
    materials: Materials
    textures: Textures
    lights: Lights
    world_center: jnp.ndarray   # [3]
    world_radius: jnp.ndarray   # []
    bvh_nodes_min: Optional[jnp.ndarray] = None   # [N,3]
    bvh_nodes_max: Optional[jnp.ndarray] = None   # [N,3]
    bvh_meta: Optional[jnp.ndarray] = None        # [N,3] int32 (see geometry.bvh)
    # packed traversal layout (geometry.bvh.pack_nodes): one 8-float row per
    # node = (min, max, bitcast miss, bitcast first<<3|count) -> a single
    # gather per traversal step; tri verts pre-gathered to leaf order so a
    # leaf slot is one 9-float row gather instead of index+3 vert gathers
    bvh_nodes8: Optional[jnp.ndarray] = None      # [N,8] f32
    bvh_tri_verts: Optional[jnp.ndarray] = None   # [F,3,3] f32
    # dense MXU intersection features (geometry.tensor_tri): attached for
    # scenes within the dense budget; preferred over the BVH walk on TPU
    tri_features: Optional[tuple] = None          # tensor_tri.TriFeatures
    # VMEM-fused flash-intersect features (geometry.pallas_tri
    # pack_features_pallas, [4,16,Fpad]); used instead of tri_features when
    # running on a real TPU backend — the pair matrix never leaves VMEM
    tri_qfeat: Optional[jnp.ndarray] = None
    # packed per-face hit attributes [F,32] (geometry.triangle
    # build_tri_attr): one row gather per hit instead of ~8 indirect ones
    tri_attr: Optional[jnp.ndarray] = None
    # packed per-face light-sampling table for AREA_TRI lights, in the
    # ORIGINAL face order (independent of the BVH leaf reorder; lights
    # address faces by contiguous [tri_start, tri_start+tri_count) range).
    # Row: 0 alias prob | 1 alias index (float) | 2:11 p0p1p2 | 11 flip |
    # 12:16 pad. Alias sampling = O(1): TWO row gathers per lane replace
    # the 21-gather CDF bisection (reference Distribution1D,
    # sampling.rs:59-135). None when the scene has no mesh area light —
    # that staticness gates the whole AREA_TRI branch out of the trace.
    light_tri: Optional[jnp.ndarray] = None       # [F, 16]
    env_images: Optional[tuple] = None            # shading.mipmap.ImageAtlas
    # env-map importance sampling (reference infinite.rs:63-77): a STACKED
    # Distribution2D over luminance*sin(theta) with one slot per env-mapped
    # infinite light (leading axis S); lights.env_slot maps light -> slot,
    # -1 = uniform-sphere sampling
    env_dist: Optional[tuple] = None              # core.sampling.EnvAlias

    @property
    def n_lights(self) -> int:
        return self.lights.count
