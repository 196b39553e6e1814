"""Perspective camera with depth of field, batched ray generation.

TPU-native analog of reference ``src/camera/mod.rs``:
- raster→screen→camera transform chain (CameraProjection, camera/mod.rs:43-70),
- perspective projection + DoF via concentric lens sampling
  (PerspectiveCamera::generate_ray, camera/mod.rs:118-143),
- ray differentials as one-pixel film offsets (camera/mod.rs:145-205) — here
  the cheap dx/dy-camera form (no lens term needed for texture filtering).

One camera generates the rays for the whole wavefront in a single batched
call; the camera itself is a small pytree of precomputed transforms.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from fountain_tpu.core import transform as tf
from fountain_tpu.core.sampling import concentric_sample_disk
from fountain_tpu.core.vecmath import (Float, V3, length, normalize, vec,
                                       where3)


class Rays(NamedTuple):
    """Component-SoA ray batch (flat [N] arrays — see core.vecmath.V3).
    ``d`` need not be normalized for intersection tests but camera rays are
    unit length (matching reference conventions)."""
    o: V3
    d: V3
    t_max: jnp.ndarray  # [N]
    # differentials (dx/dy of origin and direction w.r.t. one raster pixel)
    rx_o: Optional[V3] = None
    rx_d: Optional[V3] = None
    ry_o: Optional[V3] = None
    ry_d: Optional[V3] = None


class PerspectiveCamera(NamedTuple):
    camera_to_world: tf.Transform
    raster_to_camera: tf.Transform
    lens_radius: jnp.ndarray   # []
    focal_dist: jnp.ndarray    # []
    dx_camera: jnp.ndarray     # [3] camera-space shift for +1 raster x
    dy_camera: jnp.ndarray     # [3]


def default_screen_window(xres: int, yres: int) -> Tuple[float, float, float, float]:
    """PBRT aspect-correct screen window (x_min, x_max, y_min, y_max).

    Note: the reference hard-codes [-1,1]^2 (camera/mod.rs:85 TODO note;
    loaders/pbrt.rs make_camera), which distorts non-square images; we follow
    the PBRT convention instead (identical for square images like the
    furnace scene).
    """
    aspect = xres / yres
    if aspect > 1.0:
        return (-aspect, aspect, -1.0, 1.0)
    return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)


def make_perspective_camera(
    camera_to_world: tf.Transform,
    resolution: Tuple[int, int],
    fov_deg: float,
    lens_radius: float = 0.0,
    focal_dist: float = 1e6,
    screen_window: Optional[Tuple[float, float, float, float]] = None,
) -> PerspectiveCamera:
    """Build the transform chain (reference CameraProjection::new,
    camera/mod.rs:51-70). Raster y points down; screen y up."""
    xres, yres = resolution
    if screen_window is None:
        screen_window = default_screen_window(xres, yres)
    x0, x1, y0, y1 = screen_window

    persp = tf.perspective(fov_deg, 1.0e-2, 1000.0)
    screen_to_raster = (
        tf.scale(float(xres), float(yres), 1.0)
        @ tf.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
        @ tf.translate([-x0, -y1, 0.0]))
    raster_to_camera = persp.inverse @ screen_to_raster.inverse

    origin = tf.transform_point(raster_to_camera, vec(0.0, 0.0, 0.0))
    dx_camera = tf.transform_point(raster_to_camera, vec(1.0, 0.0, 0.0)) - origin
    dy_camera = tf.transform_point(raster_to_camera, vec(0.0, 1.0, 0.0)) - origin

    return PerspectiveCamera(
        camera_to_world=camera_to_world,
        raster_to_camera=raster_to_camera,
        lens_radius=jnp.asarray(lens_radius, Float),
        focal_dist=jnp.asarray(focal_dist, Float),
        dx_camera=dx_camera,
        dy_camera=dy_camera,
    )


def generate_rays(cam: PerspectiveCamera, px, py, lens_u, lens_v,
                  with_differentials: bool = True) -> Rays:
    """Generate world-space rays for raster-space film points (px, py) [N].

    ``lens_u/lens_v`` are U[0,1) lens samples [N] (only used when
    lens_radius > 0). Mirrors reference generate_ray (camera/mod.rs:118-143)
    batched and branch-free: the DoF path is computed unconditionally and
    selected by `where` on lens_radius (a scalar, so XLA folds it when 0).
    Everything flows in component-SoA V3 layout.
    """
    n = jnp.shape(px)
    p_cam = tf.transform_point_v3(cam.raster_to_camera,
                                  V3(px, py, jnp.zeros(n, Float)))
    d = normalize(p_cam)
    o = V3(jnp.zeros(n, Float), jnp.zeros(n, Float), jnp.zeros(n, Float))

    # depth of field (camera/mod.rs:129-139)
    lx, ly = concentric_sample_disk(lens_u, lens_v)
    p_lens3 = V3(cam.lens_radius * lx, cam.lens_radius * ly,
                 jnp.zeros_like(lx))
    ft = cam.focal_dist / d.z
    p_focus = o + d * ft
    dof_d = normalize(p_focus - p_lens3)

    use_dof = cam.lens_radius > 0.0
    o = where3(use_dof, p_lens3, o)
    d = where3(use_dof, dof_d, d)

    o_w = tf.transform_point_v3(cam.camera_to_world, o)
    d_w = tf.transform_vector_v3(cam.camera_to_world, d)
    t_max = jnp.full(n, jnp.inf, Float)

    if not with_differentials:
        return Rays(o=o_w, d=d_w, t_max=t_max)

    # pinhole-style differentials; under DoF the lens origin is shared
    # (reference camera/mod.rs:162-176 keeps p_lens for rx/ry origins)
    dxc = V3(cam.dx_camera[0], cam.dx_camera[1], cam.dx_camera[2])
    dyc = V3(cam.dy_camera[0], cam.dy_camera[1], cam.dy_camera[2])
    dx = normalize(p_cam + dxc)
    dy = normalize(p_cam + dyc)
    ft_x = cam.focal_dist / dx.z
    ft_y = cam.focal_dist / dy.z
    dx_dof = normalize(dx * ft_x - p_lens3)
    dy_dof = normalize(dy * ft_y - p_lens3)
    dx = where3(use_dof, dx_dof, dx)
    dy = where3(use_dof, dy_dof, dy)

    rx_o = ry_o = o_w
    rx_d = tf.transform_vector_v3(cam.camera_to_world, dx)
    ry_d = tf.transform_vector_v3(cam.camera_to_world, dy)
    return Rays(o=o_w, d=d_w, t_max=t_max,
                rx_o=rx_o, rx_d=rx_d, ry_o=ry_o, ry_d=ry_d)
