"""Texture evaluation over the flattened texture table.

TPU-native analog of reference ``src/texture/``: the `Arc<dyn Texture>`
object graph (texture/mod.rs:12-21) becomes an id-indexed table
(scene.types.Textures) evaluated with masked gathers. Nesting
(checkerboard/scale sub-textures, checkerboard.rs:10-65) is resolved with a
bounded unrolled loop — scene compilation guarantees sub-texture ids point
"downward" in the table.

All values flow in component-SoA V3 layout (three flat [N] arrays — see
core.vecmath.V3); image textures (mipmapped) are wired in via
fountain_tpu.shading.mipmap.
"""
from __future__ import annotations

import jax.numpy as jnp

from fountain_tpu.core.gather import gather_rows3, select_rows
from fountain_tpu.core.vecmath import Float, V3, where3, zeros3
from fountain_tpu.scene.types import (TEX_CHECKER, TEX_CONSTANT, TEX_IMAGE,
                                      TEX_SCALE, TEX_UV, Textures)

# maximum nesting depth of the texture graph we resolve (checker-of-scale-of-
# image etc.). Matches practical PBRT scenes.
MAX_TEX_DEPTH = 3


def _leaf_value(tex: Textures, tid, u0, v0, tex_lookup=None, width=None):
    """Evaluate non-nesting texture types for per-lane ids `tid` at uv."""
    ttype = select_rows(tex.ttype, tid)
    value = gather_rows3(tex.value, tid)
    su, sv = (select_rows(tex.uv_scale[:, 0], tid),
              select_rows(tex.uv_scale[:, 1], tid))
    du, dv = (select_rows(tex.uv_offset[:, 0], tid),
              select_rows(tex.uv_offset[:, 1], tid))
    u = u0 * su + du
    v = v0 * sv + dv

    out = value  # TEX_CONSTANT (texture/mod.rs:34-42)

    # TEX_UV debug texture (texture/uv.rs:6-25): rgb = (u%1, v%1, 0)
    uv_rgb = V3(u - jnp.floor(u), v - jnp.floor(v), jnp.zeros_like(u))
    out = where3(ttype == TEX_UV, uv_rgb, out)

    if tex_lookup is not None:
        w = None if width is None else width * jnp.maximum(su, sv)
        img_rgb = tex_lookup(select_rows(tex.image_id, tid), u, v, w)
        out = where3(ttype == TEX_IMAGE, img_rgb, out)
    return out


def eval_texture(tex: Textures, tid: jnp.ndarray, u, v,
                 tex_lookup=None, width=None) -> V3:
    """Evaluate texture ids [N] at (u, v) [N] -> rgb V3.

    ``tex_lookup(image_id, u, v, width) -> V3`` is supplied by the mipmap
    layer when the scene has image textures (kept as an injection point so
    this module has no HBM image dependencies). ``width`` [N] is the uv-
    space filter footprint (ray cones; None = finest level).
    """
    tid = jnp.clip(tid, 0, max(tex.count - 1, 0)).astype(jnp.int32)
    if tex.count == 0:
        return zeros3(jnp.shape(u))

    # checkerboard selector (reference checkerboard.rs:47-58: integer lattice
    # parity in mapped uv)
    su, sv = (select_rows(tex.uv_scale[:, 0], tid),
              select_rows(tex.uv_scale[:, 1], tid))
    du, dv = (select_rows(tex.uv_offset[:, 0], tid),
              select_rows(tex.uv_offset[:, 1], tid))
    cu = jnp.floor(u * su + du).astype(jnp.int32)
    cv = jnp.floor(v * sv + dv).astype(jnp.int32)
    checker_first = ((cu + cv) % 2) == 0

    # resolve one level of nesting at a time (bounded)
    cur = tid
    mult = None
    for _ in range(MAX_TEX_DEPTH):
        t = select_rows(tex.ttype, cur)
        sub_a = select_rows(tex.sub_a, cur)
        is_checker = t == TEX_CHECKER
        is_scale = t == TEX_SCALE
        nxt = jnp.where(is_checker,
                        jnp.where(checker_first, sub_a,
                                  select_rows(tex.sub_b, cur)),
                        jnp.where(is_scale, sub_a, cur))
        scale_val = where3(is_scale, gather_rows3(tex.value, cur), 1.0)
        mult = scale_val if mult is None else mult * scale_val
        cur = nxt.astype(jnp.int32)

    return mult * _leaf_value(tex, cur, u, v, tex_lookup=tex_lookup,
                              width=width)
