"""Host-side scene builder: python objects → flat device arrays.

TPU-native analog of the reference's constructors layer
(src/loaders/constructors.rs:38-359): where the reference allocates
`Arc<dyn ...>` object graphs, this accumulates rows for the SoA tables in
plain python lists and compiles them to jnp arrays once, at `build()`.
The PBRT frontend (fountain_tpu.io.pbrt) drives this builder.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fountain_tpu.scene.types import (LIGHT_AREA_SPHERE, LIGHT_AREA_TRI,
                                      LIGHT_DISTANT, LIGHT_INFINITE,
                                      LIGHT_POINT, MAT_GLASS, MAT_MATTE,
                                      MAT_METAL, MAT_MIRROR, MAT_PLASTIC,
                                      TEX_CHECKER, TEX_CONSTANT, TEX_IMAGE,
                                      TEX_SCALE, TEX_UV, Lights, Materials,
                                      Scene, Spheres, Textures, Triangles,
                                      empty_spheres, empty_triangles)

_I4 = np.eye(4, dtype=np.float32)


# Vose alias-table construction (O(1) device-side sampling) — shared with
# the env-map texel tables; see core.sampling.vose_alias.
from fountain_tpu.core.sampling import vose_alias as _vose_alias


class SceneBuilder:
    def __init__(self):
        self._spheres = []       # dicts
        self._tex = []
        self._mat = []
        self._lights = []
        self._tri_meshes = []    # (positions, indices, normals, uv, mat, light, flip)
        self._images = []        # raw [H,W,3] float32 payloads (mipmap source)
        self._image_wraps = []
        # texture id 0 is reserved "black" so -1-ish defaults stay harmless
        self.add_constant_texture([0.0, 0.0, 0.0])

    # --- images -----------------------------------------------------------

    def add_image(self, img, wrap: int = 0) -> int:
        """Register a raw [H,W,3] linear image; returns its atlas id."""
        self._images.append(np.asarray(img, np.float32))
        self._image_wraps.append(int(wrap))
        return len(self._images) - 1

    # --- textures ---------------------------------------------------------

    def _add_tex(self, **kw) -> int:
        row = dict(ttype=TEX_CONSTANT, value=[0.0, 0.0, 0.0], sub_a=0,
                   sub_b=0, uv_scale=[1.0, 1.0], uv_offset=[0.0, 0.0],
                   image_id=-1)
        row.update(kw)
        self._tex.append(row)
        return len(self._tex) - 1

    def add_constant_texture(self, value) -> int:
        value = np.broadcast_to(np.asarray(value, np.float32), (3,)).tolist()
        return self._add_tex(ttype=TEX_CONSTANT, value=value)

    def add_checkerboard_texture(self, tex1: int, tex2: int,
                                 uscale=1.0, vscale=1.0) -> int:
        return self._add_tex(ttype=TEX_CHECKER, sub_a=tex1, sub_b=tex2,
                             uv_scale=[uscale, vscale])

    def add_uv_texture(self) -> int:
        return self._add_tex(ttype=TEX_UV)

    def add_scale_texture(self, inner: int, factor) -> int:
        factor = np.broadcast_to(np.asarray(factor, np.float32), (3,)).tolist()
        return self._add_tex(ttype=TEX_SCALE, sub_a=inner, value=factor)

    def add_image_texture(self, image_id: int, uscale=1.0, vscale=1.0,
                          uoffset=0.0, voffset=0.0) -> int:
        return self._add_tex(ttype=TEX_IMAGE, image_id=image_id,
                             uv_scale=[uscale, vscale],
                             uv_offset=[uoffset, voffset])

    def _tex_or_const(self, v):
        """Accept either a texture id (int) or a constant value."""
        if isinstance(v, (int, np.integer)):
            return int(v)
        return self.add_constant_texture(v)

    # --- materials (reference constructors.rs:192-238) --------------------

    def _add_mat(self, **kw) -> int:
        row = dict(mtype=MAT_MATTE, kd_tex=0, ks_tex=0, kr_tex=0, kt_tex=0,
                   sigma_tex=0, rough_u_tex=0, rough_v_tex=0, eta=1.5,
                   eta3=[1.0, 1.0, 1.0], k3=[1.0, 1.0, 1.0],
                   remap_roughness=True)
        row.update(kw)
        self._mat.append(row)
        return len(self._mat) - 1

    def add_matte(self, kd=(0.5, 0.5, 0.5), sigma=0.0) -> int:
        return self._add_mat(mtype=MAT_MATTE, kd_tex=self._tex_or_const(kd),
                             sigma_tex=self._tex_or_const([sigma] * 3))

    def add_mirror(self, kr=(0.9, 0.9, 0.9)) -> int:
        return self._add_mat(mtype=MAT_MIRROR, kr_tex=self._tex_or_const(kr))

    def add_glass(self, kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.5,
                  rough_u=0.0, rough_v=0.0, remap=True) -> int:
        return self._add_mat(
            mtype=MAT_GLASS, kr_tex=self._tex_or_const(kr),
            kt_tex=self._tex_or_const(kt), eta=float(eta),
            rough_u_tex=self._tex_or_const([rough_u] * 3),
            rough_v_tex=self._tex_or_const([rough_v] * 3),
            remap_roughness=remap)

    def add_metal(self, eta3=(0.2, 0.92, 1.1), k3=(3.9, 2.45, 2.14),
                  roughness=0.01, rough_u=None, rough_v=None,
                  remap=True) -> int:
        ru = roughness if rough_u is None else rough_u
        rv = roughness if rough_v is None else rough_v
        return self._add_mat(
            mtype=MAT_METAL, eta3=list(map(float, eta3)),
            k3=list(map(float, k3)),
            rough_u_tex=self._tex_or_const(np.full(3, ru, np.float32))
            if not isinstance(ru, (int, np.integer)) else int(ru),
            rough_v_tex=self._tex_or_const(np.full(3, rv, np.float32))
            if not isinstance(rv, (int, np.integer)) else int(rv),
            remap_roughness=remap)

    def add_plastic(self, kd=(0.25, 0.25, 0.25), ks=(0.25, 0.25, 0.25),
                    roughness=0.1, remap=True) -> int:
        return self._add_mat(
            mtype=MAT_PLASTIC, kd_tex=self._tex_or_const(kd),
            ks_tex=self._tex_or_const(ks),
            rough_u_tex=self._tex_or_const([roughness] * 3),
            remap_roughness=remap)

    # --- shapes -----------------------------------------------------------

    def add_sphere(self, radius=1.0, o2w=None, mat_id=-1,
                   reverse_orientation=False, z_min=None, z_max=None,
                   phi_max_deg=360.0) -> int:
        o2w = _I4 if o2w is None else np.asarray(o2w, np.float32)
        swaps = np.linalg.det(o2w[:3, :3]) < 0
        self._spheres.append(dict(
            o2w=o2w, w2o=np.linalg.inv(o2w).astype(np.float32),
            radius=float(radius),
            z_min=-radius if z_min is None else float(z_min),
            z_max=radius if z_max is None else float(z_max),
            phi_max=float(np.deg2rad(phi_max_deg)),
            mat_id=int(mat_id), light_id=-1,
            flip_normal=bool(reverse_orientation) ^ bool(swaps)))
        return len(self._spheres) - 1

    def add_triangle_mesh(self, positions, indices, normals=None, uv=None,
                          mat_id=-1, reverse_orientation=False,
                          o2w=None) -> int:
        """positions [V,3] (object space if o2w given), indices [F,3]."""
        positions = np.asarray(positions, np.float32)
        indices = np.asarray(indices, np.int32)
        swaps = False
        if o2w is not None:
            o2w = np.asarray(o2w, np.float32)
            swaps = bool(np.linalg.det(o2w[:3, :3]) < 0)
            positions = positions @ o2w[:3, :3].T + o2w[:3, 3]
            if normals is not None:
                nrm_m = np.linalg.inv(o2w[:3, :3]).T
                normals = np.asarray(normals, np.float32) @ nrm_m.T
        if normals is not None:
            normals = np.asarray(normals, np.float32)
            ln = np.linalg.norm(normals, axis=-1, keepdims=True)
            normals = normals / np.maximum(ln, 1e-20)
        self._tri_meshes.append(dict(
            positions=positions, indices=indices, normals=normals, uv=uv,
            mat_id=int(mat_id), light_id=-1,
            flip_normal=bool(reverse_orientation) ^ swaps))
        return len(self._tri_meshes) - 1

    # --- lights (reference constructors.rs:240-359) -----------------------

    def _add_light(self, **kw) -> int:
        row = dict(ltype=LIGHT_POINT, emit=[1.0, 1.0, 1.0],
                   pos=[0.0, 0.0, 0.0], dir=[0.0, 0.0, 1.0], shape_id=-1,
                   tri_start=0, tri_count=0, env_tex=-1)
        row.update(kw)
        self._lights.append(row)
        return len(self._lights) - 1

    def add_point_light(self, pos, intensity) -> int:
        return self._add_light(ltype=LIGHT_POINT, pos=list(map(float, pos)),
                               emit=list(map(float, intensity)))

    def add_distant_light(self, direction, radiance) -> int:
        """`direction` points FROM the light (reference distant.rs)."""
        return self._add_light(ltype=LIGHT_DISTANT,
                               dir=list(map(float, direction)),
                               emit=list(map(float, radiance)))

    def add_infinite_light(self, radiance=(1.0, 1.0, 1.0),
                           env_tex: int = -1) -> int:
        return self._add_light(ltype=LIGHT_INFINITE,
                               emit=list(map(float, radiance)),
                               env_tex=int(env_tex))

    def add_area_light_sphere(self, sphere_idx: int, radiance) -> int:
        lid = self._add_light(ltype=LIGHT_AREA_SPHERE,
                              emit=list(map(float, radiance)),
                              shape_id=int(sphere_idx))
        self._spheres[sphere_idx]["light_id"] = lid
        return lid

    def add_area_light_mesh(self, mesh_idx: int, radiance) -> int:
        lid = self._add_light(ltype=LIGHT_AREA_TRI,
                              emit=list(map(float, radiance)),
                              shape_id=int(mesh_idx))
        self._tri_meshes[mesh_idx]["light_id"] = lid
        return lid

    # --- compile ----------------------------------------------------------

    def build(self) -> Scene:
        # spheres
        if self._spheres:
            s = self._spheres
            spheres = Spheres(
                o2w=jnp.asarray(np.stack([r["o2w"] for r in s])),
                w2o=jnp.asarray(np.stack([r["w2o"] for r in s])),
                radius=jnp.asarray([r["radius"] for r in s], jnp.float32),
                z_min=jnp.asarray([r["z_min"] for r in s], jnp.float32),
                z_max=jnp.asarray([r["z_max"] for r in s], jnp.float32),
                phi_max=jnp.asarray([r["phi_max"] for r in s], jnp.float32),
                mat_id=jnp.asarray([r["mat_id"] for r in s], jnp.int32),
                light_id=jnp.asarray([r["light_id"] for r in s], jnp.int32),
                flip_normal=jnp.asarray([r["flip_normal"] for r in s], bool))
        else:
            spheres = empty_spheres()

        # triangle meshes → one concatenated table
        tri_light_ranges = {}
        if self._tri_meshes:
            pos_list, idx_list, nrm_list, uv_list = [], [], [], []
            face_mat, face_light, face_flip, face_mesh, face_hasn = \
                [], [], [], [], []
            v_off = 0
            f_off = 0
            for mi, m in enumerate(self._tri_meshes):
                v = m["positions"]
                f = m["indices"]
                pos_list.append(v)
                idx_list.append(f + v_off)
                has_n = m["normals"] is not None
                nrm_list.append(m["normals"] if has_n
                                else np.zeros_like(v))
                uv_list.append(np.asarray(m["uv"], np.float32) if m["uv"]
                               is not None else np.zeros((len(v), 2),
                                                         np.float32))
                nf = len(f)
                face_mat += [m["mat_id"]] * nf
                face_light += [m["light_id"]] * nf
                face_flip += [m["flip_normal"]] * nf
                face_mesh += [mi] * nf
                face_hasn += [has_n] * nf
                if m["light_id"] >= 0:
                    tri_light_ranges[m["light_id"]] = (f_off, nf)
                v_off += len(v)
                f_off += nf
            triangles = Triangles(
                positions=jnp.asarray(np.concatenate(pos_list)),
                indices=jnp.asarray(np.concatenate(idx_list)),
                normals=jnp.asarray(np.concatenate(nrm_list)),
                has_normals=jnp.asarray(face_hasn, bool),
                uv=jnp.asarray(np.concatenate(uv_list)),
                mat_id=jnp.asarray(face_mat, jnp.int32),
                light_id=jnp.asarray(face_light, jnp.int32),
                flip_normal=jnp.asarray(face_flip, bool),
                mesh_id=jnp.asarray(face_mesh, jnp.int32))
        else:
            triangles = empty_triangles()

        materials = Materials(
            mtype=jnp.asarray([r["mtype"] for r in self._mat] or [0],
                              jnp.int32),
            kd_tex=jnp.asarray([r["kd_tex"] for r in self._mat] or [0],
                               jnp.int32),
            ks_tex=jnp.asarray([r["ks_tex"] for r in self._mat] or [0],
                               jnp.int32),
            kr_tex=jnp.asarray([r["kr_tex"] for r in self._mat] or [0],
                               jnp.int32),
            kt_tex=jnp.asarray([r["kt_tex"] for r in self._mat] or [0],
                               jnp.int32),
            sigma_tex=jnp.asarray([r["sigma_tex"] for r in self._mat] or [0],
                                  jnp.int32),
            rough_u_tex=jnp.asarray(
                [r["rough_u_tex"] for r in self._mat] or [0], jnp.int32),
            rough_v_tex=jnp.asarray(
                [r["rough_v_tex"] for r in self._mat] or [0], jnp.int32),
            eta=jnp.asarray([r["eta"] for r in self._mat] or [1.5],
                            jnp.float32),
            eta3=jnp.asarray([r["eta3"] for r in self._mat] or
                             [[1.0, 1.0, 1.0]], jnp.float32),
            k3=jnp.asarray([r["k3"] for r in self._mat] or [[1.0, 1.0, 1.0]],
                           jnp.float32),
            remap_roughness=jnp.asarray(
                [r["remap_roughness"] for r in self._mat] or [True], bool))

        textures = Textures(
            ttype=jnp.asarray([r["ttype"] for r in self._tex], jnp.int32),
            value=jnp.asarray([r["value"] for r in self._tex], jnp.float32),
            sub_a=jnp.asarray([r["sub_a"] for r in self._tex], jnp.int32),
            sub_b=jnp.asarray([r["sub_b"] for r in self._tex], jnp.int32),
            uv_scale=jnp.asarray([r["uv_scale"] for r in self._tex],
                                 jnp.float32),
            uv_offset=jnp.asarray([r["uv_offset"] for r in self._tex],
                                  jnp.float32),
            image_id=jnp.asarray([r["image_id"] for r in self._tex],
                                 jnp.int32),
            has_nested=jnp.zeros(
                (1 if any(r["ttype"] in (TEX_CHECKER, TEX_SCALE)
                          for r in self._tex) else 0,), jnp.int32))

        # world-space per-face areas + per-light alias tables (reference
        # Distribution1D over shape areas, sampling.rs:59-135; here O(1)
        # Vose alias sampling over contiguous face ranges)
        light_tri = None
        face_area = None
        fverts = None
        if self._tri_meshes:
            pos_all = np.concatenate([m["positions"]
                                      for m in self._tri_meshes])
            idx_all = np.concatenate(
                [m["indices"] + off for m, off in zip(
                    self._tri_meshes,
                    np.cumsum([0] + [len(m["positions"])
                                     for m in self._tri_meshes])[:-1])])
            fverts = pos_all[idx_all]          # [F, 3, 3] original order
            e1 = fverts[:, 1] - fverts[:, 0]
            e2 = fverts[:, 2] - fverts[:, 0]
            face_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

        if self._lights:
            lt = self._lights
            if tri_light_ranges:
                light_tri = np.zeros((len(face_area), 16), np.float32)
                light_tri[:, 2:11] = fverts.reshape(-1, 9)
                flips = np.concatenate(
                    [np.full(len(m["indices"]),
                             float(m["flip_normal"]), np.float32)
                     for m in self._tri_meshes])
                light_tri[:, 11] = flips
            for lid, (start, cnt) in tri_light_ranges.items():
                lt[lid]["tri_start"] = start
                lt[lid]["tri_count"] = cnt
                seg = face_area[start:start + cnt]
                total = max(float(seg.sum()), 1e-20)
                lt[lid]["area"] = total
                prob, alias = _vose_alias(seg / total)
                light_tri[start:start + cnt, 0] = prob
                light_tri[start:start + cnt, 1] = (
                    alias + start).astype(np.float32)
            for r in lt:
                if r["ltype"] == LIGHT_AREA_SPHERE:
                    sp = self._spheres[r["shape_id"]]
                    r["area"] = 4.0 * np.pi * sp["radius"] ** 2
            lights = Lights(
                ltype=jnp.asarray([r["ltype"] for r in lt], jnp.int32),
                emit=jnp.asarray([r["emit"] for r in lt], jnp.float32),
                pos=jnp.asarray([r["pos"] for r in lt], jnp.float32),
                dir=jnp.asarray([r["dir"] for r in lt], jnp.float32),
                shape_id=jnp.asarray([r["shape_id"] for r in lt], jnp.int32),
                tri_start=jnp.asarray([r["tri_start"] for r in lt],
                                      jnp.int32),
                tri_count=jnp.asarray([r["tri_count"] for r in lt],
                                      jnp.int32),
                env_tex=jnp.asarray([r["env_tex"] for r in lt], jnp.int32),
                area=jnp.asarray([r.get("area", 0.0) for r in lt],
                                 jnp.float32),
                env_slot=jnp.full((len(lt),), -1, jnp.int32))
        else:
            from fountain_tpu.scene.types import no_lights
            lights = no_lights()
        # `light_tri is not None` (only when some light samples mesh
        # faces) is the STATIC gate for the AREA_TRI branch in
        # lights.sample_light — an always-attached table made every scene
        # pay the per-bounce masked face-sampling gathers (measured
        # ~200 ms/step at 512^2 on v5e for a scene with no mesh light)
        if light_tri is not None:
            light_tri = jnp.asarray(light_tri)

        # world bounds (reference Scene::new light preprocess,
        # scene/mod.rs:32-49 / infinite.rs:93-97)
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)
        for r in self._spheres:
            c = r["o2w"][:3, 3]
            rad = abs(r["radius"]) * float(
                np.linalg.norm(r["o2w"][:3, :3], 2))
            lo = np.minimum(lo, c - rad)
            hi = np.maximum(hi, c + rad)
        for m in self._tri_meshes:
            if len(m["positions"]):
                lo = np.minimum(lo, m["positions"].min(0))
                hi = np.maximum(hi, m["positions"].max(0))
        if not np.all(np.isfinite(lo)):
            lo = np.zeros(3, np.float32)
            hi = np.ones(3, np.float32)
        center = (lo + hi) / 2.0
        radius = float(np.linalg.norm(hi - center))

        # image atlas + per-light env-map importance distributions
        # (reference builds one Distribution2D per InfiniteAreaLight,
        # infinite.rs:63-77; a shared one would give wrong MIS pdfs with
        # two env maps in a scene)
        atlas = None
        env_dist = None
        env_slots = {}
        if self._images:
            from fountain_tpu.shading.mipmap import build_atlas
            atlas = build_atlas(self._images, self._image_wraps)
            per_light = self._env_light_images()
            if per_light:
                from fountain_tpu.core.sampling import make_env_alias_stack
                funcs = []
                # common grid: nearest-UPsample every map to the largest
                # size so the stack shares one shape; replication preserves
                # each map's support exactly (pdf > 0 wherever L > 0)
                nv_c = max(self._images[i].shape[0] for _, i in per_light)
                nu_c = max(self._images[i].shape[1] for _, i in per_light)
                for slot, (lid, img_id) in enumerate(per_light):
                    img = self._images[img_id]
                    # luminance * sin(theta); row 0 is the image bottom
                    # (v=0) => theta = pi*(1 - v)
                    lum = (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
                           + 0.072169 * img[..., 2])
                    # Radiance lookups bilerp the map, spreading each
                    # texel's energy over a 2x2-texel tent; convolve the
                    # sampling density with the per-texel tent integrals
                    # [1/8, 3/4, 1/8] so pdf > 0 wherever the bilerped
                    # radiance is > 0 (keeps the light-sampling estimator
                    # unbiased even for delta-texel maps).
                    k = np.array([0.125, 0.75, 0.125], np.float32)
                    pad = np.concatenate(  # wrap in u (azimuthal seam)
                        [lum[:, -1:], lum, lum[:, :1]], axis=1)
                    lum_u = (k[0] * pad[:, :-2] + k[1] * pad[:, 1:-1]
                             + k[2] * pad[:, 2:])
                    pad = np.concatenate(  # clamp in v (poles)
                        [lum_u[:1], lum_u, lum_u[-1:]], axis=0)
                    lum_b = (k[0] * pad[:-2] + k[1] * pad[1:-1]
                             + k[2] * pad[2:])
                    h, w = lum_b.shape
                    if (h, w) != (nv_c, nu_c):
                        ri = np.minimum((np.arange(nv_c) * h) // nv_c, h - 1)
                        ci = np.minimum((np.arange(nu_c) * w) // nu_c, w - 1)
                        lum_b = lum_b[ri][:, ci]
                    v = (np.arange(nv_c, dtype=np.float32) + 0.5) / nv_c
                    sin_t = np.sin(np.pi * (1.0 - v))
                    funcs.append(lum_b * sin_t[:, None])
                    env_slots[lid] = slot
                env_dist = make_env_alias_stack(funcs)
        if self._lights and lights.count:
            lights = lights._replace(env_slot=jnp.asarray(
                [env_slots.get(i, -1) for i in range(len(self._lights))],
                jnp.int32))

        return Scene(
            spheres=spheres, triangles=triangles, materials=materials,
            textures=textures, lights=lights,
            world_center=jnp.asarray(center, jnp.float32),
            world_radius=jnp.asarray(max(radius, 1e-3), jnp.float32),
            light_tri=light_tri, env_images=atlas, env_dist=env_dist)

    def _env_light_images(self):
        """[(light_idx, image_id)] for every env-mapped infinite light
        (resolving scale/checker nesting to the underlying TEX_IMAGE)."""
        out = []
        for lid, r in enumerate(self._lights):
            if r["ltype"] == LIGHT_INFINITE and r["env_tex"] >= 0:
                tid = r["env_tex"]
                for _ in range(4):
                    row = self._tex[tid]
                    if row["ttype"] == TEX_IMAGE:
                        out.append((lid, row["image_id"]))
                        break
                    if row["ttype"] == TEX_SCALE:
                        tid = row["sub_a"]
                        continue
                    break
        return out
