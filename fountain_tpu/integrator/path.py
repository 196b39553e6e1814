"""Wavefront unidirectional path integrator with NEE + MIS.

TPU-native analog of reference ``src/integrator/path.rs`` (the iterative
per-ray bounce loop :25-95) and the shared NEE/MIS machinery
(``uniform_sample_one_light`` / ``estimate_direct``,
src/integrator/mod.rs:289-395):

- the whole wavefront of lanes advances together through a statically
  unrolled bounce loop; per-lane divergence (escape, RR death, black BSDF
  sample) is handled by an `active` mask instead of `break`,
- emitted radiance is added on bounce 0 / after specular bounces
  (path.rs:43-51); NEE picks one light uniformly per bounce
  (mod.rs:289-305) and combines light- and BSDF-sampling with the power
  heuristic (mod.rs:336,362),
- Russian roulette after 3 bounces below the throughput threshold
  (path.rs:84-91),
- every random number is a counter-based hash of
  (lane, sample, bounce, slot) — see core.rng.

Differentiability: sampled directions / discrete choices are detached
(stop_gradient) so gradients flow through the integrand f·L·cos/pdf —
the detached-sampling estimator. The reference has no gradient story.

Known deviation: lanes hitting a null-BSDF material (mat_id = -1) pass
through but *do* consume a bounce iteration here (the reference `continue`s
without incrementing, path.rs:77-81); only affects scenes with null
materials at extreme depth budgets.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fountain_tpu.core import rng
from fountain_tpu.core.sampling import power_heuristic
from fountain_tpu.core.vecmath import (SHADOW_EPSILON, absdot, dot,
                                       normalize, offset_ray_origin)
from fountain_tpu.geometry.intersect import (Hit, scene_intersect,
                                             scene_intersect_any, spawn_ray)
from fountain_tpu.lights.lights import (emitted_radiance,
                                        environment_radiance, light_pdf,
                                        sample_light)
from fountain_tpu.scene.types import Scene
from fountain_tpu.shading.bsdf import (bsdf_f_pdf, bsdf_sample,
                                       gather_shading, has_non_specular,
                                       local_to_world, world_to_local)

# RNG slot layout within a bounce (dims are bounce*SLOTS + slot)
_SLOTS = 4
_SLOT_BSDF = 0      # u_lobe, u1, u2
_SLOT_LIGHT = 1     # light select, u_light x2
_SLOT_SCATTER = 2   # u_scattering x2 (MIS bsdf branch)
_SLOT_RR = 3
DIM_CAMERA = 1 << 20  # camera jitter/lens dims live far above bounce dims


class PathConfig(NamedTuple):
    max_depth: int = 5
    rr_threshold: float = 1.0
    nee: bool = True          # next-event estimation on (reference default)
    emit_all_bounces: bool = False  # BSDF-sampling-only mode (nee=False)
    # "path": full path tracing (reference path.rs)
    # "direct": direct lighting + specular recursion (direct_lighting.rs,
    #           UniformSampleOne strategy)
    # "whitted": all-lights direct, light-sampling only, + specular
    #            recursion (whitted.rs)
    mode: str = "path"


def _estimate_direct(scene: Scene, hit: Hit, sp, light_idx, n_lights,
                     u_light, u_scatter, detach, bsdf_branch: bool = True,
                     active=None):
    """One-light direct illumination (reference estimate_direct,
    integrator/mod.rs:307-395).

    With ``bsdf_branch=False`` only the light-sampling branch runs (one
    shadow ray, no extra scene traversal); the BSDF-sampling MIS branch is
    then the *continuation ray's* emission gather in the bounce loop —
    the wavefront restructure that cuts traversal sweeps per bounce from
    3 to 2. ``active`` feeds the sweep's dead-tile occupancy skip.
    """
    wo_l = world_to_local(hit, hit.wo)

    # ---- light-sampling branch
    ls = sample_light(scene, light_idx, hit.p, u_light[0], u_light[1])
    wi = detach(ls.wi)
    wi_l = world_to_local(hit, wi)
    f, scattering_pdf = bsdf_f_pdf(sp, wo_l, wi_l)
    f_cos = f * absdot(wi, hit.ns)[..., None]
    light_pdf_val = detach(ls.pdf)

    possible = (light_pdf_val > 0.0) & jnp.any(ls.radiance > 0.0, -1) \
        & jnp.any(f_cos > 0.0, -1)
    # shadow ray (VisibilityTester::unoccluded, light/mod.rs:82-85 →
    # spawn_ray_to_hit, interaction.rs:47-58)
    o_sh = offset_ray_origin(hit.p, hit.p_err, hit.n, wi)
    target = jnp.where(
        ls.is_infinite[..., None] | ls.is_delta[..., None], ls.p_light,
        offset_ray_origin(ls.p_light, ls.p_light_err, ls.n_light,
                          o_sh - ls.p_light))
    d_sh = target - o_sh
    t_max = jnp.where(possible, 1.0 - SHADOW_EPSILON, -1.0)  # skip dead lanes
    sh_active = possible if active is None else (possible & active)
    occluded = scene_intersect_any(scene, o_sh, d_sh, t_max, active=sh_active)
    unocc = possible & ~occluded

    weight_l = jnp.where(ls.is_delta, 1.0,
                         power_heuristic(1, light_pdf_val, 1,
                                         detach(scattering_pdf)))
    ld = jnp.where(
        unocc[..., None],
        f_cos * ls.radiance * (weight_l
                               / jnp.maximum(light_pdf_val, 1e-12))[..., None],
        0.0)
    if not bsdf_branch:
        return ld

    # ---- BSDF-sampling branch (skipped for delta lights, mod.rs:344-346)
    bs = bsdf_sample(sp, wo_l, u_scatter[0], u_scatter[1], u_scatter[2])
    wi_b = detach(local_to_world(hit, bs.wi))
    f_b = bs.f * absdot(wi_b, hit.ns)[..., None]
    bsdf_ok = bs.valid & ~ls.is_delta & jnp.any(f_b > 0.0, -1) & ~bs.is_specular

    # trace the BSDF-sampled ray; count light only if we hit THIS light.
    # Traced BEFORE the light-pdf query: mesh area lights derive their pdf
    # from the hit (lights.light_pdf).
    o_b = spawn_ray(hit, wi_b)
    t_inf = jnp.where(bsdf_ok, jnp.inf, -1.0)
    hit_b = scene_intersect(scene, o_b, wi_b, t_inf)
    lpdf_b = light_pdf(scene, light_idx, hit.p, wi_b, hit=hit_b)
    bsdf_ok = bsdf_ok & (lpdf_b > 0.0)
    weight_b = power_heuristic(1, detach(bs.pdf), 1, detach(lpdf_b))
    same_light = hit_b.valid & (hit_b.light_id == light_idx)
    li_surface = jnp.where(same_light[..., None],
                           emitted_radiance(scene, hit_b), 0.0)
    from fountain_tpu.scene.types import LIGHT_INFINITE
    is_inf_light = scene.lights.ltype[
        jnp.clip(light_idx, 0, max(n_lights - 1, 0))] == LIGHT_INFINITE
    li_env = jnp.where((~hit_b.valid & is_inf_light)[..., None],
                       environment_radiance(scene, wi_b), 0.0)
    li = li_surface + li_env
    lb = jnp.where(
        bsdf_ok[..., None],
        f_b * li * (weight_b / jnp.maximum(detach(bs.pdf), 1e-12))[..., None],
        0.0)
    return ld + lb


def trace_paths(scene: Scene, o, d, lane, sample, cfg: PathConfig,
                seed=0, detach_sampling: bool = True,
                count_rays: bool = False, cone_spread=None):
    """Trace one camera-path per lane; returns radiance [N, 3]
    (or (radiance, n_rays) with count_rays=True, where n_rays is the exact
    number of useful rays traced: one closest-hit per active lane per bounce
    plus shadow + MIS rays on NEE bounces — the benchmark accounting).

    o, d: camera ray origins/directions [N,3]; lane/sample: int arrays [N]
    feeding the counter-based RNG.
    """
    n_lights = scene.lights.count
    detach = jax.lax.stop_gradient if detach_sampling else (lambda x: x)

    n = o.shape[:-1]
    state = dict(
        o=o, d=d,
        beta=jnp.ones(n + (3,), jnp.float32),
        radiance=jnp.zeros(n + (3,), jnp.float32),
        active=jnp.ones(n, bool),
        specular=jnp.zeros(n, bool),
        n_rays=jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64
                         else jnp.int32),
        # ray-cone width for texture filtering (reference texture
        # differentials, interaction.rs:123-173 → the cone approximation)
        cone_width=jnp.zeros(n, jnp.float32),
        # BSDF pdf of the ray that produced the NEXT hit: the emission
        # gather at that hit MIS-weights against it (the continuation ray
        # doubles as the reference's estimate_direct BSDF-sample ray,
        # integrator/mod.rs:346-391 — one traversal instead of two)
        prev_pdf=jnp.ones(n, jnp.float32),
    )
    spread = jnp.zeros(n, jnp.float32) if cone_spread is None \
        else jnp.broadcast_to(cone_spread, n)

    # --- lane-major packed loop carry -------------------------------------
    # TPU tiles f32 arrays as (8 sublanes, 128 lanes) with the LAST axis on
    # lanes; a materialized [N,3] costs 42x (and [N,1] 128x) its logical
    # size in HBM. Per-bounce state therefore crosses the scan boundary as
    # ONE [16, N] array (rows = o,d,beta,radiance,cone,active,specular):
    # 16 sublanes x N lanes tiles exactly, so the rematerialized backward
    # pass saves 16MB/bounce instead of ~3GB. Inside the (fused) body the
    # [N,3] convention is unchanged.
    flat = len(n) == 1

    def _pack(st):
        rows = [st["o"].T, st["d"].T, st["beta"].T, st["radiance"].T,
                st["cone_width"][None], st["active"][None].astype(jnp.float32),
                st["specular"][None].astype(jnp.float32),
                st["prev_pdf"][None]]
        return jnp.concatenate(rows, axis=0)

    def _unpack(p, n_rays):
        # o/d/cone/prev_pdf never carry tangents (detached-sampling
        # estimator: positions, directions and pdfs are *choices*); detach
        # them so packing them next to the differentiable beta/radiance
        # rows doesn't spuriously extend the tangent graph into geometry
        sg = jax.lax.stop_gradient if detach_sampling else (lambda x: x)
        return dict(
            o=sg(p[0:3].T), d=sg(p[3:6].T), beta=p[6:9].T,
            radiance=p[9:12].T, cone_width=sg(p[12]), active=p[13] > 0.5,
            specular=p[14] > 0.5, prev_pdf=sg(p[15]), n_rays=n_rays)

    # the new-estimator MIS gather applies on path-mode NEE bounces
    nee_gather = cfg.nee and n_lights > 0 and cfg.mode == "path"

    def bounce_body(bounce, st):
        t_max = jnp.where(st["active"], jnp.inf, -1.0)
        hit = scene_intersect(scene, st["o"], st["d"], t_max,
                              active=st["active"])
        if count_rays:
            st["n_rays"] = st["n_rays"] + jnp.sum(
                st["active"].astype(st["n_rays"].dtype))

        # --- emitted radiance. Full weight on camera/specular/null-NEE
        # bounces (path.rs:43-51); on NEE bounces the continuation ray IS
        # the BSDF-sampling MIS branch of the previous vertex's
        # estimate_direct (integrator/mod.rs:346-391), so emission counts
        # with the power-heuristic weight against the hit light's own
        # sampling pdf — per-light weights sum to 1 with the NEE branch.
        gate = (bounce == 0) | st["specular"] | cfg.emit_all_bounces
        le_surf = emitted_radiance(scene, hit)
        if nee_gather:
            lpdf_surf = detach(light_pdf(
                scene, jnp.maximum(hit.light_id, 0), st["o"], st["d"],
                hit=hit))
            w_surf = jnp.where(
                gate, 1.0,
                power_heuristic(1, st["prev_pdf"], 1, lpdf_surf))
            le_env = jnp.zeros_like(st["radiance"])
            from fountain_tpu.lights.lights import environment_light_radiance
            from fountain_tpu.scene.types import LIGHT_INFINITE
            for k in range(n_lights):
                pdf_k = detach(light_pdf(
                    scene, jnp.full(lane.shape, k, jnp.int32), st["o"],
                    st["d"]))
                is_inf_k = scene.lights.ltype[k] == LIGHT_INFINITE
                w_k = jnp.where(gate | ~is_inf_k, 1.0,
                                power_heuristic(1, st["prev_pdf"], 1, pdf_k))
                le_env = le_env + w_k[..., None] * environment_light_radiance(
                    scene, k, st["d"])
            le_env = jnp.where(hit.valid[..., None], 0.0, le_env)
            st["radiance"] = st["radiance"] + jnp.where(
                st["active"][..., None],
                st["beta"] * (w_surf[..., None] * le_surf + le_env), 0.0)
        else:
            le_env = jnp.where(hit.valid[..., None], 0.0,
                               environment_radiance(scene, st["d"]))
            st["radiance"] = st["radiance"] + jnp.where(
                (st["active"] & gate)[..., None],
                st["beta"] * (le_surf + le_env), 0.0)

        # --- terminate: escaped or depth cap (path.rs:53-56)
        alive = st["active"] & hit.valid & (bounce < cfg.max_depth)

        # ray-cone footprint at the hit -> mipmap filter width in uv space
        t_hit = jnp.where(hit.valid, hit.t, 0.0)
        width_at_hit = st["cone_width"] + t_hit * spread
        tex_width = width_at_hit * hit.inv_uv_scale
        st["cone_width"] = jnp.where(alive, width_at_hit, st["cone_width"])

        sp = gather_shading(scene, hit, tex_width=tex_width)
        null_bsdf = alive & (sp.mtype < 0)

        # --- NEE (path.rs:60-64) on lanes with non-specular lobes.
        # Path mode runs the light-sampling branch only (1 shadow ray);
        # its MIS partner is the next bounce's emission gather (above).
        # Direct mode keeps the reference's standalone BSDF-sample ray
        # because non-specular continuation lanes terminate there.
        if cfg.nee and n_lights > 0 and cfg.mode != "whitted":
            u_sel = rng.uniform4(lane, sample, bounce * _SLOTS + _SLOT_LIGHT,
                                 seed)
            u_sc = rng.uniform4(lane, sample, bounce * _SLOTS + _SLOT_SCATTER,
                                seed)
            light_idx = jnp.minimum(
                (u_sel[0] * n_lights).astype(jnp.int32), n_lights - 1)
            nee_on = alive & has_non_specular(sp) & ~null_bsdf
            # mask dead lanes by zeroing beta contribution
            direct = _estimate_direct(
                scene, hit, sp, light_idx, n_lights,
                (u_sel[1], u_sel[2]), (u_sc[0], u_sc[1], u_sc[2]), detach,
                bsdf_branch=(cfg.mode != "path"), active=nee_on)
            st["radiance"] = st["radiance"] + jnp.where(
                nee_on[..., None],
                st["beta"] * jnp.float32(n_lights) * direct, 0.0)
            if count_rays:  # shadow ray per NEE lane (+MIS ray in direct)
                per_lane = 1 if cfg.mode == "path" else 2
                st["n_rays"] = st["n_rays"] + per_lane * jnp.sum(
                    nee_on.astype(st["n_rays"].dtype))
        elif n_lights > 0 and cfg.mode == "whitted":
            # Whitted: loop over ALL lights, light sampling only, no MIS
            # (reference whitted.rs:24-45)
            u_sc = rng.uniform4(lane, sample, bounce * _SLOTS + _SLOT_LIGHT,
                                seed)
            nee_on = alive & has_non_specular(sp) & ~null_bsdf
            wo_l_w = world_to_local(hit, hit.wo)
            total = jnp.zeros_like(st["radiance"])
            for i in range(n_lights):
                li = jnp.full(lane.shape, i, jnp.int32)
                ui = rng.uniform4(lane, sample,
                                  bounce * _SLOTS + _SLOT_SCATTER, seed + i)
                ls = sample_light(scene, li, hit.p, ui[0], ui[1])
                wi_l = world_to_local(hit, detach(ls.wi))
                f, _ = bsdf_f_pdf(sp, wo_l_w, wi_l)
                f_cos = f * absdot(detach(ls.wi), hit.ns)[..., None]
                ok = (detach(ls.pdf) > 0.0) & jnp.any(f_cos > 0.0, -1) \
                    & jnp.any(ls.radiance > 0.0, -1)
                o_sh = offset_ray_origin(hit.p, hit.p_err, hit.n,
                                         detach(ls.wi))
                target = jnp.where(
                    (ls.is_infinite | ls.is_delta)[..., None], ls.p_light,
                    offset_ray_origin(ls.p_light, ls.p_light_err,
                                      ls.n_light, o_sh - ls.p_light))
                t_sh = jnp.where(ok, 1.0 - SHADOW_EPSILON, -1.0)
                occ = scene_intersect_any(scene, o_sh, target - o_sh, t_sh)
                contrib = f_cos * ls.radiance \
                    / jnp.maximum(detach(ls.pdf), 1e-12)[..., None]
                total = total + jnp.where((ok & ~occ)[..., None], contrib,
                                          0.0)
            st["radiance"] = st["radiance"] + jnp.where(
                nee_on[..., None], st["beta"] * total, 0.0)
            if count_rays:
                st["n_rays"] = st["n_rays"] + n_lights * jnp.sum(
                    nee_on.astype(st["n_rays"].dtype))

        # --- BSDF sampling for continuation (path.rs:66-76)
        ub = rng.uniform4(lane, sample, bounce * _SLOTS + _SLOT_BSDF, seed)
        wo_l = world_to_local(hit, hit.wo)
        bs = bsdf_sample(sp, wo_l, ub[0], ub[1], ub[2])
        wi_w = detach(normalize(local_to_world(hit, bs.wi)))
        f_ok = bs.valid & jnp.any(bs.f != 0.0, -1)
        contrib = bs.f * (absdot(wi_w, hit.ns)
                          / jnp.maximum(detach(bs.pdf), 1e-12))[..., None]
        new_beta = st["beta"] * jnp.where(f_ok[..., None], contrib, 1.0)
        new_o = spawn_ray(hit, wi_w)

        # null bsdf: pass through unchanged (see module docstring)
        pass_o = offset_ray_origin(hit.p, hit.p_err, hit.n, st["d"])
        st["o"] = jnp.where(null_bsdf[..., None], pass_o,
                            jnp.where(alive[..., None], new_o, st["o"]))
        st["d"] = jnp.where(null_bsdf[..., None], st["d"],
                            jnp.where(alive[..., None], wi_w, st["d"]))
        st["beta"] = jnp.where((alive & ~null_bsdf)[..., None], new_beta,
                               st["beta"])
        st["specular"] = jnp.where(null_bsdf, st["specular"],
                                   jnp.where(alive, bs.is_specular,
                                             st["specular"]))
        # pdf of the continuation direction, for the next gather's MIS
        # weight (null pass-through keeps the original vertex's pdf)
        st["prev_pdf"] = jnp.where(null_bsdf, st["prev_pdf"],
                                   jnp.where(alive, detach(bs.pdf),
                                             st["prev_pdf"]))
        alive = alive & (null_bsdf | f_ok)
        if cfg.mode != "path":
            # direct/whitted continue only through specular lobes
            # (direct_lighting.rs:60-76, whitted.rs:47-66)
            alive = alive & (null_bsdf | bs.is_specular)

        # --- Russian roulette (path.rs:84-91)
        if cfg.rr_threshold > 0.0:
            u_rr = rng.uniform1(lane, sample, bounce * _SLOTS + _SLOT_RR,
                                seed)
            beta_max = detach(jnp.max(st["beta"], axis=-1))
            do_rr = alive & (beta_max < cfg.rr_threshold) & (bounce > 3)
            q = jnp.maximum(0.05, 1.0 - beta_max)
            die = do_rr & (u_rr < q)
            st["beta"] = jnp.where(
                (do_rr & ~die)[..., None],
                st["beta"] / jnp.maximum(1.0 - q, 1e-6)[..., None],
                st["beta"])
            alive = alive & ~die

        st["active"] = alive
        return st

    if flat:
        # scan over bounces with a rematerialized body: backward recomputes
        # each bounce from its 16-row packed carry instead of saving every
        # padded [N,*] intermediate (see _pack note above). The intersection
        # sweeps' raw (t, idx, valid) ARE saved (checkpoint_name "isect" in
        # geometry.intersect): they carry no gradient, and re-running the
        # Pallas sweeps in the backward pass was 5x the whole forward cost.
        import functools as _ft
        _policy = jax.checkpoint_policies.save_only_these_names("isect")

        @_ft.partial(jax.checkpoint, policy=_policy)
        def scan_body(carry, bounce):
            packed, n_rays = carry
            st = _unpack(packed, n_rays)
            st = bounce_body(bounce, st)
            return (_pack(st), st["n_rays"]), None

        (packed, n_rays), _ = jax.lax.scan(
            scan_body, (_pack(state), state["n_rays"]),
            jnp.arange(cfg.max_depth + 1))
        state = _unpack(packed, n_rays)
    else:
        state = jax.lax.fori_loop(0, cfg.max_depth + 1, bounce_body, state)
    if count_rays:
        return state["radiance"], state["n_rays"]
    return state["radiance"]
