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

Layout: ALL per-lane state is flat [N] arrays (vectors as component-SoA
V3 — see core.vecmath.V3). A [N, 3]-materializing formulation padded
42.7x under TPU (8,128) tiling and was ~85% of the round-2 step time;
flat [N] leaves also make the scan carry packing-free.

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
from fountain_tpu.core.vecmath import (SHADOW_EPSILON, V3, absdot, dot,
                                       normalize, offset_ray_origin, where3,
                                       zeros3)
from fountain_tpu.geometry.intersect import (Hit, scene_intersect,
                                             scene_intersect_any, spawn_ray)
from fountain_tpu.lights.lights import (emitted_radiance,
                                        environment_radiance, light_pdf,
                                        sample_light)
from fountain_tpu.scene.types import Scene
from fountain_tpu.shading.bsdf import (bsdf_f_pdf, bsdf_sample,
                                       gather_shading, has_non_specular,
                                       local_to_world, world_to_local)

# debug: names added here get their gradient contribution severed
# (stop_gradient) to bisect NaN sources; empty in production
_DBG_SG = set()

# named residuals saved across the bounce-scan remat (see trace_paths):
# "isect" = raw intersection sweep results, "nee" = the per-bounce NEE
# contribution, "rows" = gathered table rows (a 262k-index row gather is
# ~2.3 ms on v5e regardless of width — saving beats re-gathering),
# "shade" = shading params
_CKPT_SAVE_NAMES = ("isect", "nee", "rows", "shade")


def _dbg(name, x):
    if name in _DBG_SG:
        return jax.tree.map(jax.lax.stop_gradient, x)
    return x


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
                     active=None, presorted: bool = False) -> V3:
    """One-light direct illumination (reference estimate_direct,
    integrator/mod.rs:307-395).

    With ``bsdf_branch=False`` only the light-sampling branch runs (one
    shadow ray, no extra scene traversal); the BSDF-sampling MIS branch is
    then the *continuation ray's* emission gather in the bounce loop —
    the wavefront restructure that cuts traversal sweeps per bounce from
    3 to 2. ``active`` feeds the sweep's dead-tile occupancy skip; with
    ``presorted=True`` the wave is already live-lanes-first (the
    keep-permuted bounce loop) and ``active`` must be that clustered
    parent mask — dead shadow lanes then ride t_max < 0 only.
    """
    wo_l = world_to_local(hit, hit.wo)

    # ---- light-sampling branch
    ls = sample_light(scene, light_idx, hit.p, u_light[0], u_light[1])
    wi = detach(ls.wi)
    wi_l = world_to_local(hit, wi)
    f, scattering_pdf = bsdf_f_pdf(sp, wo_l, wi_l)
    f = _dbg("nee_f", f)
    f_cos = f * absdot(wi, _dbg("nee_ns", hit.ns))
    light_pdf_val = detach(ls.pdf)

    possible = (light_pdf_val > 0.0) & ls.radiance.any_positive() \
        & f_cos.any_positive()
    # shadow ray (VisibilityTester::unoccluded, light/mod.rs:82-85 →
    # spawn_ray_to_hit, interaction.rs:47-58)
    o_sh = offset_ray_origin(hit.p, hit.p_err, hit.n, wi)
    target = where3(
        ls.is_infinite | ls.is_delta, ls.p_light,
        offset_ray_origin(ls.p_light, ls.p_light_err, ls.n_light,
                          o_sh - ls.p_light))
    d_sh = target - o_sh
    t_max = jnp.where(possible, 1.0 - SHADOW_EPSILON, -1.0)  # skip dead lanes
    sh_active = active if presorted else \
        (possible if active is None else (possible & active))
    occluded = scene_intersect_any(scene, o_sh, d_sh, t_max, active=sh_active,
                                   presorted=presorted)
    unocc = possible & ~occluded

    weight_l = jnp.where(ls.is_delta, 1.0,
                         power_heuristic(1, light_pdf_val, 1,
                                         detach(scattering_pdf)))
    ld = where3(
        unocc,
        f_cos * _dbg("nee_rad", ls.radiance)
        * (_dbg("nee_w", weight_l) / jnp.maximum(light_pdf_val, 1e-12)),
        0.0)
    if not bsdf_branch:
        return ld

    # ---- BSDF-sampling branch (skipped for delta lights, mod.rs:344-346)
    bs = bsdf_sample(sp, wo_l, u_scatter[0], u_scatter[1], u_scatter[2],
                     detach_wi=detach is jax.lax.stop_gradient)
    wi_b = detach(local_to_world(hit, bs.wi))
    f_b = bs.f * absdot(wi_b, hit.ns)
    bsdf_ok = bs.valid & ~ls.is_delta & f_b.any_positive() & ~bs.is_specular

    # trace the BSDF-sampled ray; count light only if we hit THIS light.
    # Traced BEFORE the light-pdf query: mesh area lights derive their pdf
    # from the hit (lights.light_pdf).
    o_b = spawn_ray(hit, wi_b)
    t_inf = jnp.where(bsdf_ok, jnp.inf, -1.0)
    hit_b = scene_intersect(scene, o_b, wi_b, t_inf,
                            active=active if presorted else None,
                            presorted=presorted)
    lpdf_b = light_pdf(scene, light_idx, hit.p, wi_b, hit=hit_b)
    bsdf_ok = bsdf_ok & (lpdf_b > 0.0)
    weight_b = power_heuristic(1, detach(bs.pdf), 1, detach(lpdf_b))
    same_light = hit_b.valid & (hit_b.light_id == light_idx)
    li_surface = where3(same_light, emitted_radiance(scene, hit_b), 0.0)
    from fountain_tpu.scene.types import LIGHT_INFINITE
    is_inf_light = scene.lights.ltype[
        jnp.clip(light_idx, 0, max(n_lights - 1, 0))] == LIGHT_INFINITE
    li_env = where3(~hit_b.valid & is_inf_light,
                    environment_radiance(scene, wi_b), 0.0)
    li = li_surface + li_env
    lb = where3(
        bsdf_ok,
        f_b * li * (weight_b / jnp.maximum(detach(bs.pdf), 1e-12)),
        0.0)
    return ld + lb


# Keep-permuted carry: every per-lane leaf of the bounce state is
# reordered with its own FLAT 1-D gather. Measured on v5e (tools
# microbench): 20 independent 262k-lane flat gathers run at HBM speed
# (~0.1 ms total) — while any [N, C<128] packing materializes
# f32[N,1]{T(8,128)} producer buffers padded 128x (134 MB each!), which
# multiplied the whole step 4x when tried. Flat [N] arrays never pad.
def _permute_state(st: dict, perm, inv) -> dict:
    """Reorder every per-lane leaf of the carry by ``perm`` (inverse
    ``inv``); see core.gather.permute_rows for the permutation-aware VJP
    (beta/radiance carry gradients — backward is a gather by ``inv``,
    not a scatter)."""
    from fountain_tpu.core.gather import permute_rows
    out = dict(st)
    for k, v in st.items():
        if isinstance(v, V3):
            out[k] = V3(permute_rows(v.x, perm, inv),
                        permute_rows(v.y, perm, inv),
                        permute_rows(v.z, perm, inv))
        elif getattr(v, "ndim", None) == 1:
            out[k] = permute_rows(v, perm, inv)
    return out


class RegenResult(NamedTuple):
    """Result of a path-regeneration wave (see trace_paths ``regen_fn``):
    per-lane radiance summed over all COMPLETED samples, the number of
    completed samples, and (count_rays) the exact useful-ray count."""
    accum: V3
    n_done: jnp.ndarray
    n_rays: jnp.ndarray


def trace_paths(scene: Scene, o: V3, d: V3, lane, sample, cfg: PathConfig,
                seed=0, detach_sampling: bool = True,
                count_rays: bool = False, cone_spread=None,
                regen_fn=None, n_iters: int | None = None):
    """Trace one camera-path per lane; returns radiance V3 over [N]
    (or (radiance, n_rays) with count_rays=True, where n_rays is the exact
    number of useful rays traced: one closest-hit per active lane per bounce
    plus shadow + MIS rays on NEE bounces — the benchmark accounting).

    o, d: camera ray origins/directions (component-SoA V3 of [N]);
    lane/sample: int arrays [N] feeding the counter-based RNG.

    Path regeneration (``regen_fn`` + ``n_iters``): the round-4 wave ran
    every per-bounce op full-width while only 25% of lanes were alive
    (lane_occupancy 0.254) — dead lanes paid full price for nothing,
    because on TPU every gather/fusion runs over all N lanes regardless.
    With ``regen_fn(lane, sample) -> (o, d, spread)`` supplied, a lane
    whose path terminates immediately starts the NEXT sample of the same
    pixel (sample counter + 1, fresh counter-RNG streams) instead of
    idling, for the first ``n_iters - (max_depth + 1)`` iterations; the
    remaining iterations drain in-flight paths to completion so every
    started path is fully traced (no tail truncation bias — the classic
    wavefront-regeneration scheme, cf. Laine et al. 2013, on top of
    reference path.rs:25-95 semantics). Returns RegenResult with the
    per-lane COMPLETED-sample radiance sum and count; the per-pixel
    estimator is accum/n_done (each completed sample is an unbiased
    pixel-radiance sample; n_done depends only on detached path-length
    events). Requires flat [N] lanes and mode="path"/"direct"/"whitted"
    as usual; per-lane depth rides in the carry, so the bounce index the
    body sees is an ARRAY (the RNG dims, emission gate, depth cap, and RR
    gate all broadcast).
    """
    n_lights = scene.lights.count
    detach = jax.lax.stop_gradient if detach_sampling else (lambda x: x)

    # materialize the camera rays ONCE: without the barrier XLA freely
    # duplicates the whole ray-generation chain (counter-RNG hash + camera
    # transforms) into every consumer fusion — measured 660 ms/step of
    # recompute at 512^2 when rays are traced in-jit values (the bench /
    # render_wave path) instead of jit arguments
    o, d = jax.lax.optimization_barrier((o, d))
    if cone_spread is not None:
        cone_spread = jax.lax.optimization_barrier(cone_spread)

    n = o.shape
    ones = jnp.ones(n, jnp.float32)
    state = dict(
        ox=o.x, oy=o.y, oz=o.z, dx=d.x, dy=d.y, dz=d.z,
        beta=V3(ones, ones, ones),
        radiance=zeros3(n),
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
        # per-lane identity rides IN the carry so the whole wavefront can
        # be kept Morton-permuted across a bounce (see _permute_state):
        # RNG counters travel with their lane; ``orig`` maps each slot
        # back to its input position for the single final unsort
        lane=jnp.broadcast_to(jnp.asarray(lane, jnp.int32), n),
        sample=jnp.broadcast_to(jnp.asarray(sample, jnp.int32), n),
        orig=jnp.arange(n[0], dtype=jnp.int32) if len(n) == 1 else None,
        spread=(jnp.zeros(n, jnp.float32) if cone_spread is None
                else jnp.broadcast_to(cone_spread, n)),
    )
    if state["orig"] is None:
        del state["orig"]

    # the new-estimator MIS gather applies on path-mode NEE bounces
    nee_gather = cfg.nee and n_lights > 0 and cfg.mode == "path"

    def bounce_body(bounce, st, first: bool = False, permute: bool = False):
        if permute and not first:
            # reorder the WHOLE carry once per bounce (Morton key over the
            # continuation rays, dead lanes last): the closest-hit sweep,
            # the shadow sweep, and all shading/NEE gathers then run on a
            # spatially-coherent live-first wave with zero per-sweep
            # sort/unsort; radiance is unsorted ONCE after the last bounce
            from fountain_tpu.geometry.pallas_tri import sort_keys
            key = sort_keys(V3(st["ox"], st["oy"], st["oz"]),
                            V3(st["dx"], st["dy"], st["dz"]))
            key = jnp.where(st["active"], key, jnp.int32(2 ** 31 - 1))
            perm = jnp.argsort(jax.lax.stop_gradient(key))
            inv = jnp.argsort(perm)
            st = _permute_state(st, perm, inv)
        ro = V3(st["ox"], st["oy"], st["oz"])
        rd = V3(st["dx"], st["dy"], st["dz"])
        t_max = jnp.where(st["active"], jnp.inf, -1.0)
        # bounce 0 (static `first` under the unrolled loop): camera rays
        # are already pixel-coherent and every lane is live — the Morton
        # sort/permutation plumbing is pure overhead there
        hit = scene_intersect(scene, ro, rd, t_max,
                              active=None if first else st["active"],
                              sort=not first and not permute,
                              presorted=permute and not first)
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
                scene, jnp.maximum(hit.light_id, 0), ro, rd, hit=hit))
            w_surf = jnp.where(
                gate, 1.0,
                power_heuristic(1, st["prev_pdf"], 1, lpdf_surf))
            le_env = zeros3(n)
            from fountain_tpu.lights.lights import environment_light_radiance
            from fountain_tpu.scene.types import LIGHT_INFINITE
            for k in range(n_lights):
                pdf_k = detach(light_pdf(
                    scene, jnp.full(st["lane"].shape, k, jnp.int32), ro, rd))
                is_inf_k = scene.lights.ltype[k] == LIGHT_INFINITE
                w_k = jnp.where(gate | ~is_inf_k, 1.0,
                                power_heuristic(1, st["prev_pdf"], 1, pdf_k))
                le_env = le_env + environment_light_radiance(
                    scene, k, rd) * w_k
            le_env = where3(hit.valid, 0.0, le_env)
            st["radiance"] = st["radiance"] + _dbg("emit", where3(
                st["active"],
                st["beta"] * (le_surf * w_surf + le_env), 0.0))
        else:
            le_env = where3(hit.valid, 0.0, environment_radiance(scene, rd))
            st["radiance"] = st["radiance"] + _dbg("emit", where3(
                st["active"] & gate,
                st["beta"] * (le_surf + le_env), 0.0))

        # --- terminate: escaped or depth cap (path.rs:53-56)
        alive = st["active"] & hit.valid & (bounce < cfg.max_depth)

        # ray-cone footprint at the hit -> mipmap filter width in uv space.
        # Grazing incidence stretches the footprint by 1/cos(theta) along
        # the view direction (the reference's plane-projection
        # differentials capture this via the 2x2 solve,
        # interaction.rs:123-173); an isotropic cone tracks the minor
        # axis, so we elongate by 1/|cos| (clamped: the reference's
        # degenerate-projection fallback analog) to match the reference's
        # max-axis width = max(|duv/dx|, |duv/dy|). The 3D cone width
        # carried to the next bounce stays unstretched.
        t_hit = jnp.where(hit.valid, hit.t, 0.0)
        width_at_hit = st["cone_width"] + t_hit * st["spread"]
        abs_cos = jnp.abs(dot(hit.wo, hit.n))
        tex_width = width_at_hit * hit.inv_uv_scale \
            / jnp.maximum(abs_cos, 0.05)
        st["cone_width"] = jnp.where(alive, width_at_hit, st["cone_width"])

        sp = gather_shading(scene, hit, tex_width=tex_width)
        # tag shading params as nameable remat residuals ("shade"); whether
        # they are saved is decided by _CKPT_SAVE_NAMES
        from jax.ad_checkpoint import checkpoint_name as _cn_
        sp = jax.tree.map(
            lambda x: _cn_(x, "shade") if x.dtype == jnp.float32 else x, sp)
        null_bsdf = alive & (sp.mtype < 0)

        # --- NEE (path.rs:60-64) on lanes with non-specular lobes.
        # Path mode runs the light-sampling branch only (1 shadow ray);
        # its MIS partner is the next bounce's emission gather (above).
        # Direct mode keeps the reference's standalone BSDF-sample ray
        # because non-specular continuation lanes terminate there.
        if cfg.nee and n_lights > 0 and cfg.mode != "whitted":
            u_sel = rng.uniform4(st["lane"], st["sample"],
                                 bounce * _SLOTS + _SLOT_LIGHT, seed)
            u_sc = rng.uniform4(st["lane"], st["sample"],
                                bounce * _SLOTS + _SLOT_SCATTER, seed)
            light_idx = jnp.minimum(
                (u_sel[0] * n_lights).astype(jnp.int32), n_lights - 1)
            nee_on = alive & has_non_specular(sp) & ~null_bsdf
            # mask dead lanes by zeroing beta contribution
            direct = _estimate_direct(
                scene, hit, sp, light_idx, n_lights,
                (u_sel[1], u_sel[2]), (u_sc[0], u_sc[1], u_sc[2]), detach,
                bsdf_branch=(cfg.mode != "path"),
                active=(st["active"] if permute and not first else nee_on),
                presorted=permute and not first)
            # save the NEE result as a remat residual: recomputing the NEE
            # block (light sampling + shadow-sweep plumbing + masked
            # all-lobes eval) in the backward pass measured ~500 ms of the
            # 773 ms round-3 step — 3 [N] f32 saves per bounce buy it out
            from jax.ad_checkpoint import checkpoint_name as _cn
            direct = V3(_cn(direct.x, "nee"), _cn(direct.y, "nee"),
                        _cn(direct.z, "nee"))
            st["radiance"] = st["radiance"] + _dbg("nee", where3(
                nee_on, st["beta"] * direct * jnp.float32(n_lights), 0.0))
            if count_rays:  # shadow ray per NEE lane (+MIS ray in direct)
                per_lane = 1 if cfg.mode == "path" else 2
                st["n_rays"] = st["n_rays"] + per_lane * jnp.sum(
                    nee_on.astype(st["n_rays"].dtype))
        elif n_lights > 0 and cfg.mode == "whitted":
            # Whitted: loop over ALL lights, light sampling only, no MIS
            # (reference whitted.rs:24-45)
            nee_on = alive & has_non_specular(sp) & ~null_bsdf
            wo_l_w = world_to_local(hit, hit.wo)
            total = zeros3(n)
            for i in range(n_lights):
                li = jnp.full(st["lane"].shape, i, jnp.int32)
                ui = rng.uniform4(st["lane"], st["sample"],
                                  bounce * _SLOTS + _SLOT_SCATTER, seed + i)
                ls = sample_light(scene, li, hit.p, ui[0], ui[1])
                wi_l = world_to_local(hit, detach(ls.wi))
                f, _ = bsdf_f_pdf(sp, wo_l_w, wi_l)
                f_cos = f * absdot(detach(ls.wi), hit.ns)
                ok = (detach(ls.pdf) > 0.0) & f_cos.any_positive() \
                    & ls.radiance.any_positive()
                o_sh = offset_ray_origin(hit.p, hit.p_err, hit.n,
                                         detach(ls.wi))
                target = where3(
                    ls.is_infinite | ls.is_delta, ls.p_light,
                    offset_ray_origin(ls.p_light, ls.p_light_err,
                                      ls.n_light, o_sh - ls.p_light))
                t_sh = jnp.where(ok, 1.0 - SHADOW_EPSILON, -1.0)
                occ = scene_intersect_any(scene, o_sh, target - o_sh, t_sh)
                contrib = f_cos * ls.radiance \
                    * (1.0 / jnp.maximum(detach(ls.pdf), 1e-12))
                total = total + where3(ok & ~occ, contrib, 0.0)
            st["radiance"] = st["radiance"] + where3(
                nee_on, st["beta"] * total, 0.0)
            if count_rays:
                st["n_rays"] = st["n_rays"] + n_lights * jnp.sum(
                    nee_on.astype(st["n_rays"].dtype))

        # --- BSDF sampling for continuation (path.rs:66-76)
        ub = rng.uniform4(st["lane"], st["sample"],
                          bounce * _SLOTS + _SLOT_BSDF, seed)
        wo_l = world_to_local(hit, hit.wo)
        bs = bsdf_sample(sp, wo_l, ub[0], ub[1], ub[2],
                         detach_wi=detach_sampling)
        wi_w = detach(normalize(local_to_world(hit, bs.wi)))
        f_ok = bs.valid & bs.f.any_nonzero()
        contrib = bs.f * (absdot(wi_w, hit.ns)
                          / jnp.maximum(detach(bs.pdf), 1e-12))
        new_beta = st["beta"] * where3(f_ok, contrib, 1.0)
        new_o = spawn_ray(hit, wi_w)

        # null bsdf: pass through unchanged (see module docstring)
        pass_o = offset_ray_origin(hit.p, hit.p_err, hit.n, rd)
        new_ro = where3(null_bsdf, pass_o, where3(alive, new_o, ro))
        new_rd = where3(null_bsdf, rd, where3(alive, wi_w, rd))
        st["ox"], st["oy"], st["oz"] = new_ro.x, new_ro.y, new_ro.z
        st["dx"], st["dy"], st["dz"] = new_rd.x, new_rd.y, new_rd.z
        st["beta"] = _dbg("beta", where3(alive & ~null_bsdf, new_beta,
                                          st["beta"]))
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
            u_rr = rng.uniform1(st["lane"], st["sample"],
                                bounce * _SLOTS + _SLOT_RR, seed)
            beta_max = detach(st["beta"].max_component())
            do_rr = alive & (beta_max < cfg.rr_threshold) & (bounce > 3)
            q = jnp.maximum(0.05, 1.0 - beta_max)
            die = do_rr & (u_rr < q)
            st["beta"] = where3(do_rr & ~die,
                                st["beta"] * (1.0
                                              / jnp.maximum(1.0 - q, 1e-6)),
                                st["beta"])
            alive = alive & ~die

        st["active"] = alive
        return st

    flat = len(n) == 1
    if flat:
        # scan over bounces with a rematerialized body: backward recomputes
        # each bounce from the flat-[N] carry instead of saving every
        # intermediate. The intersection sweeps' raw (t, idx, valid) ARE
        # saved (checkpoint_name "isect" in geometry.intersect): they carry
        # no gradient, and re-running the Pallas sweeps in the backward
        # pass was 5x the whole forward cost. Geometry rows of the carry
        # (o, d, cone, prev_pdf) are detached on entry so the tangent graph
        # never extends into sampled positions/directions.
        import functools as _ft
        _policy = jax.checkpoint_policies.save_only_these_names(
            *_CKPT_SAVE_NAMES)
        _geo = ("ox", "oy", "oz", "dx", "dy", "dz", "cone_width", "prev_pdf")

        @_ft.partial(jax.checkpoint, policy=_policy, static_argnums=(2, 3))
        def scan_body(carry, bounce, first=False, permute=False):
            st = dict(carry)
            if detach_sampling:
                for k in _geo:
                    st[k] = jax.lax.stop_gradient(st[k])
            st = bounce_body(bounce, st, first=first, permute=permute)
            return st, None

        from fountain_tpu.geometry.intersect import _use_pallas
        from fountain_tpu.geometry.pallas_tri import BN as _BN
        unroll = (_use_pallas() and "scan" not in _DBG_SG) \
            or "forceperm" in _DBG_SG

        if regen_fn is not None:
            k_iters = n_iters if n_iters is not None else \
                2 * (cfg.max_depth + 1)
            # refill window: paths started at iteration < r_win always have
            # max_depth+1 iterations left, so they complete inside the wave
            r_win = k_iters - (cfg.max_depth + 1)
            state["depth"] = jnp.zeros(n, jnp.int32)
            state["accum"] = zeros3(n)
            state["n_done"] = jnp.zeros(n, jnp.int32)

            @_ft.partial(jax.checkpoint, policy=_policy,
                         static_argnums=(2, 3))
            def regen_body(carry, it, first=False, static_it=None):
                st = dict(carry)
                if detach_sampling:
                    for k in _geo:
                        st[k] = jax.lax.stop_gradient(st[k])
                was = st["active"]
                st = bounce_body(st["depth"], st, first=first)
                finished = was & ~st["active"]
                st["accum"] = st["accum"] + where3(finished, st["radiance"],
                                                   0.0)
                st["n_done"] = st["n_done"] + finished.astype(jnp.int32)
                in_window = (static_it < r_win) if static_it is not None \
                    else (it < r_win)
                refill = finished & in_window
                new_sample = st["sample"] + 1
                o2, d2, sp2 = regen_fn(st["lane"], new_sample)
                o2, d2 = jax.lax.optimization_barrier((o2, d2))
                for kk, v in (("ox", o2.x), ("oy", o2.y), ("oz", o2.z),
                              ("dx", d2.x), ("dy", d2.y), ("dz", d2.z)):
                    st[kk] = jnp.where(refill, v, st[kk])
                st["radiance"] = where3(refill, 0.0, st["radiance"])
                st["beta"] = where3(refill, 1.0, st["beta"])
                st["specular"] = jnp.where(refill, False, st["specular"])
                st["cone_width"] = jnp.where(refill, 0.0, st["cone_width"])
                st["spread"] = jnp.where(refill, sp2, st["spread"])
                st["prev_pdf"] = jnp.where(refill, 1.0, st["prev_pdf"])
                st["sample"] = jnp.where(refill, new_sample, st["sample"])
                st["depth"] = jnp.where(
                    refill, 0, jnp.where(st["active"], st["depth"] + 1,
                                         st["depth"]))
                st["active"] = st["active"] | refill
                return st, None

            if unroll:
                # static iteration index: drain iterations (it >= r_win)
                # compile with the refill block dead-code-eliminated
                for itv in range(k_iters):
                    state, _ = regen_body(state, jnp.int32(itv), itv == 0,
                                          itv)
            else:
                state, _ = regen_body(state, jnp.int32(0), True, 0)
                state, _ = jax.lax.scan(
                    lambda c, i: regen_body(c, i, False, None),
                    state, jnp.arange(1, k_iters))
            return RegenResult(state["accum"], state["n_done"],
                               state["n_rays"] if count_rays else None)
        # keep-permuted bounce loop: OFF by default. Measured on v5e
        # (round 5): reordering the whole 20-leaf carry per bounce costs
        # more than the per-sweep sort/unsort it replaces — v5e gathers
        # are ~2-6 ms per 262k indices however issued, and the packed
        # variant's [N, C<128] stacking forces 128x-padded [N, 1]
        # producer buffers. Kept behind "forceperm" (correctness test
        # + future hardware where gathers are bandwidth-bound).
        do_perm = "forceperm" in _DBG_SG
        if "nockpt" in _DBG_SG:      # debug: no remat
            for b in range(cfg.max_depth + 1):
                st = dict(state)
                if detach_sampling:
                    for k in _geo:
                        st[k] = jax.lax.stop_gradient(st[k])
                state = bounce_body(jnp.int32(b), st, first=(b == 0),
                                    permute=do_perm)
        elif unroll:
            # unrolled bounce loop on TPU (depth is small and static): no
            # scan carry slicing/DUS plumbing, no while-step dispatch
            # overhead (~20 ms/step at 512^2), and bounce 0 gets the
            # static sort-skip. Each iteration is still jax.checkpoint'd
            # with the named-residual policy, so backward memory matches
            # the scan. CPU (tests, virtual-mesh dryrun) keeps the scan:
            # compiling the body once instead of depth+1 times keeps the
            # suite's compile times sane, and `sort` only affects the
            # TPU pallas path anyway.
            for b in range(cfg.max_depth + 1):
                state, _ = scan_body(state, jnp.int32(b), b == 0, do_perm)
        else:
            state, _ = jax.lax.scan(
                lambda c, b: scan_body(c, b, False, False),
                state, jnp.arange(cfg.max_depth + 1))
        if unroll and do_perm and cfg.max_depth >= 1:
            # single unsort of the permuted-frame radiance back to input
            # lane order: orig ∘ inv = id, so gather by inv = argsort(orig)
            # (permutation-aware VJP: backward re-gathers by orig)
            from fountain_tpu.core.gather import permute_rows
            orig = state["orig"]
            inv = jnp.argsort(orig)
            r = state["radiance"]
            state["radiance"] = V3(permute_rows(r.x, inv, orig),
                                   permute_rows(r.y, inv, orig),
                                   permute_rows(r.z, inv, orig))
    else:
        state = jax.lax.fori_loop(0, cfg.max_depth + 1, bounce_body, state)
    if count_rays:
        return state["radiance"], state["n_rays"]
    return state["radiance"]
