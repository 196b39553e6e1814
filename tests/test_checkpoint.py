"""Checkpoint/resume: interrupted render == uninterrupted render, bitwise.

The property the reference reserved but never shipped
(src/sampler/mod.rs:53 set_sample_number, unimplemented at
src/sampler/random.rs:73-75): because every random number is a counter
hash of (lane, sample index), accumulating samples [0,4) then [4,8) is the
same float additions in the same order as [0,8) — bitwise, not just
statistically.
"""
import os

import jax.numpy as jnp
import numpy as np

from fountain_tpu.core import transform as tf
from fountain_tpu.integrator.path import PathConfig
from fountain_tpu.integrator.render import render_samples
from fountain_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from fountain_tpu.scene.build import SceneBuilder
from fountain_tpu.scene.camera import make_perspective_camera
from fountain_tpu.scene.film import finalize, make_film


def _scene(res=12):
    b = SceneBuilder()
    mat = b.add_matte(kd=[0.5] * 3)
    sph = b.add_sphere(radius=100.0, mat_id=mat, reverse_orientation=True)
    b.add_area_light_sphere(sph, [1.0] * 3)
    cam = make_perspective_camera(
        tf.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]),
        (res, res), fov_deg=60.0)
    return b.build(), cam


def test_resume_bitwise_equal(tmp_path):
    res, spp = 12, 8
    scene, cam = _scene(res)
    cfg = PathConfig(max_depth=4, rr_threshold=0.0, nee=True)

    # uninterrupted: samples [0, 8)
    film_full = render_samples(scene, cam, res, res, 0, spp, spp,
                               make_film(res, res), cfg, seed=3)

    # interrupted: [0, 4), save, load, [4, 8)
    film_a = render_samples(scene, cam, res, res, 0, 4, spp,
                            make_film(res, res), cfg, seed=3)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, film_a, next_sample=4, spp_total=spp, seed=3,
                    params=scene.textures.value)
    film_b, next_s, spp_tot, seed, params = load_checkpoint(
        path, params_like=scene.textures.value)
    assert next_s == 4 and spp_tot == spp and seed == 3
    np.testing.assert_array_equal(np.asarray(params),
                                  np.asarray(scene.textures.value))
    film_b = type(film_b)(*[jnp.asarray(p) for p in film_b])
    film_resumed = render_samples(scene, cam, res, res, next_s, spp_tot,
                                  spp_tot, film_b, cfg, seed=seed)

    for full, res_p in zip(film_full, film_resumed):
        np.testing.assert_array_equal(np.asarray(full), np.asarray(res_p))
    np.testing.assert_array_equal(np.asarray(finalize(film_full)),
                                  np.asarray(finalize(film_resumed)))


def test_checkpoint_rejects_garbage(tmp_path):
    p = os.path.join(tmp_path, "bad.npz")
    np.savez(p, meta=np.frombuffer(b'{"magic": "nope"}', dtype=np.uint8),
             r_sum=np.zeros((2, 2)), g_sum=np.zeros((2, 2)),
             b_sum=np.zeros((2, 2)), weight_sum=np.zeros((2, 2)))
    import pytest
    with pytest.raises(ValueError):
        load_checkpoint(p)
