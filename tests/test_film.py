"""Film reconstruction-filter tests (reference film.rs:136-210 semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fountain_tpu.core.vecmath import V3
from fountain_tpu.scene.film import (FILTER_BOX, FILTER_GAUSSIAN,
                                     FILTER_TRIANGLE, add_samples,
                                     add_samples_aligned, finalize, make_film)


def _v3(a):
    a = jnp.asarray(a)
    return V3(a[..., 0], a[..., 1], a[..., 2])


def _rand_wave(w, h, seed):
    r = np.random.default_rng(seed)
    frac = r.random((w * h, 2), np.float32)
    radiance = r.random((w * h, 3), np.float32)
    lane = np.arange(w * h)
    p_film = np.stack([lane % w + frac[:, 0], lane // w + frac[:, 1]],
                      axis=-1).astype(np.float32)
    return frac, p_film, radiance


@pytest.mark.parametrize("ftype,radius", [
    (FILTER_BOX, 0.5), (FILTER_TRIANGLE, 1.0), (FILTER_TRIANGLE, 2.0),
    (FILTER_GAUSSIAN, 1.5),
])
def test_aligned_matches_scatter(ftype, radius):
    w, h = 7, 5
    frac, p_film, radiance = _rand_wave(w, h, 42)
    f_scatter = add_samples(make_film(w, h), jnp.asarray(p_film[:, 0]),
                            jnp.asarray(p_film[:, 1]), _v3(radiance),
                            ftype=ftype, radius=radius)
    f_aligned = add_samples_aligned(make_film(w, h), jnp.asarray(frac[:, 0]),
                                    jnp.asarray(frac[:, 1]), _v3(radiance),
                                    ftype=ftype, radius=radius)
    np.testing.assert_allclose(np.asarray(f_aligned.rgb_sum),
                               np.asarray(f_scatter.rgb_sum),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_aligned.weight_sum),
                               np.asarray(f_scatter.weight_sum),
                               rtol=1e-5, atol=1e-6)


def test_box_filter_partition_of_unity():
    # every sample deposits weight exactly 1 somewhere -> weight_sum total = N
    w, h = 8, 8
    frac, _, radiance = _rand_wave(w, h, 7)
    film = add_samples_aligned(make_film(w, h), jnp.asarray(frac[:, 0]),
                               jnp.asarray(frac[:, 1]), _v3(radiance),
                               ftype=FILTER_BOX, radius=0.5)
    assert np.isclose(float(film.weight_sum.sum()), w * h)


def test_constant_radiance_reconstructs_constant():
    # filtering a constant signal must return the constant (interior pixels)
    w, h = 16, 16
    frac, _, _ = _rand_wave(w, h, 3)
    radiance = _v3(jnp.full((w * h, 3), 0.75))
    film = make_film(w, h)
    for s in range(4):
        fr, _, _ = _rand_wave(w, h, 10 + s)
        film = add_samples_aligned(film, jnp.asarray(fr[:, 0]),
                                   jnp.asarray(fr[:, 1]), radiance,
                                   ftype=FILTER_GAUSSIAN, radius=1.5)
    img = np.asarray(finalize(film))
    np.testing.assert_allclose(img[2:-2, 2:-2], 0.75, atol=1e-4)


def test_nan_samples_are_dropped():
    w, h = 4, 4
    frac, _, radiance = _rand_wave(w, h, 1)
    radiance = radiance.copy()
    radiance[5] = np.nan
    film = add_samples_aligned(make_film(w, h), jnp.asarray(frac[:, 0]),
                               jnp.asarray(frac[:, 1]), _v3(radiance),
                               ftype=FILTER_BOX)
    assert np.isfinite(np.asarray(film.rgb_sum)).all()
    # the NaN lane contributes no weight either
    assert float(film.weight_sum.reshape(-1)[5]) == 0.0
