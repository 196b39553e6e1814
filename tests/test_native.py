"""Native (C++) host components vs their pure-Python fallbacks."""
import numpy as np
import pytest

from fountain_tpu import native


def _random_boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return c - h, c + h


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("n", [1, 2, 5, 100, 10000])
def test_native_lbvh_matches_python(n, monkeypatch):
    from fountain_tpu.geometry.bvh import build_lbvh

    bmin, bmax = _random_boxes(n)
    cc = native.lbvh_build(bmin, bmax, 4)
    assert cc is not None
    # force the python path
    monkeypatch.setattr(native, "lbvh_build", lambda *a, **k: None)
    py = build_lbvh(bmin, bmax, 4)
    for a, b, name in zip(py, cc, ["nodes_min", "nodes_max", "meta",
                                   "order"]):
        np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_lbvh_structure():
    bmin, bmax = _random_boxes(500)
    nodes_min, nodes_max, meta, order = native.lbvh_build(bmin, bmax, 4)
    m = len(meta)
    # miss links advance and stay in [1, M]
    assert (meta[:, 0] > np.arange(m)).all()
    assert (meta[:, 0] <= m).all()
    # leaves cover every sorted prim exactly once
    leaves = meta[meta[:, 2] > 0]
    covered = np.concatenate(
        [np.arange(f, f + c) for _, f, c in leaves])
    assert sorted(covered) == list(range(500))
    assert sorted(order) == list(range(500))
