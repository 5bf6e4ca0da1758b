import numpy as np

from spapy_ray.kernels.strtree import STRtree


def _random_boxes(rng, n, size=5.0, extent=100.0):
    x0 = rng.uniform(0, extent, n)
    y0 = rng.uniform(0, extent, n)
    w = rng.uniform(0.1, size, n)
    h = rng.uniform(0.1, size, n)
    return np.column_stack([x0, y0, x0 + w, y0 + h])


def _pairs_set(a, b):
    return set(zip(a.tolist(), b.tolist()))


def test_query_points_matches_bruteforce():
    rng = np.random.default_rng(42)
    boxes = _random_boxes(rng, 300)
    tree = STRtree(boxes)
    px = rng.uniform(-5, 105, 2000)
    py = rng.uniform(-5, 105, 2000)
    pi, bi = tree.query_points(px, py)
    # brute force
    inside = ((px[:, None] >= boxes[None, :, 0]) & (px[:, None] <= boxes[None, :, 2]) &
              (py[:, None] >= boxes[None, :, 1]) & (py[:, None] <= boxes[None, :, 3]))
    epi, ebi = np.nonzero(inside)
    assert _pairs_set(pi, bi) == _pairs_set(epi, ebi)


def test_query_boxes_matches_bruteforce():
    rng = np.random.default_rng(7)
    boxes = _random_boxes(rng, 200)
    tree = STRtree(boxes, cap=4)
    q = _random_boxes(rng, 150, size=10.0)
    qi, bi = tree.query_boxes(q)
    ov = ((q[:, None, 0] <= boxes[None, :, 2]) & (q[:, None, 2] >= boxes[None, :, 0]) &
          (q[:, None, 1] <= boxes[None, :, 3]) & (q[:, None, 3] >= boxes[None, :, 1]))
    eqi, ebi = np.nonzero(ov)
    assert _pairs_set(qi, bi) == _pairs_set(eqi, ebi)


def test_small_trees():
    # empty
    t = STRtree(np.zeros((0, 4)))
    pi, bi = t.query_points(np.array([1.0]), np.array([1.0]))
    assert len(pi) == 0 == len(bi)
    # single box
    t1 = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
    pi, bi = t1.query_points(np.array([0.5, 2.0]), np.array([0.5, 2.0]))
    assert list(pi) == [0] and list(bi) == [0]


def test_degenerate_identical_boxes():
    boxes = np.tile(np.array([[1.0, 1.0, 2.0, 2.0]]), (50, 1))
    t = STRtree(boxes)
    pi, bi = t.query_points(np.array([1.5]), np.array([1.5]))
    assert len(pi) == 50
    assert sorted(bi.tolist()) == list(range(50))
