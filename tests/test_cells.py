import numpy as np

from covertile import cells


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    ix = rng.integers(0, 1 << 20, 1000)
    iy = rng.integers(0, 1 << 20, 1000)
    code = cells.morton_encode(ix, iy)
    jx, jy = cells.morton_decode(code)
    assert np.array_equal(ix, jx) and np.array_equal(iy, jy)


def test_parent_child():
    code = cells.morton_encode(np.array([5]), np.array([9]))
    kids = cells.children_cells(code)
    assert kids.shape == (1, 4)
    assert (cells.parent_cell(kids[0]) == code[0]).all()


def test_cell_of_clipping():
    x = np.array([-100.0, 0.0, 100.0], np.float32)
    y = np.array([0.0, 0.0, 0.0], np.float32)
    c = cells.cell_of(x, y, 4)
    ix, iy = cells.morton_decode(c)
    assert ix[0] == 0 and ix[2] == 15  # clipped to grid edge


def test_halo_covers_disc():
    rng = np.random.default_rng(1)
    x = rng.uniform(-10, 10, 200).astype(np.float32)
    y = rng.uniform(-10, 10, 200).astype(np.float32)
    r, res = 0.7, 5
    rep, halo = cells.halo_cells(x, y, r, res)
    own = cells.cell_of(x, y, res)
    # own cell always in halo
    for i in range(200):
        assert own[i] in set(halo[rep == i].tolist())
    # any point within r of point i lies in one of i's halo cells
    qx = x[:, None] + rng.uniform(-r, r, (200, 8)).astype(np.float32)
    qy = y[:, None] + rng.uniform(-r, r, (200, 8)).astype(np.float32)
    for i in range(0, 200, 17):
        hs = set(halo[rep == i].tolist())
        d = np.sqrt((qx[i] - x[i]).astype(np.float64) ** 2
                    + (qy[i] - y[i]).astype(np.float64) ** 2)
        inside = d <= r
        cc = cells.cell_of(qx[i][inside], qy[i][inside], res)
        assert set(cc.tolist()) <= hs


def test_morton_order_is_spatially_local():
    # consecutive codes at the same resolution share parents often
    ix = np.arange(64) % 8
    iy = np.arange(64) // 8
    codes = np.sort(cells.morton_encode(ix, iy))
    jx, jy = cells.morton_decode(codes)
    jumps = np.abs(np.diff(jx)) + np.abs(np.diff(jy))
    assert np.median(jumps) <= 2
