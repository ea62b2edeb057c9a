"""Sort-based binning must exactly match the scan-based reference path."""
import math

import jax.numpy as jnp
import numpy as np

from d3gs_tpu.ops.binning import bin_splats, bin_splats_sorted
from d3gs_tpu.ops.projection import project_gaussians
from d3gs_tpu.ops.transforms import cov3d_packed
from tests.test_rasterize_parity import make_scene


def _project(seed=0, n=400, width=128, height=96):
    means, scales, quats, opac, colors, cam = make_scene(
        n=n, seed=seed, width=width, height=height)
    cov = cov3d_packed(jnp.array(scales), jnp.array(quats))
    return project_gaussians(
        jnp.array(means), cov, jnp.array(opac), jnp.array(colors),
        jnp.array(cam["viewmatrix"]), jnp.array(cam["projmatrix"]),
        cam["tanfovx"], cam["tanfovy"], width, height), width, height


def test_sort_binning_matches_scan():
    splats, w, h = _project()
    tx, ty = (w + 15) // 16, (h + 15) // 16
    a = bin_splats(splats, tiles_x=tx, tiles_y=ty, capacity=256)
    b = bin_splats_sorted(splats, tiles_x=tx, tiles_y=ty, capacity=256)
    np.testing.assert_array_equal(np.asarray(a.tile_lists),
                                  np.asarray(b.tile_lists))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))


def test_sort_binning_tile_offset():
    splats, w, h = _project(seed=1)
    tx, ty = (w + 15) // 16, (h + 15) // 16
    full = bin_splats_sorted(splats, tiles_x=tx, tiles_y=ty, capacity=128)
    half = bin_splats_sorted(splats, tiles_x=tx, tiles_y=ty // 2,
                             capacity=128, tile_y0=ty // 2)
    np.testing.assert_array_equal(
        np.asarray(full.tile_lists)[(ty // 2) * tx:],
        np.asarray(half.tile_lists))


def test_sort_binning_dup_overflow_drops_deepest():
    """With a tiny duplicate budget, surviving entries must be the
    front-most by depth."""
    splats, w, h = _project(seed=2, n=300)
    tx, ty = (w + 15) // 16, (h + 15) // 16
    full = bin_splats_sorted(splats, tiles_x=tx, tiles_y=ty, capacity=256)
    small = bin_splats_sorted(splats, tiles_x=tx, tiles_y=ty, capacity=256,
                              dup_capacity=512)
    fl = np.asarray(full.tile_lists)
    sm = np.asarray(small.tile_lists)
    n = splats.depths.shape[0]
    for t in range(fl.shape[0]):
        kept = sm[t][sm[t] < n]
        # surviving entries are a depth-prefix of the full list
        np.testing.assert_array_equal(kept, fl[t][:len(kept)])
