"""Compact pair expansion vs the dense window enumeration.

flat_bin_gaussians(expand_budget=...) enumerates live pairs directly into
a budget-sized array instead of materializing all N*C window slots — the
sort/scan population at 100k+-alive scale drops 3-4x (DESIGN.md §5f). The
live-pair order is constructed to be IDENTICAL to the dense path's
(gaussian-major, window-slot minor), so with a sufficient budget every
output field must match the dense path exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionsense_tpu.render.binning import (
    auto_expand_budget, flat_bin_gaussians)

WIDTH, HEIGHT, TILE = 160, 96, 16


def _scene(key, n=300, cull_frac=0.3):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mean2d = jnp.stack([
        jax.random.uniform(k1, (n,), minval=-20.0, maxval=WIDTH + 20.0),
        jax.random.uniform(k2, (n,), minval=-20.0, maxval=HEIGHT + 20.0),
    ], -1)
    radius = jax.random.uniform(k3, (n,), minval=1.0, maxval=40.0)
    culled = jax.random.uniform(k4, (n,)) < cull_frac
    radius = jnp.where(culled, 0.0, radius)
    depth = jax.random.uniform(jax.random.PRNGKey(9), (n,),
                               minval=0.5, maxval=6.0)
    return mean2d, radius, depth


def _bins(sc, *, expand_budget, pair_budget=128 * 60, cover=9,
          compute_landing=True, tile_lo=0, num_tiles_local=None):
    return flat_bin_gaussians(
        *sc, width=WIDTH, height=HEIGHT, tile_size=TILE,
        pair_budget=pair_budget, max_tiles_per_gaussian=cover,
        compute_landing=compute_landing, expand_budget=expand_budget,
        tile_lo=tile_lo, num_tiles_local=num_tiles_local)


@pytest.mark.parametrize("cover", [1, 4, 9])
@pytest.mark.parametrize("seed", [0, 1])
def test_compact_matches_dense_exactly(cover, seed):
    sc = _scene(jax.random.PRNGKey(seed))
    n = sc[0].shape[0]
    dense = _bins(sc, expand_budget=None, cover=cover)
    # generous budget: nothing dropped by the expansion
    compact = _bins(sc, expand_budget=((n * cover + 127) // 128) * 128 - 128
                    if n * cover > 256 else 256, cover=cover)
    for name in ("valid", "blk_tile", "blk_first", "blk_count", "landing",
                 "overflow", "truncated", "trunc_by_win", "used"):
        a, b = getattr(dense, name), getattr(compact, name)
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name)
    # gauss_ids carry garbage in padding slots (masked by `valid`
    # downstream; the kernel reads log_op=-1e10 there) — compare live slots
    v = np.asarray(dense.valid)
    np.testing.assert_array_equal(np.asarray(dense.gauss_ids)[v],
                                  np.asarray(compact.gauss_ids)[v])


def test_compact_without_landing():
    sc = _scene(jax.random.PRNGKey(2))
    dense = _bins(sc, expand_budget=None, compute_landing=False)
    compact = _bins(sc, expand_budget=1280, compute_landing=False)
    assert compact.landing is None
    np.testing.assert_array_equal(np.asarray(dense.valid),
                                  np.asarray(compact.valid))
    v = np.asarray(dense.valid)
    np.testing.assert_array_equal(np.asarray(dense.gauss_ids)[v],
                                  np.asarray(compact.gauss_ids)[v])


def test_compact_local_tile_shard():
    """tile_lo / num_tiles_local (the sharded caller's clip) compose with
    the compact enumeration."""
    sc = _scene(jax.random.PRNGKey(3))
    tiles_x = -(-WIDTH // TILE)
    tiles_y = -(-HEIGHT // TILE)
    t_half = (tiles_x * tiles_y) // 2
    dense = _bins(sc, expand_budget=None, tile_lo=t_half,
                  num_tiles_local=t_half)
    compact = _bins(sc, expand_budget=1280, tile_lo=t_half,
                    num_tiles_local=t_half)
    for name in ("valid", "blk_tile", "blk_count", "landing"):
        np.testing.assert_array_equal(
            np.asarray(getattr(dense, name)),
            np.asarray(getattr(compact, name)), err_msg=name)
    v = np.asarray(dense.valid)
    np.testing.assert_array_equal(np.asarray(dense.gauss_ids)[v],
                                  np.asarray(compact.gauss_ids)[v])


def test_truncating_expand_budget_reports_need():
    """A too-small expand budget drops pairs but tells the policy: overflow
    counts the dropped pairs and `used` reports at least the true live
    total, so the trainer's budget growth pulls both budgets up."""
    sc = _scene(jax.random.PRNGKey(4), cull_frac=0.0)
    dense = _bins(sc, expand_budget=None)
    eb = 256   # far below the live pair population
    compact = _bins(sc, expand_budget=eb)
    assert int(compact.overflow) > int(dense.overflow)
    assert int(compact.used) >= int(dense.used) - 128 * 60  # >= total live
    # layout stays well-formed: every valid slot references a real gaussian
    gi = np.asarray(compact.gauss_ids)[np.asarray(compact.valid)]
    assert gi.min() >= 0 and gi.max() < sc[0].shape[0]


def test_auto_expand_budget_gate():
    # scale regime: budget far below N*C -> compaction on, block-rounded
    eb = auto_expand_budget(441600, 196608, 9)
    assert eb is not None and eb % 128 == 0 and eb < 196608 * 9
    assert eb == -(-(441600 * 3 // 2) // 128) * 128
    # bench regime: N*C smaller than 1.5x budget -> dense path
    assert auto_expand_budget(96000, 8192, 9) is None
