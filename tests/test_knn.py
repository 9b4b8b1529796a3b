"""KNN kernel tests: XLA fallback + Pallas (interpret mode) vs numpy brute
force, valid-count masking, and point-loss gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2eslam_tpu.losses import chamfer_distance, color_points_loss, knn_points_loss
from e2eslam_tpu.ops.knn import knn_pallas, knn_xla


def brute(query, ref):
    d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    return d2.min(1), d2.argmin(1)


@pytest.mark.parametrize("nq,nr", [(37, 53), (300, 2500), (1024, 1024)])
def test_knn_xla_matches_brute(nq, nr):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(nq, 3)).astype(np.float32)
    r = rng.normal(size=(nr, 3)).astype(np.float32)
    d, i = knn_xla(jnp.asarray(q), jnp.asarray(r))
    bd, bi = brute(q, r)
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)


def test_knn_xla_valid_count_masking():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(64, 3)).astype(np.float32)
    r = rng.normal(size=(512, 3)).astype(np.float32)
    # Put perfect matches in the INVALID tail: they must be ignored.
    r[300:364] = q
    d, i = knn_xla(jnp.asarray(q), jnp.asarray(r), nr=300)
    bd, bi = brute(q, r[:300])
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)


def test_knn_pallas_interpret_matches_brute():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(200, 3)).astype(np.float32)
    r = rng.normal(size=(1500, 3)).astype(np.float32)
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
    bd, bi = brute(q, r)
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-5)


def test_knn_pallas_interpret_valid_count():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(64, 3)).astype(np.float32)
    r = rng.normal(size=(2048, 3)).astype(np.float32)
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(r), nr=700, interpret=True)
    bd, bi = brute(q, r[:700])
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-5)


def test_knn_pallas_interpret_valid_query_count():
    """nq: tiles past the valid query prefix are skipped; the prefix must
    still be exact (tail entries are documented as undefined)."""
    rng = np.random.default_rng(7)
    q = rng.normal(size=(1024, 3)).astype(np.float32)
    r = rng.normal(size=(2048, 3)).astype(np.float32)
    nq = 300
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(r), nq=nq, interpret=True)
    bd, bi = brute(q[:nq], r)
    np.testing.assert_array_equal(np.asarray(i)[:nq], bi)
    np.testing.assert_allclose(np.asarray(d)[:nq], bd, atol=1e-5)


def test_knn_pallas_interpret_warm_start_exact():
    """Warm-start candidates (init_idx) accelerate branch-and-bound but must
    NEVER change the result: correct candidates, wrong candidates, -1
    no-candidates, and out-of-range candidates (indices into a map that was
    since compacted) all return the true top-1."""
    rng = np.random.default_rng(21)
    q = rng.normal(size=(300, 3)).astype(np.float32)
    r = rng.normal(size=(2500, 3)).astype(np.float32)
    nr = 2000
    bd, bi = brute(q, r[:nr])

    wrong = rng.integers(0, nr, size=300).astype(np.int32)
    mixed = np.where(rng.random(300) < 0.5, bi.astype(np.int32), -1)
    oob = rng.integers(nr, 2500, size=300).astype(np.int32)  # all invalid
    for init in (bi.astype(np.int32), wrong, mixed,
                 np.full(300, -1, np.int32), oob):
        d, i = knn_pallas(jnp.asarray(q), jnp.asarray(r), nr=nr,
                          init_idx=jnp.asarray(init), interpret=True)
        # A candidate that TIES the true NN may legitimately win the
        # running max; compare distances through the chosen index.
        d_via = ((q - r[np.asarray(i)]) ** 2).sum(-1)
        np.testing.assert_allclose(d_via, bd, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d), bd, atol=1e-5)
        assert np.all(np.asarray(i) < nr)


def test_knn_pallas_interpret_warm_start_valid_query_count():
    """Warm start composes with nq masking (the map->frame direction)."""
    rng = np.random.default_rng(22)
    q = rng.normal(size=(1024, 3)).astype(np.float32)
    r = rng.normal(size=(2048, 3)).astype(np.float32)
    nq = 300
    bd, bi = brute(q[:nq], r)
    init = np.full(1024, -1, np.int32)
    init[:nq] = bi
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(r), nq=nq,
                      init_idx=jnp.asarray(init), interpret=True)
    d_via = ((q[:nq] - r[np.asarray(i)[:nq]]) ** 2).sum(-1)
    np.testing.assert_allclose(d_via, bd, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d)[:nq], bd, atol=1e-5)


@pytest.mark.slow
def test_knn_pallas_interpret_exact_mode_shapes():
    """Lowering guard at the EXACT-MODE shapes (VERDICT r3 #1): a full-frame
    query (82k = 256x320, non-multiple of the 256-query tile after the real
    frame crop below) against a map-capacity-sized ref with a partial valid
    prefix. Pins the shape-dependent assumptions (grid construction, scalar
    prefetch sizes, in-kernel query bboxes) the round-3 on-chip failure
    slipped through: the kernel is run in interpret mode at the same grid
    the chip sees, just on a smaller ref capacity to keep CPU time sane."""
    rng = np.random.default_rng(11)
    nq = 256 * 320  # full-frame query count (81920)
    cap = 3 * 8192 + 517  # non-tile-aligned capacity -> padded final tile
    q = rng.uniform(-2, 2, size=(nq, 3)).astype(np.float32)
    r = rng.uniform(-2, 2, size=(cap, 3)).astype(np.float32)
    nr = 2 * 8192 + 99  # valid prefix ends mid-tile
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(r), nr=nr, interpret=True)
    dx, ix = knn_xla(jnp.asarray(q), jnp.asarray(r), nr=nr)
    # Ties pick either index (pallas visits tiles newest-first, XLA oldest-
    # first): require the DISTANCE THROUGH the chosen index to match, the
    # same convention as tools/knn_tpu_check.py.
    d_via = ((q - r[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(d_via, np.asarray(dx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dx), atol=1e-4)
    assert np.all(np.asarray(i) < nr)


@pytest.mark.slow
def test_knn_pallas_interpret_map_as_query():
    """Map->frame direction (the bidirectional chamfer's second term): the
    QUERY is the large cloud. The query bbox table must not live in scalar
    prefetch (SMEM scales with query count — ADVICE r3 medium); this pins
    the in-kernel scratch-bbox path at a query count far beyond any
    prefetched-table budget assumption (shape-wise; size kept CPU-sane)."""
    rng = np.random.default_rng(12)
    nq = 40_000 + 123  # many query tiles, non-aligned
    q = rng.uniform(-2, 2, size=(nq, 3)).astype(np.float32)
    r = rng.uniform(-2, 2, size=(9000, 3)).astype(np.float32)
    d, i = knn_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
    dx, ix = knn_xla(jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ix))
    np.testing.assert_allclose(np.asarray(d), np.asarray(dx), atol=1e-4)


def test_knn_points_loss_value_and_grads():
    rng = np.random.default_rng(4)
    gt = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    noisy = gt[:50] + 0.01

    loss, idx = knn_points_loss(gt, noisy)
    assert float(loss) == pytest.approx(3 * 0.01**2, rel=1e-3)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(50))

    # Gradients flow to the query cloud; detached gt gets none through
    # stop_gradient at the call site.
    g = jax.grad(lambda q: knn_points_loss(gt, q)[0])(noisy)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_color_points_loss():
    gt_pts = jnp.asarray(np.eye(3, dtype=np.float32) * 5)  # 3 well-separated pts
    gt_col = jnp.asarray(np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32))
    q_pts = gt_pts[jnp.array([2, 0])] + 0.01
    q_col = jnp.asarray(np.array([[0, 0, 1], [1, 0, 0]], np.float32))
    _, idx = knn_points_loss(gt_pts, q_pts)
    loss = color_points_loss(gt_col, q_col, idx)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_chamfer_symmetric_and_zero_on_identical():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(size=(80, 3)).astype(np.float32))
    assert float(chamfer_distance(a, a)) == pytest.approx(0.0, abs=1e-5)
    b = a + 0.1
    ab = float(chamfer_distance(a, b))
    ba = float(chamfer_distance(b, a))
    assert ab == pytest.approx(ba, rel=1e-5)


def test_spatial_sort_preserves_exactness():
    """Morton sort (ops/spatial_sort.py): valid prefix preserved, perm is a
    permutation, sorted points match the originals through it, and KNN
    against the sorted ref returns the same distances as against the raw
    ref (exactness is layout-independent)."""
    from e2eslam_tpu.ops.spatial_sort import sort_map_points

    rng = np.random.default_rng(30)
    n, count = 3000, 2201
    pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    pts[count:] = 0.0  # garbage tail
    sm = sort_map_points(jnp.asarray(pts), jnp.asarray(count, jnp.int32))
    perm = np.asarray(sm.perm)
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_array_equal(np.asarray(sm.points), pts[perm])
    # every valid row stays in the prefix
    assert np.all(perm[:count] < count) and np.all(perm[count:] >= count)
    # spatial locality: mean neighbor distance shrinks vs the random order
    d_sorted = np.linalg.norm(
        np.diff(np.asarray(sm.points)[:count], axis=0), axis=1
    ).mean()
    d_orig = np.linalg.norm(np.diff(pts[:count], axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig, (d_sorted, d_orig)

    q = rng.uniform(-3, 3, (257, 3)).astype(np.float32)
    d_raw, i_raw = knn_pallas(jnp.asarray(q), jnp.asarray(pts), nr=count,
                              interpret=True)
    d_srt, i_srt = knn_pallas(jnp.asarray(q), sm.points, nr=count,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(d_srt), np.asarray(d_raw),
                               atol=1e-5)
    # indices translate back through the permutation (ties aside: compare
    # the distance through the translated index)
    back = perm[np.asarray(i_srt)]
    d_via = ((q - pts[back]) ** 2).sum(-1)
    np.testing.assert_allclose(d_via, np.asarray(d_raw), atol=1e-5)


def test_regather_sorted_stale_perm_invariants():
    """regather_sorted (ops/spatial_sort.py): between periodic re-sorts the
    cached perm must keep (a) the identity tail over rows that were invalid
    at sort time — so appends land in the view tail in append order, (b)
    the valid-prefix invariant at the NEW count, and (c) exact KNN results
    against the refreshed view."""
    from e2eslam_tpu.ops.spatial_sort import regather_sorted, sort_map_points

    rng = np.random.default_rng(31)
    n, count0 = 3000, 1800
    pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    pts[count0:] = 0.0
    sm = sort_map_points(jnp.asarray(pts), jnp.asarray(count0, jnp.int32))
    perm = np.asarray(sm.perm)
    # (a) stable sort keys invalid rows to the max code -> identity tail
    np.testing.assert_array_equal(perm[count0:], np.arange(count0, n))

    # Simulate fusion: append new valid rows, nudge some merged rows.
    count1 = 2400
    pts2 = pts.copy()
    pts2[count0:count1] = rng.uniform(-3, 3, (count1 - count0, 3)).astype(
        np.float32
    )
    pts2[:50] += 0.01  # merged rows moved slightly (stale Morton order ok)

    view = regather_sorted(jnp.asarray(pts2), sm.perm, sm.inv_perm)
    vp = np.asarray(view.points)
    np.testing.assert_array_equal(vp, pts2[perm])
    # (b) the view's first count1 rows are exactly the valid rows
    assert sorted(perm[:count1].tolist()) == list(range(count1))

    # (c) KNN against the refreshed view == KNN against the raw buffer
    q = rng.uniform(-3, 3, (257, 3)).astype(np.float32)
    d_raw, _ = knn_pallas(jnp.asarray(q), jnp.asarray(pts2), nr=count1,
                          interpret=True)
    d_view, i_view = knn_pallas(jnp.asarray(q), view.points, nr=count1,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(d_view), np.asarray(d_raw),
                               atol=1e-5)
    back = perm[np.asarray(i_view)]
    d_via = ((q - pts2[back]) ** 2).sum(-1)
    np.testing.assert_allclose(d_via, np.asarray(d_raw), atol=1e-5)


def test_knn_pallas_candidate_table_matches_brute(monkeypatch):
    """The round-5 candidate-table grid (warm + nrt > _MAX_CAND) must be
    exact. At the production _RT=8192 the path needs >524k refs — far too
    big for interpret mode — so shrink the tile constants instead: the
    table construction, the lax.cond dispatch, and the table-driven kernel
    are all exercised at toy scale."""
    import sys

    import e2eslam_tpu.ops.knn  # noqa: F401 — ensure the module is loaded

    # `ops/__init__` re-exports the `knn` FUNCTION under the same name, so
    # attribute access resolves to it; fetch the module object directly.
    knn_mod = sys.modules["e2eslam_tpu.ops.knn"]
    monkeypatch.setattr(knn_mod, "_RT", 64)
    monkeypatch.setattr(knn_mod, "_MAX_CAND", 4, raising=False)

    rng = np.random.default_rng(11)
    nq, nr = 130, 64 * 140  # nrt=140 > _MAX_CAND=128 at the patched width
    # Clustered SLAM-like layout so bbox pruning actually engages.
    centers = rng.normal(size=(140, 3)) * 5.0
    r = (centers[:, None, :] + rng.normal(size=(140, 64, 3)) * 0.1).reshape(
        -1, 3
    ).astype(np.float32)
    q = r[rng.integers(0, nr, nq)] + rng.normal(size=(nq, 3)).astype(
        np.float32
    ) * 0.05
    want_d, want_i = brute(q, r)

    # Near-optimal seeds: the true NN for every query (one unseeded query
    # would push its whole tile's threshold to the sentinel — every tile
    # becomes a candidate and the call correctly falls back to dense).
    init = want_i.astype(np.int32).copy()
    # The jitted wrapper caches on shapes, not module globals — call the
    # unjitted function directly.
    fn = knn_pallas.__wrapped__
    d, i = fn(jnp.asarray(q), jnp.asarray(r), None, None,
              jnp.asarray(init), interpret=True)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-4, atol=1e-4)
    # Distances must match exactly-ranked winners (ties may differ).
    d_of_i = ((q - r[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(d_of_i, want_d, rtol=1e-4, atol=1e-4)

    # Unseeded queries force the dense fallback branch of the cond when
    # every seed is -1 (threshold = sentinel, every tile is a candidate).
    d2, i2 = fn(jnp.asarray(q), jnp.asarray(r), None, None,
                jnp.asarray(np.full(nq, -1, np.int32)), interpret=True)
    np.testing.assert_allclose(np.asarray(d2), want_d, rtol=1e-4, atol=1e-4)
