"""Unit tests for multi-emitter candidate association
(tdoa_tpu/solve/association.py)."""

import numpy as np

from tdoa_tpu.solve.association import (
    associate_emitters,
    top_k_peaks,
)


def _pairs3():
    return np.array([[0, 1], [0, 2], [1, 2]])


def test_top_k_peaks_finds_separated_peaks():
    w = np.zeros((1, 101))
    w[0, 30] = 1.0
    w[0, 31] = 0.6
    w[0, 70] = 0.8
    cand = top_k_peaks(w, k=3, guard=5)
    assert abs(cand.lag[0, 0] - 30) < 0.5
    assert abs(cand.lag[0, 1] - 70) < 0.5
    # The 31 sidelobe sits inside peak 0's guard zone: not a candidate.
    assert cand.value[0, 2] == 0.0 or abs(cand.lag[0, 2] - 31) > 5


def test_association_recovers_two_emitters():
    # Emitter A arrival times [0, 10, 25]; emitter B [0, -40, 5].
    tA = np.array([0.0, 10.0, 25.0])
    tB = np.array([0.0, -40.0, 5.0])
    pairs = _pairs3()

    def tdoas(t):
        return t[pairs[:, 1]] - t[pairs[:, 0]]

    cand = np.stack([tdoas(tA), tdoas(tB)], axis=1)  # [3, 2]
    vals = np.array([[1.0, 0.9], [0.8, 1.0], [1.0, 0.7]])
    sets = associate_emitters(cand, vals, pairs, 3, max_emitters=2)
    assert len(sets) == 2
    got = sorted(round(s.tdoa[0]) for s in sets)
    assert got == sorted([10, -40])
    for s in sets:
        assert s.max_inconsistency < 1e-9


def test_association_rejects_inconsistent_cross_pair():
    pairs = _pairs3()
    # Anchor pairs say tau01=10, tau02=25 -> cross pair must be ~15,
    # but only 40 is on offer.
    cand = np.array([[10.0, 0.0], [25.0, 0.0], [40.0, 0.0]])
    vals = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    sets = associate_emitters(cand, vals, pairs, 3, tol_samples=3.0)
    assert sets == []


def test_association_four_stations():
    t = np.array([0.0, 7.0, -12.0, 3.0])
    pairs = np.array(
        [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]]
    )
    true = t[pairs[:, 1]] - t[pairs[:, 0]]
    rng = np.random.default_rng(0)
    noise_peaks = rng.uniform(-50, 50, size=(6, 2))
    cand = np.concatenate([true[:, None], noise_peaks], axis=1)
    vals = np.concatenate(
        [np.full((6, 1), 1.0), np.full((6, 2), 0.4)], axis=1
    )
    sets = associate_emitters(cand, vals, pairs, 4, max_emitters=2)
    assert len(sets) >= 1
    np.testing.assert_allclose(sets[0].tdoa, true, atol=1e-9)


def test_single_wide_peak_does_not_split_into_phantom_emitter():
    """Regression: a single emitter with a realistic wide correlation
    peak (~40 samples for narrowband FM) must not have its main-lobe
    shoulders assembled into a cycle-consistent phantom second emitter.
    The auto guard sizes the exclusion zone from the measured main-lobe
    width."""
    from tdoa_tpu.solve.association import main_lobe_width

    lags = np.arange(201) - 100.0
    true = np.array([10.0, 25.0, 15.0])  # consistent single emitter
    win = np.stack([
        np.exp(-0.5 * ((lags - t) / 17.0) ** 2) for t in true
    ])  # ~40-sample FWHM
    assert 35 < np.median(main_lobe_width(win)) < 45
    cand = top_k_peaks(win, k=4)
    cand_tdoa = cand.lag - 100.0
    sets = associate_emitters(cand_tdoa, cand.value, _pairs3(), 3,
                              max_emitters=2)
    assert len(sets) == 1
    np.testing.assert_allclose(sets[0].tdoa, true, atol=0.5)


def test_association_property_random_emitters():
    """Property: for random geometries and 1-3 emitters with exact
    candidate TDOAs (plus decoy noise candidates), association recovers
    every emitter's set exactly and never invents extras — across
    station counts and candidate orders."""
    rng = np.random.default_rng(42)
    for trial in range(25):
        n_st = int(rng.integers(3, 6))
        n_em = int(rng.integers(1, 4))
        pairs = np.array(
            [[i, j] for i in range(n_st) for j in range(i + 1, n_st)]
        )
        m = len(pairs)
        # Arrival times per emitter; TDOA sets must differ by > the
        # match tolerance on at least one anchor pair to be countable.
        while True:
            t = rng.uniform(-50, 50, size=(n_em, n_st))
            sets = t[:, pairs[:, 1]] - t[:, pairs[:, 0]]
            ok = all(
                np.abs(sets[a] - sets[b]).max() > 12.0
                for a in range(n_em) for b in range(a + 1, n_em)
            )
            if ok:
                break
        k = n_em + 2
        cand = np.full((m, k), np.nan)
        vals = np.zeros((m, k))
        for e in range(n_em):
            cand[:, e] = sets[e]
            vals[:, e] = 1.0 - 0.2 * e  # strength-ordered
        # Decoys: random lags, weak-but-nonzero values.
        cand[:, n_em:] = rng.uniform(-200, 200, size=(m, k - n_em))
        vals[:, n_em:] = 0.3
        # Shuffle candidate order per pair (association must not rely
        # on column order).
        for row in range(m):
            perm = rng.permutation(k)
            cand[row] = cand[row, perm]
            vals[row] = vals[row, perm]
        got = associate_emitters(
            cand, vals, pairs, n_st, tol_samples=1.0, max_emitters=3
        )
        recovered = 0
        for e in range(n_em):
            hit = any(
                np.abs(g.tdoa - sets[e]).max() < 1e-6 for g in got
            )
            recovered += hit
        assert recovered == n_em, (trial, n_st, n_em, len(got))
        # No phantom: every returned set is one of the true emitters
        # (decoys are mutually inconsistent with probability ~1).
        for g in got:
            assert any(
                np.abs(g.tdoa - sets[e]).max() < 1e-6
                for e in range(n_em)
            ), (trial, g.tdoa, sets)
