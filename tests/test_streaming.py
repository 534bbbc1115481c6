"""Streaming accumulation + multi-target tracking tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tdoa_tpu.geo import lla_to_ecef, lla_to_enu
from tdoa_tpu.ops.corr import correlate_pairs_planar, next_pow2
from tdoa_tpu.ops.cplx import C, from_complex
from tdoa_tpu.pipeline.streaming import (
    TargetTracker,
    acc_finalize,
    acc_init,
    acc_update,
)
from tdoa_tpu.sim import fm_source, fractional_delay
from tdoa_tpu.solve.multilateration import station_pairs
from tdoa_tpu.utils.constants import SPEED_OF_LIGHT


def _stack(sigs):
    x = jnp.stack(sigs)
    return C(jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))


def test_incremental_matches_batch():
    """Chunked accumulation must reproduce the one-shot result exactly
    (same segmentation), and estimates must be available mid-stream."""
    n = 1 << 16
    seg = 1 << 13
    base = fm_source(jax.random.PRNGKey(0), n, 2e6)
    x = _stack([base, fractional_delay(base, jnp.float32(23.75))])
    pairs = jnp.asarray([[0, 1]], jnp.int32)
    fft_len = next_pow2(seg + 128)

    batch = correlate_pairs_planar(
        x, pairs, max_lag=128, seg_len=seg, weighting="ht"
    )

    state = acc_init(2, 1, fft_len)
    chunk_len = 1 << 14  # 2 segments per chunk
    mid_delay = None
    for c in range(n // chunk_len):
        chunk = C(
            x.re[:, c * chunk_len : (c + 1) * chunk_len],
            x.im[:, c * chunk_len : (c + 1) * chunk_len],
        )
        state = acc_update(state, chunk, pairs, seg, fft_len)
        if c == 0:
            mid = acc_finalize(state, pairs, max_lag=128)
            mid_delay = float(mid.delay[0])

    final = acc_finalize(state, pairs, max_lag=128)
    assert abs(mid_delay - 23.75) < 0.1  # usable estimate after 1 chunk
    # Note: batch path pre-scales by total RMS; accumulate path is raw.
    # Delays must agree to sub-sample regardless.
    np.testing.assert_allclose(
        float(final.delay[0]), float(batch.delay[0]), atol=5e-3
    )
    assert int(state.n_seg) * seg == n


def test_accumulator_state_is_checkpointable():
    """The state round-trips through host numpy (checkpoint/resume)."""
    n, seg = 1 << 14, 1 << 12
    base = fm_source(jax.random.PRNGKey(1), n, 2e6)
    x = _stack([base, fractional_delay(base, jnp.float32(-7.5))])
    pairs = jnp.asarray([[0, 1]], jnp.int32)
    fft_len = next_pow2(seg + 64)

    state = acc_init(2, 1, fft_len)
    half = C(x.re[:, : n // 2], x.im[:, : n // 2])
    state = acc_update(state, half, pairs, seg, fft_len)

    # "Checkpoint": pull to host, rebuild, resume.
    saved = jax.tree.map(np.asarray, state)
    restored = jax.tree.map(jnp.asarray, saved)
    rest = C(x.re[:, n // 2 :], x.im[:, n // 2 :])
    state2 = acc_update(restored, rest, pairs, seg, fft_len)
    res = acc_finalize(state2, pairs, max_lag=64)
    assert abs(float(res.delay[0]) + 7.5) < 0.05


def test_target_tracker_converges(omaha_stations):
    s = omaha_stations
    st = lla_to_ecef(s["station_lla"])
    pairs = station_pairs(3)

    def tdoas_for(tx_lla):
        d = np.linalg.norm(st - lla_to_ecef(tx_lla), axis=-1)
        return (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT

    tracker = TargetTracker(s["station_lla"])
    rng = np.random.default_rng(0)
    truth_a = s["tgt_tx_lla"]
    truth_b = np.array([41.22, -96.00, 350.0])
    for k in range(10):
        noise = rng.normal(0, 10e-9, 3)  # 10 ns TDOA jitter per window
        tracker.update(
            t=float(k),
            tdoas_s={
                "A": tdoas_for(truth_a) + noise,
                "B": tdoas_for(truth_b) + noise,
            },
        )
    tracks = tracker.tracks
    assert set(tracks) == {"A", "B"}
    for tid, truth in (("A", truth_a), ("B", truth_b)):
        lla = tracks[tid].lla(tracker.origin)
        err = np.linalg.norm(
            lla_to_enu(np.array([lla[0], lla[1], truth[2]]), truth)[:2]
        )
        assert err < 150.0, (tid, err)
        assert tracks[tid].n_updates == 10


def test_tracker_honors_solve_weights():
    """The tracker's own re-solve must respect the processor's final
    per-pair weights: with one station's pairs corrupted (and zeroed by
    outlier rejection upstream), the weighted update lands on truth
    while the unweighted one is dragged far off."""
    lla5 = np.array([
        [41.18660274289527, -95.96064116595667, 355.69],
        [41.24669616513154, -96.08366304481238, 329.0],
        [41.32916620016985, -96.03513381562004, 373.18],
        [41.26, -95.90, 340.0],
        [41.36, -96.12, 360.0],
    ])
    st = lla_to_ecef(lla5)
    pairs = station_pairs(5)
    truth = np.array([41.30888549464701, -96.02619229605524, 356.0])
    d = np.linalg.norm(st - lla_to_ecef(truth), axis=-1)
    tdoa = (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT
    # Station 3's arrival shifted by 80 us — every pair touching it is
    # wrong by that much, the exact shape outlier rejection produces.
    bias = np.array([
        80e-6 * (float(j == 3) - float(i == 3)) for i, j in pairs
    ])
    w = np.array([float(3 not in (i, j)) for i, j in pairs])

    def final_err(weights):
        tracker = TargetTracker(lla5)
        tracker.update(0.0, {"t": tdoa + bias},
                       weights=None if weights is None else {"t": weights})
        lla = tracker.tracks["t"].lla(tracker.origin)
        return np.linalg.norm(
            lla_to_enu(np.array([lla[0], lla[1], truth[2]]), truth)[:2]
        )

    assert final_err(w) < 50.0
    assert final_err(None) > 1000.0  # corrupted pairs drag the re-solve


def test_tracker_innovation_gate(omaha_stations):
    """A single corrupted window (solve lands tens of km off) must not
    yank an established track: the innovation gate coasts through it,
    and the track re-acquires after persistent relocation."""
    s = omaha_stations
    st = lla_to_ecef(s["station_lla"])
    pairs = station_pairs(3)

    def tdoas_for(tx_lla):
        d = np.linalg.norm(st - lla_to_ecef(tx_lla), axis=-1)
        return (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT

    truth = np.array(s["tgt_tx_lla"])
    garbage = tdoas_for(truth) + np.array([60e-6, -45e-6, 15e-6])

    tracker = TargetTracker(s["station_lla"])
    rng = np.random.default_rng(7)
    for k in range(5):
        tracker.update(float(k), {"t": tdoas_for(truth)
                                  + rng.normal(0, 10e-9, 3)})

    def err_to(tx):
        lla = tracker.tracks["t"].lla(tracker.origin)
        return np.linalg.norm(
            lla_to_enu(np.array([lla[0], lla[1], tx[2]]), tx)[:2]
        )

    base_err = err_to(truth)
    tracker.update(5.0, {"t": garbage})
    tr = tracker.tracks["t"]
    assert tr.n_rejected == 1 and tr.coasts == 1
    assert err_to(truth) < base_err + 50.0  # coasted, not yanked
    # A good window resumes normal tracking.
    tracker.update(6.0, {"t": tdoas_for(truth)})
    assert tracker.tracks["t"].coasts == 0
    assert err_to(truth) < 150.0

    # Persistent relocation: after max_coasts consecutive rejections
    # the gate stands down and the track re-acquires the new position.
    new_truth = truth + np.array([0.05, 0.04, 0.0])  # ~6 km away
    for k in range(7, 12):
        tracker.update(float(k), {"t": tdoas_for(new_truth)})
    assert err_to(new_truth) < 300.0, err_to(new_truth)
    assert tracker.tracks["t"].n_rejected >= 3

    # Regression (review finding): after re-acquisition the track must
    # keep following a FAST target. The snap restarts the track's life
    # (n_updates back to 1), so the next windows re-seed the innovation
    # EMA instead of being rejected against a zeroed one — without the
    # restart this scenario limped in an endless reject/snap cycle with
    # 3 of every 4 genuine windows discarded.
    rejected_before = tracker.tracks["t"].n_rejected
    tx = new_truth.copy()
    for k in range(12, 22):
        tx = tx + np.array([0.0, 0.008, 0.0])  # ~670 m east / window
        tracker.update(float(k), {"t": tdoas_for(tx)})
    assert err_to(tx) < 500.0, err_to(tx)
    assert tracker.tracks["t"].n_rejected == rejected_before


def test_tracker_follows_moving_target(omaha_stations):
    """A target drifting ~30 m/s: the alpha-beta filter must keep the
    track within a few hundred meters while smoothing the jitter."""
    s = omaha_stations
    st = lla_to_ecef(s["station_lla"])
    pairs = station_pairs(3)
    tracker = TargetTracker(s["station_lla"], alpha=0.6, beta=0.3)
    rng = np.random.default_rng(1)
    base = np.array(s["tgt_tx_lla"])
    for k in range(15):
        tx = base + np.array([0.0003 * k, 0.0, 0.0])  # ~33 m north/step
        d = np.linalg.norm(st - lla_to_ecef(tx), axis=-1)
        tdoa = (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT
        tracker.update(float(k), {"mover": tdoa + rng.normal(0, 5e-9, 3)})
    lla = tracker.tracks["mover"].lla(tracker.origin)
    final_truth = base + np.array([0.0003 * 14, 0.0, 0.0])
    err = np.linalg.norm(
        lla_to_enu(np.array([lla[0], lla[1], final_truth[2]]), final_truth)[:2]
    )
    assert err < 300.0
    # Velocity estimate should point roughly north at ~33 m/s.
    v = tracker.tracks["mover"].vel_enu
    assert v[1] > 10.0


def _geom_tdoas(station_lla, tx_lla):
    st = lla_to_ecef(station_lla)
    pairs = station_pairs(len(station_lla))
    d = np.linalg.norm(st - lla_to_ecef(np.asarray(tx_lla)), axis=-1)
    return (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT


def test_tracker_kalman_blend_weights_windows(omaha_stations):
    """With calibrated window covariances, the position blend is a
    Kalman gain: a weak window (10 km σ) must barely move an
    established track — or its velocity — while an equally-offset
    tight window (10 m σ) moves it most of the way. The fixed-α blend
    would move 50% of the residual in both cases."""
    s = omaha_stations
    truth = np.array(s["tgt_tx_lla"])
    tdoa = _geom_tdoas(s["station_lla"], truth)
    tight = 100.0 * np.eye(2)  # 10 m σ

    def established():
        tracker = TargetTracker(s["station_lla"])
        p0 = lla_to_enu(truth, tracker.origin)
        for k in range(5):
            tracker.update(float(k), {"t": tdoa},
                           positions_enu={"t": p0},
                           covs_en={"t": tight})
        return tracker, p0

    tracker, p0 = established()
    tr = tracker.tracks["t"]
    assert tr.cov_p is not None
    # Five 10 m-σ windows: the track knows more than one window does.
    assert np.sqrt(tr.cov_p[0, 0]) < 12.0
    base = tr.pos_enu.copy()
    meas = p0 + np.array([400.0, 0.0, 0.0])  # inside the 500 m gate

    tracker.update(5.0, {"t": tdoa}, positions_enu={"t": meas},
                   covs_en={"t": (1e4 ** 2) * np.eye(2)})
    moved_weak = np.linalg.norm(tracker.tracks["t"].pos_enu[:2] - base[:2])
    assert moved_weak < 5.0, moved_weak
    # The velocity correction follows the APPLIED position correction,
    # so the weak window cannot yank it either.
    assert np.linalg.norm(tracker.tracks["t"].vel_enu) < 1.0

    tracker2, _ = established()
    tracker2.update(5.0, {"t": tdoa}, positions_enu={"t": meas},
                    covs_en={"t": tight})
    moved_tight = np.linalg.norm(
        tracker2.tracks["t"].pos_enu[:2] - base[:2]
    )
    assert moved_tight > 150.0, moved_tight


def test_tracker_kalman_covariance_lifecycle(omaha_stations):
    """cov_p stays None on the legacy path, seeds from the first
    calibrated window, grows across a coast/time gap (process noise),
    and a malformed covariance is ignored rather than crashing."""
    s = omaha_stations
    truth = np.array(s["tgt_tx_lla"])
    tdoa = _geom_tdoas(s["station_lla"], truth)
    tracker = TargetTracker(s["station_lla"])
    p0 = lla_to_enu(truth, tracker.origin)

    tracker.update(0.0, {"t": tdoa}, positions_enu={"t": p0})
    assert tracker.tracks["t"].cov_p is None  # legacy: no covariance

    # First calibrated window seeds the covariance.
    tracker.update(1.0, {"t": tdoa}, positions_enu={"t": p0},
                   covs_en={"t": 100.0 * np.eye(2)})
    assert tracker.tracks["t"].cov_p is not None

    # An un-calibrated window keeps (and grows) it: predict adds
    # (process_sigma_v*dt)^2 per axis and no update shrinks it.
    before = tracker.tracks["t"].cov_p[0, 0]
    tracker.update(2.0, {"t": tdoa}, positions_enu={"t": p0})
    after = tracker.tracks["t"].cov_p[0, 0]
    assert after >= before + 0.9 * tracker.process_sigma_v ** 2

    # Malformed covariances (non-PSD, NaN, wrong shape) fall back to
    # the alpha blend instead of crashing the stream.
    for bad in (np.array([[1.0, 9.0], [9.0, 1.0]]),  # det < 0
                np.full((2, 2), np.nan),
                np.eye(3)):
        tracker.update(3.0, {"t": tdoa}, positions_enu={"t": p0},
                       covs_en={"t": bad})


def test_tracker_gate_stands_down_after_long_gap(omaha_stations):
    """A genuine window after a long outage (service restart from
    --state, missed windows) must be ACCEPTED: the prediction is a
    stale extrapolation and the gate widens with the prediction's own
    uncertainty (3·σv·dt, or the grown Kalman covariance). At normal
    window spacing the same jump is still rejected."""
    s = omaha_stations
    truth = np.array(s["tgt_tx_lla"])
    tdoa = _geom_tdoas(s["station_lla"], truth)

    def established(covs):
        tracker = TargetTracker(s["station_lla"])
        p0 = lla_to_enu(truth, tracker.origin)
        for k in range(4):
            tracker.update(float(k), {"t": tdoa},
                           positions_enu={"t": p0}, covs_en=covs)
        return tracker, p0

    jump = np.array([2000.0, 0.0, 0.0])  # 2 km > the 500 m floor

    for covs in (None, {"t": 100.0 * np.eye(2)}):
        # Normal spacing: the 2 km jump is a corrupted window — coast.
        tracker, p0 = established(covs)
        tracker.update(4.0, {"t": tdoa},
                       positions_enu={"t": p0 + jump}, covs_en=covs)
        assert tracker.tracks["t"].coasts == 1, covs

        # One hour later: the same offset is expected drift — accept.
        tracker, p0 = established(covs)
        tracker.update(3600.0, {"t": tdoa},
                       positions_enu={"t": p0 + jump}, covs_en=covs)
        tr = tracker.tracks["t"]
        assert tr.coasts == 0 and tr.n_rejected == 0, covs
        moved = np.linalg.norm(tr.pos_enu[:2] - p0[:2])
        # Kalman: the grown covariance snaps nearly all the way;
        # legacy: the alpha blend takes half.
        assert moved > 900.0, (covs, moved)


def test_track_covariance_calibration(omaha_stations):
    """The Kalman track's claimed covariance must COVER the actual
    track error (chi²(2) coverage at or above the nominal levels).
    With measurement noise drawn exactly from the windows' stated R,
    the only mismatch is the process-noise inflation — which errs
    conservative for a static emitter, never overconfident."""
    s = omaha_stations
    truth = np.array(s["tgt_tx_lla"])
    tdoa = _geom_tdoas(s["station_lla"], truth)
    # Correlated, anisotropic measurement covariance.
    R = np.array([[120.0, 35.0], [35.0, 60.0]])
    chol = np.linalg.cholesky(R)
    maha = []
    for seed in range(150):
        rng = np.random.default_rng(seed)
        tracker = TargetTracker(s["station_lla"])
        p0 = lla_to_enu(truth, tracker.origin)
        for k in range(8):
            noise = chol @ rng.standard_normal(2)
            meas = p0 + np.array([noise[0], noise[1], 0.0])
            tracker.update(float(k), {"t": tdoa},
                           positions_enu={"t": meas}, covs_en={"t": R})
        tr = tracker.tracks["t"]
        e = tr.pos_enu[:2] - p0[:2]
        maha.append(float(e @ np.linalg.solve(tr.cov_p, e)))
    maha = np.asarray(maha)
    # chi²(2) quantiles: 2.30 (39.3%), 6.18 (86.5%), 11.83 (98.9%).
    for q, target in ((2.30, 0.393), (6.18, 0.865), (11.83, 0.989)):
        cov = float(np.mean(maha <= q))
        assert cov >= target - 0.05, (q, cov)


def test_track_from_jsonable_rejects_corrupt_state():
    """A corrupted-but-parseable checkpoint must fail in the loader
    (where the CLI falls back to a fresh start), not at the first
    window's update."""
    import pytest

    from tdoa_tpu.pipeline.streaming import Track

    good = Track(pos_enu=np.zeros(3), vel_enu=np.zeros(3),
                 last_t=1.0, cov_p=np.eye(2)).to_jsonable()
    assert Track.from_jsonable(good).cov_p is not None

    for mutate in (
        {"pos_enu": [1.0, 2.0]},                 # truncated vector
        {"vel_enu": [0.0, float("nan"), 0.0]},   # NaN-poisoned
        {"last_t": float("nan")},
        {"cov_p": [[1.0, 0.0]]},                 # wrong shape
    ):
        bad = dict(good, **mutate)
        with pytest.raises((ValueError, TypeError)):
            Track.from_jsonable(bad)


def test_acc_checkpoint_roundtrip(tmp_path):
    """acc_save/acc_load: integrate, checkpoint, resume in a fresh
    state, and finalize — identical delays to an uninterrupted run."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.pipeline.streaming import (
        acc_finalize,
        acc_init,
        acc_load,
        acc_save,
        acc_update,
    )

    seg, fft_len, max_lag = 4096, 8192, 64
    rng = np.random.default_rng(3)
    base = rng.standard_normal(4 * seg) + 1j * rng.standard_normal(4 * seg)
    f = np.fft.fftfreq(4 * seg)
    delayed = np.fft.ifft(np.fft.fft(base) * np.exp(-2j * np.pi * f * 7.25))
    x = np.stack([base, delayed])
    chunk = lambda k: C(
        jnp.asarray(x.real[:, k * seg:(k + 2) * seg], jnp.float32),
        jnp.asarray(x.imag[:, k * seg:(k + 2) * seg], jnp.float32),
    )
    pairs = jnp.asarray(np.array([[0, 1]], np.int32))

    # Uninterrupted.
    st = acc_init(2, 1, fft_len)
    st = acc_update(st, chunk(0), pairs, seg, fft_len)
    st = acc_update(st, chunk(2), pairs, seg, fft_len)
    ref = acc_finalize(st, pairs, max_lag)

    # Checkpointed between chunks.
    st = acc_init(2, 1, fft_len)
    st = acc_update(st, chunk(0), pairs, seg, fft_len)
    acc_save(str(tmp_path / "ck.npz"), st)
    st2 = acc_load(str(tmp_path / "ck.npz"))
    st2 = acc_update(st2, chunk(2), pairs, seg, fft_len)
    res = acc_finalize(st2, pairs, max_lag)

    np.testing.assert_allclose(np.asarray(res.delay), np.asarray(ref.delay),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.delay), [7.25], atol=0.05)


def test_stage_timer_and_processor_profile():
    """StageTimer accumulates synced stage times and the processor
    surfaces them via .timer."""
    from tdoa_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        x = jnp_ones()
        t.observe(x)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and "total" in rep
    assert t.times["a"] > 0


def jnp_ones():
    import jax.numpy as jnp

    return jnp.ones((8,)) * 2.0


def test_streaming_split_slot_empirical_sigma():
    """acc_finalize folds a split-slot empirical sigma into delay_std
    once BOTH interleaved slots hold data: small on a clean stream,
    inflated when half the stream is corrupted — and absent (model
    sigma only) after a single update call."""
    n = 1 << 16
    seg = 1 << 13
    chunk_len = 1 << 14
    base = fm_source(jax.random.PRNGKey(6), n, 2e6)
    x = _stack([base, fractional_delay(base, jnp.float32(11.5))])
    kr, ki = jax.random.split(jax.random.PRNGKey(7))
    x = C(
        x.re + 0.2 * jax.random.normal(kr, x.re.shape, jnp.float32),
        x.im + 0.2 * jax.random.normal(ki, x.im.shape, jnp.float32),
    )
    pairs = jnp.asarray([[0, 1]], jnp.int32)
    fft_len = next_pow2(seg + 128)

    def run(sig):
        st = acc_init(2, 1, fft_len)
        for c in range(n // chunk_len):
            st = acc_update(
                st,
                C(sig.re[:, c * chunk_len:(c + 1) * chunk_len],
                  sig.im[:, c * chunk_len:(c + 1) * chunk_len]),
                pairs, seg, fft_len,
            )
        return st, acc_finalize(st, pairs, max_lag=128)

    st_clean, clean = run(x)
    # 4 chunks rotate through the 4 slots: 2 segs each, K=4 active.
    assert int(st_clean.n_seg_a) == 2  # chunk 0 only
    assert int(st_clean.n_seg_b) == 2
    assert int(st_clean.n_seg_c) == 2
    assert abs(float(clean.delay[0]) - 11.5) < 0.1
    s_clean = float(clean.delay_std[0])
    assert 0.0 < s_clean < 0.5, s_clean

    # Corrupt the odd chunks (slot B): signal replaced by noise there.
    # The noise slot's zoom peak is a uniform draw over the +-16
    # window, so sigma_emp = |da-db|/2 is itself random (it is a
    # 1-realization estimator; the ellipse-calibration study validates
    # it statistically) — assert over a few draws, not one.
    mask = np.zeros(n, np.float32)
    for c in range(n // chunk_len):
        if c % 2 == 1:
            mask[c * chunk_len:(c + 1) * chunk_len] = 1.0
    m = jnp.asarray(mask)
    s_wrecks = []
    for ks in (8, 9, 10):
        kw = jax.random.normal(
            jax.random.PRNGKey(ks), (2, n, 2), jnp.float32
        )
        xw = C(x.re * (1 - m) + kw[..., 0] * m,
               x.im * (1 - m) + kw[..., 1] * m)
        _, wreck = run(xw)
        s_wrecks.append(float(wreck.delay_std[0]))
    assert max(s_wrecks) > max(3.0 * s_clean, 0.5), (s_wrecks, s_clean)

    # Single update: slot B empty, model sigma only — finite, no NaN.
    st1 = acc_init(2, 1, fft_len)
    st1 = acc_update(
        st1, C(x.re[:, :chunk_len], x.im[:, :chunk_len]), pairs, seg,
        fft_len,
    )
    one = acc_finalize(st1, pairs, max_lag=128)
    assert np.isfinite(float(one.delay_std[0]))
    assert abs(float(one.delay[0]) - 11.5) < 0.1


def test_streaming_k4_slots_and_k2_fallback():
    """Slot ladder: 4 balanced slots -> K=4 sigma; 2-3 chunks -> the
    even/odd K=2 halves; 2-slot-era checkpoints (no B/C arrays) load
    with empty slots and finalize still folds the K=2 floor in."""
    import os
    import tempfile

    from tdoa_tpu.pipeline.streaming import (
        acc_finalize,
        acc_init,
        acc_load,
        acc_save,
        acc_update,
    )

    n = 1 << 16
    seg = 1 << 13
    chunk_len = 1 << 14
    base = fm_source(jax.random.PRNGKey(16), n, 2e6)
    x = _stack([base, fractional_delay(base, jnp.float32(7.5))])
    kr, ki = jax.random.split(jax.random.PRNGKey(17))
    x = C(
        x.re + 0.2 * jax.random.normal(kr, x.re.shape, jnp.float32),
        x.im + 0.2 * jax.random.normal(ki, x.im.shape, jnp.float32),
    )
    pairs = jnp.asarray([[0, 1]], jnp.int32)
    fft_len = next_pow2(seg + 128)

    def advance(st, lo, hi):
        for c in range(lo, hi):
            st = acc_update(
                st,
                C(x.re[:, c * chunk_len:(c + 1) * chunk_len],
                  x.im[:, c * chunk_len:(c + 1) * chunk_len]),
                pairs, seg, fft_len,
            )
        return st

    # 3 chunks: slot D empty -> the K=2 even/odd fallback must engage
    # (finite sigma, correct delay).
    st3 = advance(acc_init(2, 1, fft_len), 0, 3)
    r3 = acc_finalize(st3, pairs, max_lag=128)
    assert abs(float(r3.delay[0]) - 7.5) < 0.1
    assert np.isfinite(float(r3.delay_std[0]))

    # 4 chunks: all slots hold 2 segments -> K=4 active.
    st4 = advance(st3, 3, 4)
    assert int(st4.n_seg - st4.n_seg_a - st4.n_seg_b - st4.n_seg_c) == 2
    r4 = acc_finalize(st4, pairs, max_lag=128)
    assert abs(float(r4.delay[0]) - 7.5) < 0.1
    assert 0.0 < float(r4.delay_std[0]) < 1.0

    # 2-slot-era checkpoint: strip the B/C arrays from a saved state.
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ck.npz")
        acc_save(p, st4)
        with np.load(p) as z:
            legacy = {k: z[k] for k in z.files
                      if not (k.endswith("_b") or k.endswith("_c"))}
        np.savez(p, **legacy)
        st_old = acc_load(p)
        assert int(st_old.n_seg_b) == 0 and int(st_old.n_seg_c) == 0
        r_old = acc_finalize(st_old, pairs, max_lag=128)
        # Slot A (chunks 0,4,... here just 0) vs D=total-A: K=2 path.
        assert abs(float(r_old.delay[0]) - 7.5) < 0.1
        assert np.isfinite(float(r_old.delay_std[0]))
