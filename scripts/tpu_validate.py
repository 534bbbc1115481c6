"""On-hardware validation sweep: every hardware-only code path, on the
REAL TPU chip, PASS/FAIL per check, nonzero exit on any failure.

Checks (each exists because CPU-interpreter validation missed a real
hardware failure at least once — VMEM budgets, bf16 numerics, compile
stalls):
 1. full pipeline e2e: fused Pallas accumulator + bf16 .dat decode
 2. fused kernel vs XLA path agreement; split-half empirical sigma
    (clean sub-sample, corrupted-half inflation) on real bf16 numerics
 3. CAF joint delay-Doppler estimation
 4. streaming accumulator through the fused kernel
 5. Pallas FM-demod kernel vs XLA demod; FM-mode pipeline on chip
    (the XLA conv path requested 34 GB at 100 s scale — regression)
 6. 8/12/16/20-station fused kernel: computed VMEM limits (16 stations
    = 120 pairs fit one invocation; 20 = 190 pairs pair-TILE across two
    invocations, fused_max_pairs), DC clamps
 7. multi-emitter separation through the fused path
 8. moving emitter: CAF + deramp-and-correlate + FDOA velocity
 9. joint (lag, Doppler) separation: mover + co-channel interferer
 10. audio-pattern matched filter (both match domains) on chip
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

FAILURES = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name}  {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    dev = jax.devices()[0]
    plat = dev.platform.lower()
    if not ("tpu" in plat or plat == "axon"):
        print(f"not a TPU backend ({dev}); this sweep proves hardware paths")
        return 2
    print(f"device: {dev}", flush=True)

    from tdoa_tpu.geo import lla_to_enu
    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.ops.pallas.corr_accum import SEG_LEN
    from tdoa_tpu.pipeline import TDOAProcessor
    from tdoa_tpu.sim import SimScene, write_scene_captures

    # One source of truth for the deployment geometry (also what
    # lat-lon-table.csv carries).
    from tdoa_tpu.cli.simulator import (
        DEFAULT_REF_TX,
        DEFAULT_STATIONS,
        DEFAULT_TGT_TX,
    )

    omaha = {
        "names": tuple(DEFAULT_STATIONS),
        "lla": np.array(list(DEFAULT_STATIONS.values())),
        "ref_tx": np.array(DEFAULT_REF_TX),
        "tgt_tx": np.array(DEFAULT_TGT_TX),
    }
    # Shared by checks 7 and 9 (>90-sample TDOA separation per pair).
    interferer_lla = np.array([41.05, -95.99, 340.0])

    # ---- 1. full pipeline, fused kernel + bf16 decode -------------------
    t0 = time.time()
    scene = SimScene(
        station_names=omaha["names"],
        station_lla=omaha["lla"],
        ref_tx_lla=omaha["ref_tx"],
        tgt_tx_lla=omaha["tgt_tx"],
        ref_freq=162.4e6,
        tgt_freq=101.9e6,
        block_len=2 * SEG_LEN,  # ≥ one kernel segment per block
        clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),
        seed=3,
    )
    with tempfile.TemporaryDirectory() as td:
        csv = os.path.join(td, "stations.csv")
        with open(csv, "w") as f:
            f.write("Name,Latitude,Longitude,Elevation\n")
            f.write(f"162400000,{omaha['ref_tx'][0]},{omaha['ref_tx'][1]},"
                    f"{omaha['ref_tx'][2]}\n")
            for n, row in zip(omaha["names"], omaha["lla"]):
                f.write(f"{n},{row[0]},{row[1]},{row[2]}\n")
        # The scene simulator is complex64 (CPU-only on this runtime);
        # only the processing under test should touch the chip.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            paths, truth = write_scene_captures(scene, td)
        proc = TDOAProcessor.from_csv(
            162.4e6, 101.9e6, csv, max_lag=512, accumulator="pallas"
        )
        res = proc.process_files(sorted(paths.values()))
        tau = dict(zip(scene.station_names, truth.station_delays_samples[:, 1]))
        order = res.station_names
        want = np.array([
            tau[order[j]] - tau[order[i]] for i, j in res.pair_idx
        ])
        tdoa_err = np.abs(res.corrected_tdoa_samples - want).max()
        est = np.array([res.fix.lat, res.fix.lon, omaha["tgt_tx"][2]])
        fix_err = np.linalg.norm(lla_to_enu(est, omaha["tgt_tx"])[:2])
        check(
            "pipeline fused+bf16 e2e",
            tdoa_err < 0.5 and fix_err < 200.0,
            f"tdoa_err {tdoa_err:.3f} samp, fix_err {fix_err:.1f} m, "
            f"{time.time()-t0:.0f}s",
        )

    # ---- 2. fused vs XLA agreement --------------------------------------
    from tdoa_tpu.ops.corr import correlate_pairs_fused, correlate_pairs_planar

    key = jax.random.PRNGKey(0)
    kr, ki = jax.random.split(key)
    n = 2 * SEG_LEN
    base_r = jax.random.normal(kr, (n,), jnp.float32)
    base_i = jax.random.normal(ki, (n,), jnp.float32)
    shift = 37
    x = C(
        jnp.stack([base_r, jnp.roll(base_r, shift)]),
        jnp.stack([base_i, jnp.roll(base_i, shift)]),
    )
    pairs = ((0, 1),)
    rf = correlate_pairs_fused(x, pairs, max_lag=512, weighting="phat",
                               precision="bf16")
    rx = correlate_pairs_planar(
        x, jnp.asarray([[0, 1]], jnp.int32), max_lag=512,
        seg_len=SEG_LEN, fft_len=65536, weighting="phat",
    )
    d_f, d_x = float(rf.delay[0]), float(rx.delay[0])
    check(
        "fused kernel vs XLA path",
        abs(d_f - shift) < 0.1 and abs(d_x - shift) < 0.1,
        f"fused {d_f:.3f}, xla {d_x:.3f}, true {shift}",
    )

    # ---- 2b. split-half empirical sigma on chip ---------------------------
    # The honest-error-bar machinery (coherence debias + per-half zoom
    # DFT, BENCHLOG "Honest error bars") runs bf16 matmuls on hardware:
    # a clean capture must keep a sub-sample sigma, and corrupting ONE
    # half (noise replaces signal) must inflate sigma — the halves now
    # disagree — without breaking the delay estimate the good half
    # still anchors.
    noise = 0.3 * jax.random.normal(jax.random.PRNGKey(9), (2, n, 2))
    xn = C(x.re + noise[..., 0], x.im + noise[..., 1])
    r_clean = correlate_pairs_fused(xn, pairs, max_lag=512, weighting="ht",
                                    precision="bf16")
    wreck = jax.random.normal(jax.random.PRNGKey(10), (2, SEG_LEN, 2))
    xw = C(
        xn.re.at[1, SEG_LEN:].set(wreck[1, :, 0]),
        xn.im.at[1, SEG_LEN:].set(wreck[1, :, 1]),
    )
    r_wreck = correlate_pairs_fused(xw, pairs, max_lag=512, weighting="ht",
                                    precision="bf16")
    s_clean = float(r_clean.delay_std[0])
    s_wreck = float(r_wreck.delay_std[0])
    d_clean = float(r_clean.delay[0])
    check(
        "split-half sigma on chip",
        abs(d_clean - shift) < 0.1 and 0.0 < s_clean < 0.5
        and s_wreck > max(2.0 * s_clean, 0.5),
        f"delay {d_clean:.3f} (want {shift}), sigma clean {s_clean:.4f}, "
        f"half-corrupted {s_wreck:.3f}",
    )

    # ---- 3. CAF on device ------------------------------------------------
    from tdoa_tpu.ops.caf import caf_pairs
    from tdoa_tpu.sim import fm_source, fractional_delay

    fs = 2e6
    nn = 1 << 17
    # Source synthesis uses complex64 internally → CPU; the CAF under
    # test runs on the chip.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        src = np.asarray(fm_source(jax.random.PRNGKey(5), nn, fs))
        delayed = np.asarray(
            fractional_delay(jnp.asarray(src), jnp.float32(23.5))
        )
    # Apply a 40 Hz relative Doppler to the delayed copy (host numpy).
    t = np.arange(nn) / fs
    delayed = delayed * np.exp(2j * np.pi * 40.0 * t)
    xc = C(
        jnp.asarray(np.stack([src.real, delayed.real]), jnp.float32),
        jnp.asarray(np.stack([src.imag, delayed.imag]), jnp.float32),
    )
    cres = caf_pairs(xc, jnp.asarray([[0, 1]], jnp.int32), fs,
                     max_lag=128, seg_len=1 << 14, n_doppler=33)
    cd, cf = float(cres.delay[0]), float(cres.doppler_hz[0])
    check("CAF delay-Doppler", abs(cd - 23.5) < 0.5 and abs(cf - 40) < 8,
          f"delay {cd:.2f} (want 23.5), doppler {cf:.1f} Hz (want 40)")

    # ---- 4. streaming accumulator through the fused kernel ---------------
    from tdoa_tpu.pipeline.streaming import acc_finalize, acc_init, acc_update

    st = acc_init(2, 1, 65536)
    chunk = C(x.re[:, :SEG_LEN], x.im[:, :SEG_LEN])
    pair_idx = jnp.asarray([[0, 1]], jnp.int32)
    st = acc_update(st, chunk, pair_idx, SEG_LEN, 65536, pairs_static=pairs)
    st = acc_update(
        st, C(x.re[:, SEG_LEN:], x.im[:, SEG_LEN:]), pair_idx, SEG_LEN,
        65536, pairs_static=pairs,
    )
    sres = acc_finalize(st, pair_idx, max_lag=512, weighting="phat")
    sd = float(sres.delay[0])
    check("streaming pallas accumulate", abs(sd - shift) < 0.1,
          f"delay {sd:.3f}, n_seg {int(st.n_seg)}")

    # ---- 5. Pallas FM demod kernel vs XLA path ---------------------------
    from tdoa_tpu.dsp import fm_demodulate
    from tdoa_tpu.ops.pallas.fm_demod import fm_demod_decimate_pallas

    na = 1 << 18
    audio = np.sin(2 * np.pi * 1e3 * np.arange(na) / fs)
    phase = 2 * np.pi * 25e3 / fs * np.cumsum(audio)
    iq = np.exp(1j * phase).astype(np.complex64)
    xa = C(jnp.asarray(iq.real), jnp.asarray(iq.imag))
    a_pl = np.asarray(fm_demod_decimate_pallas(xa, fs, deviation_hz=25e3))
    a_xla = np.asarray(fm_demodulate(xa, fs, decim=16, deviation_hz=25e3))
    m = min(len(a_pl), len(a_xla))
    # The two paths use different FIR group-delay conventions (centered
    # 'SAME' vs causal polyphase) — align over a few audio samples
    # before judging fidelity.
    corr = max(
        np.corrcoef(
            a_pl[100 + s : m - 100 + s], a_xla[100 : m - 100]
        )[0, 1]
        for s in range(-8, 9)
    )
    check("pallas FM demod kernel", corr > 0.99,
          f"aligned corr vs XLA {corr:.4f}")

    # ---- 5b. FM-mode pipeline on chip ------------------------------------
    # mode="fm" must route through the Pallas demod on TPU: the XLA
    # conv path's relayout requested 34 GB at 100 s scale and failed to
    # compile (BENCHLOG round 2). This catches both the routing and the
    # audio-domain TDOA math on real hardware: a known sample shift on
    # station 2's IQ must appear in the corrected audio-domain TDOAs.
    from tdoa_tpu.pipeline.processor import process_blocks

    nfm = 2 * SEG_LEN
    shift_fm = 96  # multiple of fm_decim → exact in audio samples
    fm_blocks = []
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        for bk in range(3):
            srcb = np.asarray(fm_source(jax.random.PRNGKey(40 + bk), nfm, fs))
            # Shift only the TGT block: the REF blocks then measure
            # zero clock offset and the corrected TDOA IS the shift.
            st2 = np.roll(srcb, shift_fm) if bk == 1 else srcb
            sig = np.stack([srcb, srcb, st2])
            fm_blocks.append(
                C(jnp.asarray(sig.real, jnp.float32),
                  jnp.asarray(sig.imag, jnp.float32))
            )
    out_fm = process_blocks(
        fm_blocks[0], fm_blocks[1], fm_blocks[2],
        jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32),
        jnp.zeros(3, jnp.float32),
        max_lag=512, weighting="ht", mode="fm", fm_decim=8,
    )
    tdoa_fm = np.asarray(out_fm[0])
    want_fm = np.array([0.0, shift_fm, shift_fm])
    err_fm = np.abs(tdoa_fm - want_fm).max()
    check("FM-mode pipeline on chip", err_fm < 2.0,
          f"audio-domain TDOAs {np.round(tdoa_fm, 2)} want {want_fm}")

    # ---- 6. full 8-station kernel configuration --------------------------
    # 28 pairs of VMEM accumulators (~20 MB) exercises the computed
    # vmem_limit_bytes request, and DC-offset inputs exercise the
    # negative-PSD clamp in the DC-removal finalize (both were hardware-
    # only failures once).
    from tdoa_tpu.solve.multilateration import station_pairs

    br8 = np.asarray(base_r)
    bi8 = np.asarray(base_i)
    # 8 = the round-1 limit; 12 and 16 = the capacity-gated extension
    # (fused_max_pairs: 16 stations = 120 pairs fit ONE invocation);
    # 20 = pair tiling (190 pairs split across 2 kernel invocations,
    # stitched cross-spectra — the cap-lift path must be chip-proven).
    for n_st in (8, 12, 16, 20):
        shifts = [7 * k for k in range(n_st)] if n_st <= 8 else [
            5 * k for k in range(n_st)
        ]
        xs = C(
            jnp.asarray(np.stack([np.roll(br8, s) + 0.005 for s in shifts]),
                        jnp.float32),
            jnp.asarray(np.stack([np.roll(bi8, s) - 0.004 for s in shifts]),
                        jnp.float32),
        )
        pairs_n = tuple(map(tuple, station_pairs(n_st).tolist()))
        rs = correlate_pairs_fused(xs, pairs_n, max_lag=512, weighting="ht",
                                   precision="bf16", remove_dc=True)
        ds = np.asarray(rs.delay)
        want_n = np.array([shifts[j] - shifts[i] for i, j in pairs_n])
        err_n = np.abs(ds - want_n).max()
        finite = bool(np.isfinite(np.asarray(rs.quality)).all())
        check(f"{n_st}-station fused kernel", err_n < 0.1 and finite,
              f"{len(pairs_n)} pairs, max delay err {err_n:.3f}, "
              f"finite={finite}")

    # ---- 7. multi-emitter separation through the fused path --------------
    # The correlation-window return from the fused kernel (a post-review
    # output) and the host-side association must work against real-chip
    # numerics. Interferer placed for >90-sample TDOA separation.
    t0 = time.time()
    scene_me = SimScene(
        station_names=omaha["names"],
        station_lla=omaha["lla"],
        ref_tx_lla=omaha["ref_tx"],
        tgt_tx_lla=omaha["tgt_tx"],
        ref_freq=162.4e6,
        tgt_freq=101.9e6,
        block_len=2 * SEG_LEN,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]),
        interferer_lla=interferer_lla,
        interferer_amplitude=1.0,
        seed=17,
    )
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig
    from tdoa_tpu.sim.scene import simulate_scene

    from tdoa_tpu.ops.cplx import from_complex

    # Simulate AND planar-convert on CPU: the TPU backend cannot touch
    # complex64 at all (even jnp.real on a transfer fails UNIMPLEMENTED).
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        caps_me, truth_me = simulate_scene(scene_me)
        caps_me = {
            n: tuple(from_complex(b) for b in blocks)
            for n, blocks in caps_me.items()
        }

    table_me = StationTable(
        stations=[Station(n, *omaha["lla"][k])
                  for k, n in enumerate(omaha["names"])],
        reference_tx=Station("162400000", *omaha["ref_tx"]),
    )
    proc_me = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        accumulator="pallas", multi_emitter=2),
        table_me,
    )
    res_me = proc_me.process_captures(
        {n: caps_me[n] for n in scene_me.station_names}
    )
    n_em = 0 if res_me.emitters is None else len(res_me.emitters)
    me_ok = n_em == 2
    if me_ok:
        from tdoa_tpu.geo import lla_to_ecef

        def _true_tdoa(tx):
            st = lla_to_ecef(omaha["lla"])
            d = np.linalg.norm(st - lla_to_ecef(tx), axis=-1)
            tau = d / 299792458.0 * scene_me.sample_rate
            # res_me pair order may differ from scene order
            name_i = [res_me.station_names[i] for i in res_me.pair_idx[:, 0]]
            name_j = [res_me.station_names[j] for j in res_me.pair_idx[:, 1]]
            by = {n: k for k, n in enumerate(omaha["names"])}
            return np.array(
                [tau[by[nj]] - tau[by[ni]] for ni, nj in zip(name_i, name_j)]
            )

        errs = [
            min(np.abs(e.tdoa_samples - _true_tdoa(tx)).max()
                for e in res_me.emitters)
            for tx in (omaha["tgt_tx"], interferer_lla)
        ]
        me_ok = all(e < 2.0 for e in errs)
    check("multi-emitter fused separation", me_ok,
          f"{n_em} emitters, tdoa errs "
          f"{[round(float(e), 2) for e in errs] if n_em == 2 else 'n/a'}, "
          f"{time.time()-t0:.0f}s")

    # ---- 8. moving emitter: CAF + deramp-and-correlate + velocity --------
    # The --solve-velocity chain (CAF steering matmuls, the deramp
    # rotation, the re-run correlator) all on the chip.
    t0 = time.time()
    scene_mv = SimScene(
        station_names=omaha["names"],
        station_lla=omaha["lla"],
        ref_tx_lla=omaha["ref_tx"],
        tgt_tx_lla=omaha["tgt_tx"],
        ref_freq=162.4e6,
        tgt_freq=101.9e6,
        block_len=4 * SEG_LEN,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]),
        tgt_velocity_enu=np.array([150.0, -80.0, 0.0]),
        seed=5,
    )
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        caps_mv, _ = simulate_scene(scene_mv)
        caps_mv = {
            n: tuple(from_complex(b) for b in blocks)
            for n, blocks in caps_mv.items()
        }
    proc_mv = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        solve_velocity=True),
        table_me,
    )
    res_mv = proc_mv.process_captures(
        {n: caps_mv[n] for n in scene_mv.station_names}
    )
    v_err = (
        np.linalg.norm(res_mv.velocity_enu - np.array([150.0, -80.0, 0.0]))
        if res_mv.velocity_enu is not None else np.inf
    )
    fix_err_mv = np.linalg.norm(
        lla_to_enu(
            np.array([res_mv.fix.lat, res_mv.fix.lon, omaha["tgt_tx"][2]]),
            omaha["tgt_tx"],
        )[:2]
    )
    check("moving-emitter velocity (CAF+deramp)",
          v_err < 10.0 and fix_err_mv < 200.0,
          f"vel err {v_err:.1f} m/s, fix err {fix_err_mv:.0f} m, "
          f"{time.time()-t0:.0f}s")

    # ---- 9. joint (lag, Doppler) separation: mover + static interferer --
    t0 = time.time()
    scene_j = SimScene(
        station_names=omaha["names"],
        station_lla=omaha["lla"],
        ref_tx_lla=omaha["ref_tx"],
        tgt_tx_lla=omaha["tgt_tx"],
        ref_freq=162.4e6,
        tgt_freq=101.9e6,
        block_len=4 * SEG_LEN,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]),
        tgt_velocity_enu=np.array([120.0, -60.0, 0.0]),
        interferer_lla=interferer_lla,
        interferer_amplitude=1.0,
        seed=5,
    )
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        caps_j, _ = simulate_scene(scene_j)
        caps_j = {
            n: tuple(from_complex(b) for b in blocks)
            for n, blocks in caps_j.items()
        }
    proc_j = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        solve_velocity=True, multi_emitter=2),
        table_me,
    )
    res_j = proc_j.process_captures(
        {n: caps_j[n] for n in scene_j.station_names}
    )
    n_j = 0 if res_j.emitters is None else len(res_j.emitters)
    j_ok = n_j == 2
    detail_j = f"{n_j} emitters"
    if j_ok:
        def _dist(e, tx):
            est = np.array([e.fix.lat, e.fix.lon, tx[2]])
            return np.linalg.norm(lla_to_enu(est, tx)[:2])

        mover = min(res_j.emitters, key=lambda e: _dist(e, omaha["tgt_tx"]))
        static = min(
            res_j.emitters,
            key=lambda e: _dist(e, interferer_lla),
        )
        v_err_j = (
            np.linalg.norm(
                mover.velocity_enu - np.array([120.0, -60.0, 0.0]))
            if mover.velocity_enu is not None else np.inf
        )
        j_ok = (
            mover is not static
            and _dist(mover, omaha["tgt_tx"]) < 2000.0
            and _dist(static, interferer_lla) < 2000.0
            and v_err_j < 15.0
        )
        detail_j += (
            f", mover fix {_dist(mover, omaha['tgt_tx']):.0f} m / vel err "
            f"{v_err_j:.1f} m/s, static fix "
            f"{_dist(static, interferer_lla):.0f} m"
        )
    check("joint lag-Doppler separation", j_ok,
          f"{detail_j}, {time.time()-t0:.0f}s")

    # ---- 10. audio-pattern matched filter on chip -----------------------
    # A known 44.1 kHz recording drives the TGT emitter; both match
    # domains (demod-audio correlation, complex-RF CAF with LO search)
    # run their FFT/matmul programs on the real chip.
    t0 = time.time()
    from tdoa_tpu.dsp.filters import resample_fft
    from tdoa_tpu.pipeline.audio_match import match_captures
    from tdoa_tpu.sim import simulate_scene
    from tdoa_tpu.sim.source import bandlimited_noise

    blk_a = 2 * SEG_LEN
    fs = 2e6
    n44 = int(round(blk_a * 44100.0 / fs))
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        audio44 = np.asarray(
            bandlimited_noise(jax.random.PRNGKey(11), n44, 10e3, 44100.0)
        )
        audio44 = 0.8 * audio44 / np.abs(audio44).max()
        n_res = int(round(n44 * fs / 44100.0))
        audio_fs = np.asarray(resample_fft(jnp.asarray(audio44), n_res))
        scene_a = SimScene(
            station_names=omaha["names"],
            station_lla=omaha["lla"],
            ref_tx_lla=omaha["ref_tx"],
            tgt_tx_lla=omaha["tgt_tx"],
            ref_freq=162.4e6,
            tgt_freq=101.9e6,
            block_len=blk_a,
            clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),
            tgt_audio=audio_fs,
            tgt_deviation_hz=50e3,
            seed=11,
        )
        caps_a, truth_a = simulate_scene(scene_a)
        # Planar conversion on CPU: eager complex transfers to the TPU
        # are UNIMPLEMENTED (same convention as checks 7 and 9).
        caps_a = {
            n: tuple(from_complex(b) for b in blocks)
            for n, blocks in caps_a.items()
        }
    proc_a = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6,
                        max_lag=1024, seg_len=None),
        table_me,
    )
    tau_a = dict(
        zip(scene_a.station_names, truth_a.station_delays_samples[:, 1])
    )
    for am_mode in ("audio", "rf", "auto"):
        res_a = match_captures(
            proc_a, {n: caps_a[n] for n in scene_a.station_names},
            audio44, 44100.0, mode=am_mode, deviation_hz=50e3,
        )
        order_a = res_a.station_names
        want_a = np.array([
            tau_a[order_a[j]] - tau_a[order_a[i]]
            for i, j in res_a.pair_idx
        ])
        err_a = np.abs(
            np.asarray(res_a.corrected_tdoa_samples) - want_a
        ).max()
        est_a = np.array([res_a.fix.lat, res_a.fix.lon, omaha["tgt_tx"][2]])
        fixe_a = np.linalg.norm(lla_to_enu(est_a, omaha["tgt_tx"])[:2])
        # On this clean scene auto must stay in the audio domain with
        # no escalation — a PSR-trigger misfire would show up here.
        mode_ok = (am_mode != "auto") or (
            res_a.mode_used == "audio"
            and not any("escalated" in w for w in res_a.warnings)
        )
        check(f"audio-match ({am_mode}) on chip",
              err_a < 4.0 and fixe_a < 4000.0 and mode_ok,
              f"tdoa err {err_a:.2f} smp, fix err {fixe_a:.0f} m, "
              f"covered {res_a.covered_fraction:.2f}"
              + (f", used {res_a.mode_used}" if am_mode == "auto" else "")
              + f", {time.time()-t0:.0f}s")
        t0 = time.time()

    print()
    if FAILURES:
        print(f"{len(FAILURES)} FAILED: {', '.join(FAILURES)}")
        return 1
    print("ALL HARDWARE CHECKS PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
