"""Overlapped chunked ingest (pipeline/ingest.py): the streamed
host→device path must reproduce the batch pipeline's TDOAs and fix.

The overlap itself (transfer during compute) is a wall-clock property
measured on hardware by bench.py; these tests pin the NUMERICS — chunk
boundaries, per-chunk DC removal, the stacked 3-block pair layout, the
clock correction, and the CLI wiring — on the CPU backend.
"""

import numpy as np
import pytest

from tdoa_tpu.geo import lla_to_enu
from tdoa_tpu.pipeline import TDOAProcessor
from tdoa_tpu.sim import SimScene, simulate_scene, write_scene_captures

BLOCK = 1 << 17


def _scene(omaha, **kw):
    return SimScene(
        station_names=omaha["names"],
        station_lla=omaha["station_lla"],
        ref_tx_lla=omaha["ref_tx_lla"],
        tgt_tx_lla=omaha["tgt_tx_lla"],
        ref_freq=omaha["ref_freq"],
        tgt_freq=omaha["tgt_freq"],
        block_len=BLOCK,
        **kw,
    )


def _fix_error_m(fix, tgt_lla):
    est = np.array([fix.lat, fix.lon, tgt_lla[2]])
    return np.linalg.norm(lla_to_enu(est, tgt_lla)[:2])


def test_plan_chunks_covers_whole_segments():
    from tdoa_tpu.pipeline.ingest import plan_chunks

    chunk, spans = plan_chunks(block_len=10_000, seg_len=896,
                               chunk_samples=3 * 896)
    assert chunk == 3 * 896
    # Every span a multiple of seg_len, contiguous, covering 11*896.
    assert all(n % 896 == 0 for _, n in spans)
    assert spans[0][0] == 0
    for (s0, n0), (s1, _) in zip(spans, spans[1:]):
        assert s1 == s0 + n0
    assert sum(n for _, n in spans) == (10_000 // 896) * 896


def test_ingest_matches_batch_path(omaha_stations, station_csv, tmp_path):
    """Streamed chunked ingest vs the batch processor on the same
    capture bytes: corrected TDOAs within 0.05 samples, fix within a
    few meters (per-chunk vs per-block DC removal and the interleaved
    streaming split-σ are the only differences)."""
    scene = _scene(
        omaha_stations,
        clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),
        seed=11,
    )
    paths, truth = write_scene_captures(scene, str(tmp_path))
    dat = [paths[n] for n in scene.station_names]
    kw = dict(seg_len=1 << 14, max_lag=512)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv, **kw
    )
    batch = proc.process_files(dat)
    stream = proc.process_files_overlapped(dat)
    np.testing.assert_allclose(
        stream.corrected_tdoa_samples,
        batch.corrected_tdoa_samples,
        atol=0.05,
    )
    np.testing.assert_allclose(
        stream.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=0.5
    )
    assert _fix_error_m(stream.fix, scene.tgt_tx_lla) < 150.0
    # The σ ladder must be live (split slots populated by the chunks).
    assert stream.tdoa_std_s is not None
    assert np.all(np.asarray(stream.tdoa_std_s) > 0)


def test_ingest_unsupported_options_raise(omaha_stations, station_csv,
                                          tmp_path):
    scene = _scene(omaha_stations, seed=5)
    paths, _ = write_scene_captures(scene, str(tmp_path))
    dat = [paths[n] for n in scene.station_names]
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=1 << 14, max_lag=512, solve_velocity=True,
    )
    with pytest.raises(ValueError, match="overlapped ingest"):
        proc.process_files_overlapped(dat)


def test_tail_ingest_matches_batch(omaha_stations, station_csv, tmp_path):
    """TailIngest (the stream service's growing-file path) vs the batch
    processor on the same bytes: the session streams chunks as the
    'writer' appends, finalizes at close, and must reproduce the batch
    TDOAs — with nearly all chunks dispatched BEFORE the last byte (the
    freshness property: only the final chunk + finalize + solve remain
    at window close, instead of the whole transfer+compute)."""
    import time

    from tdoa_tpu.io.datfile import iq_bytes_as_u16
    from tdoa_tpu.pipeline.processor import HostCapture

    scene = _scene(
        omaha_stations,
        clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),
        seed=11,
    )
    paths, truth = write_scene_captures(scene, str(tmp_path))
    dat = [paths[n] for n in scene.station_names]
    kw = dict(seg_len=1 << 14, max_lag=512)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv, **kw
    )
    batch = proc.process_files(dat)

    snames = sorted(scene.station_names)
    full = {}
    for n in snames:
        raw = np.memmap(paths[n], dtype=np.uint8, mode="r")
        full[n] = iq_bytes_as_u16(raw[: (raw.size // 2) * 2])
    bl = full[snames[0]].shape[0] // 3
    total = full[snames[0]].shape[0]
    caps = {n: HostCapture(u16=full[n], block_len=bl) for n in snames}

    def grow_window(sess, steps=10):
        """'Writer' appends in 10 steps; feeds the first ``steps`` of
        them and returns chunks dispatched before the final step."""
        before = 0
        for k in range(1, steps + 1):
            avail = total * k // 10
            d = sess.feed([full[n][:avail] for n in snames])
            if k < 10:
                before += d
        return before

    # 4 chunks per block (12 total) so growth actually interleaves.
    sess = proc.tail_session(snames, bl, chunk_samples=bl // 4)
    assert sess.total_chunks >= 9
    before_close = grow_window(sess)
    # Freshness structure: all but the last chunk(s) streamed while the
    # capture was still being written.
    assert before_close >= sess.total_chunks - 2
    res = proc.process_captures(caps, tail=sess)

    # Freshness wall-clock, on WARM jits (the service processes window
    # after window; first-compile costs on the CPU backend would
    # otherwise swamp the number): the work remaining after the last
    # byte — final chunk + finalize + solve — is bounded by the
    # round-4 target (<2 s to the fix), with ~10x margin at this scene
    # size. At THIS tiny scale the warm batch path is solve-dominated
    # too, so batch-vs-tail wall clock is a coin flip — the freshness
    # win is the structural before_close assertion above plus the
    # transfer overlap bench.py measures on hardware.
    sess2 = proc.tail_session(snames, bl, chunk_samples=bl // 4)
    grow_window(sess2, steps=9)  # capture still 1/10 short
    t0 = time.time()  # ...last byte lands now:
    proc.process_captures(caps, tail=sess2)  # drains + finalizes
    t_fresh = time.time() - t0
    assert t_fresh < 2.0

    # Pair bases differ only by station order; map via names.
    def tdoa_map(names, tdoas):
        from tdoa_tpu.solve.multilateration import station_pairs

        prs = station_pairs(len(names))
        return {
            frozenset((names[i], names[j])): (names[i], names[j], t)
            for (i, j), t in zip(np.asarray(prs), tdoas)
        }

    got = tdoa_map(snames, np.asarray(res.corrected_tdoa_samples))
    want = tdoa_map(batch.station_names,
                    np.asarray(batch.corrected_tdoa_samples))
    assert set(got) == set(want)
    for key in got:
        gi, gj, gt = got[key]
        wi, wj, wt = want[key]
        if (gi, gj) != (wi, wj):
            wt = -wt
        np.testing.assert_allclose(gt, wt, atol=0.05)
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 150.0
    # σ ladder live (split slots populated by the streamed chunks).
    assert res.tdoa_std_s is not None
    assert np.all(np.asarray(res.tdoa_std_s) > 0)


def test_tail_ingest_size_mismatch_rejected(omaha_stations, station_csv,
                                            tmp_path):
    """A finished file whose block length disagrees with the session's
    assumption means every block-1/2 chunk mixed two blocks — the
    finalize must refuse (the service then falls back to the batch
    path) rather than emit a silently wrong fix."""
    from tdoa_tpu.io.datfile import iq_bytes_as_u16
    from tdoa_tpu.pipeline.processor import HostCapture

    scene = _scene(omaha_stations, seed=5)
    paths, _ = write_scene_captures(scene, str(tmp_path))
    snames = sorted(scene.station_names)
    full = {}
    for n in snames:
        raw = np.memmap(paths[n], dtype=np.uint8, mode="r")
        full[n] = iq_bytes_as_u16(raw[: (raw.size // 2) * 2])
    bl = full[snames[0]].shape[0] // 3
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=1 << 14, max_lag=512,
    )
    # Session assumes a LONGER capture than the files actually are.
    sess = proc.tail_session(snames, bl + 4096)
    sess.feed([full[n] for n in snames])
    caps = {n: HostCapture(u16=full[n], block_len=bl) for n in snames}
    with pytest.raises(ValueError, match="mismatch"):
        proc.process_captures(caps, tail=sess)
    assert sess.mismatch is not None


def test_stream_processor_watch_tail_ingest(omaha_stations, station_csv,
                                            tmp_path, capsys):
    """End-to-end service test: collectors 'write' the window's .dat
    files incrementally while the --watch --overlap-ingest service
    polls; the service must stream chunks BEFORE the files close
    (tail-ingest progress on stderr) and emit the fix after."""
    import shutil
    import threading
    import time

    from tdoa_tpu.cli.stream_processor import main

    scene = _scene(omaha_stations, seed=23)
    stage_dir = tmp_path / "stage"
    stage_dir.mkdir()
    watch_dir = tmp_path / "watch"
    watch_dir.mkdir()
    paths, _ = write_scene_captures(scene, str(stage_dir))
    epoch = 1700000000
    duration_s = 3 * scene.block_len / scene.sample_rate

    def writer():
        """Append each station's bytes in 8 slices, round-robin (all
        stations grow together, like real collectors)."""
        srcs = {
            n: np.fromfile(paths[n], dtype=np.uint8)
            for n in scene.station_names
        }
        outs = {
            n: watch_dir / f"{n}-{epoch}.dat" for n in scene.station_names
        }
        nbytes = len(next(iter(srcs.values())))
        edges = [nbytes * k // 8 for k in range(9)]
        for a, b in zip(edges, edges[1:]):
            for n in scene.station_names:
                with open(outs[n], "ab") as fh:
                    fh.write(srcs[n][a:b].tobytes())
            time.sleep(0.2)

    t = threading.Thread(target=writer)
    t.start()
    try:
        rc = main([
            str(scene.ref_freq), str(scene.tgt_freq), station_csv,
            str(watch_dir),
            # settle 4x the writer's inter-slice gap so a mid-write
            # window never looks finished.
            "--watch", "0.1", "--settle", "0.8",
            "--overlap-ingest", str(duration_s),
            "--max-lag", "512", "--seg-len", str(1 << 14),
            # Tail-ingest progress counts as service activity, so the
            # idle clock only starts once the window is processed.
            "--idle-exit", "5",
        ])
    finally:
        t.join()
        shutil.rmtree(stage_dir, ignore_errors=True)
    out = capsys.readouterr()
    assert rc == 0
    assert "tail-ingest" in out.err  # chunks streamed during capture
    assert "fell back" not in out.err
    assert "fix" in out.out


def test_ingest_cli_flag(omaha_stations, station_csv, tmp_path, capsys):
    from tdoa_tpu.cli.processor import main

    scene = _scene(omaha_stations, seed=7)
    paths, _ = write_scene_captures(scene, str(tmp_path))
    rc = main([
        str(scene.ref_freq), str(scene.tgt_freq), station_csv,
        *[paths[n] for n in scene.station_names],
        "--overlap-ingest", "--max-lag", "512", "--seg-len", str(1 << 14),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Position fix:" in out
