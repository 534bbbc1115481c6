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
