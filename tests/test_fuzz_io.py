"""Robustness fuzz: arbitrary bytes must never crash the validation and
analysis tools — they gate every real capture."""

import numpy as np

from tdoa_tpu.quality import analyze_capture, validate_dat_structure
from tdoa_tpu.io import load_dat


def test_random_files_never_crash(tmp_path):
    rng = np.random.default_rng(0)
    for i, size in enumerate([0, 1, 2, 5, 6, 100, 101, 6000, 65536]):
        path = str(tmp_path / f"fuzz{i}.dat")
        with open(path, "wb") as f:
            f.write(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
        rep = validate_dat_structure(path)
        assert rep.size_bytes == size
        if size >= 6 and size % 6 == 0:
            # Analyzable shapes must also run the deep analyzer + loader.
            analyze_capture(path, nfft=64)
            cap = load_dat(path)
            assert cap.block_len == size // 6


def test_extreme_bytes(tmp_path):
    for name, fill in (("zeros", 0), ("ones", 255), ("center", 127)):
        path = str(tmp_path / f"{name}.dat")
        with open(path, "wb") as f:
            f.write(bytes([fill]) * 6144)
        rep = validate_dat_structure(path)
        a = analyze_capture(path, nfft=256)
        if fill in (0, 255):
            assert a.ref.is_clipping
        else:
            assert a.ref.is_dead
