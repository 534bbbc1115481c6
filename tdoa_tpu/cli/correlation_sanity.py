"""Pipeline-level correlation sanity CLI — correlation_sanity.go contract:
correlate a real ``.dat`` capture's REF signal with itself through the
*actual* processing pipeline and expect ≈1.0 at delay 0
(correlation_sanity.go:44-64):

    python -m tdoa_tpu.cli.correlation_sanity <file.dat>
"""

from __future__ import annotations

import argparse
import sys

from tdoa_tpu.cli import setup_platform


def main(argv=None) -> int:
    setup_platform()
    p = argparse.ArgumentParser(prog="correlation_sanity")
    p.add_argument("dat_file")
    p.add_argument("--max-samples", type=int, default=1 << 20)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from tdoa_tpu.io import load_dat
    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.ops.corr import correlate_pairs_planar

    cap = load_dat(args.dat_file)
    print(f"Loaded {args.dat_file}: {cap.block_len:,} samples/block")
    ref = cap.ref1
    n = min(args.max_samples, int(ref.re.shape[0]))
    x = C(
        jnp.stack([ref.re[:n], ref.re[:n]]),
        jnp.stack([ref.im[:n], ref.im[:n]]),
    )
    res = correlate_pairs_planar(
        x, jnp.asarray([[0, 1]], jnp.int32), max_lag=1024, weighting="none"
    )
    peak = float(res.peak_value[0])
    delay = float(res.delay[0])
    print(f"Self-correlation peak {peak:.6f} at delay {delay:+.4f} samples")
    ok = abs(peak - 1.0) < 1e-3 and abs(delay) < 0.01
    print("PASS" if ok else "FAIL (pipeline is corrupting the signal)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
