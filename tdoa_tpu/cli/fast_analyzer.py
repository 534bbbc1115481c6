"""Fast analyzer CLI — fast_analyzer.go contract: machine-readable CSV
lines ``REF,snr,power,clip,ovl`` / ``TGT,...`` for calibration scripting:

    python -m tdoa_tpu.cli.fast_analyzer <file.dat>
"""

from __future__ import annotations

import argparse
import sys

from tdoa_tpu.cli import setup_platform


def main(argv=None) -> int:
    setup_platform()
    p = argparse.ArgumentParser(prog="fast_analyzer")
    p.add_argument("dat_file")
    p.add_argument("--nfft", type=int, default=8192,
                   help="FFT size (reference used 8192-pt)")
    p.add_argument("--max-samples", type=int, default=32768,
                   help="samples per block to analyze "
                        "(reference used 32768)")
    args = p.parse_args(argv)

    from tdoa_tpu.quality import analyze_capture
    from tdoa_tpu.quality.analyzer import fast_csv_line

    a = analyze_capture(
        args.dat_file, nfft=args.nfft, max_samples_per_block=args.max_samples
    )
    print(fast_csv_line(a))
    return 0


if __name__ == "__main__":
    sys.exit(main())
