"""Hardware-conditional silicon validation: real-dongle smoke tests.

The USB/tuner stack is register-mock-proven in CI (usb_test); these
tests close the remaining gap on a host with an actual RTL2832U dongle
plugged in. They are marked ``hardware`` and SKIP (never fail) when no
dongle enumerates, so CI stays green without silicon and a
dongle-equipped operator validates the whole stack with one command:

    python -m pytest -m hardware tests/test_hardware.py -v

Mirrors the reference's end-to-end device behavior: open → tune → gain
→ stream → validate (librtlsdr-2freq/src/rtl_sdr.c:240-331), plus the
EEPROM read path (rtl_eeprom.c) and the sample-drop benchmark
(rtl_test.c). See docs/hardware.md ("Silicon validation") for the
operator checklist.
"""

import functools
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "capture", "build")

pytestmark = pytest.mark.hardware


def tool(name):
    return os.path.join(BUILD, name)


def _dongle_present() -> bool:
    """True when the native tools are built AND a known RTL2832U device
    enumerates on the bus (sdr_eeprom --usb opens it, reads the EEPROM,
    and exits 0 — a full open/claim round trip, not just enumeration,
    so a permissions problem also reads as 'no hardware' with the udev
    hint on stderr)."""
    exe = tool("sdr_eeprom")
    if not os.path.exists(exe):
        return False
    try:
        r = subprocess.run(
            [exe, "--usb"], capture_output=True, text=True, timeout=30
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    return r.returncode == 0


@functools.lru_cache(maxsize=None)
def _have_dongle() -> bool:
    return _dongle_present()


@pytest.fixture
def needs_dongle():
    """Skip unless a dongle enumerates. A fixture (not a collection-time
    skipif) so the USB probe — a real open/claim round trip that can
    stall up to 30 s and perturb a dongle another process is streaming
    from — only runs when a hardware test is actually selected, never
    during plain ``pytest tests/`` collection."""
    if not _have_dongle():
        pytest.skip("no RTL2832U dongle enumerates on this host")


def test_usb_open_tune_capture_validate(tmp_path, needs_dongle):
    """The reference's rtl_sdr end-to-end behavior on real silicon:
    open the dongle, program both frequencies and gains, stream one
    full [REF|TGT|REF] capture with zero sample loss, and validate the
    bytes through the quality reader (rtl_sdr.c:240-331 +
    collector.go:178-248 semantics)."""
    n = 200_000  # samples per frequency: ~0.1 s per block at 2 Msps
    path = str(tmp_path / "hw.dat")
    out = subprocess.run(
        [tool("sdr_capture"), "--usb", "-f", "162400000",
         "-h", "101900000", "-1", "30", "-2", "30", "-n", str(n), path],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    data = np.fromfile(path, np.uint8)
    assert data.size == 3 * 2 * n, (
        f"expected exactly 3x{2 * n} bytes (zero-loss retunes), got "
        f"{data.size}"
    )
    # Live air: the ADC must not be railed or dead (reader.go:151-173
    # semantics — DC near 127.5, nonzero dynamic range).
    assert 100.0 < float(data.mean()) < 155.0, "DC bias out of range"
    assert float(data.std()) > 0.5, "dead receiver (no signal variance)"
    # The structural validator must accept the file.
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        ["python", "-m", "tdoa_tpu.cli.reader", path],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_usb_tuner_retune_and_gain_ladder(needs_dongle):
    """Tune across VHF/UHF and sweep three gain rungs; every
    set_center_freq/set_tuner_gain must succeed on the real tuner
    (convenience.c verbose_set_frequency / verbose_gain_set parity)."""
    out = subprocess.run(
        [tool("sdr_test"), "--usb", "-t", "0.2"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr


def test_usb_sample_drop_benchmark(needs_dongle):
    """rtl_test -p on silicon: stream for a few seconds and require the
    reported sample-loss rate to stay under 1% (a healthy bus; the
    reference treats drops as the primary hardware failure signal,
    rtl_test.c)."""
    out = subprocess.run(
        [tool("sdr_test"), "--usb", "-p", "2", "-t", "4"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr


def test_usb_eeprom_read(needs_dongle):
    """EEPROM read on silicon (rtl_eeprom.c read path): must parse and
    print the configuration without error."""
    out = subprocess.run(
        [tool("sdr_eeprom"), "--usb"],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "Vendor ID" in out.stdout or "vendor" in out.stdout.lower()


def test_hardware_suite_is_discoverable():
    """Always runs (no dongle needed): the hardware suite itself must
    stay collectable and the skip machinery sound, so 'pytest -m
    hardware' remains the documented one-command silicon validation
    even on CI hosts without a dongle."""
    assert callable(_dongle_present)
