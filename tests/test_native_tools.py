"""Native-layer integration tests: build (if needed) and drive each C++
tool as a subprocess — the whole capture stack without hardware."""

import os
import shutil
import socket
import struct
import subprocess
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "capture", "build")


def _ensure_built():
    if os.path.exists(os.path.join(BUILD, "sdr_capture")):
        return True
    if shutil.which("cmake") is None:
        return False
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    try:
        subprocess.check_call(
            ["cmake", "-S", os.path.join(REPO, "capture"), "-B", BUILD, *gen],
            stdout=subprocess.DEVNULL,
        )
        subprocess.check_call(
            ["cmake", "--build", BUILD, "--parallel"], stdout=subprocess.DEVNULL
        )
        return True
    except subprocess.CalledProcessError:
        return False


pytestmark = pytest.mark.skipif(
    not _ensure_built(), reason="native toolchain unavailable"
)


def tool(name):
    return os.path.join(BUILD, name)


def test_engine_unit_tests():
    out = subprocess.check_output([tool("engine_test")], text=True)
    assert "ALL NATIVE TESTS PASS" in out


def test_usb_protocol_stack():
    """RTL2832U driver + R82xx tuner + ordered async engine against the
    register-level mock transport (capture/tests/usb_test.cc)."""
    out = subprocess.check_output([tool("usb_test")], text=True)
    assert "ALL USB TESTS PASSED" in out


def test_capture_produces_valid_dat(tmp_path):
    path = str(tmp_path / "cap.dat")
    subprocess.check_call(
        [tool("sdr_capture"), "-f", "162400000", "-h", "101900000",
         "-1", "30", "-2", "20", "-n", "100000", path],
        stderr=subprocess.DEVNULL,
    )
    raw = np.fromfile(path, np.uint8)
    assert len(raw) == 600000
    # Gain drop on the middle block must be visible in the bytes.
    blocks = raw.reshape(3, -1).astype(np.float64)
    power = ((blocks - 127.5) / 127.5) ** 2
    p = power.mean(axis=1)
    assert p[1] < p[0] * 0.7
    assert abs(p[0] - p[2]) / p[0] < 0.5


def test_capture_replay_backend(tmp_path):
    src = tmp_path / "src.iq"
    rng = np.random.default_rng(0)
    src.write_bytes(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())
    out = str(tmp_path / "cap.dat")
    subprocess.check_call(
        [tool("sdr_capture"), "--replay", str(src), "-f", "1000000",
         "-h", "2000000", "-1", "10", "-2", "10", "-n", "5000", out],
        stderr=subprocess.DEVNULL,
    )
    assert os.path.getsize(out) == 30000


def test_capture_requires_both_gains(tmp_path):
    r = subprocess.run(
        [tool("sdr_capture"), "-f", "1", "-h", "2", "-n", "10",
         str(tmp_path / "x.dat")],
        capture_output=True,
    )
    assert r.returncode == 2


def test_server_protocol():
    port = 18765
    srv = subprocess.Popen(
        [tool("sdr_server"), "-p", str(port), "--once"],
        stderr=subprocess.DEVNULL,
    )
    try:
        for _ in range(50):
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=1)
                break
            except OSError:
                time.sleep(0.1)
        else:
            pytest.fail("server did not come up")
        hdr = s.recv(12)
        assert hdr[:4] == b"RTL0"
        s.sendall(struct.pack(">BI", 0x01, 162400000))
        s.sendall(struct.pack(">BI", 0x04, 280))
        data = b""
        while len(data) < 32768:
            chunk = s.recv(65536)
            assert chunk
            data += chunk
        s.close()
    finally:
        srv.wait(timeout=10)


def test_power_scan_csv(tmp_path):
    out = str(tmp_path / "scan.csv")
    subprocess.check_call(
        [tool("sdr_power"), "-f", "100000000:104000000:10000",
         "-n", "8192", out],
        stderr=subprocess.DEVNULL,
    )
    lines = open(out).read().strip().splitlines()
    assert len(lines) >= 2  # ≥ 2 tunings to cover 4 MHz at 2.048 Msps
    fields = lines[0].split(", ")
    assert float(fields[2]) == 100000000.0  # hz_low
    assert all(float(v) < 0 for v in fields[6:10])  # dB values


def test_fm_demod_file_mode(tmp_path):
    # Synthesize an NBFM tone capture and demodulate it.
    n = 200000
    t = np.arange(n) / 2e6
    audio = np.sin(2 * np.pi * 1e3 * t)
    phase = 2 * np.pi * 25e3 / 2e6 * np.cumsum(audio)
    iq = 0.8 * np.exp(1j * phase)
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(iq.real * 127.5 + 127.5, 0, 255).astype(np.uint8)
    raw[1::2] = np.clip(iq.imag * 127.5 + 127.5, 0, 255).astype(np.uint8)
    src = tmp_path / "tone.iq"
    src.write_bytes(raw.tobytes())
    out = str(tmp_path / "audio.raw")
    subprocess.check_call(
        [tool("sdr_fm"), "-i", str(src), "-s", "2000000", "-r", "125000",
         "-d", "0", out],
        stderr=subprocess.DEVNULL,
    )
    audio_out = np.frombuffer(open(out, "rb").read(), np.int16).astype(np.float64)
    # The 1 kHz tone must dominate the demodulated spectrum.
    spec = np.abs(np.fft.rfft(audio_out[500:-500]))
    f = np.fft.rfftfreq(len(audio_out) - 1000, 1 / 125000)
    peak_f = f[np.argmax(spec[1:]) + 1]
    assert abs(peak_f - 1000) < 50


def test_adsb_selftest():
    out = subprocess.check_output([tool("sdr_adsb"), "--selftest"], text=True)
    assert "SELFTEST PASS" in out


def test_eeprom_roundtrip(tmp_path):
    img = str(tmp_path / "ee.bin")
    subprocess.check_call([tool("sdr_eeprom"), "-I", img, "-g"],
                          stdout=subprocess.DEVNULL)
    subprocess.check_call(
        [tool("sdr_eeprom"), "-I", img, "-S", "TDOA0042"],
        stdout=subprocess.DEVNULL,
    )
    out = subprocess.check_output([tool("sdr_eeprom"), "-I", img], text=True)
    assert "TDOA0042" in out
    assert "0x0bda" in out


def test_sdr_test_reports_rate():
    out = subprocess.check_output([tool("sdr_test"), "-t", "1"], text=True)
    assert "in-order callbacks" in out
    assert "transfer errors: 0" in out


def test_capture_over_tcp(tmp_path):
    """Full 2-frequency capture through the rtl_tcp protocol: sdr_server
    (sim device) on one end, sdr_capture --tcp on the other — retunes and
    the 3x n byte contract cross the wire."""
    port = 43219
    srv = subprocess.Popen(
        [tool("sdr_server"), "-p", str(port), "--once"],
        stderr=subprocess.DEVNULL,
    )
    try:
        for _ in range(50):
            try:
                socket.create_connection(("127.0.0.1", port), timeout=1).close()
                break
            except OSError:
                time.sleep(0.1)
        else:
            pytest.fail("server did not come up")
        # The probe connection consumed the --once slot; restart.
        srv.wait(timeout=10)
        srv = subprocess.Popen(
            [tool("sdr_server"), "-p", str(port), "--once"],
            stderr=subprocess.DEVNULL,
        )
        time.sleep(0.3)
        out = tmp_path / "tcp.dat"
        n = 50_000
        subprocess.check_call(
            [tool("sdr_capture"), "-f", "162400000", "-h", "101900000",
             "-1", "30", "-2", "10", "-n", str(n), "--tcp",
             f"127.0.0.1:{port}", str(out)],
            stderr=subprocess.DEVNULL,
        )
        raw = np.fromfile(out, dtype=np.uint8)
        assert raw.size == 3 * n * 2
        # Block 2 captured at much lower gain: visible power drop. TCP has
        # no sample-accurate retune (commands race in-flight samples, as
        # with real rtl_tcp), so judge each block by its second half where
        # the gain change has certainly settled.
        blocks = raw.reshape(3, -1).astype(np.float64)
        power = ((blocks - 127.5) / 127.5) ** 2
        p = power[:, power.shape[1] // 2:].mean(axis=1)
        assert p[1] < p[0] * 0.5
        assert p[2] > p[1]
    finally:
        srv.kill()
        srv.wait()


def test_am_demod_file_mode(tmp_path):
    # Synthesize an AM tone capture and demodulate the envelope.
    n = 200000
    t = np.arange(n) / 2e6
    audio = np.sin(2 * np.pi * 1e3 * t)
    iq = (1.0 + 0.5 * audio) * 0.4 * np.exp(2j * np.pi * 10e3 * t)
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(iq.real * 127.5 + 127.5, 0, 255).astype(np.uint8)
    raw[1::2] = np.clip(iq.imag * 127.5 + 127.5, 0, 255).astype(np.uint8)
    src = tmp_path / "am.iq"
    src.write_bytes(raw.tobytes())
    out = str(tmp_path / "audio.raw")
    subprocess.check_call(
        [tool("sdr_fm"), "-M", "am", "-i", str(src), "-s", "2000000",
         "-r", "125000", out],
        stderr=subprocess.DEVNULL,
    )
    audio_out = np.frombuffer(open(out, "rb").read(), np.int16).astype(np.float64)
    spec = np.abs(np.fft.rfft(audio_out[500:-500]))
    f = np.fft.rfftfreq(len(audio_out) - 1000, 1 / 125000)
    peak_f = f[np.argmax(spec[1:]) + 1]
    assert abs(peak_f - 1000) < 50


def test_ssb_demod_file_mode(tmp_path):
    # A +5 kHz complex tone: strong in USB output, nulled in LSB.
    n = 200000
    t = np.arange(n) / 2e6
    iq = 0.6 * np.exp(2j * np.pi * 5e3 * t)
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(iq.real * 127.5 + 127.5, 0, 255).astype(np.uint8)
    raw[1::2] = np.clip(iq.imag * 127.5 + 127.5, 0, 255).astype(np.uint8)
    src = tmp_path / "ssb.iq"
    src.write_bytes(raw.tobytes())

    def rms(mode):
        out = str(tmp_path / f"{mode}.raw")
        subprocess.check_call(
            [tool("sdr_fm"), "-M", mode, "-i", str(src), "-s", "2000000",
             "-r", "125000", out],
            stderr=subprocess.DEVNULL,
        )
        a = np.frombuffer(open(out, "rb").read(), np.int16).astype(np.float64)
        return np.sqrt(np.mean(a[500:-500] ** 2))

    assert rms("usb") > 10 * rms("lsb")


def test_capture_sync_mode(tmp_path):
    """-S forces the blocking-read path (rtl_sdr.c:295-321 fallback):
    same 3x n contract, sample-accurate retunes by construction."""
    path = str(tmp_path / "sync.dat")
    subprocess.check_call(
        [tool("sdr_capture"), "-S", "-f", "162400000", "-h", "101900000",
         "-1", "30", "-2", "10", "-n", "100000", path],
        stderr=subprocess.DEVNULL,
    )
    raw = np.fromfile(path, np.uint8)
    assert len(raw) == 600000
    blocks = raw.reshape(3, -1).astype(np.float64)
    power = ((blocks - 127.5) / 127.5) ** 2
    p = power.mean(axis=1)
    assert p[1] < p[0] * 0.5  # low-gain middle block, no slop in sync mode
    assert p[2] > p[1]


def test_capture_stdout(tmp_path):
    out = subprocess.run(
        [tool("sdr_capture"), "-f", "162400000", "-h", "101900000",
         "-1", "30", "-2", "30", "-n", "5000", "-"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, check=True,
    ).stdout
    assert len(out) == 30000


def test_capture_ppm_shifts_sim_tone(tmp_path):
    """The sim device models crystal error: -p moves the baseband tone
    by fc*ppm/1e6, so ppm correction is observable like on hardware."""
    def tone_hz(ppm_args):
        path = str(tmp_path / "ppm.dat")
        subprocess.check_call(
            [tool("sdr_capture"), *ppm_args, "-f", "100000000",
             "-h", "100000000", "-1", "30", "-2", "30", "-n", "65536", path],
            stderr=subprocess.DEVNULL,
        )
        raw = np.fromfile(path, np.uint8)[: 2 * 65536].astype(np.float64)
        iq = (raw[0::2] - 127.5) / 127.5 + 1j * (raw[1::2] - 127.5) / 127.5
        spec = np.abs(np.fft.fft(iq))
        f = np.fft.fftfreq(len(iq), 1 / 2e6)
        return f[np.argmax(spec)]

    base = tone_hz([])
    shifted = tone_hz(["-p", "50"])  # 100 MHz * 50 ppm = 5 kHz shift
    assert abs((base - shifted) - 5000) < 100


def test_fm_squelch_scan_settles_on_station(tmp_path):
    """Multi-frequency scanning (rtl_fm.c:186-189): squelch-closed
    frequencies are hopped past; the scanner settles where the simulated
    station actually transmits."""
    out = str(tmp_path / "scan.raw")
    env = dict(os.environ, SDRCAP_SIM_STATIONS="100.1M")
    res = subprocess.run(
        [tool("sdr_fm"), "-s", "2M", "-r", "50k", "-l", "8", "-t", "3",
         "--live", "0.5", "-f", "99M", "-f", "100.1M", "-f", "101M",
         "--sim-seed", "7", out],
        env=env, capture_output=True, text=True, check=True,
    )
    assert "final frequency 100100000 Hz" in res.stderr
    # Settled audio must be unmuted (non-zero s16 samples present).
    audio = np.fromfile(out, np.int16)
    assert np.abs(audio[len(audio) // 2:]).max() > 0


def test_fm_squelch_negative_delay_exits(tmp_path):
    """-t with a negative value exits once the squelch has been closed
    that many consecutive blocks (rtl_fm.c:1087-1093)."""
    out = str(tmp_path / "sq.raw")
    env = dict(os.environ, SDRCAP_SIM_STATIONS="200M")  # nothing at 100M
    subprocess.run(
        [tool("sdr_fm"), "-s", "2M", "-r", "50k", "-l", "50", "-t", "-5",
         "--live", "5", "-f", "100M", out],
        env=env, capture_output=True, text=True, check=True, timeout=60,
    )
    audio = np.fromfile(out, np.int16)
    # 5 squelched 16384-byte blocks at decim 40 = 1024 muted samples,
    # far short of the 5 s (250k samples) the stream would have run.
    assert len(audio) == 1024
    assert np.all(audio == 0)


def test_fm_wbfm_preset(tmp_path):
    """-M wbfm expands to -s 170k -r 32k with de-emphasis
    (rtl_fm.c:1130-1137)."""
    iq = (np.random.default_rng(5).integers(100, 156, 170_000 * 2)
          .astype(np.uint8))
    src = tmp_path / "in.iq"
    iq.tofile(src)
    out = str(tmp_path / "wbfm.raw")
    res = subprocess.run(
        [tool("sdr_fm"), "-M", "wbfm", "-i", str(src), out],
        capture_output=True, text=True, check=True,
    )
    assert "at 32143 Hz" in res.stderr or "at 34000 Hz" in res.stderr
    assert os.path.getsize(out) > 0


def test_fm_freq_range_spec(tmp_path):
    """-f low:high:step expands to a scan list (rtl_fm ranges)."""
    out = str(tmp_path / "r.raw")
    env = dict(os.environ, SDRCAP_SIM_STATIONS="100.2M")
    # Narrow front-end rate (250k) so only the 100.2M tuning has the
    # station in its passband (the sim passband is ±0.45·fs).
    res = subprocess.run(
        [tool("sdr_fm"), "-s", "250k", "-r", "50k", "-l", "8", "-t", "2",
         "--live", "3", "-f", "100M:100.4M:200k", "--sim-seed", "11", out],
        env=env, capture_output=True, text=True, check=True,
    )
    assert "final frequency 100200000 Hz" in res.stderr


def test_power_window_crop_peakhold(tmp_path):
    """sdr_power parity options: -w window menu, -c crop scheduling,
    -P peak hold, -i integration (rtl_power.c:121-167)."""
    base = str(tmp_path / "b.csv")
    subprocess.check_call(
        [tool("sdr_power"), "-f", "88M:108M:125k", "-1", base])
    crop = str(tmp_path / "c.csv")
    subprocess.check_call(
        [tool("sdr_power"), "-f", "88M:108M:125k", "-c", "20%", "-w",
         "blackman-harris", "-1", crop])
    b_lines = open(base).read().strip().splitlines()
    c_lines = open(crop).read().strip().splitlines()
    # Cropping narrows each tuning's kept band -> more tunings, fewer
    # bins per line; coverage stays contiguous (next low <= prev high).
    assert len(c_lines) > len(b_lines)
    assert len(c_lines[0].split(", ")) < len(b_lines[0].split(", "))
    prev_high = None
    for ln in c_lines:
        f = ln.split(", ")
        lo, hi = float(f[2]), float(f[3])
        if prev_high is not None:
            assert lo <= prev_high + 1.0
        prev_high = hi
    assert float(c_lines[0].split(", ")[2]) <= 88e6

    peak = str(tmp_path / "p.csv")
    subprocess.check_call(
        [tool("sdr_power"), "-f", "88M:90M:125k", "-P", "-i", "2", "-1",
         peak])
    avg = str(tmp_path / "a.csv")
    subprocess.check_call(
        [tool("sdr_power"), "-f", "88M:90M:125k", "-i", "2", "-1", avg])
    p_db = [float(x) for x in open(peak).read().split(", ")[6:]]
    a_db = [float(x) for x in open(avg).read().split(", ")[6:]]
    assert len(p_db) == len(a_db)
    # Peak hold over the same integration is >= the average everywhere.
    assert all(p >= a - 0.01 for p, a in zip(p_db, a_db))


def test_power_unknown_window_rejected():
    res = subprocess.run(
        [tool("sdr_power"), "-f", "88M:90M:125k", "-w", "bogus"],
        capture_output=True, text=True)
    assert res.returncode == 2
    assert "unknown window" in res.stderr


def test_power_integration_scales_without_n(tmp_path):
    """-i alone sets integration depth; the samples column must scale
    with the interval (regression: it was silently capped at 16384)."""
    a = str(tmp_path / "i2.csv")
    b = str(tmp_path / "i8.csv")
    subprocess.check_call([tool("sdr_power"), "-f", "88M:90M:125k",
                           "-i", "2", "-1", a])
    subprocess.check_call([tool("sdr_power"), "-f", "88M:90M:125k",
                           "-i", "8", "-1", b])
    sa = int(open(a).read().split(", ")[5])
    sb = int(open(b).read().split(", ")[5])
    assert sb == 4 * sa


def test_trailing_value_flags_error_cleanly():
    """A flag missing its value must exit 2 with a message, not abort
    (regression: std::string from NULL aborted with SIGABRT)."""
    for cmd in ([tool("sdr_fm"), "out.raw", "-E"],
                [tool("sdr_fm"), "out.raw", "-f"],
                [tool("sdr_power"), "-f", "88M:90M:1M", "-w"]):
        res = subprocess.run(cmd, capture_output=True, text=True)
        assert res.returncode == 2, cmd


def test_power_single_bin_window_not_nan(tmp_path):
    """bin >= rate gives a 1-point FFT; windows must degenerate to 1.0,
    not divide by zero (regression: every dB column was -nan)."""
    out = subprocess.check_output(
        [tool("sdr_power"), "-f", "88M:108M:3M", "-w", "hann", "-1"],
        text=True)
    assert "nan" not in out
    db = float(out.strip().splitlines()[0].split(", ")[6])
    assert -60 < db < 20
