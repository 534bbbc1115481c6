#!/usr/bin/env bash
# Station/workstation bootstrap — deploy.sh capability for the rebuild:
# verify the Python/JAX environment, build the native capture layer, and
# run end-to-end smoke checks (reference deploy.sh:40-226 did apt deps,
# librtlsdr build, go build, udev rules, and probe captures; hardware
# steps become the simulated-backend equivalents here).
set -euo pipefail

REPO="$(cd "$(dirname "$0")" && pwd)"
cd "$REPO"

echo "== tdoa-tpu deploy =="

echo "[1/5] Python environment"
python3 - <<'EOF'
import sys
assert sys.version_info >= (3, 10), "need python >= 3.10"
import jax, numpy
print(f"  python {sys.version.split()[0]}, jax {jax.__version__}, numpy {numpy.__version__}")
EOF

echo "[2/5] Native capture layer"
if command -v cmake >/dev/null && (command -v ninja >/dev/null || command -v make >/dev/null); then
    GEN=""
    command -v ninja >/dev/null && GEN="-G Ninja"
    cmake -S capture -B capture/build $GEN >/dev/null
    cmake --build capture/build --parallel >/dev/null
    echo "  built: $(ls capture/build/sdr_* | tr '\n' ' ')"
    echo "[2b] native engine + USB protocol tests"
    ./capture/build/engine_test
    SDRCAP_SKIP_LIBUSB_PROBE=1 ./capture/build/usb_test
else
    echo "  cmake/ninja not found — skipping native build (sim backends still work)"
fi

echo "[3/5] Capture-path probe (dual-frequency contract)"
if [ -x capture/build/sdr_capture ]; then
    TMP=$(mktemp -d)
    ./capture/build/sdr_capture -f 162400000 -h 101900000 -1 28 -2 28 \
        -n 100000 "$TMP/probe.dat" 2>/dev/null
    SIZE=$(stat -c%s "$TMP/probe.dat")
    [ "$SIZE" -eq 600000 ] || { echo "  FAIL: probe capture wrong size $SIZE"; exit 1; }
    PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" TDOA_TPU_PLATFORM=cpu python3 -m tdoa_tpu.cli.reader "$TMP/probe.dat" >/dev/null \
        && echo "  probe capture validates OK"
    rm -rf "$TMP"
fi

echo "[4/5] Algorithm sanity (simple_corr)"
PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" TDOA_TPU_PLATFORM=cpu python3 -m tdoa_tpu.cli.simple_corr --n 16384 | tail -1

echo "[5/5] Test suite (quick subset)"
PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" python3 -m pytest tests/test_io.py tests/test_geo.py -q --no-header | tail -1

# Optional station-hardware provisioning (reference deploy.sh:152-170):
# udev rules so RTL2832U dongles are usable without root, + the DVB
# kernel-module unlock. Run as `./deploy.sh --hw` on a collector host.
if [ "${1:-}" = "--hw" ]; then
    echo "[hw] udev rules for RTL2832U dongles"
    RULES=/etc/udev/rules.d/60-sdrcap-rtlsdr.rules
    if [ -w "$(dirname "$RULES")" ] || [ "$(id -u)" = 0 ]; then
        {
            echo '# RTL2832U SDR dongles — installed by tdoa-tpu deploy.sh'
            for ID in 0bda:2832 0bda:2838 0ccd:00b3 1f4d:b803; do
                VID=${ID%%:*}; PID=${ID##*:}
                echo "SUBSYSTEM==\"usb\", ATTRS{idVendor}==\"$VID\", ATTRS{idProduct}==\"$PID\", MODE=\"0666\", GROUP=\"plugdev\""
            done
        } > "$RULES"
        command -v udevadm >/dev/null && udevadm control --reload-rules || true
        echo "  installed $RULES"
    else
        echo "  need root to install udev rules (re-run with sudo)"
    fi
    [ -x scripts/unlock_dvb.sh ] && echo "[hw] run scripts/unlock_dvb.sh to free the dongle from DVB drivers"
    if [ -x capture/build/sdr_capture ]; then
        echo "[hw] probing for a directly-attached dongle"
        TMP=$(mktemp -d)
        if ./capture/build/sdr_capture --usb -f 162400000 -h 162500000 \
            -1 28 -2 28 -n 1000 "$TMP/usbprobe.dat" 2>&1 | tail -1; then
            echo "  USB capture OK"
        else
            echo "  no dongle found (collector still works via --tcp or sim)"
        fi
        rm -rf "$TMP"
    fi
fi

echo "== deploy complete =="
