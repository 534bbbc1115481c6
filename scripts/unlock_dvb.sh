#!/usr/bin/env bash
# Free RTL-SDR hardware from conflicting DVB kernel drivers, then probe
# a short capture — rtl_unlock_dvb.sh capability. Safe no-op on machines
# without the modules or without hardware.
set -uo pipefail

MODULES=(dvb_usb_rtl28xxu rtl2832_sdr rtl2832 rtl2830 dvb_usb_v2 dvb_core)

echo "== unlock DVB drivers =="
for m in "${MODULES[@]}"; do
    if lsmod 2>/dev/null | grep -q "^$m"; then
        echo "unloading $m"
        sudo modprobe -r "$m" 2>/dev/null || sudo rmmod "$m" 2>/dev/null \
            || echo "  could not unload $m (in use?)"
    fi
done

BLACKLIST=/etc/modprobe.d/blacklist-rtl-sdr.conf
if [ -w /etc/modprobe.d ] 2>/dev/null; then
    if [ ! -f "$BLACKLIST" ]; then
        printf 'blacklist %s\n' "${MODULES[@]}" | sudo tee "$BLACKLIST" >/dev/null
        echo "wrote $BLACKLIST"
    fi
fi

# Probe: 100-sample test capture through the capture tool (sim backend
# when no hardware backend is attached).
TOOL="$(dirname "$0")/../capture/build/sdr_capture"
if [ -x "$TOOL" ]; then
    TMP=$(mktemp)
    if "$TOOL" -f 100000000 -h 100100000 -1 20 -2 20 -n 100 "$TMP" 2>/dev/null; then
        echo "probe capture OK ($(stat -c%s "$TMP") bytes)"
    else
        echo "probe capture FAILED"
    fi
    rm -f "$TMP"
else
    echo "capture tool not built; run deploy.sh first"
fi
