#!/bin/bash
# Tunnel-outage watcher for the round-5 endurance soak.
#
# Seg1 (PID in /tmp/endurance.pid's child) is blocked mid-step on a tunnel
# data-plane outage.  This loop probes the data plane with a bounded
# subprocess; on recovery it gives seg1 a grace window to finish (its
# deadline already passed, so it exits after <=1 window), kills it by exact
# PID if the stalled RPC never unblocks, then runs seg2: a resumed soak
# under --max-rss-gb so the checkpoint-recycle (exit 75) path executes on
# hardware.  All state under /tmp/endurance*, log /tmp/endurance_watch.log.
set -u
OUT=/tmp/endurance
SEG1_PID=901

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np
d = jax.device_put(np.ones(1 << 20, np.uint8))
d.block_until_ready()
_ = np.asarray(d[:4])
EOF
}

echo "$(date -u +%FT%TZ) watcher start; probing data plane" >> /tmp/endurance_watch.log
while ! probe; do
  echo "$(date -u +%FT%TZ) data plane still down" >> /tmp/endurance_watch.log
  sleep 180
done
echo "$(date -u +%FT%TZ) data plane RECOVERED" >> /tmp/endurance_watch.log

# grace: seg1 is past deadline; if the tunnel recovery unblocks its stalled
# transfer it finishes one window, checkpoints, writes summary, exits.
for i in $(seq 1 60); do
  kill -0 "$SEG1_PID" 2>/dev/null || break
  sleep 20
done
if kill -0 "$SEG1_PID" 2>/dev/null; then
  echo "$(date -u +%FT%TZ) seg1 still blocked 20min after recovery; kill -9 (crash-restore demo)" >> /tmp/endurance_watch.log
  kill -9 "$SEG1_PID"
  sleep 5
else
  echo "$(date -u +%FT%TZ) seg1 exited on its own" >> /tmp/endurance_watch.log
fi

# seg2+: resumed soak with RSS-bounded recycle; exit 75 => relaunch.
seg=2
while :; do
  echo "$(date -u +%FT%TZ) launching seg$seg" >> /tmp/endurance_watch.log
  python scripts/hw_endurance.py --hours 1.0 --max-rss-gb 30 --out "$OUT" \
    > "/tmp/endurance_seg${seg}.log" 2>&1
  rc=$?
  echo "$(date -u +%FT%TZ) seg$seg exited rc=$rc" >> /tmp/endurance_watch.log
  [ "$rc" -ne 75 ] && break
  seg=$((seg + 1))
done
echo "$(date -u +%FT%TZ) watcher done" >> /tmp/endurance_watch.log
