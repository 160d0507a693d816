#!/bin/bash
# Round-5 phase-2b chip workload: record-stream pack="f32" A/B.
# attr2 (out/r5/attr2.log) names the record gather the TOP config-2
# stage (stub_records +12.58 ms on a 16k-tri table = 2.6 MB f32,
# cache-resident) — at that size the bf16 hi/lo split only doubles
# gathered elements and adds rebuild math.  bl2f32/bl6f32 price the
# raw-f32 stream at the two small-table configs; bl3f32 sanity-checks
# that it does NOT win at the 168k-tri scale the bf16 economics were
# measured at.  Waits for the r5b queue (one TPU client at a time).
set -u
cd "$(dirname "$0")/.."
LOG=out/r5
mkdir -p "$LOG"

if [ -f /tmp/r5b.pid ]; then
    while kill -0 "$(cat /tmp/r5b.pid)" 2>/dev/null; do sleep 30; done
fi

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
jax.devices()
x = jnp.ones((128,128)) @ jnp.ones((128,128))
assert float(x[0,0]) == 128.0
" >/dev/null 2>&1
}

step() { # name timeout_s cmd...
    local name=$1 t=$2; shift 2
    [ -f "$LOG/$name.ok" ] && return 0
    echo "=== $name start $(date +%T) ===" | tee -a "$LOG/session.log"
    timeout "$t" "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
        touch "$LOG/$name.ok"
        echo "=== $name OK $(date +%T) ===" | tee -a "$LOG/session.log"
    else
        echo "=== $name rc=$rc $(date +%T) (retry next window) ===" \
            | tee -a "$LOG/session.log"
    fi
    return $rc
}

all_done() {
    for n in bl2f32 bl6f32 bl3f32; do
        [ -f "$LOG/$n.ok" ] || return 1
    done
    return 0
}

while ! all_done; do
    if ! probe; then
        echo "tunnel down $(date +%T)" >> "$LOG/session.log"
        sleep 180
        continue
    fi
    echo "tunnel UP $(date +%T)" | tee -a "$LOG/session.log"
    step bl2f32 1800 python tools/bench_baselines.py --frames 16 \
        --only 2 --rec-pack f32 || continue
    step bl6f32 1800 python tools/bench_baselines.py --frames 16 \
        --only 6 --rec-pack f32 || continue
    step bl3f32 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --rec-pack f32 || continue
done
echo "chip r5d session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
