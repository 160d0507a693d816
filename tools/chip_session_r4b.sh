#!/bin/bash
# Round-4 phase-2 chip workload: re-bench after the round-4 kernel wins
# (empty-bin skip, chunk-outer depth resolve, ESM crop, texsample
# NBLK=6/TPS=8, vis barrier), plus SSAO window sweep and compile-opt
# experiment.  Same step/marker pattern as chip_session_r4.sh.
set -u
cd "$(dirname "$0")/.."
LOG=out/r4
mkdir -p "$LOG"

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
    for n in shadowab2 mainab bl6b bl123b bl45b texfields5 texparts5 \
             ssaosweep copt3; do
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
    # shadow raster A/B post empty-bin + chunk-outer double-buffer
    step shadowab2 3000 python tools/bench_shadow.py || continue
    # MAIN-view grid A/B at config-5 scale (resolve is ~15-20 ms there)
    step mainab 3000 python tools/bench_shadow.py --view main \
        --scene full --width 1920 --height 1088 || continue
    # config 6 end-to-end with depth-only + empty-bin + ESM crop
    step bl6b 1800 python tools/bench_baselines.py --frames 16 --only 6 \
        || continue
    # quick re-bench of the cheap configs with the round-4 wins
    step bl123b 2400 bash -c "
        python tools/bench_baselines.py --frames 16 --only 1 &&
        python tools/bench_baselines.py --frames 16 --only 2 &&
        python tools/bench_baselines.py --frames 16 --only 3" || continue
    step bl45b 3000 bash -c "
        python tools/bench_baselines.py --frames 16 --only 4 &&
        python tools/bench_baselines.py --frames 16 --only 5" || continue
    # chip-captured config-5 fields + planner study (size c5 caps)
    step texfields5 1200 python tools/capture_texfields.py --scene full \
        --width 1920 --height 1088 --out /tmp/texfields_full1088.npz \
        || continue
    step texparts5 2400 python tools/bench_texsample.py --scene full \
        --width 1920 --height 1088 --fields /tmp/texfields_full1088.npz \
        || continue
    # record-gather layout A/B (19.2 ms in-frame at config 5)
    step recab 2400 python tools/bench_records.py || continue
    # SSAO window sweep (time + clamp error vs the exact tail)
    step ssaosweep 2400 env WHICH=sweep python tools/bench_ssao.py \
        || continue
    # compile-latency experiment (VERDICT r3 item 8)
    step copt3 1800 python tools/bench_baselines.py --frames 16 --only 3 \
        --compiler-opt xla_tpu_enable_latency_hiding_scheduler=false \
        || continue
done
echo "chip r4b session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
