#!/bin/bash
# Round-5 phase-2 chip workload: texture-wall A/Bs that decide the
# round's shipping defaults (VERDICT r4 item 1).
#  - px-fallback vs tile-discard dirty handling at configs 3 and 5
#  - planner geometry sweep (k_top / nblk) at config 3
#  - trilinear re-price after the bf16-record + fallback work (the
#    +26% round-3 premium was measured against the old sampler)
# Run AFTER chip_session_r5a.sh completes (one TPU client at a time).
set -u
cd "$(dirname "$0")/.."
LOG=out/r5
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
    for n in bl3px bl5px geom3a geom3b geom3c geom3d geom3e bl3tri; do
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
    # px-fallback A/B (compare vs bl123/bl45 tile-mode rows)
    step bl3px 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-px-fallback || continue
    step bl5px 2400 python tools/bench_baselines.py --frames 16 \
        --only 5 --tex-px-fallback || continue
    # planner geometry: deeper candidate list / more slots (dirty-rate
    # levers; chip dirty 11.8-15% vs study ~0.4% — measure, don't model)
    step geom3a 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 8,6,8 || continue
    step geom3b 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 6,8,8 || continue
    step geom3c 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 8,8,8 || continue
    # dirty is now <0.7% (exact bf16 stream) and the fallback tax is
    # cap-proportional — SMALLER planner geometry may win outright:
    # fewer candidates/slots cut planner+DMA cost, extra dirty pixels
    # ride the right-sized fallback.
    step geom3d 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 4,6,8 || continue
    step geom3e 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 6,4,8 || continue
    # trilinear re-price at current defaults
    step bl3tri 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --filter trilinear || continue
done
echo "chip r5b session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
