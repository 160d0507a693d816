#!/bin/bash
# Round-5 phase-2 chip workload: the A/Bs that decide the round's
# shipping defaults (VERDICT r4 items 1, 5, 7).
#  - config-7 re-measure at the right-sized 5% SSR compaction cap
#  - config-2 tile-sampler A/B (attr2 says the record+tex chain is the
#    top config-2 item; the auto xla choice was priced in round 3
#    against the OLD sampler)
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

step_once() { # name timeout_s cmd... — one attempt, failure IS a result
    local name=$1 t=$2; shift 2
    [ -f "$LOG/$name.ok" ] && return 0
    echo "=== $name start $(date +%T) (single-attempt) ===" \
        | tee -a "$LOG/session.log"
    timeout "$t" "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    touch "$LOG/$name.ok"
    echo "=== $name rc=$rc $(date +%T) (recorded; no retry) ===" \
        | tee -a "$LOG/session.log"
    return 0
}

all_done() {
    for n in bl7b bl3u32 bl2tile bl3px bl5px bl5u32 geom3a geom3b geom3c \
             geom3d geom3e bl3tri complat3 clouds_iso; do
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
    # config-7 at the 5% SSR cap (item 5 gate <= 90 ms)
    step bl7b 1800 python tools/bench_baselines.py --frames 16 \
        --only 7 || continue
    # u32-packed shading-record stream A/B (item 2: records 15.6 ms at
    # config 5; same bf16 bits, half the gathered elements)
    step bl3u32 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --rec-pack u32 || continue
    # config-2 tile sampler A/B (item 7)
    step bl2tile 1800 python tools/bench_baselines.py --frames 16 \
        --only 2 --tex-impl pallas || continue
    # px-fallback A/B (compare vs bl123/bl45 tile-mode rows)
    step bl3px 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-px-fallback || continue
    step bl5px 2400 python tools/bench_baselines.py --frames 16 \
        --only 5 --tex-px-fallback || continue
    step bl5u32 2400 python tools/bench_baselines.py --frames 16 \
        --only 5 --rec-pack u32 || continue
    # planner geometry: dirty is now <0.7% (exact bf16 stream) and the
    # fallback tax is cap-proportional — SMALLER planner geometry may
    # win outright: fewer candidates/slots cut planner+DMA cost, extra
    # dirty pixels ride the right-sized fallback.
    step geom3d 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 4,6,8 || continue
    step geom3e 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 6,4,8 || continue
    step geom3a 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 8,6,8 || continue
    step geom3b 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 6,8,8 || continue
    step geom3c 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --tex-geom 8,8,8 || continue
    # trilinear re-price at current defaults
    step bl3tri 1800 python tools/bench_baselines.py --frames 16 \
        --only 3 --filter trilinear || continue
    # third compile-latency experiment (VERDICT r4 item 9): drop the
    # backend optimization level — the compile column is the result;
    # single-attempt: a rejected option name is itself the negative
    # result, and must not crash-loop the queue
    step_once complat3 2400 python tools/bench_baselines.py --frames 8 \
        --only 5 --compiler-opt xla_backend_optimization_level=1
    # LAST (crash containment): the per-pixel clouds price tag,
    # ISOLATED — the in-frame config-5 perpixel run kernel-faults the
    # worker (out/r5/clouds5.log); single-attempt for the same reason.
    step_once clouds_iso 2400 python tools/bench_clouds.py
done
echo "chip r5b session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
