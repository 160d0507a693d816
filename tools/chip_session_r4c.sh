#!/bin/bash
# Round-4 phase-3 chip workload: goldens re-capture (16-frame exposure
# warm-up + provenance manifest, ADVICE r3), honest config-7 SSR, the
# final all-config re-bench at the round-4 defaults (64x32 main grid,
# resolution-sized dirty cap), the -hiz cost-analysis diff, and
# bench.py.
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
    for n in verify4 verify4_assert bl123c bl45c bl67c bench4 diaghiz; do
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
    # re-capture goldens: round-4 kernels (depth resolve, SSAO batch
    # matmul, 64x32 grid) shift fallback-tile pixels within bf16
    # rounding AND the capture now warms up 16 frames (ADVICE r3) — a
    # fresh chip-provenance manifest is written
    step verify4 4000 python tools/verify_chip.py --update || continue
    step verify4_assert 2400 python tools/verify_chip.py || continue
    # final round-4 numbers at the shipped defaults (single source of
    # truth for BASELINE.md); config 7 = honest SSR (probe-liveness
    # fix, VERDICT r3 item 2)
    step bl123c 1800 python tools/bench_baselines.py --frames 16 \
        --only 1,2,3 || continue
    step bl45c 1800 python tools/bench_baselines.py --frames 16 \
        --only 4,5 || continue
    step bl67c 1800 python tools/bench_baselines.py --frames 16 \
        --only 6,7 || continue
    step bench4 1800 python bench.py || continue
    # config-5 hiz-off anomaly: XLA cost/memory analysis diff
    step diaghiz 2400 python tools/diag_hiz.py --config 5 || continue
done
echo "chip r4c session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
