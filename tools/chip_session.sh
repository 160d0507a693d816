#!/bin/bash
# Opportunistic on-chip session driver for a FLAKY axon tunnel.
#
# Probes the tunnel in a loop; whenever a window opens, runs the next
# not-yet-done step of the round-3 chip workload (on-chip verify +
# goldens, the 7-config baseline table, the trilinear A/B, bench.py).
# Each step gets a hard timeout and a .ok marker in out/chip/ so a
# tunnel drop mid-step just means that step retries on the next window
# — progress survives across windows and across invocations.
#
# One TPU process at a time (PERF.md: two processes sharing the chip
# serialize unpredictably) — do not run other TPU work while this loop
# is in a step.
set -u
cd "$(dirname "$0")/.."
LOG=out/chip
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
    for n in verify_chip verify_assert bl1 bl2 bl3 bl4 bl5 bl6 bl7 \
             tri3 tri5 toggle3 toggle5 bench; do
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
    # goldens are written on the first successful run (--update), then
    # subsequent runs compare (the .ok marker makes this one-shot here;
    # re-run verify_chip manually without --update to assert).
    step verify_chip 3000 python tools/verify_chip.py --update || continue
    # assert against the goldens just written (fast via the compile
    # cache): proves run-to-run determinism on the chip and exercises
    # the compare path end-to-end
    step verify_assert 1800 python tools/verify_chip.py || continue
    blfail=0
    for n in 1 2 3 4 5 6 7; do
        step "bl$n" 1800 python tools/bench_baselines.py --frames 16 \
            --only "$n" || { blfail=1; break; }
    done
    # a bl failure means the tunnel likely dropped: re-probe instead of
    # launching the remaining steps against a dead tunnel
    [ "$blfail" -eq 1 ] && continue
    step tri3 1200 python tools/bench_baselines.py --frames 16 --only 3 \
        --filter trilinear || continue
    step tri5 1800 python tools/bench_baselines.py --frames 16 --only 5 \
        --filter trilinear || continue
    # in-frame per-pass attribution for the two gated configs — tells
    # round 3/4 where the next ms actually are
    step toggle3 2400 python tools/bench_toggle.py --config 3 || continue
    step toggle5 3000 python tools/bench_toggle.py --config 5 || continue
    step bench 1800 python bench.py || continue
done
echo "chip session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
