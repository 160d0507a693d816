#!/bin/bash
# Round-4 on-chip workload: attribution + kernel A/Bs, one step at a
# time (one TPU process at a time — PERF.md), each with a hard timeout
# and an .ok marker so a tunnel drop retries the step next window.
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
    for n in render6 shadowab texfields3 texparts3 attr6 attr5; do
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
    # end-to-end drive of the NEW depth-only shadow kernel on the paid
    # path (helmet_lifted) before benching it
    step render6 900 python tools/render.py --scene helmet_lifted \
        --width 1280 --height 736 --frames 2 --out out/r4/render6.png \
        || continue
    # shadow bin-grid / depth-only A/B (VERDICT r3 item 3)
    step shadowab 3000 python tools/bench_shadow.py || continue
    # texsample part breakdown at the config-3 shape (the 18.3 ms wall)
    step texfields3 900 python tools/capture_texfields.py --scene sponza \
        --width 1280 --height 736 --out /tmp/texfields_sponza736.npz \
        || continue
    step texparts3 2400 python tools/bench_texsample.py --scene sponza \
        --width 1280 --height 736 --fields /tmp/texfields_sponza736.npz \
        || continue
    # config-6 whole-frame attribution (shadow resolve vs ESM)
    step attr6 2400 python tools/bench_toggle.py --config 6 \
        --toggles shadows,stub_shadow_resolve || continue
    # config-5 stage attribution (the ~80 ms residual)
    step attr5 7200 python tools/bench_toggle.py --config 5 --toggles \
        stub_raster,stub_resolve,stub_records,tex_none,unlit,hiz,no_visbar \
        || continue
done
echo "chip r4 session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
