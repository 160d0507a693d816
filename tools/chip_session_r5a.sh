#!/bin/bash
# Round-5 phase-1 chip workload (VERDICT r4 items 1-5, 7-9):
#  - smoke the new bf16 record stream + SSR-compact kernels early
#  - kernel-vs-oracle parity incl. the new bf16/SSR checks (no goldens
#    yet — defaults may still move this round)
#  - fresh baselines at the new defaults (bf16 records, 2*T pair cap,
#    compacted config-7 SSR)
#  - config-2 stub matrix (item 7), config-5 re-attribution (items 1-3)
#  - measured multi-chip band-resolve split (item 8)
#  - per-pixel clouds price tag (item 6)
#  - optimized-HLO dumps for the -hiz anomaly + in-frame texture
#    inflation (items 1, 4)
#  - isolated texture sampler parts (item 1 ratio denominator)
#  - compile-latency option sweep (item 9)
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
    for n in render1 bf16diag verify5_nogold bl123 bl45 bl67 attr2 attr5 \
             bandres clouds5 hlo5on hlo5off hlo3 hlo3tex texparts5 \
             complat1 complat2 bench5; do
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
    # 1. cheap end-to-end smoke of the bf16 raster stream on chip
    step render1 600 python tools/render.py --scene helmet --width 640 \
        --height 384 --frames 2 --out "$LOG/render1.png" || continue
    # 1b. root-cause the chip-vs-interpret bf16 flip gap (early-out A/B)
    step bf16diag 1800 python tools/diag_bf16.py || continue
    # 2. kernel parity incl. raster-bf16-vs-f32 + ssr-compact-vs-dense
    step verify5_nogold 2800 python tools/verify_chip.py \
        --skip-goldens || continue
    # 3. baselines at the new defaults
    step bl123 1800 python tools/bench_baselines.py --frames 16 \
        --only 1,2,3 || continue
    step bl45 1800 python tools/bench_baselines.py --frames 16 \
        --only 4,5 || continue
    step bl67 1800 python tools/bench_baselines.py --frames 16 \
        --only 6,7 || continue
    # 4. config-2 attribution (VERDICT item 7: 24.82 vs 15 unexplained)
    step attr2 2800 python tools/bench_toggle.py --config 2 --frames 16 \
        --toggles ssao,tex_none,stub_resolve,stub_raster,stub_records,unlit \
        || continue
    # 5. config-5 re-attribution after the bf16 stream (items 1-3)
    step attr5 5400 python tools/bench_toggle.py --config 5 --frames 16 \
        --toggles tex_none,stub_resolve,stub_raster,stub_records,hiz,no_visbar \
        || continue
    # 6. measured multi-chip raster split (item 8)
    step bandres 2800 python tools/bench_bandresolve.py || continue
    # 7. per-pixel clouds price tag (item 6)
    step clouds5 1800 python tools/bench_baselines.py --frames 16 \
        --only 5 --cloud-impl perpixel || continue
    # 8. optimized-HLO evidence (items 1, 4)
    step hlo5on 1200 python tools/dump_hlo.py --config 5 \
        --out "$LOG/hlo5_hiz1.txt" || continue
    step hlo5off 1200 python tools/dump_hlo.py --config 5 --hiz-off \
        --out "$LOG/hlo5_hiz0.txt" || continue
    step hlo3 1200 python tools/dump_hlo.py --config 3 \
        --out "$LOG/hlo3.txt" || continue
    step hlo3tex 1200 python tools/dump_hlo.py --config 3 --tex-none \
        --out "$LOG/hlo3_texnone.txt" || continue
    # 9. isolated texture parts at config-5 scale (item 1 denominator)
    step texparts5 2800 python tools/bench_texkernel_parts.py \
        --fields /tmp/texfields_full1088.npz || continue
    # 10. compile-latency sweep (item 9) — the compile column is the
    # measurement; frames kept small
    step complat1 2400 python tools/bench_baselines.py --frames 8 \
        --only 5 --compiler-opt \
        xla_tpu_enable_latency_hiding_scheduler=false || continue
    step complat2 2400 python tools/bench_baselines.py --frames 8 \
        --only 5 --compiler-opt xla_tpu_async_copy_bandwidth_scaling_factor=1 \
        --compiler-opt xla_tpu_licm_size_inflation_ratio=1 || continue
    # 11. the shipped bench
    step bench5 1800 python bench.py || continue
done
echo "chip r5a session COMPLETE $(date +%T)" | tee -a "$LOG/session.log"
