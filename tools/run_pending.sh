#!/bin/bash
# One-shot runner for the pending on-chip measurement queue (CLAUDE.md):
# executes the moment the axon tunnel is back. Each stage appends to
# /tmp/pending_log.txt and is individually timeout-bounded so one wedged
# compile can't eat the whole queue.
set -u
cd /root/repo
LOG=/tmp/pending_log.txt
echo "=== run_pending $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD)" | tee -a "$LOG"

# 0. tunnel sanity
if ! timeout -k 5 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "TUNNEL DOWN — aborting queue" | tee -a "$LOG"
    exit 1
fi

# 1. headline bench at HEAD (channels-major split-proj/linear landed unbenched)
echo "--- [1] bench.py at HEAD" | tee -a "$LOG"
timeout -k 10 1800 python bench.py 2>>"$LOG" | tee -a "$LOG" | tail -1 > /tmp/bench_head.json

# 1b. if stage 1 produced no JSON (compile wedge / hang in the unbenched
#     channels-major split-proj/linear kernels is the prime suspect), force
#     the channels-major layout OFF for every remaining stage so one bad
#     kernel can't take down the whole queue
if ! grep -q '"metric"' /tmp/bench_head.json 2>/dev/null; then
    echo "stage 1 produced no result — forcing TURTLE_CHAN_MAJOR=0 for the rest" | tee -a "$LOG"
    export TURTLE_CHAN_MAJOR=0
fi

# 2. coarse A/B: channels-major layout forced OFF (only worth reading if [1]
#    regressed below the 5.32 pre-landing number)
echo "--- [2] bench.py TURTLE_CHAN_MAJOR=0" | tee -a "$LOG"
TURTLE_CHAN_MAJOR=0 timeout -k 10 1800 python bench.py 2>>"$LOG" | tee -a "$LOG" | tail -1 > /tmp/bench_cm0.json

# 2b. CHM-apply-in-FFN fold A/B (landed parity-green after the tunnel went
#     down; defaults ON — this run isolates its contribution)
echo "--- [2b] bench.py TURTLE_CHM_IN_FFN=0" | tee -a "$LOG"
TURTLE_CHM_IN_FFN=0 timeout -k 10 1800 python bench.py 2>>"$LOG" | tee -a "$LOG" | tail -1 > /tmp/bench_chmffn0.json

# 2c. per-frame SAB value-stream refactor A/B (landed at 9d904c0 after this
#     queue was written; defaults ON — isolate its contribution)
echo "--- [2c] bench.py TURTLE_SAB_PERFRAME=0" | tee -a "$LOG"
TURTLE_SAB_PERFRAME=0 timeout -k 10 1800 python bench.py 2>>"$LOG" | tee -a "$LOG" | tail -1 > /tmp/bench_perframe0.json

# 2d. post-5.32 channels-major call sites only (site-scoped knob)
echo "--- [2d] bench.py TURTLE_CHAN_MAJOR_NEW=0" | tee -a "$LOG"
TURTLE_CHAN_MAJOR_NEW=0 timeout -k 10 1800 python bench.py 2>>"$LOG" | tee -a "$LOG" | tail -1 > /tmp/bench_cmnew0.json

# 3. tiled-protocol chunking A/B: max_tile_batch 15 vs the default 12 (45 = 3x15)
echo "--- [3] bench_suite tiled @ max_tile_batch 15" | tee -a "$LOG"
timeout -k 10 2400 python tools/bench_suite.py --iters 12 --max_tile_batch 15 \
    --skip sr,batch2,1080,desnow >>"$LOG" 2>&1

# 4. full BENCH_SUITE refresh at the final config
echo "--- [4] bench_suite full refresh" | tee -a "$LOG"
timeout -k 10 3600 python tools/bench_suite.py --iters 12 >>"$LOG" 2>&1

# 5. XLA cost-analysis traffic artifact after the r3 fusions
echo "--- [5] traffic_json" | tee -a "$LOG"
timeout -k 10 1800 python -m turtlevsr_tpu.cli.bench -opt options/Turtle_Deblur_Gopro.yml \
    --size 720 1280 --iters 30 --traffic_json TRAFFIC_r03.json >>"$LOG" 2>&1

# 6. re-validate NUMERICS.json at HEAD (the channels-major split-proj/linear
#    kernels landed after the last numerics run; bound the shipped bf16+pallas
#    pipeline against fp32 XLA again on the real chip)
echo "--- [6] numerics refresh" | tee -a "$LOG"
timeout -k 10 1800 python -m turtlevsr_tpu.cli.bench -opt options/Turtle_Deblur_Gopro.yml \
    --size 720 1280 --numerics --numerics_json NUMERICS.json >>"$LOG" 2>&1

# 7. per-block/per-level profile at HEAD — feeds the next optimisation
#    target pick (the CLAUDE.md micro numbers predate the channels-major
#    split-proj/linear kernels)
echo "--- [7] block/level profiles" | tee -a "$LOG"
timeout -k 10 1800 python tools/profile_blocks.py > /tmp/profile_blocks_head.txt 2>&1
timeout -k 10 1200 python tools/profile_levels.py > /tmp/profile_levels_head.txt 2>&1

# 8. training-step refresh: the r3 graph folds (q2/k2 patchify, reduce_chan
#    concat fold) live in the shared XLA path the training recipe uses, so
#    BENCH_TRAIN.json's 626 ms/iter predates them
echo "--- [8] train-step refresh" | tee -a "$LOG"
timeout -k 10 2400 python -m turtlevsr_tpu.cli.bench \
    -opt options/Turtle_Deblur_Gopro.yml --train_step >>"$LOG" 2>&1

# 9. floor-vs-measured comparison (pure host math; reads TRAFFIC_r03.json)
echo "--- [9] roofline floor vs measured" | tee -a "$LOG"
timeout -k 10 300 python tools/roofline.py >>"$LOG" 2>&1

echo "=== queue done $(date -u +%FT%TZ)" | tee -a "$LOG"
