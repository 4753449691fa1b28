#!/bin/bash
# One-shot runner for the pending on-chip measurement queue: executes the
# moment the axon tunnel is back (tools/tunnel_watch.sh fires it). Each
# stage appends to /tmp/pending_log.txt and is individually
# timeout-bounded so one wedged compile can't eat the whole queue.
#
# r4 state: everything on the r3/r4 queue was MEASURED this round (see
# CLAUDE.md "Round-4 measurements") — the queue now just refreshes the
# standing artifacts at HEAD after a tunnel outage.
set -u
cd /root/repo
LOG=/tmp/pending_log.txt
echo "=== run_pending $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD)" | tee -a "$LOG"

# 0. tunnel sanity
if ! timeout -k 5 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "TUNNEL DOWN — aborting queue" | tee -a "$LOG"
    exit 1
fi

# 1. headline bench at HEAD
echo "--- [1] bench.py at HEAD" | tee -a "$LOG"
timeout -k 10 2700 python bench.py 2>>"$LOG" | tee -a "$LOG" | tail -1 > /tmp/bench_head.json

# 2. suite refresh (commit-stamped; device-resident I/O protocol)
echo "--- [2] bench_suite full refresh" | tee -a "$LOG"
timeout -k 10 3600 python tools/bench_suite.py --iters 12 >>"$LOG" 2>&1

# 3. numerics refresh (all three families, merged into NUMERICS.json)
echo "--- [3] numerics refresh" | tee -a "$LOG"
for OPT in Turtle_Deblur_Gopro Turtle_Desnow; do
    timeout -k 10 2400 python -m turtlevsr_tpu.cli.bench \
        -opt "options/${OPT}.yml" --size 720 1280 --numerics >>"$LOG" 2>&1
done
timeout -k 10 2400 python -m turtlevsr_tpu.cli.bench \
    -opt options/Turtle_SR_MVSR.yml --size 180 320 --numerics >>"$LOG" 2>&1

# 4. train-step at HEAD (both kernel backends; BENCH_TRAIN.json is written
#    by hand from these lines when they move)
echo "--- [4] train step" | tee -a "$LOG"
for K in pallas xla; do
    timeout -k 10 2400 python -m turtlevsr_tpu.cli.bench \
        -opt options/Turtle_Deblur_Gopro.yml --train_step --kernels "$K" \
        --iters 20 >>"$LOG" 2>&1
done

echo "=== run_pending done $(date -u +%FT%TZ)" | tee -a "$LOG"
