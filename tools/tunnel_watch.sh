#!/bin/bash
# Poll for the axon tunnel; the moment device acquisition works, run the
# pending measurement queue (tools/run_pending.sh). Bounded to ~11h.
set -u
LOG=/tmp/tunnel_watch.log
echo "=== tunnel_watch start $(date -u +%FT%TZ)" >> "$LOG"
for i in $(seq 1 260); do
    # -k 5: the wedged backend-init survives SIGTERM (see bench.py notes);
    # follow up with SIGKILL or the watcher never advances past probe 1
    if timeout -k 5 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "tunnel UP at $(date -u +%FT%TZ) (probe $i)" >> "$LOG"
        bash /root/repo/tools/run_pending.sh >> "$LOG" 2>&1
        echo "queue finished $(date -u +%FT%TZ)" >> "$LOG"
        exit 0
    fi
    sleep 150
done
echo "gave up: tunnel never came up $(date -u +%FT%TZ)" >> "$LOG"
exit 1
