#!/bin/bash
# Round-5 session-2 chip queue (runs after the in-flight u64chain job):
#   1. p256 secure row REGENERATED on the fused-kernel path with the
#      round-5 h-aware gate ON (e_lo 11, hamming 21: uniform 175.9 /
#      h-aware 135.3 bits; the round-4 row used h=8, whose MITM bound is
#      56 bits) -> reports/bootstrap_n32768_p256.md.
#   2. SECURE u64 @ n=32768 attempt (h=21, e_lo=14, gate ON), --skip-warm,
#      hard-stopped before the round's bench window; even a partial run
#      logs the real per-phase costs at the secure u64 shape.
set -x
cd "$(dirname "$0")/.."
WAIT_PID=$1
if [ -n "$WAIT_PID" ]; then
    tail --pid="$WAIT_PID" -f /dev/null
fi
NOW=$(date -u +%s)
P256_STOP=$(date -ud '09:02' +%s)
timeout $((P256_STOP - NOW)) python -u boot_repro.py --profile p256 \
    --n 32768 --e-lo 11 --hamming 21 --batch 2 --chain 2 \
    > logs/boot_p256_secure_r5.log 2>&1
echo "p256 exit: $?"
NOW=$(date -u +%s)
STOP=$(date -ud '09:00' +%s)
BUDGET=$((STOP - NOW))
if [ "$BUDGET" -gt 300 ]; then
    EXACTO_TPU_PS_BUDGET_GB=8 timeout "$BUDGET" python -u boot_repro.py \
        --profile u64 --n 32768 --hamming 21 --e-lo 14 --batch 1 \
        --skip-chain --skip-warm \
        > logs/boot_u64_secure_r5.log 2>&1
    echo "secure u64 exit: $?"
else
    echo "no budget left for the secure u64 attempt"
fi
