#!/bin/bash
# Round-4 bootstrap evidence runs (VERDICT r3 items 1+2), sequential so the
# single TPU chip is never contended.  Each run writes reports/bootstrap_*.md
# and logs/boot_*.log; the persistent compile cache makes repeats cheap.
set -x
cd /root/repo
mkdir -p logs

# 1. u64chain (value-reducing digit-split): batch 2 + depth-4 chain —
#    the headline "unlimited u64 multiply chains" capability, FIRST so the
#    round has its key artifact even if later runs overrun
timeout 14400 python boot_repro.py --profile u64chain --batch 2 --chain 4 \
    --allow-insecure > logs/boot_u64chain.log 2>&1

# 2. u64 (value-preserving refresh): batch sweep 2,8,32; follow-on op = add
timeout 14400 python boot_repro.py --profile u64 --batch 2,8,32 \
    --skip-chain --allow-insecure > logs/boot_u64.log 2>&1

# 3. SECURE row: p256 @ n=32768 clears 128-bit by the repo's own estimator
#    (202.2 bits) — no --allow-insecure, the gate must pass it
timeout 10800 python boot_repro.py --profile p256 --n 32768 --batch 2,8 \
    --chain 2 > logs/boot_p256_n32768.log 2>&1

echo "ALL DONE" > logs/boot_evidence_done
