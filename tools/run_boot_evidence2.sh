#!/bin/bash
# Round-4 evidence, phase 2 (after the follow-on-mul noise-budget fix):
# u64chain with the corrected sizing, then the SECURE p256 row, then the
# u64 batch-8 amortization row.
set -x
cd /root/repo
mkdir -p logs

timeout 10800 python boot_repro.py --profile u64chain --batch 2 --chain 2 \
    --allow-insecure > logs/boot_u64chain_fixed.log 2>&1

timeout 9000 python boot_repro.py --profile p256 --n 32768 --batch 2,8 \
    --chain 2 > logs/boot_p256_n32768.log 2>&1

timeout 7200 python boot_repro.py --profile u64 --batch 2,8 \
    --skip-chain --allow-insecure > logs/boot_u64_v2.log 2>&1

echo "ALL DONE" > logs/boot_evidence2_done
