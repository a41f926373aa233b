#!/bin/bash
# Round-5 bootstrap evidence queue — run the two flagship chip jobs
# back-to-back so the chip never idles between them:
#   1. u64chain @ n=4096 (VERDICT r4 task 1): res1 t_boot + factor 16,
#      warm pass, follow-on MULTIPLY check -> regenerates
#      reports/bootstrap_n4096_u64chain.md.
#   2. SECURE u64 @ n=32768 (task 3): h=21 clears BOTH the uniform and
#      the sparse-MITM 128-bit bounds; value-preserving refresh with
#      follow-on add, batch 1, warm pass -> reports/bootstrap_n32768_u64.md.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
timeout 10800 python -u boot_repro.py --profile u64chain --n 4096 \
    --allow-insecure --batch 2 --skip-chain \
    > logs/boot_u64chain_r5.log 2>&1
echo "u64chain exit: $?"
# trace Galois keys at L=29/n=32768 are ~3.3 GB of the 16 GB HBM; keep
# the P-S working-set budget at 8 GB so keys + operands + P-S fit
EXACTO_TPU_PS_BUDGET_GB=8 timeout 14400 python -u boot_repro.py \
    --profile u64 --n 32768 --hamming 21 --e-lo 14 --batch 1 --skip-chain \
    > logs/boot_u64_secure_r5.log 2>&1
echo "secure u64 exit: $?"
