#!/bin/bash
# Round-4 perf measurement battery — run ONLY on an idle chip (no active
# boot_repro): calibration, narrow phase floors, wide phase table, bench.
set -x
cd /root/repo
mkdir -p logs
timeout 1200 python tools/calibrate_vpu.py > logs/calibrate_vpu_r04.log 2>&1
timeout 1800 python profile_narrow.py > logs/profile_narrow_r04.log 2>&1
timeout 2400 python tools/profile_wide.py --md > logs/profile_wide_r04.log 2>&1
timeout 2400 python bench.py > logs/bench_r04.log 2>&1
echo DONE > logs/perf_suite_done
