#!/bin/bash
# Sequential TPU bench campaign (each prints one JSON line).
cd /root/repo
set -x
echo "=== baseline B=16 6s ==="
python bench.py 2>/dev/null | tail -1
echo "=== B=32 6s ==="
BENCH_BATCH=32 python bench.py 2>/dev/null | tail -1
echo "=== B=16 16s noflash ==="
BENCH_AUDIO_SECONDS=16 python bench.py 2>/dev/null | tail -1
echo "=== B=16 16s flash ==="
BENCH_AUDIO_SECONDS=16 BENCH_FLASH=1 python bench.py 2>/dev/null | tail -1
echo "=== profile B=16 6s ==="
rm -rf /tmp/prof_r5
BENCH_PROFILE=/tmp/prof_r5 BENCH_WINDOWS=1 python bench.py 2>/dev/null | tail -1
python tools/profile_step.py /tmp/prof_r5 2>/dev/null | head -60
