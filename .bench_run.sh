#!/bin/bash
# helper used during development to run the benchmark + component profile
cd /root/repo
BENCH_SKIP_CPU=1 BENCH_ITERS=20 BENCH_BATCH=8 timeout 560 python bench.py > /tmp/bench4.log 2>&1
timeout 560 python /tmp/profile_parts.py > /tmp/profile_parts.log 2>&1
