#!/bin/bash
# Round-3 TPU battery, phase 2 (serialized: ONE tunnel client at a time).
# Assumes the 2^20 workload cache exists (tools/build_bench_cache.py).
set -u
cd "$(dirname "$0")/.."
mkdir -p benches/results
OUT=benches/results/tpu_round3.jsonl

echo "=== a. headline bench n=2^16 (post kernel-uniformity edit; self-checks)"
timeout 1500 python -u bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a $OUT

echo "=== b. headline bench n=2^20"
ABTPU_BENCH_LOGN=20 timeout 2400 python -u bench.py 2>&1 | grep -v WARNING | tail -2 | tee -a $OUT

echo "=== c. stage profile at 2^20"
timeout 2400 python -u tools/probe_msm2_stages.py 1048576 2>&1 | grep -v WARNING | tail -12

echo "=== d. sharded v2 composition on hardware (D=1 mesh)"
timeout 2400 python -u tools/probe_msm2_sharded.py 65536 2>&1 | grep -v WARNING | tail -6

echo "=== e. IPA batched prover proofs/s (P=128, n=64) post fetch-fix"
timeout 2400 python -u benches/bench_ipa_batch.py 128 64 2>&1 | grep -v WARNING | tail -3 | tee -a $OUT

echo "=== f. batch verify at BASELINE scale (1024 proofs, k=8)"
timeout 3600 python -u benches/bench_batch_verify.py --n 1024 --k 8 --iters 1 2>&1 | grep -v WARNING | tail -3 | tee -a $OUT

echo "=== done"
