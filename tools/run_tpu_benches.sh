#!/bin/bash
# Serialized TPU measurement battery (ONE tunnel client at a time).
# Run after any kernel change: validates correctness first, then
# records the BASELINE.md workloads. Each step appends to
# benches/results/tpu_round2.jsonl or a log under /tmp.
set -u
cd "$(dirname "$0")/.."
mkdir -p benches/results
TS=$(date +%H%M%S)

echo "=== 1. msm2 validation + timing at 2^16 (single + batch)"
timeout 1800 python -u tools/probe_msm2.py 65536 2>&1 | tail -8

echo "=== 2. headline bench n=2^16"
timeout 1500 python -u bench.py 2>&1 | tail -2

echo "=== 3. headline bench n=2^20"
ABTPU_BENCH_LOGN=20 timeout 2400 python -u bench.py 2>&1 | tail -2

echo "=== 4. stage profile at 2^20"
timeout 2400 python -u tools/probe_msm2_stages.py 1048576 2>&1 | tail -10

echo "=== 5. IPA batched prover proofs/s (P=128, n=64)"
timeout 2400 python -u benches/bench_ipa_batch.py 128 64 2>&1 | tail -3

echo "=== 6. batch verify (n proofs = 64, k = 8)"
timeout 2400 python -u benches/bench_batch_verify.py --n 64 --k 8 2>&1 | tail -3

echo "=== 6b. batch verify at BASELINE scale (1024 proofs, k = 8)"
timeout 3600 python -u benches/bench_batch_verify.py --n 1024 --k 8 --iters 1 2>&1 | tail -3

echo "=== 7. TPU-backend shuffle prove/verify at k=1024 (reference parity row)"
timeout 3000 python -u benches/bench_shuffle.py --backend jax --only 1024 2>&1 | tail -4

echo "=== done $TS"
