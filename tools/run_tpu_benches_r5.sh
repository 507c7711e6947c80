#!/bin/bash
# Round-5 TPU battery — ALL flagship rows back-to-back in ONE session so
# cross-round comparisons aren't confounded by tunnel-latency drift
# (VERDICT r4 next #8). Serialized: ONE tunnel client at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p benches/results
OUT=benches/results/tpu_round5.jsonl
date -u +"%Y-%m-%dT%H:%M:%SZ battery start" | tee -a $OUT

echo "=== a. headline bench n=2^20 (cold-checkout capable; self-checks)"
timeout 2400 python -u bench.py 2>&1 | tail -2 | tee -a $OUT

echo "=== b. shuffle k=1024 secq256k1 / zorro / curve25519"
timeout 1800 python -u benches/bench_shuffle.py --curve secq256k1 --only 1024 --backend jax 2>&1 | tail -3 | tee -a $OUT
timeout 1800 python -u benches/bench_shuffle.py --curve zorro --only 1024 --backend jax 2>&1 | tail -3 | tee -a $OUT
timeout 2700 python -u benches/bench_shuffle.py --curve curve25519 --only 1024 --backend jax 2>&1 | tail -3 | tee -a $OUT

echo "=== c. large IPA n=2^16 (segmented FS prover + device verify)"
timeout 2400 python -u benches/bench_ipa_large.py 16 2 2>&1 | tail -3 | tee -a $OUT

echo "=== d. IPA batch prove P=128 n=64 (FS batch prover)"
timeout 1800 python -u benches/bench_ipa_batch.py 128 64 2>&1 | tail -2 | tee -a $OUT

echo "=== e. batch verify at BASELINE scale (1024 proofs, k=8)"
timeout 3000 python -u benches/bench_batch_verify.py --n 1024 --k 8 2>&1 | tail -2 | tee -a $OUT

echo "=== f. prove phase table k=1024"
timeout 1500 python -u tools/profile_shuffle_prove.py 1024 3 2>&1 | tail -16 | tee -a $OUT

date -u +"%Y-%m-%dT%H:%M:%SZ battery end" | tee -a $OUT
echo "=== done"
