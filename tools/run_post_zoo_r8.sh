#!/bin/bash
# Post-zoo-r8 queue: once the r8 chain releases the TPU tunnel
# (ZOO_R8_DONE in its log), run the per-chunk latency bench (new this
# round) and a bench.py sanity check. Detached so it survives session
# death, like the zoo chains.
set -x
cd "$(dirname "$0")/.."

while ! grep -q ZOO_R8_DONE runs/zoo_r8_chain.log 2>/dev/null; do
  sleep 60
done

python tools/bench_latency.py > runs/bench_latency.log 2>&1
echo "LATENCY rc=$?"
python bench.py > runs/bench_sanity_r8.log 2>&1
echo "BENCH rc=$?"
echo POST_ZOO_R8_DONE
