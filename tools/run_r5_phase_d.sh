#!/bin/bash
# Round-5 phase D (final window): bench validation + N=300 re-scores.
# GAN stage-3 deepening was cut after the config-ceiling fix: one v5e
# core through the relay does ~45 min/stage-3-epoch and the remaining
# wall clock buys more value as N=300 rows (VERDICT r4 next #6) than
# as one additional adversarial epoch (the num_epoch horizon is now 4,
# so any future run deepens it with a plain --resume True).
set -x
cd "$(dirname "$0")/.."

timeout 1500 python bench.py > runs/bench_r5.log 2>&1
echo "BENCH rc=$?"
tail -1 runs/bench_r5.log

python predict.py ./config_gtsa.yaml GTSA \
  --user_defined_name gtsa_r5 --num_items 300 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_gtsa_n300_stress.json \
  > runs/eval_gtsa_n300_stress.log 2>&1
echo "N300_GTSA_STRESS rc=$?"
python predict.py ./config_gtsa.yaml GTSA \
  --user_defined_name gtsa_r5 --num_items 300 \
  --out_json runs/eval_gtsa_n300.json > runs/eval_gtsa_n300.log 2>&1
echo "N300_GTSA rc=$?"
python predict.py ./config_gb.yaml GeneralBeamformer \
  --user_defined_name gb_r5 --num_items 300 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_gb_n300_stress.json \
  > runs/eval_gb_n300_stress.log 2>&1
echo "N300_GB_STRESS rc=$?"

echo R5_PHASE_D_DONE
