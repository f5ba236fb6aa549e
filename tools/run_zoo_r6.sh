#!/bin/bash
# Round-3 zoo deepening: extend the GTSA / GeneralBeamformer evidence
# runs (2 epochs each, tools/run_zoo_r5.sh) to regimen-shaped depth via
# --resume: GTSA 2->8 epochs (~22 min/epoch measured), GB 2->6 epochs
# (~55 min/epoch). GB's dev criterion was still improving steeply at
# epoch 1 (-0.7956 -> -0.8192), so the 2-epoch numbers undersell both
# families. Each extension re-evals at BOTH protocols (parity 0-25 dB +
# stress -5..+5 dB) into *_r6 artifacts; the r5 artifacts stay
# committed as the 2-epoch snapshot.
set -x
cd "$(dirname "$0")/.."

python train.py GTSA ./config_gtsa.yaml --user_defined_name gtsa_r5 --resume True \
  > runs/gtsa_r6_train.log 2>&1
echo "GTSA_TRAIN rc=$?"
python predict.py ./config_gtsa.yaml GTSA --user_defined_name gtsa_r5 \
  --num_items 100 --out_json runs/eval_gtsa_r6.json \
  > runs/eval_gtsa_r6.log 2>&1
echo "GTSA_EVAL rc=$?"
python predict.py ./config_gtsa.yaml GTSA --user_defined_name gtsa_r5 \
  --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_gtsa_r6_stress.json \
  > runs/eval_gtsa_r6_stress.log 2>&1
echo "GTSA_STRESS rc=$?"

python train.py GeneralBeamformer ./config_gb.yaml --user_defined_name gb_r5 --resume True \
  > runs/gb_r6_train.log 2>&1
echo "GB_TRAIN rc=$?"
python predict.py ./config_gb.yaml GeneralBeamformer --user_defined_name gb_r5 \
  --num_items 100 --out_json runs/eval_gb_r6.json \
  > runs/eval_gb_r6.log 2>&1
echo "GB_EVAL rc=$?"
python predict.py ./config_gb.yaml GeneralBeamformer --user_defined_name gb_r5 \
  --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_gb_r6_stress.json \
  > runs/eval_gb_r6_stress.log 2>&1
echo "GB_STRESS rc=$?"

echo ZOO_R6_DONE
