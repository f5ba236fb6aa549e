#!/bin/bash
# Round-5 phase E (last ~90 min): FullSubNet N=300 at both protocols
# (VERDICT r4 next #6 — third family to full sample), then GTSA
# deepening with whatever remains.
set -x
cd "$(dirname "$0")/.."

python predict_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --num_items 300 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_fsn_n300_stress.json \
  > runs/eval_fsn_n300_stress.log 2>&1
echo "N300_FSN_STRESS rc=$?"
python predict_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --num_items 300 \
  --out_json runs/eval_fsn_n300.json > runs/eval_fsn_n300.log 2>&1
echo "N300_FSN rc=$?"

echo R5_PHASE_E_DONE

python tools/supervise_resume.py --retries 2 -- \
  python train.py GTSA ./config_gtsa.yaml \
  --user_defined_name gtsa_r5 --resume True \
  >> runs/gtsa_r4_train.log 2>&1
echo "GTSA_TRAIN rc=$?"
