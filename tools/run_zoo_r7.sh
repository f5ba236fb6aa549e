#!/bin/bash
# Round-3 zoo deepening, wave 2: extend FullSubNet 4 -> 12 epochs
# (~22 min/epoch measured from the fsn_r3 run: 4 epochs in 1.5 h).
# The committed checkpoint is weights-only, so this run exercises the
# weights-only WARM-START resume (fresh Adam, step realigned) the same
# way gb_r6 did. Re-evals at BOTH protocols into *_r7 artifacts; the
# r3 artifacts stay committed as the 4-epoch snapshot.
set -x
cd "$(dirname "$0")/.."

python train_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --resume True \
  > runs/fsn_r7_train.log 2>&1
echo "FSN_TRAIN rc=$?"
python predict_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --num_items 100 \
  --out_json runs/eval_fsn_r7.json \
  > runs/eval_fsn_r7.log 2>&1
echo "FSN_EVAL rc=$?"
python predict_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_fsn_r7_stress.json \
  > runs/eval_fsn_r7_stress.log 2>&1
echo "FSN_STRESS rc=$?"

echo ZOO_R7_DONE
