#!/bin/bash
# Round-3 zoo completion: evidence-scale runs for the two families the
# reference never published numbers for (GTSA: "never intended to train
# it fully", README.md:69; GB: its committed checkpoint counter stops at
# epoch 14/80 with no numbers, SURVEY.md 5.1). Measured pace on one v5e
# core: GTSA ~52 min/epoch at B=4/K=16, so each family gets a 2-epoch
# (40k-utterance) run — enough to demonstrate positive enhancement
# deltas, extendable via --resume.
# Each run ends with the shared per-item eval artifact. The two runs are
# independent: a failure in one must not block the other (GB whole-
# utterance backprop needs 61G HBM at B=8 -> piece engine at B=4).
set -x
cd "$(dirname "$0")/.."

python train.py GTSA ./config_gtsa.yaml --user_defined_name gtsa_r5 \
  > runs/gtsa_r5_train.log 2>&1 \
&& python predict.py ./config_gtsa.yaml GTSA --user_defined_name gtsa_r5 \
  --num_items 100 --out_json runs/eval_gtsa_r5.json \
  > runs/eval_gtsa_r5.log 2>&1
echo "GTSA_DONE rc=$?"

python train.py GeneralBeamformer ./config_gb.yaml --user_defined_name gb_r5 \
  > runs/gb_r5_train.log 2>&1 \
&& python predict.py ./config_gb.yaml GeneralBeamformer --user_defined_name gb_r5 \
  --num_items 100 --out_json runs/eval_gb_r5.json \
  > runs/eval_gb_r5.log 2>&1
echo "GB_DONE rc=$?"
echo ZOO_R5_DONE
