#!/bin/bash
# Round-3 wrap-up TPU queue, run after tools/run_zoo_r5.sh:
# 1) refresh the committed eval artifacts so every family's JSON now
#    carries both PESQ modes (predict gained true NB-PESQ this round) —
#    same checkpoints, same 100 held-out items, WB numbers must
#    reproduce;
# 2) re-distill the student at 48 epochs (round-3 ran 32; the frozen
#    parity_r3 teacher is unchanged) — the zoo's best model gets the
#    most training;
# 3) re-eval the new student (f32 + int8-resident) and sanity-check the
#    driver bench.
set -x
cd "$(dirname "$0")/.."

python predict.py ./config_parity.yaml TemporalCRN --user_defined_name parity_r3 \
  --num_items 100 --out_json runs/eval_parity_r3.json > runs/eval_parity_r3.log 2>&1
echo "PARITY_EVAL rc=$?"

python predict_fullsubnet.py ./config_fullsubnet.yaml --user_defined_name fsn_r3 \
  --num_items 100 --out_json runs/eval_fsn_r3.json > runs/eval_fsn_r3.log 2>&1
echo "FSN_EVAL rc=$?"

python predict_hifigan.py ./config_hifigan.yaml --stage 2 --user_defined_name gan_r5 \
  --num_items 100 --out_json runs/eval_gan_r5_s2.json > runs/eval_gan_r5_s2.log 2>&1
echo "GAN_EVAL rc=$?"

python predict_distillation.py ./config_distill.yaml --user_defined_name parity_r3 \
  --num_items 100 --out_json runs/eval_distill_r3.json > runs/eval_distill_r3.log 2>&1
echo "DISTILL_R3_EVAL rc=$?"
python predict_distillation.py ./config_distill.yaml --user_defined_name parity_r3 \
  --quantize --num_items 100 --out_json runs/eval_distill_r3_int8.json \
  > runs/eval_distill_r3_int8.log 2>&1
echo "DISTILL_R3_INT8_EVAL rc=$?"

# 48-epoch re-distillation (overwrites dillations/denoise/parity_r3;
# the 32-epoch student is committed, so git restores it if this is worse)
python train_distillation.py ./config_distill.yaml --user_defined_name parity_r3 \
  > runs/distill_r5_train.log 2>&1
echo "DISTILL_TRAIN rc=$?"

python predict_distillation.py ./config_distill.yaml --user_defined_name parity_r3 \
  --num_items 100 --out_json runs/eval_distill_r5.json > runs/eval_distill_r5.log 2>&1
echo "DISTILL_R5_EVAL rc=$?"
python predict_distillation.py ./config_distill.yaml --user_defined_name parity_r3 \
  --quantize --num_items 100 --out_json runs/eval_distill_r5_int8.json \
  > runs/eval_distill_r5_int8.log 2>&1
echo "DISTILL_R5_INT8_EVAL rc=$?"

python bench.py > runs/bench_r3_check.json 2> runs/bench_r3_check.log
echo "BENCH rc=$?"
echo POST_ZOO_DONE
