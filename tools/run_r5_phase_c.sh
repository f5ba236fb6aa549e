#!/bin/bash
# Round-5 phase C (final TPU window): GAN stage-3 deepening under a
# wall cap (config stage3 num_epoch 2 -> 4; the round-4 "exit at
# epoch 1" was the config ceiling, not a crash), MCD re-eval, bench.py
# validation of the new serving fields, then GTSA N=300 re-scores.
set -x
cd "$(dirname "$0")/.."

timeout 3300 python train_hifigan.py ./config_hifigan.yaml --stage 3 \
  --user_defined_name gan_r5 --resume True \
  >> runs/gan_r5_stage3.log 2>&1
echo "GAN_S3_TRAIN rc=$?"
python predict_hifigan.py ./config_hifigan.yaml --stage 3 \
  --user_defined_name gan_r5 --num_items 100 \
  --out_json runs/eval_gan_r5_s3_deep.json \
  > runs/eval_gan_r5_s3_deep.log 2>&1
echo "GAN_S3_EVAL rc=$?"

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

echo R5_PHASE_C_DONE
