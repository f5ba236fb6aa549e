#!/bin/bash
# HiFi-GAN 3-stage regimen rerun after the stft_loss fidelity fix
# (spectral convergence on COMPRESSED magnitudes in the phase branch +
# global-Frobenius/pred-normalized SC, matching reference
# Hifi-GAN/hifigan.py:986-1010 exactly — golden test in
# tests/test_hifigan.py). gan_r4 trained against the drifted loss;
# this chain is the corrected-evidence run.
# Stage 3 at B=8 can die of HBM fragmentation at an epoch boundary —
# recover losslessly via --resume True (Step.json + optimizer.npz).
set -x
cd "$(dirname "$0")/.."
U=gan_r5
C=./config_hifigan.yaml

python train_hifigan.py $C --stage 1 --user_defined_name $U \
  > runs/${U}_stage1.log 2>&1 || exit 1
python train_hifigan.py $C --stage 2 --load_model True --user_defined_name $U \
  > runs/${U}_stage2.log 2>&1 || exit 1
python predict_hifigan.py $C --stage 2 --user_defined_name $U \
  --num_items 100 --out_json runs/eval_${U}_s2.json \
  > runs/eval_${U}_s2.log 2>&1

python train_hifigan.py $C --stage 3 --load_model True --user_defined_name $U \
  > runs/${U}_stage3.log 2>&1 \
  || python train_hifigan.py $C --stage 3 --user_defined_name $U --resume True \
    >> runs/${U}_stage3.log 2>&1 \
  || python train_hifigan.py $C --stage 3 --user_defined_name $U --resume True \
    >> runs/${U}_stage3.log 2>&1
python predict_hifigan.py $C --stage 3 --user_defined_name $U \
  --num_items 100 --out_json runs/eval_${U}_s3.json \
  > runs/eval_${U}_s3.log 2>&1
echo GAN_R5_CHAIN_DONE
