#!/bin/bash
# Standard-regimen flagship extension (round 3): modules/denoise/
# parity_r3 deepened 48 -> 64 epochs with the reference recipe
# unchanged (config_ext.yaml = config_parity.yaml + num_epoch 64),
# then re-evaluated at both protocols. Every family extended so far
# (student 48->? in flight, FullSubNet 12->20, GTSA 8->12, GB 6->8)
# kept improving; this chases the flagship's absolute-PESQ headroom.
# Ends with a bench.py sanity so the round's last TPU act is a bench.
# Waits for the speaker-conditioning experiment to release the TPU tunnel.
set -x
cd "$(dirname "$0")/.."

while ! grep -q SPK_EXP_DONE runs/spk_chain.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train.py TemporalCRN ./config_ext.yaml \
  --user_defined_name parity_r3 --resume True \
  > runs/flagship_ext_train.log 2>&1
echo "FLAGSHIP_EXT_TRAIN rc=$?"
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_r3 --num_items 100 \
  --out_json runs/eval_parity_r4.json > runs/eval_parity_r4.log 2>&1
echo "FLAGSHIP_EXT_EVAL rc=$?"
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_parity_r4_stress.json \
  > runs/eval_parity_r4_stress.log 2>&1
echo "FLAGSHIP_EXT_STRESS rc=$?"
python bench.py > runs/bench_sanity_r9.log 2>&1
echo "BENCH_SANITY rc=$?"

echo FLAGSHIP_EXT_DONE
