#!/bin/bash
# Standard-regimen flagship extension (round 3): the flagship deepened
# 48 -> 64 epochs with the reference recipe unchanged (config_ext.yaml =
# config_parity.yaml + num_epoch 64). Trains a COPY (parity_ext) so the
# committed parity_r3 checkpoint can never be left half-extended and
# out of sync with its committed eval artifacts if the session ends
# mid-train; parity_r3 is promoted only by an explicit later commit.
# Ends with a bench.py sanity so the chain's last TPU act is a bench.
# Waits for the speaker-conditioning fine-tune to release the TPU tunnel.
set -x
cd "$(dirname "$0")/.."

while ! grep -q SPK_FT_DONE runs/spk_ft_chain.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

PALLAS_AXON_POOL_IPS= python tools/ensure_corpus.py \
  >> runs/ensure_corpus.log 2>&1 || { echo "CORPUS check failed"; exit 1; }

if [ ! -d modules/denoise/parity_ext ]; then
  cp -r modules/denoise/parity_r3 modules/denoise/parity_ext
fi

sup python train.py TemporalCRN ./config_ext.yaml \
  --user_defined_name parity_ext --resume True \
  > runs/flagship_ext_train.log 2>&1
echo "FLAGSHIP_EXT_TRAIN rc=$?"
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_ext --num_items 100 \
  --out_json runs/eval_parity_ext.json > runs/eval_parity_ext.log 2>&1
echo "FLAGSHIP_EXT_EVAL rc=$?"
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_ext --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_parity_ext_stress.json \
  > runs/eval_parity_ext_stress.log 2>&1
echo "FLAGSHIP_EXT_STRESS rc=$?"
python bench.py > runs/bench_sanity_r9.log 2>&1
echo "BENCH_SANITY rc=$?"

echo FLAGSHIP_EXT_DONE
