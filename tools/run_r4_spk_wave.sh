#!/bin/bash
# Round-4 speaker wave (VERDICT r3 next #1): corpus v3 + DEPLOYABLE
# speaker conditioning with zero target leakage, controlled.
#
#   1. generate the speaker-keyed corpus v3 (data_v3/, >=2 utterances
#      per synthetic voice; tools/generate_corpus.py --version 3)
#   2. CONTROL: fine-tune the unconditioned flagship 12 epochs on v3
#      (parity_v3) — isolates corpus adaptation
#   3. fine-tune TemporalCRN_spk 12 epochs on v3 with enroll_mode:
#      separate (spk_v3) — enrollment is a DIFFERENT utterance of the
#      target speaker, never the target itself
#   4. evals: both at parity (0..25) + stress (-5..5) protocols;
#      spk_v3 additionally with --enroll_mode nontarget (negative
#      control: an identity-USING model must degrade)
#   5. paired per-item comparisons + per-masker babble rows
#
# Waits for the dir-probe chain (one TPU process at a time).
set -x
cd "$(dirname "$0")/.."

while ! grep -q DIR_EXP_DONE runs/r4_dir_chain.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

# -- 1. corpus v3 ----------------------------------------------------
if [ ! -f data_v3/corpus_fingerprint.json ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/generate_corpus.py \
    --version 3 --spk_utts 8 --csv_dir data_v3 --out_dir data_v3/corpus \
    > runs/gen_corpus_v3.log 2>&1 || { echo "CORPUS_V3 gen failed"; exit 1; }
else
  PALLAS_AXON_POOL_IPS= python tools/ensure_corpus.py --csv_dir data_v3 \
    >> runs/ensure_corpus.log 2>&1 || { echo "CORPUS_V3 check failed"; exit 1; }
fi
echo "CORPUS_V3 rc=0"

# -- 2. flagship control on v3 --------------------------------------
if [ ! -d modules/denoise/parity_v3 ]; then
  mkdir -p modules/denoise/parity_v3
  cp modules/denoise/parity_ext/TemporalCRN.npz \
     modules/denoise/parity_ext/Epoch.json modules/denoise/parity_v3/
fi
sup python train.py TemporalCRN ./config_parity_v3.yaml \
  --user_defined_name parity_v3 --resume True \
  > runs/parity_v3_train.log 2>&1
echo "PARITY_V3_TRAIN rc=$?"
python predict.py ./config_parity_v3.yaml TemporalCRN \
  --user_defined_name parity_v3 --num_items 100 \
  --out_json runs/eval_parity_v3.json > runs/eval_parity_v3.log 2>&1
echo "PARITY_V3_EVAL rc=$?"
python predict.py ./config_parity_v3.yaml TemporalCRN \
  --user_defined_name parity_v3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_parity_v3_stress.json \
  > runs/eval_parity_v3_stress.log 2>&1
echo "PARITY_V3_STRESS rc=$?"

# -- 3. conditioned fine-tune on v3 ---------------------------------
if [ ! -f modules/denoise/spk_v3/TemporalCRN_spk.npz ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/warmstart_spk.py \
    --config ./config_spk_v3.yaml --src ./modules/denoise/parity_ext \
    --dst ./modules/denoise/spk_v3 > runs/warmstart_spk_v3.log 2>&1 \
    || { echo "WARMSTART_V3 failed"; exit 1; }
fi
sup python train.py TemporalCRN_spk ./config_spk_v3.yaml \
  --user_defined_name spk_v3 --resume True \
  > runs/spk_v3_train.log 2>&1
echo "SPK_V3_TRAIN rc=$?"

# -- 4. evals --------------------------------------------------------
python predict.py ./config_spk_v3.yaml TemporalCRN_spk \
  --user_defined_name spk_v3 --num_items 100 --enroll_mode separate \
  --out_json runs/eval_spk_v3.json > runs/eval_spk_v3.log 2>&1
echo "SPK_V3_EVAL rc=$?"
python predict.py ./config_spk_v3.yaml TemporalCRN_spk \
  --user_defined_name spk_v3 --num_items 100 --snr_low -5 --snr_high 5 \
  --enroll_mode separate --out_json runs/eval_spk_v3_stress.json \
  > runs/eval_spk_v3_stress.log 2>&1
echo "SPK_V3_STRESS rc=$?"
python predict.py ./config_spk_v3.yaml TemporalCRN_spk \
  --user_defined_name spk_v3 --num_items 100 --snr_low -5 --snr_high 5 \
  --enroll_mode nontarget --out_json runs/eval_spk_v3_nontarget.json \
  > runs/eval_spk_v3_nontarget.log 2>&1
echo "SPK_V3_NONTARGET rc=$?"

# -- 5. paired comparisons + per-masker rows ------------------------
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_parity_v3_stress.json runs/eval_spk_v3_stress.json \
  > runs/compare_v3_stress.log 2>&1
echo "COMPARE_STRESS rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_spk_v3_nontarget.json runs/eval_spk_v3_stress.json \
  > runs/compare_v3_nontarget.log 2>&1
echo "COMPARE_NONTARGET rc=$?"
for art in parity_v3_stress spk_v3_stress spk_v3_nontarget; do
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_eval.py \
    runs/eval_$art.json --config ./config_parity_v3.yaml --csv_dir data_v3 \
    > runs/analyze_$art.log 2>&1
  echo "ANALYZE_$art rc=$?"
done

echo SPK_WAVE_DONE
