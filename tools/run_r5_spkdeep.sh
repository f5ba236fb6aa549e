#!/bin/bash
# Round-5 phase A (VERDICT r4 next #1): train the deep-conditioning
# lever round 4 built but never pulled.
#
#   1. TemporalCRNSpkDeep warm-started from the TRAINED spk_v3
#      checkpoint (done before this script: zero-init per-stage FiLM
#      => function-identical to spk_v3 at step 0, identity check
#      printed 0.0e+00) — 25 extra epochs (75 -> 100) on corpus v3,
#      enroll_mode=separate, zero target leakage.
#   2. evals: stress protocol (-5..5) at N=300 (same sample as the
#      round-4 flagship/spk_v3 rows), nontarget negative control at
#      N=100 (sign test: an identity-USING model must degrade).
#   3. paired per-item comparisons vs parity_v3 (unconditioned
#      control) and spk_v3 (bottleneck FiLM) + per-masker babble rows.
#   4. hand the TPU back to the GTSA deepening chain (VERDICT #2).
#
# One TPU process at a time (CLAUDE.md); CPU-side analyses skip the
# tunnel claim with PALLAS_AXON_POOL_IPS=.
set -x
cd "$(dirname "$0")/.."

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train.py TemporalCRN_spk_deep ./config_spk_deep.yaml \
  --user_defined_name spk_deep --resume True \
  > runs/spk_deep_train.log 2>&1
echo "SPK_DEEP_TRAIN rc=$?"

python predict.py ./config_spk_deep.yaml TemporalCRN_spk_deep \
  --user_defined_name spk_deep --num_items 300 --snr_low -5 --snr_high 5 \
  --enroll_mode separate --out_json runs/eval_spk_deep_n300_stress.json \
  > runs/eval_spk_deep_n300_stress.log 2>&1
echo "SPK_DEEP_STRESS rc=$?"

python predict.py ./config_spk_deep.yaml TemporalCRN_spk_deep \
  --user_defined_name spk_deep --num_items 100 --snr_low -5 --snr_high 5 \
  --enroll_mode nontarget --out_json runs/eval_spk_deep_nontarget.json \
  > runs/eval_spk_deep_nontarget.log 2>&1
echo "SPK_DEEP_NONTARGET rc=$?"

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_parity_v3_n300_stress.json runs/eval_spk_deep_n300_stress.json \
  > runs/compare_spk_deep_vs_parity.log 2>&1
echo "COMPARE_PARITY rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_spk_v3_n300_stress.json runs/eval_spk_deep_n300_stress.json \
  > runs/compare_spk_deep_vs_spkv3.log 2>&1
echo "COMPARE_SPKV3 rc=$?"
for art in spk_deep_n300_stress spk_deep_nontarget; do
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_eval.py \
    runs/eval_$art.json --config ./config_spk_deep.yaml --csv_dir data_v3 \
    > runs/analyze_$art.log 2>&1
  echo "ANALYZE_$art rc=$?"
done

echo SPK_DEEP_DONE

# -- hand the TPU back to GTSA deepening (VERDICT #2) ---------------
sup python train.py GTSA ./config_gtsa.yaml \
  --user_defined_name gtsa_r5 --resume True \
  >> runs/gtsa_r4_train.log 2>&1
echo "GTSA_TRAIN rc=$?"
echo R5_PHASE_A_DONE
