#!/bin/bash
# Round-4 post chain v2 (reordered): short high-value measurements
# before the long N=300 tail, so the round can't end with the MFU
# table and GAN MCD rows unmeasured. Replaces run_r4_post.sh (whose
# self-enrollment block already ran).
set -x
cd "$(dirname "$0")/.."

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

PALLAS_AXON_POOL_IPS= python tools/ensure_corpus.py \
  >> runs/ensure_corpus.log 2>&1 || { echo "CORPUS check failed"; exit 1; }

# -- 1. HiFi-GAN MCD measurement (VERDICT r3 weak #4) ---------------
python predict_hifigan.py ./config_hifigan.yaml --stage 2 \
  --user_defined_name gan_r5 --num_items 100 \
  --out_json runs/eval_gan_r5_s2_mcd.json > runs/eval_gan_r5_s2_mcd.log 2>&1
echo "GAN_S2_MCD rc=$?"
python predict_hifigan.py ./config_hifigan.yaml --stage 3 \
  --user_defined_name gan_r5 --num_items 100 \
  --out_json runs/eval_gan_r5_s3_mcd.json > runs/eval_gan_r5_s3_mcd.log 2>&1
echo "GAN_S3_MCD rc=$?"

# -- 2. per-family xRT + MFU table (VERDICT r3 weak #3) -------------
python tools/bench_families.py > runs/bench_families_r4.log 2>&1
echo "BENCH_FAMILIES rc=$?"

# -- 3. N=300 evals (VERDICT r3 next #6) ----------------------------
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_ext --num_items 300 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_parity_ext_n300_stress.json \
  > runs/eval_parity_ext_n300_stress.log 2>&1
echo "N300_FLAGSHIP_STRESS rc=$?"
python predict_distillation.py ./config_distill.yaml \
  --user_defined_name parity_r3 --num_items 300 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_distill_n300_stress.json \
  > runs/eval_distill_n300_stress.log 2>&1
echo "N300_STUDENT_STRESS rc=$?"
python predict.py ./config_spk_v3.yaml TemporalCRN_spk \
  --user_defined_name spk_v3 --num_items 300 --snr_low -5 --snr_high 5 \
  --enroll_mode separate --out_json runs/eval_spk_v3_n300_stress.json \
  > runs/eval_spk_v3_n300_stress.log 2>&1
echo "N300_SPK_STRESS rc=$?"
python predict.py ./config_parity_v3.yaml TemporalCRN \
  --user_defined_name parity_v3 --num_items 300 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_parity_v3_n300_stress.json \
  > runs/eval_parity_v3_n300_stress.log 2>&1
echo "N300_PARITYV3_STRESS rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_parity_v3_n300_stress.json runs/eval_spk_v3_n300_stress.json \
  > runs/compare_v3_n300_stress.log 2>&1
echo "COMPARE_N300 rc=$?"
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_ext --num_items 300 \
  --out_json runs/eval_parity_ext_n300.json \
  > runs/eval_parity_ext_n300.log 2>&1
echo "N300_FLAGSHIP rc=$?"

# -- 4. zoo deepening (open-ended; resumes next round) --------------
sup python train.py GTSA ./config_gtsa.yaml \
  --user_defined_name gtsa_r5 --resume True \
  > runs/gtsa_r4_train.log 2>&1
echo "GTSA_TRAIN rc=$?"
python predict.py ./config_gtsa.yaml GTSA \
  --user_defined_name gtsa_r5 --num_items 100 \
  --out_json runs/eval_gtsa_r4.json > runs/eval_gtsa_r4.log 2>&1
python predict.py ./config_gtsa.yaml GTSA \
  --user_defined_name gtsa_r5 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_gtsa_r4_stress.json > runs/eval_gtsa_r4_stress.log 2>&1
echo "GTSA_EVALS rc=$?"

sup python train.py GeneralBeamformer ./config_gb.yaml \
  --user_defined_name gb_r5 --resume True \
  > runs/gb_r4_train.log 2>&1
echo "GB_TRAIN rc=$?"

sup python train_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --resume True \
  > runs/fsn_r4_train.log 2>&1
echo "FSN_TRAIN rc=$?"

echo R4_POST_DONE
