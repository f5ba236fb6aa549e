#!/bin/bash
# Round-5 phase B: short high-value measurements first (round-4
# lesson), then the GAN stage-3 regimen, then the N=300 tail.
#   1. bench.py — validates the new serving_mfu fields on real TPU
#   2. bf16 end-to-end paired eval (VERDICT r4 next #4): same 50
#      items, f32 STFT vs bf16 STFT, flagship checkpoint
#   3. serving-throughput curve B=1..128 with per-batch MFU
#   4. OOD transfer evals (VERDICT r4 next #3): parity_v3 (uncond
#      control) + spk_deep (conditioned) at stress, parity_v3 at the
#      0-25 protocol, on the data_ood corpus from the OOD synthesizer
#   5. HiFi-GAN stage 3 real regimen (VERDICT r4 next #5): resume the
#      1-epoch stage-3 run under a wall-clock cap, then re-eval MCD
#   6. N=300 re-scores (VERDICT r4 next #6): GTSA + GB, both protocols
#   7. hand the TPU back to GTSA deepening for whatever time remains
set -x
cd "$(dirname "$0")/.."

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

# -- 1. bench validation --------------------------------------------
timeout 1500 python bench.py > runs/bench_r5.log 2>&1
echo "BENCH rc=$?"
tail -1 runs/bench_r5.log

# -- 2. bf16 STFT paired eval ---------------------------------------
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_ext --num_items 50 \
  --out_json runs/eval_bf16_stft_f32.json \
  > runs/eval_bf16_stft_f32.log 2>&1
echo "BF16_F32 rc=$?"
python predict.py ./config_ext.yaml TemporalCRN \
  --user_defined_name parity_ext --num_items 50 --stft_dtype bfloat16 \
  --out_json runs/eval_bf16_stft_bf16.json \
  > runs/eval_bf16_stft_bf16.log 2>&1
echo "BF16_BF16 rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_bf16_stft_f32.json runs/eval_bf16_stft_bf16.json \
  > runs/compare_bf16_stft.log 2>&1
echo "BF16_COMPARE rc=$?"

# -- 3. serving-throughput curve ------------------------------------
timeout 2400 python benchmarks/throughput.py > runs/throughput_r5.log 2>&1
echo "THROUGHPUT rc=$?"

# -- 4. OOD transfer evals ------------------------------------------
python predict.py ./config_ood.yaml TemporalCRN \
  --user_defined_name parity_v3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_ood_parity_v3_stress.json \
  > runs/eval_ood_parity_v3_stress.log 2>&1
echo "OOD_PARITY_STRESS rc=$?"
python predict.py ./config_ood.yaml TemporalCRN_spk_deep \
  --user_defined_name spk_deep --num_items 100 --snr_low -5 --snr_high 5 \
  --enroll_mode separate --out_json runs/eval_ood_spk_deep_stress.json \
  > runs/eval_ood_spk_deep_stress.log 2>&1
echo "OOD_SPKDEEP_STRESS rc=$?"
python predict.py ./config_ood.yaml TemporalCRN \
  --user_defined_name parity_v3 --num_items 100 \
  --out_json runs/eval_ood_parity_v3.json \
  > runs/eval_ood_parity_v3.log 2>&1
echo "OOD_PARITY rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_ood_parity_v3_stress.json runs/eval_ood_spk_deep_stress.json \
  > runs/compare_ood_conditioning.log 2>&1
echo "OOD_COMPARE rc=$?"
for art in ood_parity_v3_stress ood_spk_deep_stress ood_parity_v3; do
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_eval.py \
    runs/eval_$art.json --config ./config_ood.yaml --csv_dir data_ood \
    --kind_from_name --absolute > runs/analyze_$art.log 2>&1
  echo "ANALYZE_$art rc=$?"
done

# -- 5. GAN stage 3 regimen -----------------------------------------
timeout 5400 python train_hifigan.py ./config_hifigan.yaml --stage 3 \
  --user_defined_name gan_r5 --resume True \
  >> runs/gan_r5_stage3.log 2>&1
echo "GAN_S3_TRAIN rc=$?"
python predict_hifigan.py ./config_hifigan.yaml --stage 3 \
  --user_defined_name gan_r5 --num_items 100 \
  --out_json runs/eval_gan_r5_s3_deep.json \
  > runs/eval_gan_r5_s3_deep.log 2>&1
echo "GAN_S3_EVAL rc=$?"

# -- 6. N=300 re-scores ---------------------------------------------
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
python predict.py ./config_gb.yaml GeneralBeamformer \
  --user_defined_name gb_r5 --num_items 300 \
  --out_json runs/eval_gb_n300.json > runs/eval_gb_n300.log 2>&1
echo "N300_GB rc=$?"

echo R5_PHASE_B_DONE

# -- 7. GTSA deepening with the remaining wall clock ----------------
sup python train.py GTSA ./config_gtsa.yaml \
  --user_defined_name gtsa_r5 --resume True \
  >> runs/gtsa_r4_train.log 2>&1
echo "GTSA_TRAIN rc=$?"
